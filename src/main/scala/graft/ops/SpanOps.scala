package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level exact deduplication (ExactSubstr-style, at word-shingle
  * granularity): find every span of a document that also occurs verbatim
  * elsewhere in the corpus, and optionally rewrite documents with those
  * spans removed. This is the span-level companion to the document-level
  * dedup family in [[DedupOps]] — document dedup drops whole near-copies,
  * span dedup surgically removes boilerplate/quoted passages that repeat
  * across otherwise-distinct documents.
  *
  * Scale design (everything is linear in corpus tokens — no pair listing):
  *  1. shingle pass — each doc emits its K-word shingles with positions
  *     (`posexplode` over a `transform`/`slice` array expression; stays in
  *     whole-stage codegen);
  *  2. one shingle-keyed window count flags occurrences whose shingle
  *     appears ≥ 2 times globally (no pair expansion — a shingle occurring
  *     m times costs m flagged rows, not m² pairs);
  *  3. per-doc interval merge (gaps-and-islands over a doc-partitioned
  *     window — partitions are doc-sized, never corpus-sized);
  *  4. (rewrite only) spans collect to a per-doc sorted array — bounded by
  *     doc size — and a row-local slice expression rebuilds the text.
  *
  * The data-sized shuffles are exactly two: one on the 16-byte md5 shingle
  * key (step 2) and one on doc_id (step 3) — every candidate formulation
  * with more (groupBy + self-semi-join, explode-words + anti-join) measured
  * 2–3× slower at 100× and recomputed the shingle explode to boot.
  */
object SpanOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")

  /** Default shingle width (words). 8 keeps the testdata signal
    * non-degenerate; production corpora would use ~50 tokens. */
  val DefaultK = 8

  /** (doc_id, pos, h) for every K-word window; docs shorter than K emit
    * nothing. pos is the 0-based word index of the shingle start; h is the
    * 128-bit md5 of the shingle text — the key every downstream shuffle
    * rides on. 16-byte binary keys shuffle at a third of the raw shingle
    * strings' width, and at 128 bits a collision (which would falsely
    * flag a span as duplicated) stays negligible past 10^12 shingles —
    * the same key-width reasoning as the dedup family's md5 membership
    * keys. */
  private def shingleOcc(docsDf: DataFrame, k: Int): DataFrame =
    docsDf
      .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks) - $k)," +
          s" i -> unhex(md5(array_join(slice(toks, i + 1, $k), ' '))))"))
        .as(Seq("pos", "h")))

  /** Duplicated (doc_id, pos) shingle occurrences: the shingle starting at
    * `pos` occurs ≥ 2 times corpus-wide (same doc or another doc — an
    * internally-repeated passage is just as removable as a cross-doc one).
    *
    * A window count over the shingle key, not groupBy + self-semi-join:
    * the join form shuffles the occurrence table twice AND recomputes the
    * shingle explode for the probe side (measured 17.7 s vs 6.5 s at 100×);
    * the window pays one shuffle + sort and reads the explode once. Hot
    * boilerplate shingles are safe — sort-based windows spill, where a
    * collect_list-based contraction would hold a corpus-wide shingle's
    * occurrence list in one row. */
  private def dupOcc(docsDf: DataFrame, k: Int): DataFrame =
    shingleOcc(docsDf, k)
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .where(col("cnt") >= 2)
      .select("doc_id", "pos")

  /** q102: duplicated spans per document — maximal word-index intervals
    * covered by shingles that occur ≥ 2 times in the corpus. Overlapping
    * and adjacent shingle intervals merge (classic gaps-and-islands: a new
    * island starts when this shingle begins past the running max end + 1).
    *
    * Output: (doc_id, span_start, span_end, span_len), word indices,
    * inclusive, 0-based.
    */
  def dupSpansOn(docsDf: DataFrame, k: Int = DefaultK): DataFrame = {
    val occ = dupOcc(docsDf, k)
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val before = byPos.rowsBetween(Window.unboundedPreceding, -1)
    occ
      .withColumn("prev_end", max(col("pos") + lit(k - 1)).over(before))
      .withColumn("new_island",
        when(col("prev_end").isNull ||
          col("pos") > col("prev_end") + 1, 1).otherwise(0))
      .withColumn("grp", sum(col("new_island")).over(byPos))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id"),
        col("span_start").cast("int").as("span_start"),
        col("span_end").cast("int").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("int").as("span_len"))
      .orderBy("doc_id", "span_start")
  }

  def dupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpansOn(docs(s, dir))

  /** q103: span-masked rewrite — every word position covered by a q102
    * span is dropped and the document re-joined from the survivors. Docs
    * with no duplicated span pass through verbatim; a fully-covered doc
    * yields an empty `clean_text` (its row survives — downstream length
    * filters decide its fate, not this operator).
    *
    * Output: (doc_id, n_tokens, n_kept, n_removed, clean_text).
    */
  def substrDedupOn(docsDf: DataFrame, k: Int = DefaultK): DataFrame = {
    val toks = docsDf.select(col("doc_id"),
      split(trim(col("text")), " ").as("toks"))
    // Per-doc sorted span arrays, then a row-local array rebuild: the
    // span list is doc-bounded, so the only data-sized shuffles are the
    // span pipeline itself plus one doc-keyed join of two doc-count-sized
    // sides. (The explode-words ∕ anti-join ∕ collect_list formulation
    // shuffles every TOKEN three times — measured 3× slower at 100×.)
    val sp = dupSpansOn(docsDf, k)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(
        struct(col("span_start"), col("span_end")))).as("sp"))
    // kept = the between-span slices (spans are sorted, merged, and
    // non-overlapping by construction, so the gaps tile the doc)
    toks.join(sp, Seq("doc_id"), "left")
      .withColumn("kept", expr(
        """CASE WHEN sp IS NULL THEN toks ELSE
          |flatten(transform(sequence(0, size(sp)), j ->
          |  slice(toks,
          |    IF(j = 0, 1, element_at(sp, j).span_end + 2),
          |    greatest(0,
          |      IF(j = size(sp), size(toks),
          |         element_at(sp, j + 1).span_start)
          |        - IF(j = 0, 0, element_at(sp, j).span_end + 1)))))
          |END""".stripMargin))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(col("kept")).as("n_kept"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  def substrDedup(s: SparkSession, dir: String): DataFrame =
    substrDedupOn(docs(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_dup_spans" -> dupSpans,
    "q103_substr_dedup" -> substrDedup)

  /** Shared oracle CTE chain: tokenize → shingle with positions → flag
    * duplicated shingles → merged islands (mirrors steps 1–4 above). */
  private val spanCtes: String =
    s"""WITH d AS (SELECT doc_id,
       |  string_split(trim(text), ' ') AS toks FROM documents),
       |sh AS (SELECT doc_id, CAST(i AS INT) AS pos,
       |    array_to_string(toks[i+1 : i+$DefaultK], ' ') AS shingle
       |  FROM (SELECT doc_id, toks,
       |      unnest(range(0, len(toks) - $DefaultK + 1)) AS i
       |    FROM d WHERE len(toks) >= $DefaultK)),
       |dup AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) >= 2),
       |occ AS (SELECT doc_id, pos FROM sh
       |  WHERE shingle IN (SELECT shingle FROM dup)),
       |isl AS (SELECT doc_id, pos,
       |  CASE WHEN pos > coalesce(max(pos + ${DefaultK - 1}) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
       |    THEN 1 ELSE 0 END AS ni FROM occ),
       |g AS (SELECT doc_id, pos,
       |  sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM isl),
       |spans AS (SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       |    CAST(max(pos) + ${DefaultK - 1} AS INT) AS span_end
       |  FROM g GROUP BY doc_id, grp)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q102_dup_spans" ->
      s"""$spanCtes
         |SELECT doc_id, span_start, span_end,
         |  span_end - span_start + 1 AS span_len
         |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    "q103_substr_dedup" ->
      s"""$spanCtes,
         |cov AS (SELECT doc_id,
         |    CAST(unnest(range(span_start, span_end + 1)) AS INT) AS pos
         |  FROM spans),
         |w AS (SELECT doc_id, CAST(i AS INT) AS pos, toks[i+1] AS word,
         |    CAST(len(toks) AS INT) AS n_tokens
         |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS i
         |    FROM d)),
         |kept AS (SELECT w.* FROM w LEFT JOIN cov
         |    ON w.doc_id = cov.doc_id AND w.pos = cov.pos
         |  WHERE cov.pos IS NULL),
         |rb AS (SELECT doc_id, n_tokens, CAST(count(*) AS INT) AS n_kept,
         |    string_agg(word, ' ' ORDER BY pos) AS clean_text
         |  FROM kept GROUP BY doc_id, n_tokens)
         |SELECT d2.doc_id, CAST(len(d2.toks) AS INT) AS n_tokens,
         |  coalesce(rb.n_kept, 0) AS n_kept,
         |  CAST(len(d2.toks) AS INT) - coalesce(rb.n_kept, 0) AS n_removed,
         |  coalesce(rb.clean_text, '') AS clean_text
         |FROM d AS d2 LEFT JOIN rb ON d2.doc_id = rb.doc_id
         |ORDER BY d2.doc_id""".stripMargin)
}
