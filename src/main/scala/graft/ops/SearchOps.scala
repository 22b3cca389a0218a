package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text-search building blocks over the documents corpus: the inverted
  * index (token → document-frequency, collection-frequency, posting list)
  * and the within-document co-occurrence matrix — the two structures every
  * corpus-scale search / phrase-mining pipeline materializes first.
  *
  * Scale discipline: per-token posting lists are the canonical unbounded-
  * group hazard (a stopword's postings = the whole corpus). Nothing here
  * collects an uncapped group: posting lists go through the two-phase
  * salted top-k (bounded buffer per task at every stage), and lexicon
  * statistics are plain keyed aggregations with map-side partials.
  */
object SearchOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")

  /** Whitespace tokens, the corpus-wide convention (TextOps/DedupOps). */
  private def toks = split(trim(col("text")), " ")

  /** How many (smallest) doc ids a q79 posting row carries. */
  private[ops] val PostingCap = 10

  /** q79: inverted index lexicon — one row per token with document
    * frequency, collection frequency, and the first [[PostingCap]] doc ids
    * (ascending, comma-joined; the head of the full posting list a search
    * engine would shard by term).
    *
    * Scale: tokens first contract to (token, doc_id, tf) — keyed by the
    * (token, doc) pair, so even a stopword's rows spread across the
    * cluster. The lexicon stats are one further keyed aggregation. The
    * capped posting head does NOT collect_list the group (a stopword's
    * group is the corpus): it rides the two-phase salted top-k
    * ([[ScaleOps.topKPerGroup]]) — every task buffers at most
    * `cap · salts` rows per token — and only then collapses ≤cap survivors
    * to a string.
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    invertedIndexOn(docs(s, dir), PostingCap)

  /** `docsDf` needs (doc_id, text). */
  def invertedIndexOn(docsDf: DataFrame, cap: Int): DataFrame = {
    val perDoc = docsDf
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val lexicon = perDoc.groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
    val postings = ScaleOps
      .topKPerGroup(perDoc, Seq("token"), Seq(col("doc_id").asc), cap,
        salt = xxhash64(col("doc_id")))
      .groupBy("token")
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
        .as("postings"))
    lexicon.join(postings, "token") // both sides already keyed by token
      .orderBy("token")
  }

  /** q80: token co-occurrence — the top-50 pairs of distinct tokens by the
    * number of documents containing both (the first step of phrase mining,
    * PMI scoring, and related-term suggestion). Pair order is normalized
    * (t1 < t2) and ties break lexicographically, so the top-k cut is a
    * deterministic total order.
    *
    * Scale: pairs are generated per document from its DISTINCT token set —
    * cost is quadratic in per-document vocabulary (bounded by document
    * length) and linear in corpus size, never corpus-quadratic. The
    * generation is a self-equi-join on doc_id (one co-partitioned shuffle);
    * the count aggregates with map-side partials and the final cut plans
    * as TakeOrderedAndProject, not a global sort. At real corpus scale,
    * prune ubiquitous tokens first (df above ~50% of documents carries no
    * signal and dominates the quadratic term) — compose with
    * [[invertedIndexOn]]'s lexicon as the df side.
    */
  def tokenCooccurrence(s: SparkSession, dir: String): DataFrame =
    tokenCooccurrenceOn(docs(s, dir), 50)

  /** `docsDf` needs (doc_id, text). */
  def tokenCooccurrenceOn(docsDf: DataFrame, topK: Int): DataFrame = {
    val tok = docsDf
      .select(col("doc_id"), explode(array_distinct(toks)).as("t"))
    val a = tok.toDF("doc_id", "t1")
    val b = tok.toDF("doc_id", "t2")
    a.join(b, Seq("doc_id"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("t1").asc, col("t2").asc)
      .limit(topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_inverted_index" -> invertedIndex,
    "q80_token_cooccurrence" -> tokenCooccurrence)

  val oracle: Map[String, String] = Map(
    "q79_inverted_index" ->
      s"""WITH tok AS (SELECT doc_id,
         |    unnest(string_split(trim(text), ' ')) AS token FROM documents),
         |per_doc AS (SELECT token, doc_id, count(*) AS tf
         |  FROM tok GROUP BY token, doc_id)
         |SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
         |  array_to_string(list_sort(list(doc_id))[1:$PostingCap], ',')
         |    AS postings
         |FROM per_doc GROUP BY token ORDER BY token""".stripMargin,
    "q80_token_cooccurrence" ->
      """WITH tok AS (SELECT DISTINCT * FROM (SELECT doc_id,
        |    unnest(string_split(trim(text), ' ')) AS t FROM documents))
        |SELECT a.t AS t1, b.t AS t2, count(*) AS n_docs
        |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
        |GROUP BY t1, t2
        |ORDER BY n_docs DESC, t1, t2 LIMIT 50""".stripMargin)
}
