package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming crawl triage: per-document K-shingle novelty against the
  * indexed corpus with ZERO stream-side shuffle — the streaming face of
  * `SpanOps.noveltyAgainstOn` / q111, built the `freshDocsBloom` way.
  *
  * The corpus's distinct shingle keys fold into one bloom filter at stream
  * start (a bounded byte array riding the plan as a literal); each incoming
  * document then scores ROW-LOCALLY: its own distinct shingle hashes fold
  * through `graft_bloom_contains` — no join, no state, no watermark, so a
  * crawl frontier can gate on novelty at wire speed.
  *
  * Bloom false positives only UNDERCOUNT novelty (a genuinely novel shingle
  * read as already-indexed) — the conservative direction for a
  * keep-if-novel gate: nothing stale is ever scored novel. Size `nBits` to
  * the indexed corpus's distinct-shingle count for the usual FP math; the
  * exact offline answer is `noveltyAgainstStore`.
  */
object NoveltyTriagePipeline {

  /** 64-bit shingle keys (xxhash64 of the 16-byte md5 keys the span family
    * shuffles on — `SpanOps.shingleKeysExpr` is the ONE shingle-key
    * definition, so batch and stream can never silently diverge) — the
    * bloom's domain.
    */
  private def shingleHashExpr(k: Int, toks: String): String =
    s"transform(${graft.ops.SpanOps.shingleKeysExpr(k, toks)}, " +
      "h -> xxhash64(h))"

  /** Build the corpus filter and return the scored stream. `docStream`
    * needs (doc_id, text); appends n_shingles / n_novel / novelty_ratio
    * (null ratio for docs shorter than K words, which emit no shingles).
    */
  def scoredDocs(docStream: DataFrame, corpus: DataFrame, k: Int = 8,
      nBits: Int = 1 << 20, kHashes: Int = 7): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // no distinct() before the fold: bloom insertion is idempotent, so
    // duplicate keys change nothing in the bytes — a distinct would pay a
    // full corpus-sized shuffle for nothing (per-task partial filters of
    // nBits/8 bytes each merge to the single row instead)
    val filterBytes = corpus
      .select(split(trim(col("text")), " ").as("toks"))
      .where(size(col("toks")) >= k)
      .select(explode(expr(shingleHashExpr(k, "toks"))).as("hk"))
      .agg(expr(s"graft_bloom_agg(hk, $nBits, $kHashes)").as("b"))
      .head().getAs[Array[Byte]]("b")
    // Empty-corpus guard: a corpus with no >=k-token document aggregates
    // zero rows and the fold yields NULL — as a NullType literal that
    // would fail analysis (or null out n_novel) downstream. The
    // semantically right filter for "nothing indexed yet" is the all-zero
    // filter: every probe misses, every shingle scores novel.
    scoredAgainstFilter(docStream,
      if (filterBytes == null) new Array[Byte](nBits / 8) else filterBytes, k)
  }

  /** Score against pre-built filter bytes (persist them once beside the
    * shingle store and every consumer skips the build pass).
    */
  def scoredAgainstFilter(docStream: DataFrame, filterBytes: Array[Byte],
      k: Int = 8): DataFrame = {
    require(filterBytes != null && filterBytes.nonEmpty,
      "scoredAgainstFilter: filterBytes must be a non-empty bloom byte " +
        "array (for an empty corpus pass an all-zero array of nBits/8 " +
        "bytes — every shingle then scores novel)")
    graft.functions.GraftFunctions.ensureRegistered(docStream.sparkSession)
    docStream
      .withColumn("toks", split(trim(col("text")), " "))
      .withColumn("shs",
        when(size(col("toks")) >= k,
          array_distinct(expr(shingleHashExpr(k, "toks"))))
          .otherwise(typedLit(Seq.empty[Long])))
      .withColumn("bf", lit(filterBytes))
      .withColumn("n_shingles", size(col("shs")).cast("long"))
      .withColumn("n_novel", expr(
        "aggregate(shs, 0L, (acc, h) -> " +
          "acc + IF(graft_bloom_contains(bf, h), 0L, 1L))"))
      .withColumn("novelty_ratio",
        when(col("n_shingles") > 0,
          round(col("n_novel") / col("n_shingles"), 6)))
      .drop("toks", "shs", "bf")
  }
}
