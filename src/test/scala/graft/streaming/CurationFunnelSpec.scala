package graft.streaming

import graft.SparkSpec
import graft.ops.{CurationOps, DedupOps, SpanOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming curation funnel: every gate fires on a hand-built
  * fixture, per-batch routing is doc-for-doc the q149 core over the
  * ingested prefix, replay converges, and the eval-store contract is
  * loud.
  */
class CurationFunnelSpec extends SparkSpec {

  // corpus (already indexed) and eval benchmark texts
  private val c1 = "alpha beta gamma delta epsilon"
  private val c2 = "one two three four five six"
  private val evalText = "secret benchmark question answer here"

  // batch 1: one doc per gate
  private val batch1 = Seq(
    (10L, "s1", c1), // exact dup of the corpus → 2_fresh
    (11L, "s1", "Alpha  beta GAMMA delta epsilon"), // norm dup → 2_fresh
    (12L, "s1", "fresh distinct wording lives here happily"), // released
    (13L, "s2", "x x x x x x x x x x"), // low quality → 1_quality
    (14L, "s2", "alpha beta gamma delta epsilon zeta"), // 3 of 4 shingles
    // indexed → 3_novel
    (15L, "s2", evalText), // benchmark re-crawl → 4_decontaminated
    (16L, "s3", "contact me at bob@example.com for details"), // PII →
    // 5_released
    (17L, "s3", "twin text arrives twice in one crawl"), // released
    (18L, "s3", "twin text arrives twice in one crawl")) // within-crawl
  // dup, higher doc_id → 2_fresh
  private val batch2 = Seq(
    (20L, "s1", "fresh distinct wording lives here happily"), // dup of
    // batch 1's RELEASED doc 12 — only the store fold can catch it
    (21L, "s1", "completely novel second batch sentence emerges"))

  test("curation funnel: every gate fires, per-batch routing equals the " +
      "q149 core over the ingested prefix, stores fold released docs " +
      "forward, reports roll up additively") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val normStore = tmpDir("funnel-norms")
    val shingleStore = tmpDir("funnel-shingles")
    val evalStore = tmpDir("funnel-eval")
    val keepDir = tmpDir("funnel-keep")
    val reportDir = tmpDir("funnel-report")
    val corpus = Seq((1L, "s0", c1), (2L, "s0", c2))
      .toDF("doc_id", "source", "text")
    CurationFunnelPipeline.seedFunnelStores(corpus, normStore, shingleStore)
    CurationOps.writeFingerprintStore(
      Seq((100L, evalText)).toDF("doc_id", "text"), evalStore)

    val input = MemoryStream[(Long, String, String)]
    val q = CurationFunnelPipeline.runCurationFunnel(
      input.toDS().toDF("doc_id", "source", "text"),
      normStore, shingleStore, evalStore, keepDir, reportDir,
      tmpDir("funnel-ckpt"))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // batch 1 routing: exactly the hand-traced survivors per stage
    val rep1 = spark.read.parquet(s"$reportDir/batch_id=0")
      .groupBy("stage").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    assert(rep1 === Map("0_arrived" -> 9L, "1_quality" -> 8L,
      "2_fresh" -> 5L, "3_novel" -> 4L, "4_decontaminated" -> 3L,
      "5_released" -> 2L), s"batch-1 stage counts: $rep1")
    val kept1 = spark.read.parquet(s"$keepDir/batch_id=0")
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 === Set(12L, 17L))

    // batch 2: doc 20 must die against batch 1's RELEASED norm — the
    // cross-batch store fold at work
    val kept2 = spark.read.parquet(s"$keepDir/batch_id=1")
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 === Set(21L))

    // doc-for-doc prefix equality: batch 2 through the q149 core with
    // reference frames built by hand from corpus ∪ batch-1 released
    val released1 = Seq(batch1(2), batch1(7))
      .toDF("doc_id", "source", "text")
    val prefix = corpus.unionByName(released1)
    val stages = CurationOps.crawlFunnelStages(
      batch2.toDF("doc_id", "source", "text"),
      prefix.select(DedupOps.normText.as("norm")).distinct(),
      SpanOps.distinctShingleKeys(prefix, CurationOps.FunnelShingleK),
      spark.read.parquet(evalStore).select("norm"))
    assert(stages.last._2.select("doc_id").as[Long].collect().toSet
      === kept2, "stream routing ≡ batch core over the ingested prefix")
    assert(CurationOps.crawlFunnelReport(stages).collect().map(_.toSeq)
      .toSeq === spark.read.parquet(s"$reportDir/batch_id=1")
        .orderBy("stage", "source").collect().map(_.toSeq).toSeq,
      "stored report ≡ batch core report")

    // replay: re-routing batch 2 under the same id converges (keyed
    // probes ignore the batch's own earlier fold; keyed sinks overwrite)
    CurationFunnelPipeline.routeBatch(
      batch2.toDF("doc_id", "source", "text"), 1L,
      normStore, shingleStore, evalStore, keepDir, reportDir)
    assert(spark.read.parquet(s"$keepDir/batch_id=1")
      .select("doc_id").as[Long].collect().toSet === Set(21L))
    assert(spark.read.parquet(s"$normStore/batch_id=1")
      .as[String].collect().toSet
      === Set("completely novel second batch sentence emerges"))

    // cumulative accounting: funnelReport = sum of the batch reports
    val cum = CurationFunnelPipeline.funnelReport(spark, reportDir)
      .groupBy("stage").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    assert(cum === Map("0_arrived" -> 11L, "1_quality" -> 10L,
      "2_fresh" -> 6L, "3_novel" -> 5L, "4_decontaminated" -> 4L,
      "5_released" -> 3L), s"cumulative: $cum")
    assert(CurationFunnelPipeline.latestReport(spark, reportDir)
      .agg(sum(when(col("stage") === "0_arrived", col("n_docs"))))
      .head.getLong(0) === 2L, "latest report covers only batch 2")

    // compaction cadence: fold every COMMITTED segment into the seed
    // slot. The NEWEST segment (batch 1) is deliberately retained — it
    // is the one batch that may have crashed pre-checkpoint and will
    // replay under its own id; folding it would self-poison that replay
    CurationFunnelPipeline.compactFunnelStores(spark, normStore,
      shingleStore)
    def segs(p: String): Set[String] = new java.io.File(p).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(segs(normStore) === Set("batch_id=-1", "batch_id=1") &&
      segs(shingleStore) === Set("batch_id=-1", "batch_id=1"),
      s"seed + retained-newest after compaction: ${segs(normStore)} / " +
        s"${segs(shingleStore)}")
    SpanOps.requireShingleK(spark, shingleStore,
      CurationOps.FunnelShingleK)
    // the crashed-replay regression (the r15 self-review finding):
    // batch 1's segments survived compaction, so replaying batch 1
    // probes batch_id < 1 references only and converges — its keep
    // segment is rewritten IDENTICAL, never emptied by its own norms
    CurationFunnelPipeline.routeBatch(
      batch2.toDF("doc_id", "source", "text"), 1L,
      normStore, shingleStore, evalStore, keepDir, reportDir)
    assert(spark.read.parquet(s"$keepDir/batch_id=1")
      .select("doc_id").as[Long].collect().toSet === Set(21L),
      "a replayed newest batch must converge after compaction, not " +
        "self-poison against its own folded norms")
    // batch 3 against the compacted stores: a re-crawl of batch 1's
    // RELEASED doc still dies (the fold + retained segment keep every
    // norm), novelty still fires, a genuinely new doc still ships
    CurationFunnelPipeline.routeBatch(Seq(
        (30L, "s1", "fresh distinct wording lives here happily"),
        (31L, "s1", "yet another wholly original third crawl sentence"))
      .toDF("doc_id", "source", "text"), 2L,
      normStore, shingleStore, evalStore, keepDir, reportDir)
    assert(spark.read.parquet(s"$keepDir/batch_id=2")
      .select("doc_id").as[Long].collect().toSet === Set(31L),
      "compaction must not change any gate's answer")
    // a second compaction now folds batch 1 (no longer newest) and
    // retains batch 2 — the ratchet advances one batch behind the head
    CurationFunnelPipeline.compactFunnelStores(spark, normStore,
      shingleStore)
    assert(segs(normStore) === Set("batch_id=-1", "batch_id=2"),
      s"second compaction folds the previously-retained segment: " +
        s"${segs(normStore)}")
  }

  test("curation funnel contracts: an absent eval store fails loud " +
      "(decontamination must never silently no-op), and an unseeded " +
      "funnel admits a first crawl against empty references") {
    import spark.implicits._
    val normStore = tmpDir("funnel2-norms")
    val shingleStore = tmpDir("funnel2-shingles")
    val evalStore = tmpDir("funnel2-eval")
    val batch = Seq((1L, "s1", "a perfectly ordinary first document"))
      .toDF("doc_id", "source", "text")
    intercept[Exception] {
      CurationFunnelPipeline.routeBatch(batch, 0L, normStore,
        shingleStore, tmpDir("funnel2-missing"), tmpDir("funnel2-keep"),
        tmpDir("funnel2-report"))
    }
    // an explicitly-seeded EMPTY eval store is the sanctioned "no
    // benchmarks" statement; unseeded norm/shingle stores self-create
    CurationOps.writeFingerprintStore(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), evalStore)
    val keepDir = tmpDir("funnel2-keep2")
    CurationFunnelPipeline.routeBatch(batch, 0L, normStore,
      shingleStore, evalStore, keepDir, tmpDir("funnel2-report2"))
    assert(spark.read.parquet(s"$keepDir/batch_id=0")
      .select("doc_id").as[Long].collect().toSet === Set(1L))
    // the bootstrap stamped the width sidecar: a mismatched-k probe of
    // the funnel's shingle store now fails loud
    intercept[IllegalArgumentException] {
      SpanOps.requireShingleK(spark, shingleStore, 8)
    }
  }
}
