package graft

import graft.ops.{CorpusStats, DedupOps}
import org.apache.spark.sql.functions._

/** The ANALYZE-once stats provider behind the dedup/curation dispatch
  * gates: correctness of the one-pass aggregate, equality of stats-driven
  * vs probe-driven gate decisions, the count short-circuit's exact
  * boundary, and the per-directory memoization contract.
  */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")

  test("compute: one pass yields rows, distinct, pair floor, dup fraction") {
    // 3×A + 2×B + 1×C: floor = C(3,2) + C(2,2·) = 3 + 1 = 4
    val df = corpus(Seq(0L -> "a a a", 1L -> "a a a", 2L -> "a a a",
      3L -> "b b", 4L -> "b b", 5L -> "c"))
    val st = CorpusStats.compute(df)
    assert(st === CorpusStats(rows = 6, distinctTexts = 3,
      exactDupPairFloor = 4))
    assert(math.abs(st.dupFraction - 0.5) < 1e-12)
    assert(CorpusStats.compute(corpus(Nil))
      === CorpusStats(0, 0, 0), "empty corpus must not NPE on null sums")
  }

  test("stats-driven and probe-driven gate decisions are identical on " +
      "threshold-straddling corpora") {
    // floor = C(30,2) = 435: straddle it from both sides
    val dense = corpus((0L until 30L).map(i => i -> "same text") ++
      (100L until 140L).map(i => i -> s"unique text number $i"))
    val st = Some(CorpusStats.compute(dense))
    for (threshold <- Seq(100L, 434L, 435L, 436L, 1000L)) {
      val viaProbe = DedupOps.pairFloorIfExceeds(dense, threshold, None)
      val viaStats = DedupOps.pairFloorIfExceeds(dense, threshold, st)
      assert(viaProbe === viaStats, s"threshold $threshold")
      assert(viaProbe.isDefined === (435L > threshold), s"threshold $threshold")
    }
    // dup-fraction gate: exact-distinct stats and the HLL probe must land
    // on the same side of 0.5 for clearly-dense and clearly-sparse corpora
    val sparse = corpus((0L until 40L).map(i => i -> s"all different $i"))
    for ((df, want) <- Seq(dense -> false, sparse -> false,
      corpus((0L until 40L).map(i => i -> "dup")) -> true)) {
      assert((CorpusStats.compute(df).dupFraction > 0.5) === want)
      assert((DedupOps.dupFraction(df) > 0.5) === want)
    }
  }

  test("maxRowsListable is the exact integer boundary of n(n-1)/2 <= max") {
    for (max <- Seq(0L, 1L, 2L, 3L, 435L, 2L * 1000 * 1000, Long.MaxValue / 4)) {
      val n = DedupOps.maxRowsListable(max)
      assert(n * (n - 1) / 2 <= max, s"max=$max n=$n")
      assert((n + 1) * n / 2 > max, s"max=$max n=$n must be maximal")
    }
  }

  test("count short-circuit: a small corpus passes the gate without the " +
      "floor probe even when every row is a duplicate") {
    // 100 identical rows: floor = C(100,2) = 4950 >> threshold 0 — but
    // 100 <= maxRowsListable(2M) = 2000, so the capped count alone proves
    // the listing is bounded and the gate must NOT consult the floor
    val tiny = corpus((0L until 100L).map(i => i -> "same"))
    assert(DedupOps.pairFloorIfExceeds(tiny, 2L * 1000 * 1000, None) === None)
    // …and the listing runs (all C(100,2) J=1 pairs, bounded by the cap)
    assert(DedupOps.jaccardPairsOn(tiny).count() === 4950L)
  }

  test("write/read round-trip; forDir memoizes per SNAPSHOT — an " +
      "unchanged dir answers from cache, a rewritten dir re-probes, a " +
      "deleted dir fails loud") {
    val st = CorpusStats(rows = 7, distinctTexts = 5, exactDupPairFloor = 2)
    val p = s"${tmpDir("stats")}/corpus_stats"
    CorpusStats.write(st, spark, p)
    assert(CorpusStats.read(spark, p) === Some(st))
    assert(CorpusStats.read(spark, p + "-missing") === None)

    // snapshot-keyed memoization (the r10 Tables.pathSnapshotKey
    // discipline): the SAME directory state answers from the cache; an
    // IN-PLACE REWRITE changes the key and re-probes — the raw-dir-string
    // memo this replaced would have served the pre-rewrite stats and
    // steered every stats-dispatched operator onto the wrong arm; a
    // DELETED dir is a state change too, so the next call fails loud
    // instead of answering for a corpus that no longer exists
    val dir = tmpDir("stats-dir")
    corpus(Seq(0L -> "x", 1L -> "x", 2L -> "y"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val first = CorpusStats.forDir(spark, dir)
    assert(first === CorpusStats(3, 2, 1))
    assert(CorpusStats.forDir(spark, dir) === first) // unchanged: cached
    corpus(Seq(0L -> "x", 1L -> "x", 2L -> "x", 3L -> "x"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(CorpusStats.forDir(spark, dir) === CorpusStats(4, 1, 6),
      "a rewritten dir must re-probe, not serve the stale snapshot")
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
    intercept[Exception] { CorpusStats.forDir(spark, dir) }
  }

  test("forDir reads persisted corpus_stats before computing") {
    val dir = tmpDir("stats-readhit")
    // numbers no compute fallback could produce, and NO documents table in
    // the directory at all — the only way the assertion can pass is the
    // persisted row being read (a compute attempt would throw)
    val st = CorpusStats(rows = 42, distinctTexts = 41, exactDupPairFloor = 1)
    CorpusStats.write(st, spark, s"$dir/corpus_stats")
    try assert(CorpusStats.forDir(spark, dir) === st)
    finally CorpusStats.invalidate(dir)
  }

  test("q56/q63 stats-driven arm choice matches the probe-driven choice " +
      "and both arms stay row-identical") {
    val rnd = new scala.util.Random(11)
    def text(i: Long) = (0 until 12).map(_ => s"w${rnd.nextInt(200)}")
      .mkString(" ") + s" tail$i"
    val dense = ((0L until 60L).map(i => (i, "the same boilerplate text " +
      "repeated across the corpus many times", "en", "src1")) ++
      (100L until 120L).map(i => (i, text(i), "en", "src9")))
      .toDF("doc_id", "text", "lang", "source")
    val st = Some(CorpusStats.compute(dense.select("doc_id", "text")))
    assert(st.get.dupFraction > 0.5)
    val bench = col("source") === "src9"
    val viaStats = ops.CurationOps.ngramDecontaminationOn(dense, bench,
      stats = st).collect().map(_.toSeq)
    val viaProbe = ops.CurationOps.ngramDecontaminationOn(dense, bench)
      .collect().map(_.toSeq)
    assert(viaStats === viaProbe)
    val repStats = ops.TextOps.repetitionProfileOn(dense, stats = st)
      .collect().map(_.toSeq)
    val repProbe = ops.TextOps.repetitionProfileOn(dense)
      .collect().map(_.toSeq)
    assert(repStats === repProbe)
  }
}
