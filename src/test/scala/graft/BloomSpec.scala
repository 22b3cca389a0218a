package graft

import graft.functions.{Bloom, GraftFunctions}
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** Semantics of the distributed bloom filter (functions/bloom.scala) and
  * the bloom-pruned decontamination pipeline built on it (q90).
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives: every inserted key is reported present") {
    val keys = (1L to 5000L).map(i => Bloom.mix64(i * 31 + 7))
    val df = keys.toDF("k")
    GraftFunctions.ensureRegistered(spark)
    val bf = df.agg(expr("graft_bloom_agg(k, 65536, 7)").as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(keys.forall(Bloom.mightContain(bf, _)))
  }

  test("false-positive rate is near the design point, never 100%") {
    GraftFunctions.ensureRegistered(spark)
    // 5000 keys in 2^16 bits = 13 bits/key -> well under 1% FPs at k=7
    val bf = (1L to 5000L).toDF("k")
      .agg(expr("graft_bloom_agg(k, 65536, 7)").as("b"))
      .head().getAs[Array[Byte]]("b")
    val fps = (1_000_001L to 1_010_000L).count(Bloom.mightContain(bf, _))
    assert(fps < 100, s"expected <1% false positives, got $fps/10000")
  }

  test("filter bytes are partitioning-invariant (OR-merge is commutative)") {
    GraftFunctions.ensureRegistered(spark)
    def build(parts: Int): Array[Byte] =
      (1L to 2000L).toDF("k").repartition(parts)
        .agg(expr("graft_bloom_agg(k, 4096, 5)").as("b"))
        .head().getAs[Array[Byte]]("b")
    assert(java.util.Arrays.equals(build(1), build(7)))
  }

  test("empty input yields a filter that contains nothing") {
    GraftFunctions.ensureRegistered(spark)
    val bf = Seq.empty[Long].toDF("k")
      .agg(expr("graft_bloom_agg(k, 1024, 4)").as("b"))
      .head().getAs[Array[Byte]]("b")
    assert((1L to 100L).forall(!Bloom.mightContain(bf, _)))
  }

  test("corrupted filter bytes fail fast with the defect named — never a " +
      "silent wrong-mask probe") {
    val good = Bloom.empty(1024, 3)
    Bloom.add(good, 1024, 3, 42L)
    assert(Bloom.mightContain(good, 42L))
    // truncated below the header: would have indexed out of bounds
    val short = Array[Byte](1, 2, 3)
    val e1 = intercept[IllegalArgumentException](Bloom.mightContain(short, 1L))
    assert(e1.getMessage.contains("too short"))
    // header/payload length mismatch (a truncated persisted filter)
    val trunc = java.util.Arrays.copyOf(good, good.length - 16)
    val e2 = intercept[IllegalArgumentException](Bloom.mightContain(trunc, 1L))
    assert(e2.getMessage.contains("header says"))
    // non-power-of-two bit length: the probe mask would differ from the
    // build mask => false negatives; must be rejected, not probed
    val odd = new Array[Byte](8 + 100)
    System.arraycopy(good, 0, odd, 0, 8)
    odd(5) = 0; odd(6) = 0; odd(7) = 100 // header says 100 payload bytes
    val e3 = intercept[IllegalArgumentException](Bloom.mightContain(odd, 1L))
    assert(e3.getMessage.contains("power of two"))
    // nonsense k in the header
    val badK = good.clone(); badK(0) = 1 // k = 1<<24
    val e4 = intercept[IllegalArgumentException](Bloom.mightContain(badK, 1L))
    assert(e4.getMessage.contains("k="))
  }

  test("bloom_contains survives whole-stage codegen with fallback disabled") {
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.fallback", "false")
    GraftFunctions.ensureRegistered(strict)
    val bf = Bloom.empty(1024, 3)
    Bloom.add(bf, 1024, 3, 42L)
    import strict.implicits._
    val hits = strict.range(1, 100).toDF("id")
      .withColumn("b", lit(bf))
      .filter(expr("graft_bloom_contains(b, id)"))
      .select("id").as[Long].collect()
    assert(hits.contains(42L)) // present key always survives
    assert(hits.length < 20) // and the sparse filter rejects most others
  }

  test("non-literal nBits/k arguments are rejected, not mis-planned") {
    GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bloom_agg(id, id, 3) FROM range(5)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }

  test("q90 bloom-pruned pipeline equals the bloom-free exact semi-join") {
    val docs = Tables.t(spark, sfDir, "documents")
    val got = DedupOps.bloomLeakProfileOn(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // reference: identical split + plain exact semi-join, no bloom stage
    val d = docs
      .withColumn("norm",
        regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .withColumn("split",
        when((col("doc_id") * 48271L + 7L) % 100L < 90L, "train")
          .otherwise("eval"))
    val evalNorms = d.filter($"split" === "eval").select("norm").distinct()
    val train = d.filter($"split" === "train").select("source", "norm")
    val leaked = train.join(evalNorms, Seq("norm"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_leaked"))
    val want = train.groupBy("source").agg(count(lit(1)).as("n_train"))
      .join(leaked, Seq("source"), "left")
      .select(col("source"), col("n_train"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._2).sum > 0)
  }

  test("q90 plan: the bloom prunes BELOW the confirm join, not above it") {
    // regression guard for a real optimizer interaction: with a left-semi
    // confirm, PushDownLeftSemiAntiJoin re-keys the confirm onto the full
    // train side and hoists the bloom test above it (dead weight at
    // scale). The inner-join formulation must keep the bloom join inside
    // the confirm join's LEFT subtree.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val docs = Tables.t(spark, sfDir, "documents")
    val plan = DedupOps.bloomLeakProfileOn(docs)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    val bloomJoin = joins.filter(
      _.condition.exists(_.sql.contains("bloom_contains")))
    assert(bloomJoin.size === 1, "bloom test must live in a join condition")
    val confirm = joins.filter(j =>
      j.condition.exists(_.sql.contains("norm")) &&
        !j.condition.exists(_.sql.contains("bloom_contains")) &&
        j.left.collect { case b: Join if b eq bloomJoin.head => b }.nonEmpty)
    assert(confirm.nonEmpty,
      s"confirm join must sit ABOVE the bloom join; got:\n$plan")
  }

  test("a tiny (collision-heavy) filter still loses no true matches") {
    // 64-bit filter with 400 keys: nearly every probe is a false positive,
    // so the confirm join does all the work — result must be unchanged
    val docs = Tables.t(spark, sfDir, "documents")
    val tight = DedupOps.bloomLeakProfileOn(docs, nBits = 64, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val normal = DedupOps.bloomLeakProfileOn(docs)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(tight.toSeq === normal.toSeq)
  }
}
