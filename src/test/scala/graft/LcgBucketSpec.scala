package graft

import org.apache.spark.sql.functions._

/** Pins the round-10 LCG rewrite's two claims (Tables.lcgBucket):
  *
  *  1. BIT-EQUALITY on the historical domain — for every id where the old
  *     raw form `(id·mult + add) % m` does not overflow (all real-corpus
  *     ids), the floor-mod-first form produces the identical bucket, so
  *     no oracle hash can have moved.
  *  2. TOTALITY — for EVERY 64-bit id (negative, Long.MaxValue,
  *     Long.MinValue) the bucket is well-defined in [0, m), where the raw
  *     form either ANSI-overflows or returns a negative remainder.
  */
class LcgBucketSpec extends SparkSpec {

  import spark.implicits._

  private val params = Seq((48271L, 7L, 100L), (48271L, 23L, 100L),
    (9301L, 49297L, 100L), (48271L, 11L, 1000000007L))

  test("lcgBucket equals the raw affine form wherever the raw form " +
      "cannot overflow") {
    val rnd = new scala.util.Random(42)
    // ids across the full non-overflowing magnitude range, plus the
    // boundary id where id*48271+23 is the largest representable product
    val ids = (Seq(0L, 1L, 99L, 100L, 101L, (Long.MaxValue - 49297L) / 48271L)
      ++ Seq.fill(300)(math.abs(rnd.nextLong()) % 190000000000000L)).distinct
    val df = ids.toDF("id").cache()
    for ((mult, add, m) <- params) {
      val rows = df.select(
        Tables.lcgBucket(col("id"), mult, add, m).as("bucket"),
        ((col("id") * mult + add) % m).as("raw")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"mult=$mult add=$add m=$m: ${r.toSeq}"))
    }
  }

  test("lcgBucket stays in [0, m) for every 64-bit id, including the " +
      "extremes that overflow or sign-flip the raw form") {
    val rnd = new scala.util.Random(7)
    val ids = Seq(Long.MaxValue, Long.MinValue, -1L, -100L,
      Long.MaxValue - 1, Long.MinValue + 1) ++
      Seq.fill(300)(rnd.nextLong())
    val df = ids.toDF("id").cache()
    for ((mult, add, m) <- params) {
      val buckets = df.select(Tables.lcgBucket(col("id"), mult, add, m))
        .collect().map(_.getLong(0))
      buckets.foreach(b =>
        assert(b >= 0L && b < m, s"mult=$mult add=$add m=$m: bucket $b"))
    }
  }
}
