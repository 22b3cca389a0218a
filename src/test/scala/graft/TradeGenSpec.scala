package graft

import graft.gen.TradeGen
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Property checks for the seeded generator — the invariants from
  * SURVEY.md §5.2(3) (producer.py:62-105 semantics).
  */
class TradeGenSpec extends SparkSpec {

  private lazy val trades = TradeGen.trades(spark, 2000, seed = 42).cache()

  /** Rows violating any producer invariant (one definition, used by both
    * the fixed-seed tests and the ScalaCheck multi-seed property).
    */
  private def badRows(t: org.apache.spark.sql.DataFrame) =
    t.filter(
      abs(col("notional_value") - round(col("quantity") * col("price"), 2)) > 0.011 ||
        abs(col("total_fees") - round(col("brokerage_fee") + col("clearing_fee")
          + col("exchange_fee"), 2)) > 0.011 ||
        (col("priority") === "High") =!=
          (col("status").contains("Break") || col("notional_value") > 1000000.0) ||
        col("stp_eligible") === col("status").contains("Break") ||
        !col("asset_class").isin(TradeGen.assetClasses: _*))

  test("generates the requested row count with unique trade ids") {
    assert(trades.count() === 2000)
    assert(trades.select("trade_id").distinct().count() === 2000)
  }

  test("JSON wire round-trip: gen → to_json → parseTrades is lossless") {
    // the same encode/decode pair the Kafka path uses (F1/F2), run batch
    val wire = trades.limit(200).select(to_json(struct(col("*")),
      graft.streaming.IngestPipeline.wireOptions.asJava).as("value"))
    val back = graft.streaming.IngestPipeline.parseTrades(wire)
    assert(back.count() === 200)
    assert(back.schema === graft.streaming.IngestPipeline.tradeSchema)
    val orig = trades.limit(200)
    assert(back.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(back).count() === 0)
  }

  test("producer invariants hold for arbitrary seeds (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // one Spark job per sample — keep the sample count small but the seeds
    // arbitrary; every invariant below must hold for EVERY seed
    val prop = Prop.forAll(Gen.choose(1, 1000000)) { seed =>
      val t = TradeGen.trades(spark, 300, seed = seed)
      badRows(t).count() == 0 && t.select("trade_id").distinct().count() == 300
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("derived columns satisfy all producer invariants") {
    assert(badRows(trades).count() === 0)
  }

  test("settlement date = trade date + per-class cycle") {
    TradeGen.settlementDays.foreach { case (ac, days) =>
      val bad = trades.filter(col("asset_class") === ac &&
        datediff(col("settlement_date"), col("trade_date")) =!= days)
      assert(bad.count() === 0, s"cycle violated for $ac")
    }
  }

  test("quantity and price stay within per-class ranges") {
    val ranges = Map(
      "Equity" -> ((100.0, 50000.0), (10.0, 500.0)),
      "Fixed Income" -> ((100000.0, 10000000.0), (90.0, 110.0)),
      "Derivative" -> ((1.0, 100.0), (1.0, 50.0)),
      "FX" -> ((100000.0, 5000000.0), (0.5, 2.0)),
      "Commodity" -> ((1.0, 500.0), (20.0, 2000.0)))
    ranges.foreach { case (ac, ((qLo, qHi), (pLo, pHi))) =>
      val bad = trades.filter(col("asset_class") === ac &&
        (col("quantity") < qLo || col("quantity") > qHi ||
          col("price") < pLo || col("price") > pHi))
      assert(bad.count() === 0, s"range violated for $ac")
    }
  }

  test("status distribution tracks the producer weights") {
    val n = 2000.0
    val counts = trades.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    TradeGen.statusWeights.foreach { case (st, w) =>
      val got = counts.getOrElse(st, 0L) / n
      assert(math.abs(got - w) < 0.05, s"$st: got $got want ~$w")
    }
  }

  test("derivation survives whole-stage codegen with fallback disabled") {
    // aggregate-without-key over the full 20-column derivation inlines the
    // whole chain into one generated method — the shape that used to blow
    // janino's 64 KB limit (CASE-chain byClass) and silently fall back to
    // interpreted eval. fallback=false turns any codegen failure into an
    // exception, so this test fails loudly if the derivation regrows.
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.fallback", "false")
    val r = TradeGen.trades(strict, 1000, seed = 42)
      .agg(count(lit(1)).as("n"), sum(col("notional_value")).as("nv"))
      .collect().head
    assert(r.getAs[Long]("n") === 1000L)
    assert(r.getAs[Double]("nv") > 0)
  }

  test("generation is deterministic and partitioning-independent") {
    val a = TradeGen.trades(spark, 500, seed = 7)
    val b = TradeGen.trades(spark, 500, seed = 7).repartition(13)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    val c = TradeGen.trades(spark, 500, seed = 8)
    assert(a.exceptAll(c).count() > 0, "different seeds should differ")
  }
}
