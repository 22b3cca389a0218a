package graft

import graft.ops.StatOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Semantics of the distribution/set-algebra layer (StatOps): the
  * distributed exact NTILE vs Spark's built-in window, the decorrelated
  * above-average filter vs a genuine correlated subquery, set ops vs their
  * join formulations, and histogram invariants.
  */
class StatSpec extends SparkSpec {

  import spark.implicits._

  private def events = Tables.t(spark, sfDir, "events")

  // ---------------------------------------------------------------- q85

  test("distributed ntile equals the built-in single-window ntile") {
    val df = events.select("event_id", "value")
    // the documented contract: input schema plus tile, no internal leaks
    assert(StatOps.withNtileOn(df, 10).columns.toSeq
      === Seq("event_id", "value", "tile"))
    val got = StatOps.withNtileOn(df, 10)
      .select("event_id", "tile")
    val want = df.withColumn("tile",
      ntile(10).over(Window.orderBy("value", "event_id")).cast("long"))
      .select("event_id", "tile")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("distributed ntile matches built-in on adversarial shapes") {
    // n < k (every row its own tile), heavy ties, k = 1
    val shapes = Seq(
      (Seq(5.0, 5.0, 5.0), 10),
      (Seq(1.0), 7),
      (Seq.fill(17)(2.5) ++ Seq.fill(5)(1.0), 4),
      ((1 to 23).map(_.toDouble / 7), 1))
    for ((vals, k) <- shapes) {
      val df = vals.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("event_id", "value")
      val got = StatOps.withNtileOn(df, k).select("event_id", "tile")
      val want = df.withColumn("tile",
        ntile(k).over(Window.orderBy("value", "event_id")).cast("long"))
        .select("event_id", "tile")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"shape n=${vals.size} k=$k")
    }
  }

  test("rebased ntile kernel drops the old __pid window exchange") {
    // the pre-rebase sibling ranked with a row_number window PARTITIONED
    // BY spark_partition_id(), which forced a data-sized hash exchange on
    // __pid after the pinned range exchange. Rebased on
    // withGlobalRowNumber (monotonic-id local ranks), the post-pin plan
    // holds only BOUNDED exchanges: per-pid count agg, the one-partition
    // offset ladder, and the broadcast of the offset table.
    val df = events.select("event_id", "value")
    val plan = StatOps.withNtileOn(df, 10)
      .queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(plan).length
    assert(n <= 3, s"ntile exchanges = $n (expected <= 3 bounded)\n$plan")
  }

  test("ntile bucket rule property: first n%k tiles get the extra row") {
    val prop = Prop.forAll(
      Gen.chooseNum(1, 60), Gen.chooseNum(1, 12)) { (n: Int, k: Int) =>
      val df = (1 to n).map(i => (i.toLong, (i * 37 % 11).toDouble))
        .toDF("event_id", "value")
      val sizes = StatOps.withNtileOn(df, k)
        .groupBy("tile").count().orderBy("tile")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expTiles = math.min(n, k)
      sizes.map(_._1).toSeq == (1L to expTiles) &&
        sizes.map(_._2).sum == n &&
        (if (n % k == 0) sizes.forall(_._2 == n / k)
         else sizes.filter(_._2 == n / k + 1).map(_._1).toSeq
           == (1L to (n % k).toLong)) &&
        sizes.forall(s => s._2 == n / k || s._2 == n / k + 1)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("writeOrdered: part files in filename order replay the global sort") {
    val df = events.select("event_id", "value")
    val dir = tmpDir("ordered-export")
    ops.ScaleOps.writeOrdered(df, dir,
      Seq(col("value").desc, col("event_id")), shards = 4)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(parts.length > 1, "must actually produce multiple shards")
    val replayed = parts.toSeq.flatMap(p =>
      spark.read.parquet(p).collect()
        .map(r => (r.getDouble(1), r.getLong(0))))
    val want = df.collect().map(r => (r.getDouble(1), r.getLong(0)))
      .sortBy { case (v, id) => (-v, id) }.toSeq
    assert(replayed === want)
  }

  test("withGlobalRowNumber equals the built-in single-window row_number") {
    val df = events.select("event_id", "value")
    val got = ops.ScaleOps.withGlobalRowNumber(df,
        Seq(col("value").desc, col("event_id")), out = "rank")
      .select("event_id", "rank")
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(col("value").desc, col("event_id")))
          .cast("long"))
      .select("event_id", "rank")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("withGlobalRowNumber stays correct with exchange reuse disabled") {
    // the ranked branch and the offset-count branch must observe ONE
    // physical range partitioning; the localCheckpoint pins it, so the
    // result must hold even when ReuseExchange can never fire
    val key = "spark.sql.exchange.reuse"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val df = events.select("event_id", "value")
      val got = ops.ScaleOps.withGlobalRowNumber(df,
          Seq(col("value").desc, col("event_id")), out = "rank")
        .select("event_id", "rank")
      val want = df.withColumn("rank",
          row_number().over(Window.orderBy(col("value").desc, col("event_id")))
            .cast("long"))
        .select("event_id", "rank")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // ---------------------------------------------------------------- q86

  test("decorrelated above-average equals Spark's correlated subquery") {
    events.createOrReplaceTempView("ev_q86")
    val correlated = spark.sql(
      """SELECT event_type, count(*) AS n_above
        |FROM ev_q86 e
        |WHERE CAST(value AS DECIMAL(18,6))
        |    * (SELECT CAST(count(*) AS DECIMAL(12,0)) FROM ev_q86 x
        |       WHERE x.event_type = e.event_type)
        |  > (SELECT sum(CAST(value AS DECIMAL(18,6))) FROM ev_q86 x
        |     WHERE x.event_type = e.event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = StatOps.aboveTypeAverageOn(events)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_above")))
    assert(got.toSeq === correlated.toSeq)
  }

  test("above-average boundary: a row exactly at the mean is excluded") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0))
      .toDF("event_type", "value")
    val got = StatOps.aboveTypeAverageOn(df).collect()
    // type a: mean 2.0 -> only 3.0 strictly above; type b: 5.0 == mean
    assert(got.toSeq === Seq(Row("a", 1L, 3.0)))
  }

  // ---------------------------------------------------------------- q87

  test("viewer segments equal the anti/semi-join formulation") {
    val viewers = events.filter($"event_type" === "view")
      .select("user_id").distinct()
    val buyers = events.filter($"event_type" === "purchase")
      .select("user_id").distinct()
    val nViewOnly =
      viewers.join(buyers, Seq("user_id"), "left_anti").count()
    val nBoth = viewers.join(buyers, Seq("user_id"), "left_semi").count()
    val got = StatOps.viewerSegmentsOn(events)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map(
      "view_only" -> nViewOnly, "view_and_purchase" -> nBoth))
  }

  // ---------------------------------------------------------------- q96

  test("robust outliers: MAD gate catches the planted spike, not the bulk") {
    // bulk at 10±1 (median 10, MAD 1), spikes far outside 3*MAD
    val bulk = (1 to 20).map(i => ("a", 9.0 + (i % 3))) // 9,10,11
    val spikes = Seq(("a", 100.0), ("a", -50.0))
    val df = (bulk ++ spikes).toDF("event_type", "value")
    val r = StatOps.robustOutliersOn(df).head()
    assert(r.getAs[Long]("n") === 22L)
    assert(r.getAs[Long]("n_outliers") === 2L)
    assert(r.getAs[Double]("med") === 10.0)
    assert(r.getAs[Double]("mad") === 1.0)
  }

  test("robust outliers: constant group has MAD 0 and flags any deviation") {
    val df = (Seq.fill(5)(("c", 7.0)) :+ (("c", 7.5)))
      .toDF("event_type", "value")
    val r = StatOps.robustOutliersOn(df).head()
    // med 7.0, MAD 0 -> the single 7.5 exceeds 3*0
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Double]("mad") === 0.0)
  }

  // ---------------------------------------------------------------- q88

  test("histogram: bins partition the data and edges are exact") {
    val hist = StatOps.valueHistogramOn(events).collect()
    assert(hist.map(_.getAs[Long]("n")).sum === events.count())
    for (r <- hist) {
      val lo = r.getAs[Double]("bin_lo")
      assert(r.getAs[Double]("min_v") >= lo)
      assert(r.getAs[Double]("max_v") < lo + 25.0)
    }
    // boundary value lands in the upper bin (edges are [lo, hi))
    val b = StatOps.valueHistogramOn(
      Seq(24.99, 25.0, 25.01).toDF("value")).collect()
    assert(b.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"))).toSeq
      === Seq((0L, 1L), (1L, 2L)))
  }

  test("histogram: negative values bin by FLOOR division (DuckDB // parity)") {
    // Spark's `div` truncates toward zero; DuckDB's `//` floors. A refund
    // of −0.01 must land in bin −1 (interval [−25, 0)), not bin 0 — and
    // the exact multiple −25.0 in bin −1, not −2.
    val b = StatOps.valueHistogramOn(
      Seq(-0.01, -24.99, -25.0, -25.01, 0.0, -50.0).toDF("value")).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Double]("bin_lo"))).toSeq
    // −25.01 and −50.0 → bin −2 [−50, −25); −0.01, −24.99 and the exact
    // multiple −25.0 → bin −1 [−25, 0); 0.0 → bin 0
    assert(b === Seq((-2L, 2L, -50.0), (-1L, 3L, -25.0), (0L, 1L, 0.0)))
    for (r <- StatOps.valueHistogramOn(
        Seq(-0.01, -24.99, -25.0, -60.0, 13.0).toDF("value")).collect()) {
      val lo = r.getAs[Double]("bin_lo")
      assert(r.getAs[Double]("min_v") >= lo && r.getAs[Double]("max_v") < lo + 25)
    }
  }

  // ---------------------------------------------------------------- q15
  test("q15 decomposition keeps a null event_type group (null-safe join)") {
    // the two-aggregation rewrite joins user and value sides on the group
    // key; a plain equi-join would silently drop the null group the
    // single-aggregation form (and the oracle's GROUP BY) retains
    val ev = Seq(
      (Option("a"), Option(1L), 10.0), (Option("a"), Option(2L), 20.0),
      (Option.empty[String], Option(3L), 5.0),
      (Option.empty[String], Option(4L), 7.0),
      (Option.empty[String], Option.empty[Long], 9.0))
      .toDF("event_type", "user_id", "value")
    val got = ops.EventOps.sketchCheckedOn(ev).collect()
    assert(got.length === 2, "null event_type group must survive the join")
    val nullRow = got.find(_.isNullAt(0)).get
    // count(user_id) over distinct pairs: the null USER is still excluded
    assert(nullRow.getLong(1) === 2L)
    assert(got.find(!_.isNullAt(0)).get.getLong(1) === 2L)
  }
}
