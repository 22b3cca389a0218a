package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not part of the driver contract): build an N× scale-up of a
  * testdata directory by replicating every table with key remapping, so the
  * PLANS.md scale datapoints are reproducible each round.
  *
  *   runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf1x10 10
  *
  * Key discipline: every copy i shifts each entity key by i·(max_key+1),
  * with JOIN KEYS SHIFTED CONSISTENTLY on both sides (an order and its
  * lineitems land in the same copy, a customer keeps its orders), so join
  * cardinalities and group counts scale with the factor instead of fanning
  * out. Dimension tables with fixed real-world cardinality (region, nation)
  * are copied as-is. Event time shifts by i·(span+1min) so the window
  * count scales too. Text/embedding payloads replicate as-is — cross-copy
  * duplicates are intentional (they model a dup-dense corpus; the exact
  * pair listings are expected to be output-bound on them).
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    // optional 4th arg: comma-separated table subset (e.g. a 1000× corpus
    // of documents,embeddings only — the dedup/ANN spot-check inputs —
    // without paying for 600M lineitem rows)
    val Array(src, dst, fStr) = args.take(3)
    val f = fStr.toInt
    val only = args.drop(3).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, f, only)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, dst: String, f: Int,
      only: Option[Set[String]] = None): Unit = {
    require(f >= 1, s"factor must be >= 1, got $f")
    def wanted(name: String): Boolean = only.forall(_.contains(name))

    def t(name: String): DataFrame = Tables.t(spark, src, name)
    def keySpan(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // lazy: a table-subset run must not probe spans of unselected tables
    lazy val custSpan = keySpan(t("customer"), "c_custkey")
    lazy val suppSpan = keySpan(t("supplier"), "s_suppkey")
    lazy val partSpan = keySpan(t("part"), "p_partkey")
    lazy val orderSpan = keySpan(t("orders"), "o_orderkey")
    lazy val eventSpan = keySpan(t("events"), "event_id")
    lazy val userSpan = keySpan(t("events"), "user_id")
    lazy val docSpan = keySpan(t("documents"), "doc_id")
    lazy val vecSpan = keySpan(t("embeddings"), "vec_id")
    lazy val tsSpanMicros = {
      val r = t("events")
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      r.getLong(1) - r.getLong(0) + 60L * 1000000L
    }

    /** Union `f` remapped copies of one table and write it. */
    def rep(name: String)(remap: (DataFrame, Int) => DataFrame): Unit =
        if (wanted(name)) {
      val base = t(name)
      val out = (0 until f).map(i => remap(base, i)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x$f written")
    }
    /** Fixed-cardinality dimension: written ONCE, never replicated —
      * repeating it would duplicate every key f times and explode each
      * dim join f× (a 100× corpus once inflated q22 10,000× this way).
      */
    def fixed(name: String): Unit = if (wanted(name)) {
      t(name).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x1 (fixed dim) written")
    }
    def shift(c: String, span: Long, i: Int): Column =
      col(c) + lit(span * i)

    fixed("region")
    fixed("nation")
    rep("customer")((df, i) =>
      df.withColumn("c_custkey", shift("c_custkey", custSpan, i)))
    rep("supplier")((df, i) =>
      df.withColumn("s_suppkey", shift("s_suppkey", suppSpan, i)))
    rep("part")((df, i) =>
      df.withColumn("p_partkey", shift("p_partkey", partSpan, i)))
    rep("orders")((df, i) => df
      .withColumn("o_orderkey", shift("o_orderkey", orderSpan, i))
      .withColumn("o_custkey", shift("o_custkey", custSpan, i)))
    rep("lineitem")((df, i) => df
      .withColumn("l_orderkey", shift("l_orderkey", orderSpan, i))
      .withColumn("l_partkey", shift("l_partkey", partSpan, i))
      .withColumn("l_suppkey", shift("l_suppkey", suppSpan, i)))
    rep("events")((df, i) => df
      .withColumn("event_id", shift("event_id", eventSpan, i))
      .withColumn("user_id", shift("user_id", userSpan, i))
      .withColumn("ts",
        timestamp_micros(unix_micros(col("ts")) + lit(tsSpanMicros * i))))
    rep("documents")((df, i) =>
      df.withColumn("doc_id", shift("doc_id", docSpan, i)))
    rep("embeddings")((df, i) =>
      df.withColumn("vec_id", shift("vec_id", vecSpan, i)))
  }
}
