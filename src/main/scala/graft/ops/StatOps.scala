package graft.ops

import graft.Tables
import graft.Tables.{dsum, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution / set-algebra analytics over the events stream — the
  * dashboard-style statistics layer (reference: dashboard.py's KPI panels)
  * generalized to the SQL surface a warehouse user expects: equal-frequency
  * deciles (NTILE), correlated-subquery filters, bag set operations
  * (EXCEPT / INTERSECT), and equal-width histograms.
  *
  * Scale discipline: nothing here runs a single-task global sort. The
  * exact global NTILE — the one operator that *looks* like it needs one —
  * is computed with the classic distributed-ranking decomposition
  * (range-repartition, per-partition local ranks, a ≤|partitions|-row
  * offset ladder), so every stage is as parallel as the shuffle width.
  */
object StatOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")

  /** Exact decimal cast for `value` (2-dp prices): predicate arithmetic on
    * it is bit-exact and engine-portable, unlike float comparisons.
    */
  // 38,6 not 18,6: the exact-decimal compare must absorb corrupt/extreme
  // doubles (a 1e20 feed glitch overflows DECIMAL(18, 6) and ANSI kills
  // the scan; NaN/Inf cast to NULL and drop out of sum and compare alike)
  private val Dec6 = DecimalType(38, 6)

  // ---------------------------------------------------------------- q85

  /** q85: equal-frequency deciles of event value — exact global
    * `NTILE(10) OVER (ORDER BY value, event_id)` plus per-decile stats.
    *
    * A literal window would be `Window.orderBy(...)` with NO partition
    * key: one task sorts the whole table (Spark even warns). Instead the
    * global rank is assembled from parallel pieces:
    *
    *   1. `repartitionByRange(value, event_id)` — partition p holds keys
    *      strictly below partition p+1 (total order across partitions).
    *   2. per-partition local ranks in parallel (read out of
    *      `monotonically_increasing_id` along the within-partition sort —
    *      no partition-keyed window, so no extra hash exchange).
    *   3. global rank = local rank + offset(pid), where the offset ladder
    *      is a running sum over the ≤|partitions| per-pid counts — a
    *      single-partition window over a HANDFUL of rows, not the data.
    *   4. NTILE's bucket rule from the rank in pure integer arithmetic.
    *
    * Steps 1–3 are [[ScaleOps.withGlobalRowNumber]] (shared with q44/q70/
    * q109/q118/q127); only the bucket rule lives here.
    *
    * Every stage is bounded: the only single-task step touches one row
    * per shuffle partition. This is how a 100 TB global rank/ntile has to
    * run; StatSpec pins it row-for-row to Spark's built-in `ntile`.
    */
  def valueDeciles(s: SparkSession, dir: String): DataFrame =
    decileSummaryOn(ev(s, dir), k = 10)

  /** `df` needs (event_id, value). Emits one row per non-empty tile. */
  def decileSummaryOn(df: DataFrame, k: Int): DataFrame =
    withNtileOn(df.select(col("event_id"), col("value")), k)
      .groupBy(col("tile").as("decile"))
      .agg(count(lit(1)).as("n"),
        min("value").as("min_v"), max("value").as("max_v"),
        dsum(col("value")).as("total_v"))
      .orderBy("decile")

  /** The distributed exact-NTILE kernel: input rows plus a `tile` column
    * (1-based), totally ordered by `(value, event_id)` — exactly the input
    * schema plus `tile`, no internal columns leak. Internals are
    * `__`-prefixed so caller columns can't collide with them (only the
    * output name `tile` is claimed). Exposed for reuse and for StatSpec's
    * equivalence proof against the built-in window.
    */
  def withNtileOn(df: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1, got $k")
    require(!df.columns.contains("tile"),
      "withNtileOn: input already has a 'tile' column")
    // Global rank + grand total from the ONE distributed-ranking kernel
    // (ScaleOps.withGlobalRowNumber): it pins its range exchange (the
    // boundary-divergence precondition both branches need) and reads
    // local ranks out of monotonically_increasing_id, so unlike the old
    // sibling implementation there is no extra `__pid` hash exchange for
    // a partition-keyed window. `totalOut` rides the offset ladder —
    // rank AND n in a single pass over the data.
    val ranked = ScaleOps.withGlobalRowNumber(df,
      Seq(col("value"), col("event_id")), out = "__r", totalOut = Some("__n"))
    // NTILE bucket rule, integer-exact: with n rows and k tiles the first
    // n%k tiles hold n/k+1 rows, the rest n/k. (CASE short-circuits, so
    // the `div __qq` arm never evaluates when __qq = 0, i.e. n < k.)
    ranked
      .withColumn("__qq", expr(s"__n div $k"))
      .withColumn("__rem", expr(s"__n % $k"))
      .withColumn("__cut", expr("__rem * (__qq + 1)"))
      .withColumn("tile", expr(
        """CASE WHEN __r <= __cut THEN (__r + __qq) div (__qq + 1)
          |     ELSE __rem + (__r - __cut + __qq - 1) div __qq END"""
          .stripMargin))
      .drop("__n", "__r", "__qq", "__rem", "__cut")
  }

  // ---------------------------------------------------------------- q86

  /** q86: events strictly above their own type's mean value — the
    * canonical correlated scalar subquery
    * (`WHERE value > (SELECT avg(value) ... WHERE type = e.type)`),
    * decorrelated the way an optimizer does: one tiny per-type aggregate,
    * broadcast back onto the fact table. One scan + one broadcast join;
    * no per-row subquery execution.
    *
    * Determinism: `value > avg` compares a float against an
    * order-dependent float sum. The predicate here is the algebraically
    * equal `value * n > sum` over EXACT decimals — both engines (and any
    * aggregation order) agree on every boundary row.
    */
  def aboveTypeAverage(s: SparkSession, dir: String): DataFrame =
    aboveTypeAverageOn(ev(s, dir))

  /** `df` needs (event_type, value). */
  def aboveTypeAverageOn(df: DataFrame): DataFrame = {
    val stats = df.groupBy("event_type").agg(
      count(lit(1)).cast(DecimalType(12, 0)).as("n_t"),
      sum(col("value").cast(Dec6)).as("tot_t"))
    df.join(broadcast(stats), "event_type")
      .filter(col("value").cast(Dec6) * col("n_t") > col("tot_t"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_above"), dsum(col("value")).as("sum_above"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q87

  /** q87: audience set algebra — of the distinct users who ever viewed,
    * how many never purchased (EXCEPT) vs also purchased (INTERSECT).
    * Both set ops reduce to hash-partitioned distinct + anti/semi joins
    * on user_id: linear, no driver materialization, skew-safe under AQE.
    */
  def viewerSegments(s: SparkSession, dir: String): DataFrame =
    viewerSegmentsOn(ev(s, dir))

  /** `df` needs (user_id, event_type). */
  def viewerSegmentsOn(df: DataFrame): DataFrame = {
    val viewers = df.filter(col("event_type") === "view")
      .select("user_id").distinct()
    val buyers = df.filter(col("event_type") === "purchase")
      .select("user_id").distinct()
    val viewOnly = viewers.except(buyers)
      .agg(count(lit(1)).as("n_users")).select(
        lit("view_only").as("segment"), col("n_users"))
    val both = viewers.intersect(buyers)
      .agg(count(lit(1)).as("n_users")).select(
        lit("view_and_purchase").as("segment"), col("n_users"))
    viewOnly.unionAll(both).orderBy("segment")
  }

  // ---------------------------------------------------------------- q88

  /** q88: equal-width value histogram (25.0-wide bins) — the pairing of
    * q85's equal-frequency cut. Pure map + ≤|bins| group agg; the bin id
    * comes from integer cents (`round(value*100)` floor-divided by 2500),
    * so bucket edges are exact in both engines (float `floor(value/25)`
    * would ride on division rounding). The floor correction matters for
    * SIGN safety: Spark's `div` truncates toward zero while DuckDB's `//`
    * floors, so a bare `div` would put −1 cents in bin 0 (DuckDB: bin −1);
    * the corpus is non-negative today, but a refund/credit column must not
    * silently split the engines.
    */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    valueHistogramOn(ev(s, dir))

  /** `df` needs (value). */
  def valueHistogramOn(df: DataFrame): DataFrame =
    // try_cast: NaN/Inf/±1e20-class values have no well-defined 25-wide
    // bin and must not ANSI-overflow the scan; they collect in a NULL-bin
    // row (visible, not dropped), the oracle twin TRY_CASTs identically
    df.withColumn("cents", expr("try_cast(round(value * 100) AS LONG)"))
      .withColumn("bin", expr(
        "cents div 2500 - (CASE WHEN cents % 2500 < 0 THEN 1 ELSE 0 END)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min("value").as("min_v"), max("value").as("max_v"),
        dsum(col("value")).as("total_v"))
      .withColumn("bin_lo", (col("bin") * 25).cast("double"))
      .select("bin", "bin_lo", "n", "min_v", "max_v", "total_v")
      .orderBy("bin")

  // ---------------------------------------------------------------- q96

  /** q96: robust outlier profile — per type, the median/MAD (median
    * absolute deviation) outlier count. Mean/σ outlier gates (q75's
    * z-score) break down when the outliers themselves inflate σ; the
    * median/MAD pair is the standard robust replacement for quality
    * filtering over skewed pipeline metrics.
    *
    * Two passes by construction (MAD is a median OF deviations from the
    * median — not decomposable into one aggregation): each pass is a
    * per-type exact `percentile` + a tiny broadcast join back. Both
    * engines compare against the ROUNDED (6 dp) median/MAD — exact
    * interpolated percentiles agree across engines only to rounding, so
    * an unrounded threshold could flip boundary rows between engines.
    * At true scale the exact percentile swaps for `percentile_approx`
    * (the q14 note); the two-pass shape is unchanged.
    */
  def robustOutliers(s: SparkSession, dir: String): DataFrame =
    robustOutliersOn(ev(s, dir))

  /** `df` needs (event_type, value). */
  def robustOutliersOn(df: DataFrame): DataFrame = {
    val med = df.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val mad = df.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(round(expr("percentile(abs(value - med), 0.5)"), 6).as("mad"),
        max("med").as("med"))
    df.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("med")) > col("mad") * 3, 1L)
          .otherwise(0L)).as("n_outliers"),
        max("med").as("med"), max("mad").as("mad"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_value_deciles" -> valueDeciles,
    "q86_above_type_average" -> aboveTypeAverage,
    "q87_viewer_segments" -> viewerSegments,
    "q88_value_histogram" -> valueHistogram,
    "q96_robust_outliers" -> robustOutliers)

  val oracle: Map[String, String] = Map(
    "q85_value_deciles" ->
      s"""WITH t AS (SELECT CAST(ntile(10) OVER (ORDER BY value, event_id)
         |    AS BIGINT) AS decile, value FROM events)
         |SELECT decile, count(*) AS n, min(value) AS min_v,
         |  max(value) AS max_v, ${sqlDsum("value")} AS total_v
         |FROM t GROUP BY decile ORDER BY decile""".stripMargin,
    "q86_above_type_average" ->
      s"""WITH s AS (SELECT event_type,
         |    CAST(count(*) AS DECIMAL(12,0)) AS n_t,
         |    sum(CAST(value AS DECIMAL(38,6))) AS tot_t
         |  FROM events GROUP BY event_type)
         |SELECT e.event_type, count(*) AS n_above,
         |  ${sqlDsum("e.value")} AS sum_above
         |FROM events e JOIN s USING (event_type)
         |WHERE CAST(e.value AS DECIMAL(38,6)) * n_t > tot_t
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q87_viewer_segments" ->
      """WITH v AS (SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'purchase')
        |SELECT 'view_only' AS segment, count(*) AS n_users
        |  FROM (SELECT user_id FROM v EXCEPT SELECT user_id FROM p)
        |UNION ALL
        |SELECT 'view_and_purchase' AS segment, count(*) AS n_users
        |  FROM (SELECT user_id FROM v INTERSECT SELECT user_id FROM p)
        |ORDER BY segment""".stripMargin,
    "q88_value_histogram" ->
      s"""WITH b AS (SELECT value,
         |    TRY_CAST(round(value * 100) AS BIGINT) // 2500 AS bin
         |  FROM events)
         |SELECT bin, CAST(bin * 25 AS DOUBLE) AS bin_lo, count(*) AS n,
         |  min(value) AS min_v, max(value) AS max_v,
         |  ${sqlDsum("value")} AS total_v
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q96_robust_outliers" ->
      """WITH med AS (SELECT event_type,
        |    round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (SELECT e.event_type,
        |    round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad,
        |    max(m.med) AS med
        |  FROM events e JOIN med m USING (event_type)
        |  GROUP BY e.event_type)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN abs(e.value - m.med) > m.mad * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  max(m.med) AS med, max(m.mad) AS mad
        |FROM events e JOIN mad m USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)
}
