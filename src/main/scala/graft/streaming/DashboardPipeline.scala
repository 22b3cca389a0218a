package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental restatement of the reference dashboard's analytics
  * (dashboard.py:61-303): the reference re-runs every KPI/chart query from
  * scratch on each 2–20 s poll; here the same aggregates are Structured
  * Streaming stateful queries that UPDATE incrementally per micro-batch —
  * the one place the Spark engine is architecturally better, not just
  * faster (SURVEY.md §4.2).
  *
  * Each transform is `DataFrame => DataFrame` over the events schema
  * (event_id, ts, user_id, event_type, value) and works identically on a
  * batch frame or a stream (complete/update output modes); StreamingSpec
  * asserts stream-vs-batch equality on the same data.
  */
object DashboardPipeline {

  private def cnt(p: Column): Column = sum(when(p, 1).otherwise(0))

  /** KPI header (dashboard.py:74-100 / q02): one stateful global aggregate;
    * each micro-batch touches only the partial state, not history.
    */
  def kpiStream(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_events"),
      // decimal-backed sum (Tables.dsum): streaming-state merge order
      // differs from batch shuffle order, and a raw double sum near a
      // .xx5 boundary would round differently — dsum makes the
      // stream ≡ batch equality exact instead of tolerance-papered
      graft.Tables.dsum(col("value")).as("total_value"),
      cnt(col("event_type") === "click").as("n_clicks"),
      cnt(col("event_type") === "error").as("n_errors"),
      approx_count_distinct(col("user_id")).as("approx_users"))

  /** Status/type distribution (dashboard.py:131 / q03). */
  def typeDistributionStream(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(count(lit(1)).as("n"))

  /** Top-k user exposure (dashboard.py:164-165 / q05). Sort+limit applies
    * at sink time in complete mode — state is just the per-user totals.
    */
  def topUsersStream(events: DataFrame, k: Int = 10): DataFrame =
    events.groupBy("user_id")
      .agg(graft.Tables.dsum(col("value")).as("total_value"))
      .orderBy(col("total_value").desc, col("user_id").asc)
      .limit(k)
}
