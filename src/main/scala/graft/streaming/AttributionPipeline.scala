package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming click→view attribution: the stream-stream twin of the batch
  * temporal joins (`ops.TemporalOps`). Every click is joined, while both
  * streams are still flowing, to the same user's views from the preceding
  * attribution window — Structured Streaming's watermarked interval join,
  * which buffers each side in keyed state and evicts it once the watermark
  * passes the window bound.
  *
  * Semantics: ALL views inside the window are attributed (interval-join
  * semantics, the streaming-feasible contract — unbounded "latest ever"
  * as-of matching needs the batch operator `TemporalOps.asofJoin`).
  * Left-outer: clicks with no view in the window emit with nulls once the
  * watermark proves no match can still arrive.
  *
  * Scale: state is keyed by user (millions of keys — full parallelism) and
  * bounded by `watermarkDelay + windowMinutes` per key; without the interval
  * bound in the join condition Spark would keep BOTH streams' full history
  * in state forever.
  */
object AttributionPipeline {

  /** `clicks` needs (user_id, ts, …); `views` needs (user_id, ts, view_id).
    * Output: every click row joined to (view_id, view_ts) of each view with
    * `click_ts − window ≤ view_ts ≤ click_ts`, nulls when none.
    */
  def attributeClicks(clicks: DataFrame, views: DataFrame,
      windowMinutes: Int = 5,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("view_id"))
      .withWatermark("view_ts", watermarkDelay)
    c.join(v,
        col("user_id") === col("v_user") &&
          col("view_ts") >= col("ts") -
            expr(s"INTERVAL $windowMinutes MINUTES") &&
          col("view_ts") <= col("ts"),
        "leftOuter")
      .drop("v_user")
  }

  /** Batch twin of [[attributeClicks]] — identical join predicate on static
    * frames; the streaming result must converge to exactly this (asserted in
    * StreamingSpec).
    */
  def attributeClicksBatch(clicks: DataFrame, views: DataFrame,
      windowMinutes: Int = 5): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("view_id"))
    clicks.join(v,
        col("user_id") === col("v_user") &&
          col("view_ts") >= col("ts") -
            expr(s"INTERVAL $windowMinutes MINUTES") &&
          col("view_ts") <= col("ts"),
        "leftOuter")
      .drop("v_user")
  }
}
