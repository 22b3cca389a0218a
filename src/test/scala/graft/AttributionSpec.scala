package graft

import graft.streaming.AttributionPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Click/view rows for the attribution streams (top-level for encoders). */
case class Click(user_id: Long, ts: java.sql.Timestamp, click_id: Long)
case class View(user_id: Long, ts: java.sql.Timestamp, view_id: Long)

/** Stream-stream attribution join (AttributionPipeline): window semantics,
  * outer-null emission on watermark, and convergence to the batch twin.
  */
class AttributionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // base time plus a far-future flush event: finite streams only advance the
  // watermark to (max event time − delay), so without the flush the
  // left-outer nulls near the end of input would never emit
  private val clicks = Seq(
    Click(1L, ts("2024-01-01 10:05:00"), 100L), // 2 views in window
    Click(1L, ts("2024-01-01 10:20:00"), 101L), // none: last view 14 min old
    Click(2L, ts("2024-01-01 10:05:00"), 102L), // none: view is later
    Click(3L, ts("2024-01-01 10:05:00"), 103L), // no views for user at all
    Click(9L, ts("2024-01-01 12:00:00"), 104L)) // watermark flush (click side)
  private val views = Seq(
    View(1L, ts("2024-01-01 10:01:00"), 200L),
    View(1L, ts("2024-01-01 10:05:00"), 201L), // boundary: == click ts
    View(1L, ts("2024-01-01 10:00:00"), 202L), // exactly window start
    View(2L, ts("2024-01-01 10:06:00"), 203L), // after user-2's click
    View(9L, ts("2024-01-01 12:00:00"), 999L)) // watermark flush (view side)

  test("streaming attribution matches the batch twin exactly") {
    implicit val sqlCtx = spark.sqlContext
    val cs = MemoryStream[Click]
    val vs = MemoryStream[View]
    cs.addData(clicks)
    vs.addData(views)
    val q = AttributionPipeline
      .attributeClicks(cs.toDF(), vs.toDF())
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attr")
      .select("click_id", "view_id").orderBy("click_id", "view_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    val want = AttributionPipeline
      .attributeClicksBatch(clicks.toDF(), views.toDF())
      .select("click_id", "view_id").orderBy("click_id", "view_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq === want.toSeq)
    // shape: click 100 gets all three in-window views (interval semantics);
    // clicks 101-103 emit exactly one null row each (101's only candidate
    // is 14 min stale, 102's view is later, 103's user has no views)
    assert(got.count(_._1 == 100L) === 3)
    assert(got.filter(c => c._1 >= 101L && c._1 <= 103L).map(_._2).toSeq
      === Seq(None, None, None))
  }

  test("attribution join carries the interval bound into the join condition") {
    // the interval predicate must reach the stream-stream join operator —
    // it is what lets Spark evict per-key state at the watermark; a plain
    // equi-join keeps both full streams in state forever
    implicit val sqlCtx = spark.sqlContext
    val cs = MemoryStream[Click]
    val vs = MemoryStream[View]
    val plan = AttributionPipeline.attributeClicks(cs.toDF(), vs.toDF())
      .queryExecution.analyzed.toString
    assert(plan.contains("view_ts"), plan)
    assert(plan.toLowerCase.contains("watermark"), plan)
  }

  test("out-of-order arrival within the watermark still attributes") {
    implicit val sqlCtx = spark.sqlContext
    val cs = MemoryStream[Click]
    val vs = MemoryStream[View]
    // click arrives in batch 1; its view arrives later (batch 2) but with an
    // EARLIER event time, inside the watermark delay → must still join
    cs.addData(Seq(Click(5L, ts("2024-01-01 10:05:00"), 500L)))
    val q = AttributionPipeline
      .attributeClicks(cs.toDF(), vs.toDF())
      .writeStream.format("memory").queryName("attr_ooo")
      .outputMode("append").start()
    q.processAllAvailable()
    vs.addData(Seq(View(5L, ts("2024-01-01 10:03:00"), 501L)))
    q.processAllAvailable()
    // flush both watermarks past the click so the join result finalizes
    cs.addData(Seq(Click(9L, ts("2024-01-01 12:00:00"), 900L)))
    vs.addData(Seq(View(9L, ts("2024-01-01 12:00:00"), 901L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_ooo")
      .filter(col("click_id") === 500L)
      .select("view_id").collect().map(_.get(0))
    assert(got.toSeq === Seq(501L))
  }
}
