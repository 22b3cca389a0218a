package graft

import graft.streaming.{AnomalyPipeline, TypedEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming anomaly detector (AnomalyPipeline): MemoryStream in, closed
  * minutes scored against the EWMA baseline, equal to the batch reference
  * fold even when events arrive across micro-batches.
  */
class AnomalySpec extends SparkSpec {

  import spark.implicits._
  import AnomalyPipeline.MinuteUs

  /** Deterministic series: minute i carries 2 + i%3 events, minutes 40–44
    * are silent, minute 80 carries a +50 spike. One trailing event at
    * minute 101 closes minute 100.
    */
  private val counts: Seq[(Long, Long)] = (0L to 100L).map { i =>
    val base = if (i >= 40 && i <= 44) 0L else 2L + i % 3
    i -> (if (i == 80) base + 50L else base)
  }

  private val events: Seq[TypedEvent] = counts.flatMap { case (i, n) =>
    (0L until n).map(j => TypedEvent("click", i * 1000 + j,
      i * MinuteUs + j * 1000L))
  } :+ TypedEvent("click", 999999L, 101L * MinuteUs)

  private val expected = AnomalyPipeline.batchFold("click",
    counts.map { case (i, n) => (i * MinuteUs, n) })

  test("streaming detector equals the batch fold and flags the spike") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    // two micro-batches: state must carry across triggers (split lands
    // mid-silent-gap so the zero-fill also spans a trigger boundary)
    val (first, second) = events.span(_.tsMicros < 42 * MinuteUs)
    val q = AnomalyPipeline.detect(input.toDS())
      .writeStream.format("memory").queryName("anom").start()
    input.addData(first)
    q.processAllAvailable()
    input.addData(second)
    q.processAllAvailable()
    val got = spark.table("anom").as[graft.streaming.ScoredMinute]
      .collect().sortBy(_.minuteMicros)
    q.stop()
    assert(got.toSeq === expected)
    // two true anomalies: the outage onset (minute 40 drops to zero) and
    // the spike (minute 80); the rest of the gap is absorbed as the EWMA
    // variance inflates
    val flagged = got.filter(_.is_anomaly.contains(true))
    assert(flagged.map(_.minuteMicros).toSeq ===
      Seq(40L * MinuteUs, 80L * MinuteUs))
    // silent minutes surfaced as explicit zero rows
    assert(got.filter(m => m.minuteMicros >= 40 * MinuteUs &&
      m.minuteMicros <= 44 * MinuteUs).forall(_.n_events === 0L))
    // warm-up minutes carry no score
    assert(got.take(AnomalyPipeline.Warmup.toInt).forall(_.z.isEmpty))
  }

  test("watermark timeout scores a TOTAL outage: a permanently-silent " +
      "metric keeps closing zero minutes and alarms, event-driven detect " +
      "stays structurally blind") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    // 'svc' is active minutes B+0–B+39 (counts alternate 10/12 so
    // variance is non-zero and a collapse to 0 is a huge |z|), then
    // silent FOREVER. 'other' keeps producing — it alone advances the
    // watermark. (Base offset B keeps event times clear of the initial
    // watermark at epoch 0, which drops rows at/behind it.)
    val B = 1000L
    def ev(t: String, id: Long, minute: Long, j: Long) =
      TypedEvent(t, id, (B + minute) * MinuteUs + j * 1000L)
    val svcCounts = (0L until 40L).map(i => i -> (10L + 2L * (i % 2)))
    val svcEvents = svcCounts.flatMap { case (i, n) =>
      (0L until n).map(j => ev("svc", i * 1000 + j, i, j))
    }
    val input = MemoryStream[TypedEvent]
    val q = AnomalyPipeline.detectWithTimeout(input.toDS(), "2 minutes")
      .writeStream.format("memory").queryName("anom_to")
      .outputMode("append").start()
    input.addData(svcEvents ++ Seq(ev("other", 1L, 41L, 0L)))
    q.processAllAvailable()
    // 'other' advances the watermark to minute 50; the NEXT trigger fires
    // svc's timeout with that watermark
    input.addData(ev("other", 2L, 52L, 0L))
    q.processAllAvailable()
    input.addData(ev("other", 3L, 52L, 1L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("anom_to").as[graft.streaming.ScoredMinute]
      .collect().filter(_.event_type == "svc").sortBy(_.minuteMicros)
    // minutes 0–38 closed by events; 39 (the open bucket) and the silent
    // 40–49 closed by the watermark (wm = 52 − 2 delay → minute 50)
    val expectedSvc = AnomalyPipeline.batchFold("svc",
      (svcCounts ++ (40L until 50L).map(_ -> 0L))
        .map { case (i, n) => ((B + i) * MinuteUs, n) })
    assert(got.toSeq === expectedSvc)
    // the collapse ALARMS at its onset (the rest of the gap is absorbed
    // as the EWMA variance inflates, like the event-driven spec's gap) —
    // and every silent minute actually scored, instead of detect()'s
    // structural silence
    val silent = got.filter(_.n_events == 0L)
    assert(silent.length === 10 && silent.head.is_anomaly.contains(true),
      s"outage onset must alarm: ${silent.toSeq}")
    assert(silent.forall(_.z.isDefined))
  }
}
