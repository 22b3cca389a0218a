package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming restatement of the reference's ingestion pipeline
  * (SURVEY.md §2.1 S3–S5, §2.7):
  *
  *   Kafka JSON topic → consumer → idempotent keyed insert (Postgres PK)
  *
  * becomes
  *
  *   readStream → from_json(tradeSchema) → poison-record skip →
  *   watermarked keyed dedup → foreachBatch idempotent parquet sink.
  *
  * Transforms are `DataFrame => DataFrame` so identical logic runs over a
  * MemoryStream in tests, a file source, or a Kafka source in production
  * (the source is a config swap — no Kafka broker exists in this harness).
  * End-to-end guarantee matches the reference: at-least-once delivery +
  * keyed dedup = exactly-once table state (consumer.py:78).
  */
object IngestPipeline {

  /** The 20-field trade schema of record (consumer.py:37-58 DDL;
    * SURVEY.md §1.2). Declared, never inferred — from_json requires it.
    */
  val tradeSchema: StructType = StructType(Seq(
    StructField("trade_id", StringType),
    StructField("asset_class", StringType),
    StructField("instrument", StringType),
    StructField("side", StringType),
    StructField("quantity", DoubleType),
    StructField("price", DoubleType),
    StructField("notional_value", DoubleType),
    StructField("counterparty", StringType),
    StructField("status", StringType),
    StructField("settlement_venue", StringType),
    StructField("trade_date", DateType),
    StructField("settlement_date", DateType),
    StructField("brokerage_fee", DoubleType),
    StructField("clearing_fee", DoubleType),
    StructField("exchange_fee", DoubleType),
    StructField("total_fees", DoubleType),
    StructField("priority", StringType),
    StructField("stp_eligible", BooleanType),
    StructField("timestamp", TimestampType),
    StructField("processed_by", StringType)))

  /** WRITE-side wire timestamp format: Python `datetime.isoformat()` carries
    * microseconds and no zone (producer.py:126); Spark's default `to_json`
    * output is millisecond-only and would silently truncate. The READ side
    * deliberately uses no format — the default parser accepts any
    * fractional precision losslessly, including isoformat()'s bare
    * `HH:mm:ss` when microsecond == 0 (a pinned `.SSSSSS` read format
    * would null those ~1-in-1e6 records).
    */
  val wireOptions: Map[String, String] =
    Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** Wire-format decode: JSON string payload → 20 typed columns.
    * PERMISSIVE parse + key-null filter reproduces the reference's
    * per-message poison-pill skip (consumer.py:116-118) without killing the
    * stream.
    */
  def parseTrades(raw: DataFrame, payload: Column = col("value")): DataFrame =
    raw.select(from_json(payload.cast("string"), tradeSchema).as("t"))
      .select(col("t.*"))
      .filter(col("trade_id").isNotNull)

  /** Keyed dedup with bounded state: watermark + dropDuplicatesWithinWatermark
    * keeps exactly-once table semantics while letting the state store evict
    * keys older than the horizon (the reference's Postgres PK holds state
    * forever — unbounded; `boundedState = false` reproduces that exactly).
    */
  def dedupTrades(parsed: DataFrame, watermark: String = "10 minutes",
      boundedState: Boolean = true): DataFrame = {
    val withWm = parsed.withWatermark("timestamp", watermark)
    if (boundedState) withWm.dropDuplicatesWithinWatermark("trade_id")
    else withWm.dropDuplicates("trade_id")
  }

  /** Tumbling 1-minute aggregation (dashboard.py:236-243 as a stream):
    * per-window trade count + notional sum, update-incrementally instead of
    * the reference's full recompute per poll.
    */
  def minuteAggs(trades: DataFrame): DataFrame =
    trades
      .groupBy(window(col("timestamp"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n_trades"),
        sum(col("notional_value")).as("total_notional"))
      .select(col("w.start").as("minute"), col("n_trades"), col("total_notional"))

  /** End-to-end ingest job: parse → dedup → idempotent parquet sink,
    * partitioned by trade_date (partition pruning for the analytics side),
    * 5-second micro-batches (the reference's default poll interval).
    */
  def runIngest(spark: SparkSession, raw: DataFrame, sinkDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    dedupTrades(parseTrades(raw))
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Idempotence on micro-batch replay: a failure between a plain
        // append and the offset commit would re-run the batch and duplicate
        // every row (append writes fresh part files each attempt). Keying
        // the output directory on batchId and OVERWRITING it makes a
        // replayed batch rewrite the same location instead — replays
        // converge to exactly-once table state, matching the reference's
        // PK-upsert guarantee. Readers load the sink root; trade_date stays
        // a partition column inside each batch directory for pruning.
        // Empty micro-batches (trailing AvailableNow ticks, idle triggers)
        // are skipped: writing one would clobber a same-numbered batch
        // directory from an earlier pipeline incarnation with nothing.
        // persist() so the emptiness probe and the write share one
        // evaluation of the parse/dedup plan instead of running it twice.
        val deduped = batch.dropDuplicates("trade_id").persist()
        try {
          if (!deduped.isEmpty) {
            deduped.write.mode("overwrite")
              .partitionBy("trade_date")
              .parquet(s"$sinkDir/batch_id=$batchId")
          }
        } finally { deduped.unpersist(); () }
      }
      .start()
}
