package graft.streaming

import graft.gen.TradeGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Raw trade-stream sources, all yielding the same wire shape — a `value`
  * column holding the JSON payload — so [[IngestPipeline.parseTrades]] and
  * everything downstream is source-agnostic. Swapping Kafka for the
  * self-contained rate generator (or a drop directory of JSON files) is a
  * one-line config change, exactly the isolation SURVEY.md §7.1 calls for.
  */
object TradeSource {

  /** Kafka source (reference topology: topic `trades`, earliest offsets —
    * consumer.py:12-19). Requires the spark-sql-kafka connector on the
    * classpath and a reachable broker; not exercised in this harness (no
    * broker, no connector jar), kept as the production wiring.
    *
    * `maxOffsetsPerTrigger` is the backpressure knob (SURVEY.md §2.7): the
    * reference producer self-throttles via sleep (producer.py:172-173), but
    * a backlogged topic + `startingOffsets=earliest` would otherwise make
    * the FIRST micro-batch unbounded — the cap spreads catch-up over many
    * bounded batches instead of one giant one.
    */
  def kafka(spark: SparkSession, bootstrapServers: String,
      topic: String = "trades",
      maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(col("value"))

  /** File-drop source: a directory watched for JSON-lines files (each line
    * one trade). The batch twin of a Kafka topic for harness testing.
    * `maxFilesPerTrigger` is the file-source backpressure twin of Kafka's
    * `maxOffsetsPerTrigger` — a pre-loaded drop directory is consumed in
    * bounded micro-batches rather than one unbounded first batch.
    */
  def jsonFiles(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir).select(col("value"))

  /** Self-contained generator source: rate source → seeded 20-field trades
    * (gen.TradeGen) → JSON wire encoding, so the full
    * decode→dedup→sink pipeline runs without any external system.
    */
  def rate(spark: SparkSession, rowsPerSecond: Int = 100,
      seed: Int = 42): DataFrame =
    TradeGen.tradeStream(spark, rowsPerSecond, seed)
      .select(to_json(struct(col("*")),
        IngestPipeline.wireOptions.asJava).as("value"))
}
