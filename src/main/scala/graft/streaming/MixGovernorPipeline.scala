package graft.streaming

import graft.ops.{CurationOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming data-mix governor — the per-ingest face of q115 (temperature
  * flattening) and q131 (DoReMi loss-aware reweighting) over the persisted
  * stores: each crawl micro-batch folds its (source, token, count)
  * contraction into the token store, scores itself against the FROZEN
  * reference bigram LM (`SearchOps.writeBigramStore`, seeded before the
  * stream starts — DoReMi's reference model is fixed by construction;
  * the proxy weights are what update), appends its ≤|sources| DoReMi
  * partial rows, and republishes BOTH mix tables from stores alone —
  * zero corpus re-reads, cost per batch ∝ batch. This is the live
  * sampling-weight feed a data-mix owner points the trainer at while a
  * crawl is still running, instead of a post-hoc batch sweep.
  *
  * Scale shape: per micro-batch, one batch-sized token contraction and
  * one batch-sized LM-score join (the identical work the batch faces
  * pay), then report reads bounded by |sources|·|vocab| (token store) and
  * |sources|·|batches| (partials — compact by re-aggregating through
  * [[CurationOps.doremiFromPartials]] if a crawl runs to millions of
  * batches). Nothing downstream of a batch is ever corpus-sized.
  *
  * Idempotence: all three sinks key on the micro-batch id and overwrite
  * on replay (IngestPipeline's convention) — a crashed-and-replayed batch
  * replaces its token segment, its partial row, and its report, never
  * double-counts (StreamingSpec pins replay convergence and the
  * stream ≡ batch equalities).
  */
object MixGovernorPipeline {

  /** Start the governor over a (doc_id, source, text) document stream.
    *
    * @param lmStoreDir    pre-seeded frozen bigram store (the reference
    *                      LM); absent ⇒ batches contribute zero partial
    *                      rows (model-less) and the report's DoReMi
    *                      columns stay null until the store is seeded —
    *                      token segments still land, so nothing is lost
    * @param tokenStoreDir batch-id-keyed token-count store segments
    * @param partialsDir   per-batch DoReMi partial rows
    *                      (`batch_id=N/(source, n_docs, n_bigrams, sum_lp)`)
    * @param reportDir     per-batch cumulative mix report
    */
  def runMixGovernor(docStream: DataFrame, lmStoreDir: String,
      tokenStoreDir: String, partialsDir: String, reportDir: String,
      checkpointDir: String, alpha: Double = 0.3,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          TextOps.writeTokenCountBatch(batch, tokenStoreDir, batchId)
          // an absent reference LM must not kill the stream (the media
          // triage absent-store convention): the batch's docs are all
          // model-less — zero partial rows, DoReMi columns stay null in
          // the report until the store is seeded. The batch's TOKEN
          // segment above still lands, so seeding later loses nothing.
          val partials = BatchDirs.readIfExists(s, lmStoreDir) match {
            case Some(_) => CurationOps.doremiBatchPartials(batch, lmStoreDir)
            case None => CurationOps.emptyDoremiPartials(s)
          }
          partials
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$partialsDir/batch_id=$batchId")
          mixReport(s, tokenStoreDir, partialsDir, alpha)
            .withColumn("batch_id", lit(batchId))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$reportDir/batch_id=$batchId")
        }
      }
      .start()

  /** The cumulative mix table from the stores alone: q115's temperature
    * columns for every source seen so far, left-joined with q131's DoReMi
    * columns (null for a source with only < 2-token / fully-OOV docs —
    * no LM evidence to weight it by, [[CurationOps.doremiFromStore]]'s
    * drop contract surfaced as nulls instead of dropped rows, so the
    * governor's size-based columns still cover every source).
    */
  def mixReport(s: SparkSession, tokenStoreDir: String,
      partialsDir: String, alpha: Double = 0.3): DataFrame = {
    if (BatchDirs.readIfExists(s, tokenStoreDir).isEmpty)
      return mixReportEmpty(s) // nothing ingested yet — not a read error
    val temp = CurationOps.temperatureMixFromStore(s, tokenStoreDir, alpha)
    val doremi = BatchDirs.readIfExists(s, partialsDir) match {
      case Some(p) => CurationOps.doremiFromPartials(p.drop("batch_id"))
      case None =>
        CurationOps.doremiFromPartials(CurationOps.emptyDoremiPartials(s))
    }
    temp.join(
      doremi.select(col("source"), col("n_docs"), col("nll"),
        col("excess"), col("doremi_weight")),
      Seq("source"), "left")
      .orderBy("source")
  }

  /** The governor's current answer: the report of the highest completed
    * batch id (cumulative over everything ingested so far).
    */
  def latestReport(s: SparkSession, reportDir: String): DataFrame =
    BatchDirs.readIfExists(s, reportDir) match {
      case None =>
        mixReportEmpty(s)
      case Some(rep) =>
        val last = rep.agg(max("batch_id")).head.get(0)
        rep.filter(col("batch_id") === last).drop("batch_id")
          .orderBy("source")
    }

  private def mixReportEmpty(s: SparkSession): DataFrame = {
    val temp = CurationOps.temperatureMixOn(BatchDirs.emptyDocs(s))
    temp.join(
      CurationOps.doremiFromPartials(CurationOps.emptyDoremiPartials(s))
        .select(col("source"), col("n_docs"), col("nll"), col("excess"),
          col("doremi_weight")),
      Seq("source"), "left")
  }
}
