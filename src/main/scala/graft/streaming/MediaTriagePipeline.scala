package graft.streaming

import graft.ops.MultimodalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming media dedup: each micro-batch of (doc_id, text)-payload
  * documents is fingerprinted ONCE (`MultimodalOps.mediaPhashOn`),
  * screened against the PERSISTED phash index
  * (`phashHashedPairsAgainstStore` — Hamming-banded, never a corpus
  * cross product), collapsed to one representative per within-batch
  * fingerprint, and routed keep → sink / duplicate → quarantine; the
  * fresh fingerprints then extend the index so the NEXT batch screens
  * against them — the streaming face of the CrawlSpec media loop.
  *
  * Replay idempotence: every sink (keeps, quarantine, and the store
  * segment itself) is batch-id-keyed and overwritten, the
  * DriftMonitorPipeline store convention — a replayed micro-batch
  * rewrites its own segment instead of double-appending fingerprints.
  *
  * Scale: hashing is the map-only batched kernel; the screen joins
  * 8-byte fingerprint rows only; no stream-side state store exists at
  * all (the phash store IS the state, bounded at 8 bytes per admitted
  * payload and shared with every batch consumer).
  */
object MediaTriagePipeline {

  /** Seed the batch-id-keyed store layout from an already-ingested
    * corpus (segment -1, so partition discovery sees one uniform
    * layout).
    */
  def seedStore(corpus: DataFrame, storeDir: String): Unit =
    MultimodalOps.mediaPhashOn(corpus)
      .write.mode("overwrite").parquet(s"$storeDir/batch_id=-1")

  /** Run the ingest: keeps land under `sinkDir/batch_id=N`, duplicates
    * (against the index, or near-duplicate of a lower-id batchmate)
    * under `quarantineDir/batch_id=N`, and the batch's fresh
    * fingerprints under `storeDir/batch_id=N`.
    */
  def runMediaIngest(docStream: DataFrame, storeDir: String,
      sinkDir: String, quarantineDir: String, checkpointDir: String,
      maxHamming: Int = 3,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        if (!batch.isEmpty) {
          import graft.ops.HammingBands
          // hash once; the same frame feeds both screens and the store
          // append (empty payloads hash to nothing and pass through
          // untouched as keeps)
          val hashed = MultimodalOps.mediaPhashOn(batch)
            .localCheckpoint(eager = true)
          // REPLAY SAFETY: a crashed attempt may have committed this
          // batch's own store segment already — screening against it
          // would self-match every previously-admitted doc and silently
          // quarantine it on retry, so the batch's own segment is
          // excluded from the index view
          val index = s.read.parquet(storeDir)
            .filter(col("batch_id") =!= batchId)
            .select("doc_id", "phash")
          val storeDups = MultimodalOps
            .phashHashedPairsAgainstStore(hashed, s, storeDir,
              index = Some(index), maxHamming = maxHamming)
            .select("doc_id")
          // within-batch collapse at the SAME Hamming threshold as the
          // store screen (exact-only grouping would admit co-batched
          // near-dups that consecutive batches reject): survivors are
          // docs with no lower-id near-dup batchmate
          val chunked = HammingBands.chunked(hashed, "doc_id", "phash")
          val batchDups = HammingBands.pairs(chunked, chunked, "phash",
              maxHamming, col("x.doc_id") < col("y.doc_id"))
            .select(col("y.doc_id").as("doc_id"))
          // one materialization feeds all three routing writes (and
          // breaks the read-storeDir-then-overwrite-a-segment cycle)
          val dupIds = storeDups.unionByName(batchDups).distinct()
            .localCheckpoint(eager = true)
          batch.join(dupIds, Seq("doc_id"), "left_semi")
            .write.mode("overwrite")
            .parquet(s"$quarantineDir/batch_id=$batchId")
          batch.join(dupIds, Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
          hashed.join(dupIds, Seq("doc_id"), "left_anti")
            .select("doc_id", "phash")
            .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
        }
        ()
      }
      .start()

  /** Per-batch triage report off the accumulated routing dirs: documents
    * seen / kept / quarantined and the realized duplicate rate — the
    * monitor a media-ingest operator watches for a crawl source gone
    * stale (dup_rate → 1) or a broken screen (dup_rate → 0 on a known
    * dup-heavy source). A side with no committed batch reads as empty,
    * not as an error (the gateReport convention).
    */
  def triageReport(s: org.apache.spark.sql.SparkSession, sinkDir: String,
      quarantineDir: String): DataFrame = {
    def side(dir: String, name: String) =
      BatchDirs.readIfExists(s, dir)
        .map(_.groupBy(col("batch_id").cast("long").as("batch_id"))
          .agg(count(lit(1)).as(name)))
        .getOrElse(s.range(0)
          .select(col("id").as("batch_id"), col("id").as(name)))
    side(sinkDir, "n_kept")
      .join(side(quarantineDir, "n_quarantined"), Seq("batch_id"),
        "full_outer")
      .na.fill(0L, Seq("n_kept", "n_quarantined"))
      .withColumn("n_docs", col("n_kept") + col("n_quarantined"))
      .withColumn("dup_rate", round(col("n_quarantined") / col("n_docs"), 6))
      .select("batch_id", "n_docs", "n_kept", "n_quarantined", "dup_rate")
      .orderBy("batch_id")
  }
}
