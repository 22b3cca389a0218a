package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q62's incremental delta dedup: a document stream is
  * admitted only if it is (a) new versus the EXISTING corpus and (b) the
  * first occurrence within the stream itself — the continuous form of the
  * per-crawl batch gate (`ops.CurationOps.deltaDedupOn`), sharing the same
  * normalizer so "duplicate" agrees across the batch and streaming paths.
  *
  * Scale: the corpus probe is a stream-STATIC left-anti join — stateless on
  * the streaming side (no state store growth; the static side is re-read
  * per micro-batch, so at production scale it is the stored distinct-
  * fingerprint table, partition-pruned / bucketed by the normalized-text
  * hash, not a re-scan of the raw corpus). Within-stream duplicates then
  * collapse via `dropDuplicatesWithinWatermark` on the normalized text, so
  * dedup state evicts with the watermark instead of growing with history.
  */
object DeltaDedupPipeline {

  /** `docStream` needs (doc_id, text, event_ts: timestamp); `corpus` needs
    * a `text` column. Emits the admitted (fresh, first-seen) documents.
    */
  def freshDocs(docStream: DataFrame, corpus: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val corpusNorms = corpus
      .select(graft.ops.DedupOps.normText.as("norm"))
      .distinct()
    docStream
      .withColumn("norm", graft.ops.DedupOps.normText)
      .withWatermark("event_ts", watermarkDelay)
      .join(corpusNorms, Seq("norm"), "left_anti")
      .dropDuplicatesWithinWatermark("norm")
      .drop("norm")
  }
}
