package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared reader for the batch-id-keyed sink/store directories the
  * streaming pipelines accrete (`<dir>/batch_id=N`): before the first
  * micro-batch commits — a just-started stream, or one whose batches were
  * all empty (the `!batch.isEmpty` guards skip the write) — the directory
  * does not exist yet, and a dashboard polling a report rollup must get
  * the empty report, not an AnalysisException from `read.parquet` on a
  * missing path.
  */
private[streaming] object BatchDirs {

  /** The accumulated frame, or None when no batch directory exists yet. */
  def readIfExists(s: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) Some(s.read.parquet(dir))
    else None
  }

  /** An empty (source, text) document frame — feeding it through a batch
    * report operator yields the zero-row report WITH the operator's own
    * schema, so "no batches yet" and "batches so far" answers are
    * shape-compatible.
    */
  def emptyDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(String, String)].toDF("source", "text")
  }
}
