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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The accumulated frame, or None when no batch directory exists yet —
    * INCLUDING a directory that exists but holds no readable parquet
    * (only an in-flight or crashed write's `_temporary`): a crash during
    * the very first segment write would otherwise wedge every replay and
    * poller on "Unable to infer schema" until someone hand-deletes the
    * dir, and a poller racing the first write would crash instead of
    * reading "nothing committed yet". Only the two error conditions that
    * MEAN "nothing committed" map to None — no schema to infer (no
    * parquet footer present) and path vanished between the existence
    * check and the read (a staged swap's rename window); any other
    * analysis failure on a real store (and all IO errors) still
    * propagates, so a damaged store reads as damaged, not as
    * not-yet-seeded. The None cases log a warning: a store that maps to
    * None on every poll is visible in the logs, not silent.
    */
  def readIfExists(s: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      try Some(s.read.parquet(dir))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("UNABLE_TO_INFER_SCHEMA") ||
                c.startsWith("PATH_NOT_FOUND")) =>
          log.warn(s"readIfExists: $dir exists but holds no readable " +
            s"parquet (${e.getCondition}) — treating as nothing " +
            "committed yet")
          None
      }
    else None
  }

  /** The slice of a batch-id-keyed report dir belonging to the highest
    * committed batch id (partition discovery may type `batch_id` int or
    * long — the filter is agnostic), with `batch_id` dropped; None when
    * nothing has committed. The shared read of every pipeline's
    * `latestReport`.
    */
  def latestBatchSlice(s: SparkSession, dir: String): Option[DataFrame] =
    readIfExists(s, dir).map { rep =>
      val last = rep.agg(org.apache.spark.sql.functions.max("batch_id"))
        .head.get(0)
      rep.filter(org.apache.spark.sql.functions.col("batch_id") === last)
        .drop("batch_id")
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
