package graft

import org.apache.spark.sql.functions._

/** Pins the round-10 fix for the r09 ADVICE staleness hazard: the
  * duplicate-multiplicity dispatch memo (`SimilarityOps.dupMultForDir`)
  * used to key on the raw directory STRING, so a directory regenerated
  * within one JVM (ScaleUp reruns, Scratch corpus rewrites) served a stale
  * multiplicity — and in the gated regime the two dispatch arms are not
  * output-equal, so stale dispatch could change q64/q132 results. The memo
  * now keys on (canonical path, part-file signature): a rewrite changes
  * the signature, so the next probe re-runs without anyone calling the
  * invalidation hook.
  */
class DupMultCacheSpec extends SparkSpec {

  import spark.implicits._

  private def writeEmb(dir: String, copies: Int): Unit = {
    val base = (0 until 4).map(i =>
      (i.toLong, Seq.fill(8)(i.toFloat + 1f), i % 2))
    val rows = (0 until copies).flatMap(c =>
      base.map { case (id, e, l) => (id + 10L * c, e, l) })
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
  }

  test("a rewritten embeddings dir re-probes multiplicity (no stale memo)") {
    val dir = tmpDir("graft-dupmult")
    writeEmb(dir, copies = 1)
    assert(ops.SimilarityOps.dupMultForDir(spark, dir) === 1L)
    // rewrite IN PLACE with every (label, embedding) group duplicated 300×
    // — past the 256 dispatch gate; a raw-string-keyed memo would still
    // answer 1 and keep q64/q132 on the direct arm
    writeEmb(dir, copies = 300)
    assert(ops.SimilarityOps.dupMultForDir(spark, dir) === 300L)
    // relative-path aliasing must not resurrect the stale entry either:
    // the key is the canonical path + signature, so both spellings agree
    val aliased = dir + "/./"
    assert(ops.SimilarityOps.dupMultForDir(spark, aliased) === 300L)
  }
}
