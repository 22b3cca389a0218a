package graft.streaming

import graft.SparkSpec

/** Pins [[BatchDirs.readIfExists]]'s three-way contract: absent/empty and
  * footer-less (in-flight `_temporary` only) dirs read as "nothing
  * committed yet" (None), a committed store reads, and a DAMAGED store —
  * readable dir, unreadable data file — propagates its error instead of
  * masquerading as not-yet-seeded (the r08 ADVICE item: a blanket
  * AnalysisException→None let a poller report a broken LM as unseeded
  * forever with no signal).
  */
class BatchDirsSpec extends SparkSpec {

  test("absent and empty dirs read as None") {
    assert(BatchDirs.readIfExists(spark, "/tmp/graft-no-such-dir-xyz").isEmpty)
    assert(BatchDirs.readIfExists(spark, tmpDir("bd-empty")).isEmpty)
  }

  test("a dir holding only an in-flight _temporary reads as None " +
    "(pins the UNABLE_TO_INFER_SCHEMA condition the narrowed catch keys on)") {
    val d = tmpDir("bd-tmp-only")
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(d, "_temporary"))
    // this is the exact exception the narrowed catch must keep mapping to
    // None — if a Spark upgrade renames the error condition, this test
    // fails loudly instead of every poller crashing at runtime
    assert(BatchDirs.readIfExists(spark, d).isEmpty)
  }

  test("a committed store reads back") {
    val d = tmpDir("bd-real")
    import spark.implicits._
    Seq(("a", 1L)).toDF("k", "v").write.mode("overwrite").parquet(d)
    val got = BatchDirs.readIfExists(spark, d)
    assert(got.nonEmpty && got.get.count() == 1)
  }

  test("a damaged store propagates its error, not None") {
    val d = tmpDir("bd-damaged")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "part-00000.snappy.parquet"),
      "this is not parquet".getBytes)
    val thrown = intercept[Throwable] {
      // trigger both analysis (footer read for schema inference) and, if
      // that somehow passes, execution
      BatchDirs.readIfExists(spark, d).foreach(_.count())
    }
    assert(thrown != null)
  }
}
