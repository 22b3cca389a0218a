package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad for plan inspection (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    args.headOption.getOrElse("q37") match {
      case "q37" =>
        val df = ops.DedupOps.jaccardPairs(spark, dir)
        df.explain("formatted")
        time("q37")(df.count())
        time("q37-again")(df.count())
      case "q42" =>
        val df = ops.SimilarityOps.annLsh(spark, dir)
        df.explain("formatted")
        time("q42")(df.count())
        time("q42-again")(df.count())
    }
    spark.stop()
  }
}
