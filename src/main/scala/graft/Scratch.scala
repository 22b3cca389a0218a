package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val name = args.headOption.getOrElse("q37")
    // exact key, else unique prefix (deterministic — ambiguity is an error)
    val matches = SparkEntry.queries.filter { case (k, _) =>
      k == name || k.startsWith(name)
    }.toSeq.sortBy(_._1)
    val df = matches match {
      case Seq((_, fn)) => fn(spark, dir)
      case Seq() => sys.error(s"no query named $name")
      case ms => ms.find(_._1 == name).map(_._2(spark, dir))
        .getOrElse(sys.error(
          s"ambiguous prefix $name: ${ms.map(_._1).mkString(", ")}"))
    }
    if (args.length > 1 && args(1) == "explain") df.explain("formatted")
    else if (args.length > 1 && args(1) == "dump") {
      df.write.mode("overwrite").parquet(s"/tmp/scratch_out/$name.parquet")
      println(s"[info] dumped $name")
    } else {
      time(name)(df.count())
      time(s"$name-again")(df.count())
    }
    spark.stop()
  }
}
