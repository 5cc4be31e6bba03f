package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally run+time)
  * one or more SparkEntry queries. Usage:
  *   Test/runMain graft.tools.Explain q_ngram_jaccard [sfDir] [--time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.filterNot(_.startsWith("--")).filterNot(_.startsWith("/"))
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val time = args.contains("--time")
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      df.explain("formatted")
      if (time) {
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
          println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      }
    }
    spark.stop()
  }
}
