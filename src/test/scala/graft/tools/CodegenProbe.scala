package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run every SparkEntry query with codegen forced (no interpreted
  * fallback) so any expression whose doGenCode emits uncompilable Java fails
  * loudly with its query name, instead of silently degrading to the
  * interpreted path at bench time. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, sfDir).count(); println(s"OK   $name") }
      catch { case e: Throwable =>
        bad += 1
        val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .toSeq.last
        println(s"FAIL $name: ${root.getClass.getSimpleName}: " +
          String.valueOf(root.getMessage).take(300))
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
