package graft.tools

import org.apache.spark.sql.SparkSession

object ProfileCorr {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.analytics.Tables(spark, "/root/testdata/sf0.1", "lineitem")
    val q = graft.analytics.Profiler.correlationMatrix(li,
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    q.collect() // warm
    val t0 = System.nanoTime()
    q.collect()
    println(s"[corr] ${(System.nanoTime() - t0) / 1e9}s")
    val plan = q.queryExecution.executedPlan.toString
    println("[corr] codegen spans: " +
      "WholeStageCodegen".r.findAllIn(plan).length)
    println(plan.linesIterator.take(12).mkString("\n"))
  }
}
