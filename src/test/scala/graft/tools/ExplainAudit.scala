package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: dump `explain("formatted")` for every SparkEntry query and
  * flag the physical properties each plan is expected to have (pushdown,
  * broadcast, window-group-limit, codegen coverage). Run per round; the
  * assertions live in PlanSpec. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val props = Seq(
        "WindowGroupLimit" -> plan.contains("WindowGroupLimit"),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "SortMergeJoin" -> plan.contains("SortMergeJoin"),
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "WholeStageCodegen" -> plan.contains("WholeStageCodegen"),
        "TakeOrderedAndProject" -> plan.contains("TakeOrderedAndProject"),
        "NestedLoop" -> plan.contains("NestedLoop"),
        "CartesianProduct" -> plan.contains("CartesianProduct"))
        .filter(_._2).map(_._1).mkString(", ")
      println(s"==== $name [$props]")
      if (args.length > 1 && args(1) == "-v") println(plan)
    }
    spark.stop()
  }
}
