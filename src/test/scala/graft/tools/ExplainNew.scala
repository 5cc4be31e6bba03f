package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .explain("formatted")
    }
    spark.stop()
  }
}
