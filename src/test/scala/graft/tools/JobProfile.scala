package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object JobProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var t0 = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { s =>
          Console.err.println(f"[job +${(s - t0) / 1e9}%.1fs] id=${je.jobId} took ${(System.nanoTime() - s) / 1e9}%.3f")
        }
      }
    })
    graft.SparkEntry.queries("q_gold_incr")(spark, "/root/testdata/sf0.001").count()
    Console.err.println("=== MEASURED RUN START ===")
    t0 = System.nanoTime()
    graft.SparkEntry.queries("q_gold_incr")(spark, "/root/testdata/sf0.01").count()
    Console.err.println(f"=== WALL ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
  }
}
