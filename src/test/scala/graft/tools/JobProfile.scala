package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Local profiling harness (NOT part of the driver contract): run one
  * declared query and print where the wall-clock goes — per-job durations
  * with call sites, stage task-time totals, and the gap between Spark-job
  * time and end-to-end time (driver-side planning/codegen/IO).
  *
  * Usage: sbt 'Test/runMain graft.tools.JobProfile q_pagerank [runs]'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_EXTRA_CONF ("k=v,k=v" session-conf overrides).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: JobProfile <query> [runs]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extraConf = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
      }
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = graft.analytics.GraftSession.configure(
      extraConf.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) })
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)

    // per-job records: (jobId, submitTime, endTime, callSite)
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, Long, String)]()
    val stageTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[
        Int, (Long, String)]()
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = e.stageInfos.headOption.map(si =>
          si.name.take(60) + s" [stages=${e.stageInfos.size}, tasks=" +
            s"${e.stageInfos.map(_.numTasks).sum}]").getOrElse("?")
        starts.put(e.jobId, (e.time, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (t0, cs) = starts.getOrDefault(e.jobId, (e.time, "?"))
        jobs.put(e.jobId, (t0, e.time, cs))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageTaskMs.addAndGet(e.stageInfo.taskMetrics match {
          case null => 0L
          case m => m.executorRunTime
        })
    }

    // warmup at sf0.001 (the bench protocol)
    val warmDir = new java.io.File(
      new java.io.File(sfDir).getParentFile, "sf0.001")
    try fn(spark, warmDir.getPath).count() catch { case e: Throwable =>
      System.err.println(s"warmup failed: $e") }

    (1 to runs).foreach { r =>
      jobs.clear(); stageTaskMs.set(0)
      spark.sparkContext.addSparkListener(listener)
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val recs = jobs.asScala.toSeq.sortBy(_._1)
      val jobMs = recs.map { case (_, (a, b, _)) => b - a }.sum
      println(f"== $name run $r: wall ${wallMs}%.0f ms, " +
        f"${recs.size} jobs totaling $jobMs ms (gap ${wallMs - jobMs}%.0f ms" +
        f" driver-side), task-time ${stageTaskMs.get()} ms")
      val byCs = recs.groupBy(_._2._3).map { case (cs, rs) =>
        (cs, rs.size, rs.map { case (_, (a, b, _)) => b - a }.sum)
      }.toSeq.sortBy(-_._3)
      byCs.take(20).foreach { case (cs, n, ms) =>
        println(f"   $ms%6d ms  n=$n%-3d $cs")
      }
    }
    spark.stop()
  }
}
