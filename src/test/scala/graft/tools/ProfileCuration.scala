package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Curation

/** Stage-attribution profile for the composed curation pipeline. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.analytics.Tables(spark, sfDir, "documents")

    def time[T](label: String)(body: => T): T = {
      body // warm
      val t0 = System.nanoTime()
      val r = body
      println(f"[cur] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // cumulative prefixes of the pipeline (each is a fresh plan; the
    // checkpoint inside stages() makes "whole pipeline" the real query)
    val st = Curation.stages(docs, "doc_id", "text", Some("lang"),
      Curation.Config())
    st.foreach { case (name, frame) =>
      time(s"through $name")(frame.count())
    }
    time("declared q_curation (full, again)") {
      Curation.curateFrame(docs, "doc_id", "text", Some("lang")).count()
    }
    spark.stop()
  }
}
