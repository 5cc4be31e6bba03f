package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import graft.text.TextOps

/** Scratch profiler for text-stat components (not API). */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents").cache()
    docs.count()

    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      docs.select(sum(c.cast("double"))).collect()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val txt = col("text")
    time("tokenCount")(TextOps.tokenCount(txt))
    time("bpeTokenCount")(TextOps.bpeTokenCount(txt))
    time("punctRatio")(TextOps.punctRatio(txt))
    time("stopwordRatio")(TextOps.stopwordRatio(txt))
    time("meanWordLen")(TextOps.meanWordLen(txt))
    time("repetitionScore")(TextOps.repetitionScore(txt))
    time("languageId=und")(when(TextOps.languageId(txt) === "und", 1.0).otherwise(0.0))
    spark.stop()
  }
}
