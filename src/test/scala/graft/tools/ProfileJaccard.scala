package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import graft.dedup.DedupOps

/** Scratch profiler for the string-shingle jaccard join (not API). */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = docs.select(col("doc_id").as("id"),
      DedupOps.shingles(col("text"), 3).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val inv = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("shingle"))
    println(s"[profile] postings: ${time("explode shingles")(inv.count())}")
    val a = inv.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
    val b = inv.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("shingle"))
    val j = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
    println(s"[profile] joined: ${time("self join")(j.count())}")
    val g = j.groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
    println(s"[profile] groups: ${time("groupBy")(g.count())}")
    println(s"[profile] full: ${time("full jaccardPairs")(
      DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5, Int.MaxValue).count())}")
    spark.stop()
  }
}
