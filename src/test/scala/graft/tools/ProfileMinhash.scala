package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import graft.dedup.DedupOps

/** Scratch profiler for the minhash LSH stages (not part of the API). */
object ProfileMinhash {
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

    time("docs count")(docs.count())
    val withSig = docs.select(col("doc_id").as("id"), col("text").as("_text"),
      DedupOps.minhashSignature(col("text"), 3, 64).as("sig"))
    time("signatures")(withSig.count())
    val banded = withSig.select(col("id"), col("_text"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * 4 + 1, lit(4)))))
        .as(Seq("band", "band_hash")))
    time("banded")(banded.count())
    val l = banded.select(col("id").as("id_a"), col("_text").as("text_a"),
      col("band"), col("band_hash"))
    val r = banded.select(col("id").as("id_b"), col("_text").as("text_b"),
      col("band"), col("band_hash"))
    val joined = l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
    println(s"[profile] joined rows: ${time("join")(joined.count())}")
    val cand = joined.select("id_a", "text_a", "id_b", "text_b").distinct()
    println(s"[profile] candidates: ${time("distinct")(cand.count())}")
    val full = time("full minhashLsh")(
      DedupOps.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    println(s"[profile] pairs: $full")
    spark.stop()
  }
}
