package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import graft.dedup.DedupOps
import graft.functions.HashExpressions

/** Stage attribution for the PPJoin-style exact jaccard query (not API). */
object ProfileJaccard2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1"), "documents")

    def time[T](label: String)(f: => T): T = {
      f // warm
      val t0 = System.nanoTime()
      val r = f
      println(f"[pj] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val threshold = 0.5
    time("shingleHashes projection only") {
      docs.select(col("doc_id").as("id"),
        DedupOps.shingleHashes(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).collect()(0)
    }
    val sh = docs.select(col("doc_id").as("id"),
      DedupOps.shingleHashes(col("text"), 3).as("sh"))
      .localCheckpoint(false)
      .withColumn("n_sh", size(col("sh")))
    val prefixLen = (size(col("sh"))
      - ceil(lit(threshold) * size(col("sh"))).cast("int") + 1)
    val inv = sh.select(col("id"),
      explode(slice(col("sh"), lit(1), prefixLen)).as("shingle"))
    time("prefix explode (from checkpoint)") { inv.count() }
    val candIds = inv.select(col("id").as("id_a"), col("shingle"))
      .join(inv.select(col("id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    time("candidate join + distinct") { candIds.count() }
    val verified = candIds
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("n_sh").as("n_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("n_common",
        HashExpressions.intersectCountSorted(col("sh_a"), col("sh_b"))
          .cast("long"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
    time("verification joins + merge walk") { verified.count() }
    time("declared full query") {
      DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5, Int.MaxValue)
        .orderBy(col("id_a"), col("id_b")).count()
    }
    spark.stop()
  }
}
