package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Stage-attribution profile for the winnowing fingerprint query:
  * times hash choice, window, distinct, and final sort separately. */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.analytics.Tables(spark, sfDir, "documents")

    def time(label: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val n = body
      println(f"[winnow] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    time("norm+explode positions only") {
      docs.select(col("doc_id"), TextOps.normalize(col("text")).as("_norm"))
        .select(col("doc_id"), posexplode(sequence(lit(1),
          greatest(length(col("_norm")) - 4, lit(1)))).as(Seq("_j", "_i")))
        .count()
    }
    time("+ md5 gram hash") {
      docs.select(col("doc_id"), TextOps.normalize(col("text")).as("_norm"))
        .select(col("doc_id"), col("_norm"), posexplode(sequence(lit(1),
          greatest(length(col("_norm")) - 4, lit(1)))).as(Seq("_j", "_i")))
        .select(col("doc_id"), col("_i"),
          md5(substring(col("_norm"), col("_i"), lit(5))).as("_g"))
        .agg(count(col("_g"))).collect()(0).getLong(0)
    }
    time("+ xxhash64 gram hash") {
      docs.select(col("doc_id"), TextOps.normalize(col("text")).as("_norm"))
        .select(col("doc_id"), col("_norm"), posexplode(sequence(lit(1),
          greatest(length(col("_norm")) - 4, lit(1)))).as(Seq("_j", "_i")))
        .select(col("doc_id"), col("_i"),
          xxhash64(substring(col("_norm"), col("_i"), lit(5))).as("_g"))
        .agg(count(col("_g"))).collect()(0).getLong(0)
    }
    time("+ karp-rabin gram hash") {
      def kr(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val M = 2147483647L
        (0 until 5).foldLeft(lit(0L)) { (h, j) =>
          (h * 131L + ascii(substring(s, col("_i") + j, lit(1)))) % M
        }
      }
      docs.select(col("doc_id"), TextOps.normalize(col("text")).as("_norm"))
        .select(col("doc_id"), col("_norm"), posexplode(sequence(lit(1),
          greatest(length(col("_norm")) - 4, lit(1)))).as(Seq("_j", "_i")))
        .select(col("doc_id"), col("_i"), kr(col("_norm")).as("_g"))
        .agg(count(col("_g"))).collect()(0).getLong(0)
    }
    time("+ karp-rabin, foldable positions") {
      // gram string cut once with a NON-foldable pos, then chars read at
      // LITERAL positions (codegen fast path) — vs kr() above which
      // indexes norm with computed positions per char
      def kr2(g: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val M = 2147483647L
        (1 to 5).foldLeft(lit(0L)) { (h, j) =>
          (h * 131L + ascii(substring(g, j, 1))) % M
        }
      }
      docs.select(col("doc_id"), TextOps.normalize(col("text")).as("_norm"))
        .select(col("doc_id"), col("_norm"), posexplode(sequence(lit(1),
          greatest(length(col("_norm")) - 4, lit(1)))).as(Seq("_j", "_i")))
        .select(col("doc_id"), col("_i"),
          substring(col("_norm"), col("_i"), lit(5)).as("_gs"))
        .select(col("doc_id"), col("_i"), kr2(col("_gs")).as("_g"))
        .agg(count(col("_g"))).collect()(0).getLong(0)
    }
    time("full md5 winnow (no sort)") {
      TextOps.winnowFingerprints(docs, "doc_id", "text", 5, 4, portable = true).count()
    }
    time("full xxhash64 winnow (no sort)") {
      TextOps.winnowFingerprints(docs, "doc_id", "text", 5, 4).count()
    }
    time("declared query (with sort)") {
      TextOps.winnowFingerprints(docs, "doc_id", "text", 5, 4, portable = true)
        .orderBy(col("doc_id"), col("fp")).count()
    }
    spark.stop()
  }
}
