package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.SimilarityOps
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val probes = emb.filter(col("vec_id") < 20)
      val brute = SimilarityOps.bruteForceTopK(emb, probes, 3)
        .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (it <- 0 to 2) {
        val ann = SimilarityOps.ivfTopK(emb, probes, 3, nlist = 8, nprobe = 4, lloydIters = it)
          .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"$sf lloydIters=$it recall=${(brute & ann).size.toDouble / brute.size}")
      }
    }
    spark.stop()
  }
}
