package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** U1: bounded top-k as a typed `Aggregator` — the aggregation-shaped
  * alternative to the window rank-filter. The window form sorts each
  * group (map-side-bounded by WindowGroupLimit); this form never holds
  * more than k elements: the partial aggregate on each map partition
  * carries a k-bounded buffer, the exchange moves ≤ k rows per (probe,
  * partition), and merge is a k-bounded list merge.
  *
  * At 100 TB the two shapes differ mainly in memory profile: the
  * aggregator's state is O(k) per group with no sort buffer, which
  * matters when groups are huge and k is tiny (top-10 of millions of
  * candidates). Results are IDENTICAL to the window form, including the
  * (score desc, id asc) tie order — asserted in LlmOpsSpec.
  */
class TopKAggregator(k: Int)(implicit bufEnc: Encoder[Seq[(Long, Double)]])
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  /** Strict weak ordering even for NaN scores (a zero-norm vector makes
    * cos = 0/0): java.lang.Double.compare ranks NaN greatest — the same
    * total order Spark's sort uses — whereas primitive > / == are both
    * false for NaN, which breaks sortWith's contract (TimSort can throw
    * "Comparison method violates its general contract") and diverges
    * from the window form this class promises to match bit-for-bit. */
  private def better(a: (Long, Double), b: (Long, Double)): Boolean = {
    val c = java.lang.Double.compare(a._2, b._2)
    c > 0 || (c == 0 && a._1 < b._1)
  }

  override def zero: Seq[(Long, Double)] = Nil

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double))
      : Seq[(Long, Double)] =
    if (buf.length == k && better(buf.last, in)) buf
    else ((in +: buf).sortWith(better)).take(k)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)])
      : Seq[(Long, Double)] = (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] = bufEnc
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufEnc
}

object TopKAggregator {

  /** groupBy(...).agg(topK(spark, k)(idCol, scoreCol)) → array of the k
    * best (id, score) pairs, best first. */
  def topK(spark: SparkSession, k: Int)(id: Column, score: Column): Column = {
    import spark.implicits._
    udaf(new TopKAggregator(k)).apply(id, score)
  }

  /** The aggregator-shaped brute-force ANN: same output contract as
    * [[SimilarityOps.bruteForceTopK]]. */
  def bruteForceTopKAgg(corpus: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("probe_vec"),
      SimilarityOps.norm(col(vecCol)).as("probe_norm"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      SimilarityOps.norm(col(vecCol)).as("vec_norm"))
    c.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        SimilarityOps.dot(col("probe_vec"), col("vec")) /
          (col("probe_norm") * col("vec_norm")))
      .groupBy(col("probe_id"))
      .agg(topK(spark, k)(col("vec_id"), col("cos")).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("i", "hit")))
      .select(col("probe_id"), (col("i") + 1).as("rank"),
        col("hit._1").as("vec_id"), col("hit._2").as("cos"))
  }
}
