package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus construction — the "data
  * mixing" step of a training pipeline (downsample over-represented
  * strata to target proportions) without RNG state: sample membership is
  * a pure function of the row's key, so re-runs, retries, and other
  * engines agree row-for-row (same portability argument as the md5
  * train/eval split, `q_stable_split`).
  */
object Sampling {

  /** Keep ~`fraction` of each stratum, deterministically: order each
    * stratum by (md5(key), key) — a stable pseudo-random permutation —
    * and keep rows whose `percent_rank` ≤ `fraction`. One window pass,
    * one shuffle on the stratum key; skewed strata sort within their own
    * partitions.
    *
    * `percent_rank` (= (rank−1)/(n−1), 0 for a 1-row stratum) is chosen
    * over row_number/count because it needs NO second window pass for the
    * stratum size and has identical semantics in every SQL engine, so the
    * operator is oracle-checkable bit-for-bit. A 1-row stratum is always
    * kept (rank 0 ≤ any non-negative fraction) — matching the "never
    * empty a stratum" contract stratified sampling wants. */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val key: Column = col(keyCol)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("_pr", percent_rank().over(w))
      .filter(col("_pr") <= fraction)
      .drop("_pr")
  }
}
