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

  /** Keep EXACTLY floor(fraction·(n−1))+1 rows of each stratum (n = the
    * stratum's row count; a 1-row stratum is always kept), selected
    * deterministically by an md5-keyed pseudo-random order.
    *
    * Scale shape — the q_pack lesson applied to sampling: a single
    * per-stratum window would serialize each stratum onto one task (a
    * ~5-value language column ⇒ 5 tasks own the whole corpus at 100 TB).
    * Instead, two passes:
    *
    *  1. rank within (stratum, shard), where shard = 2 hex chars of the
    *     row's md5 — 256 balanced shards per stratum, so the data-sized
    *     window is keyed on high cardinality;
    *  2. aggregate the tiny (stratum, shard) counts, prefix-sum them in
    *     shard order (strata × 256 rows — driver-scale), broadcast back,
    *     and keep rows whose shard-offset global rank clears the
    *     stratum's quota.
    *
    * The induced permutation (shards concatenated in hex order, md5 order
    * within a shard) is a fixed deterministic function of the keys, and
    * every ingredient — md5, substring, row_number, prefix sums — is
    * ANSI-portable, so the operator is oracle-checkable bit-for-bit.
    * Exact per-stratum quotas are this operator's contract; when ~fraction
    * in expectation is enough, a plain `md5(key) < threshold` filter is
    * row-local and needs no window at all (see `q_stable_split`). */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val key: Column = col(keyCol)
    val withH = df
      .withColumn("_h", md5(key.cast("string")))
      .withColumn("_shard", substring(col("_h"), 9, 2))
    val wShard = Window.partitionBy(col(strataCol), col("_shard"))
      .orderBy(col("_h"), key)
    val ranked = withH.withColumn("_rn", row_number().over(wShard))
    val counts = withH.groupBy(col(strataCol), col("_shard"))
      .agg(count(lit(1)).as("_c"))
    val wOff = Window.partitionBy(col(strataCol)).orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col(strataCol))
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(wTot))
      .select(col(strataCol), col("_shard"), col("_off"), col("_n"))
    // null-SAFE equality on the stratum: windows and groupBy treat NULL
    // as a normal group, but a null-unsafe join key would silently drop
    // the whole NULL stratum — violating the every-stratum contract
    val o = offsets
      .withColumnRenamed(strataCol, "_o_strata")
      .withColumnRenamed("_shard", "_o_shard")
    ranked.join(broadcast(o),
        col(strataCol) <=> col("_o_strata") && col("_shard") === col("_o_shard"))
      .filter(col("_rn") + col("_off") <=
        floor(lit(fraction) * (col("_n") - 1)) + 1)
      .drop("_h", "_shard", "_rn", "_off", "_n", "_o_strata", "_o_shard")
  }
}
