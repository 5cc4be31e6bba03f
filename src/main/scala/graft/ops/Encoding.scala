package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Fixed.ldiv

/** Supervised categorical encodings for feature preparation — the
  * mean/target encoding every tabular-ML pipeline runs before
  * training, built leakage-free: a row's own fold never contributes to
  * the statistic it is encoded with (the standard K-fold/out-of-fold
  * scheme; naive whole-table means leak the label and overfit
  * high-cardinality categoricals).
  *
  * Determinism/portability contract (the library-wide pattern): folds
  * are a pure md5 function of the row key (re-runs and engines agree
  * row-for-row, no RNG state), targets are per-row DECIMAL-scaled to
  * integer micro-units before aggregation (order-independent exact
  * sums), and encodings are exact fixed-point floor divisions — the
  * whole operator is oracle-checkable bit-for-bit.
  */
object Encoding {

  /** Out-of-fold target-encoding TABLE: one row per (category, fold)
    * with `enc_x1e6` = smoothed out-of-fold mean of `targetCol` in
    * integer micro-units,
    * {{{ enc = (Σ_oof target + prior · m) div (n_oof + m) }}}
    * where `prior_x1e6` is the global mean over the same out-of-fold
    * rows and `m = smoothing` pseudo-observations — high-cardinality
    * categories with few rows shrink toward the prior instead of
    * memorizing the label. A category seen ONLY in a row's own fold has
    * no out-of-fold evidence and encodes to exactly the prior.
    *
    * NULL categories form their own category (at inference time null is
    * a value); rows with NULL target are excluded from sums and counts.
    * Feature lookup is a broadcast join of this table on
    * (category, fold) for training rows.
    *
    * Scale: ONE (category, fold) hash aggregate over the data — K·|cats|
    * result rows; the out-of-fold flip (category total − own fold) is a
    * window over ≤K rows per category on the AGGREGATED table, and the
    * per-fold priors are a K-row broadcast. No data-sized window, no
    * second scan, no collect. */
  def targetEncodeTable(df: DataFrame, catCol: String, keyCol: String,
      targetCol: String, folds: Int = 5, smoothing: Long = 20L,
      seed: String = "tenc"): DataFrame = {
    require(folds >= 2, s"folds must be >= 2 for out-of-fold, got $folds")
    require(smoothing >= 0L, s"smoothing must be >= 0, got $smoothing")
    val fold = pmod(conv(substring(md5(
        concat(lit(seed), lit(":"), col(keyCol).cast("string"))), 1, 12),
      16, 10).cast("long"), lit(folds.toLong))
    // per-row micro-units BEFORE summing: exact integer sums thereafter
    val tMicro = (col(targetCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("long")
    val perFold = df
      .select(col(catCol).as("category"), fold.as("fold"), tMicro.as("_t"))
      .groupBy(col("category"), col("fold"))
      .agg(coalesce(sum(col("_t")), lit(0L)).as("_sum"),
        count(col("_t")).as("_n"))
    // per-fold global sums: the K-row broadcast behind the priors
    val byFold = broadcast(perFold.groupBy(col("fold").as("_pf"))
      .agg(sum(col("_sum")).as("_fsum"), sum(col("_n")).as("_fn"))
      .crossJoin(broadcast(perFold.agg(
        sum(col("_sum")).as("_gsum"), sum(col("_n")).as("_gn"))))
      .select(col("_pf"),
        ldiv(col("_gsum") - col("_fsum"),
          greatest(col("_gn") - col("_fn"), lit(1L))).as("prior_x1e6")))
    val w = Window.partitionBy(col("category"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    perFold
      .withColumn("_oof_sum", sum(col("_sum")).over(w) - col("_sum"))
      .withColumn("_oof_n", sum(col("_n")).over(w) - col("_n"))
      .join(byFold, col("fold") === col("_pf"))
      .select(col("category"), col("fold"),
        col("_oof_n").as("oof_n"), col("prior_x1e6"),
        when(col("_oof_n") + lit(smoothing) > 0L,
          ldiv(d(col("_oof_sum"))
              + d(col("prior_x1e6")) * lit(smoothing),
            d(col("_oof_n") + lit(smoothing))).cast("long"))
          .otherwise(col("prior_x1e6")).as("enc_x1e6"))
  }
}
