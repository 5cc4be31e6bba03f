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

  /** WEIGHT-OF-EVIDENCE / INFORMATION-VALUE table — the
    * risk-scorecard sibling of [[targetEncodeTable]] (that one encodes
    * a category as a shrunk conditional mean; this one encodes it as
    * evidence strength and grades the FEATURE): one row per bin with
    * `n`, `pos`, `neg`,
    * `woe = round(ln((neg/N⁻)/(pos/N⁺)), 6)` (how much the bin's
    * odds lean negative vs the base rate — the standard
    * "distribution of goods over distribution of bads" form) and the
    * bin's IV contribution
    * `iv_x1e6 = ⌊10⁶·(neg/N⁻ − pos/N⁺)·ln(…)⌋`; Σ iv over bins is
    * the feature's information value (the < .02 useless / > .3
    * strong screening convention). One-sided bins (pos or neg = 0,
    * where WOE is ±∞) yield NULL woe and iv — the conventional
    * skip-or-adjust choice made explicit. Rows with NULL label drop;
    * NULL bins form their own bin (null is a value at scoring time).
    *
    * Determinism: counts are exact; the doubles follow a pinned op
    * order — (neg/N⁻)/(pos/N⁺) into one ln (the
    * corpus-stats logprob precedent), the rate difference times the
    * RAW ln, floored to integer micros — so an external engine
    * replays woe and iv bit-for-bit; summing the integer `iv_x1e6`
    * is order-free where a double Σ would not be.
    *
    * Shape: ONE hash aggregate to the bin table (category-bounded) +
    * a 1-row broadcast of the class totals. */
  def woeTable(df: DataFrame, binCol: String, labelCol: Column)
      : DataFrame = {
    val bins = df.filter(labelCol.isNotNull)
      .select(col(s"`$binCol`").as("bin"),
        labelCol.cast("boolean").as("_y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val tot = broadcast(bins.agg(
      coalesce(sum(col("pos")), lit(0L)).as("_np"),
      coalesce(sum(col("neg")), lit(0L)).as("_nn")))
    def d(c: Column) = c.cast("double")
    val lnOdds = log((d(col("neg")) / d(col("_nn"))) /
      (d(col("pos")) / d(col("_np"))))
    val ok = col("pos") > 0L && col("neg") > 0L &&
      col("_np") > 0L && col("_nn") > 0L
    bins.crossJoin(tot).select(col("bin"), col("n"), col("pos"),
      col("neg"),
      when(ok, round(lnOdds, 6)).as("woe"),
      when(ok, floor((d(col("neg")) / d(col("_nn")) -
        d(col("pos")) / d(col("_np"))) * lnOdds * lit(1e6))
        .cast("long")).as("iv_x1e6"))
  }
}
