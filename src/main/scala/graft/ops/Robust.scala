package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-stratum outlier scoring — the median/MAD z-score
  * (x − median) / (1.4826 · MAD) that curation pipelines use to gate
  * length/score outliers, because mean/stddev move with the very outliers
  * they are supposed to flag (a handful of 100 MB documents shifts a mean
  * length far more than a median).
  *
  * Two stratum-keyed aggregates (median, then median absolute deviation
  * around it) joined back; the per-stratum stat tables are tiny (one row
  * per stratum) and broadcast. 1.4826 is the normal-consistency constant
  * so the score reads in σ-equivalents; a zero MAD (over half the stratum
  * at the median) yields NULL rather than ±∞.
  *
  * Scale: `exact = true` uses Spark's exact `percentile`, which holds each
  * group's values in the aggregation buffer — right for oracle parity and
  * profiling runs, wrong for 100 TB strata. `exact = false` switches both
  * medians to `approx_percentile` (mergeable GK sketch, bounded memory,
  * map-side combined) — rank error ≤ 1/accuracy, which perturbs scores
  * only around the flag threshold. The data itself is scanned twice
  * either way (MAD is a median AROUND a median — inherently two passes);
  * both joins stay broadcast.
  */
object Robust {

  /** Winsorization — clamp `valueCol` into its per-stratum
    * [`pLo`, `pHi`] EXACT percentile band, appended as `winsorized`: the
    * robust preprocessing move when the row must SURVIVE (feature
    * normalization over heavy-tailed length/score/price columns), where
    * [[robustZ]] would flag and a filter would drop. NULL values stay
    * NULL; strata absent from the bounds table (all-NULL values) pass
    * through unclamped.
    *
    * Scale: bounds come from [[Percentiles.exactPercentiles]] (range-
    * exchange rank + broadcast wanted-ranks — never a per-stratum sorted
    * aggregation buffer), the bounds table is one row per stratum and
    * broadcast back, and the clamp is two comparisons per row. */
  def winsorize(df: DataFrame, valueCol: String, strata: Seq[String],
      pLo: Double = 0.05, pHi: Double = 0.95,
      outCol: String = "winsorized"): DataFrame = {
    require(pLo < pHi, s"need pLo < pHi, got [$pLo, $pHi]")
    // never silently replace a user column (the l2Normalize outCol
    // contract): callers with a clashing column pick another name
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists; pass outCol = <other name>")
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(df.columns.contains).next()
    val loCol = fresh("_wlo")
    val hiCol = fresh("_whi")
    val bounds = Percentiles
      .exactPercentiles(df, strata, valueCol, Seq(pLo, pHi))
      .groupBy(strata.map(col): _*)
      .agg(max(when(col("p") === pLo, col("value"))).as(loCol),
        max(when(col("p") === pHi, col("value"))).as(hiCol))
    val v = col(valueCol).cast("double")
    df.join(broadcast(bounds), strata, "left")
      .withColumn(outCol,
        when(col(loCol).isNotNull && v < col(loCol), col(loCol))
          .when(col(hiCol).isNotNull && v > col(hiCol), col(hiCol))
          .otherwise(v))
      .drop(loCol, hiCol)
  }

  /** Append `robust_z` to `df`: the MAD z-score of `valueCol` within its
    * `strata` group (NULL when MAD = 0 or the value is NULL). */
  def robustZ(df: DataFrame, valueCol: String, strata: Seq[String],
      exact: Boolean = true, accuracy: Int = 10000,
      outCol: String = "robust_z"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists; pass outCol = <other name>")
    def med(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else approx_percentile(c, lit(0.5), lit(accuracy))
    val v = col(valueCol).cast("double")
    // fresh temp names (AsOfJoin/ZOrder discipline): never clobber user
    // columns that happen to be called _med/_mad
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(df.columns.contains).next()
    val medCol = fresh("_med")
    val madCol = fresh("_mad")
    val medians = df.groupBy(strata.map(col): _*).agg(med(v).as(medCol))
    val withMed = df.join(broadcast(medians), strata)
    val mads = withMed.groupBy(strata.map(col): _*)
      .agg(med(abs(v - col(medCol))).as(madCol))
    withMed.join(broadcast(mads), strata)
      .withColumn(outCol,
        (v - col(medCol)) / (lit(1.4826) * nullif(col(madCol), lit(0.0))))
      .drop(medCol, madCol)
  }
}
