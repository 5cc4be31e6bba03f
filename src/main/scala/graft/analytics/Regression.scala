package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Int128Sum.int128Sum
import graft.functions.Int128SumProd.int128SumProd

/** Grouped ORDINARY LEAST SQUARES — the "fit a line per segment" EDA /
  * monitoring primitive (price-vs-quantity elasticity per flag, latency-
  * vs-load slope per service, drift of a metric against time per
  * cohort). One row per group with the closed-form simple-regression
  * fit: `n`, `slope`, `intercept`, `r2`, all from the five power sums —
  * no iterative solver, one aggregate over the data.
  *
  * Exactness is the [[Profiler.correlationMatrix]] convention: per-row
  * values quantized ONCE to exact 1e-6 fixed point (`floor(v·1e6)` —
  * bit-portable across engines); first moments summed by
  * [[graft.functions.Int128Sum]] and cross/second moments by
  * [[graft.functions.Int128SumProd]] over the SAME quantized micros
  * (exact int128 per-row products at 1e-12 scale — so varx·vary ≥ cov²
  * and non-negative variances hold by construction, where independent
  * re-quantization of x², y², x·y can violate them on near-constant
  * data), doubles only in
  * the final closed-form arithmetic rounded at 6. Rows where either
  * column is NULL drop (complete-case per group — a group with no
  * complete row emits NO output row, not an n=0 placeholder). A
  * zero-variance x
  * yields NULL slope/intercept/r2; a zero-variance y yields r2 NULL.
  * Bound: |x| and |y| must each stay within `long` micro-units
  * (≤ 9.2e12 — products need no bound: the per-row int128 product is
  * exact for any two longs). Beyond it, floor(double)→long SATURATES
  * silently at ±2^63 (Spark's floor is (long)Math.floor — no ANSI
  * error), so out-of-bound inputs diverge from the oracle silently;
  * the caller owns the range check.
  *
  * Shape: one map-side-combined hash aggregate (6 accumulators per
  * group) + a scalar projection — the 100 TB cost is the scan. */
object Regression {

  def olsByGroup(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "olsByGroup needs at least one group column")
    val (x, y) =
      (col(s"`$xCol`").cast("double"), col(s"`$yCol`").cast("double"))
    // filter (not NULL-out) the incomplete rows: a group with NO
    // complete-case row must emit no row at all, exactly like the
    // oracle's WHERE ... GROUP BY — projecting NULL measures instead
    // would keep the group alive as a phantom n=0 row
    def m(e: Column) = floor(e * lit(1e6))
    val proj = df.filter(x.isNotNull && y.isNotNull).select(
      groupCols.map(c => col(s"`$c`")) ++ Seq(
        m(x).as("_xm"), m(y).as("_ym")): _*)
    val agg = proj.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("n"),
        int128Sum(col("_xm")).as("_sx"), int128Sum(col("_ym")).as("_sy"),
        int128SumProd(col("_xm"), col("_xm")).as("_sxx"),
        int128SumProd(col("_ym"), col("_ym")).as("_syy"),
        int128SumProd(col("_xm"), col("_ym")).as("_sxy"))
    // micro-unit decimal sums → doubles → /1e6 (first moments) and
    // /1e12 (product moments): identical nearest-double conversions in
    // any engine replaying the oracle
    def d(c: String) = col(c).cast("double") / lit(1e6)
    def d12(c: String) = col(c).cast("double") / lit(1e12)
    val n = col("n").cast("double")
    val varx = n * d12("_sxx") - d("_sx") * d("_sx")
    val vary = n * d12("_syy") - d("_sy") * d("_sy")
    val cov = n * d12("_sxy") - d("_sx") * d("_sy")
    val slope = cov / varx
    agg.select(
      groupCols.map(c => col(s"`$c`")) ++ Seq(
        col("n"),
        when(col("n") > 0 && varx > 0.0, round(slope, 6)).as("slope"),
        when(col("n") > 0 && varx > 0.0,
          round((d("_sy") - slope * d("_sx")) / n, 6)).as("intercept"),
        when(col("n") > 0 && varx > 0.0 && vary > 0.0,
          round(cov * cov / (varx * vary), 6)).as("r2")): _*)
  }
}
