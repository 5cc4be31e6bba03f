package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Int128Sum.int128Sum
import graft.functions.Int128SumProd.int128SumProd

/** One trained coefficient of [[Regression.logisticTrain]]. */
final case class LogitWeight(idx: Int, feature: String,
    weight_x1e6: Long, n: Long)

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

  /** DISTRIBUTED LOGISTIC TRAINING — fixed-step gradient descent on the
    * HARD-SIGMOID logistic surrogate σ̂(z) = clip(½ + z/4, 0, 1) (the
    * piecewise-linear sigmoid of the efficient-DL literature), in EXACT
    * integer micro fixed point so any engine replays every iteration
    * bit-for-bit (the PageRank discipline applied to a training loop).
    * This closes the quality-classifier loop: train on labeled docs
    * over the same signal columns [[graft.text.CorpusStats
    * .logisticQuality]] scores with, then feed the learned weights back
    * into the smooth scorer (hard vs smooth sigmoid is a monotone
    * change of the same linear score — rankings agree; the surrogate is
    * what makes training ENGINE-EXACT, since no portable integer `exp`
    * exists).
    *
    * Per iteration i (ALL divisions TRUNCATE toward zero — Spark `div`,
    * Scala `BigInt./` and DuckDB `//` agree on that convention, so the
    * oracle needs no floor gymnastics):
    *
    *   z_raw  = w_bias·10⁶ + Σ_j w_j·x_j          (per row, 1e-12 scale)
    *   p      = clamp(500000 + (z_raw / 10⁶) / 4, 0, 10⁶)
    *   r      = p − y·10⁶
    *   G_j    = Σ_rows r·x_j ; G_bias = 10⁶·Σ r   (exact Int128 sums)
    *   w_j   ← w_j − (lr · (G_j / n)) / 10¹²       (BigInt, driver)
    *            − (λ · w_j^start) / 10⁶             (decoupled L2 decay)
    *
    * The optional L2 term (`l2X1e6` = λ in micros, default 0 = off) is
    * DECOUPLED weight decay (the AdamW convention, public knowledge):
    * computed on the iteration-START weight, applied after the gradient
    * step, bias undecayed, truncating division — so the regularized
    * loop stays engine-exact and an external engine replays it as one
    * extra subtraction per unrolled CTE round.
    *
    * Weights start at 0 (so iteration 1 sees p = ½ exactly). Rows with
    * a NULL label or NULL in any feature drop (complete-case, the
    * [[olsByGroup]] convention).
    *
    * Overflow contract (enforced, exact-or-LOUD): ≤ 16 features, every
    * quantized |x_j| < 2²⁹ micros (|x| ≲ 536 — rescale bigger signals)
    * checked by ONE upfront aggregate, and every |w_j| < 2²⁹ micros
    * checked after each update (a learning rate that explodes weights
    * fails loudly, never wraps) — so |z_raw| < 17·2⁵⁸ stays far inside
    * long range.
    *
    * Shape: one distributed hash aggregate per iteration (k+2
    * accumulators), driver state = k+1 longs — iterations are
    * associative replays, NEVER a data-sized collect; an external
    * engine unrolls them as CTEs (the `q_logit_train` oracle).
    *
    * Returns one row per coefficient: (`idx` 0 = bias, `feature`,
    * `weight_x1e6`, `n`), idx asc. */
  def logisticTrain(df: DataFrame, labelCol: Column,
      features: Seq[(String, Column)], iters: Int = 5,
      lrX1e6: Long = 4000000L, l2X1e6: Long = 0L): DataFrame = {
    require(features.nonEmpty && features.size <= 16,
      s"logisticTrain takes 1..16 features, got ${features.size}")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lrX1e6 > 0, s"lr_x1e6 must be positive, got $lrX1e6")
    require(l2X1e6 >= 0 && l2X1e6 < 1000000L,
      s"l2_x1e6 must be in [0, 1e6) - a decay factor at or above 1 " +
        s"flips weight signs every round; got $l2X1e6")
    val spark = df.sparkSession
    import spark.implicits._
    val k = features.size
    val Bound = 1L << 29
    // NaN/Inf mask BEFORE the floor: Spark's floor(NaN) would otherwise
    // cast to a silent 0 feature (non-ANSI) or throw (ANSI) instead of
    // dropping the row complete-case — the goldAggExprs finiteness
    // discipline applied to training inputs
    val xs = features.map { case (_, c) => quantize(c) }
    val base = df
      .filter(labelCol.isNotNull && xs.map(_.isNotNull).reduce(_ && _))
      .select((when(labelCol.cast("boolean"), 1000000L).otherwise(0L)
          .as("_y6") +:
        xs.zipWithIndex.map { case (x, j) => x.as(s"_x$j") }): _*)
      .localCheckpoint(eager = false) // scanned once per iteration
    // upfront bound check — one aggregate, loud
    val maxAbs = xs.indices.map(j => max(abs(col(s"_x$j"))))
    val mx = base.agg(count(lit(1)).as("_n"),
        (if (maxAbs.size == 1) maxAbs.head
         else greatest(maxAbs: _*)).as("_m"))
      .as[(Long, Option[Long])].head()
    require(mx._2.forall(_ < Bound),
      s"logisticTrain: a feature reaches ${mx._2.get} micros >= 2^29 - " +
        "rescale features to |x| < ~536 so the integer score can't wrap")
    val n = mx._1
    val w = new Array[Long](k + 1) // idx 0 = bias, then features
    if (n > 0) {
      for (_ <- 1 to iters) {
        val zraw = xs.indices.map(j => lit(w(j + 1)) * col(s"_x$j"))
          .foldLeft(lit(w(0)) * lit(1000000L): Column)(_ + _)
        val p = greatest(lit(0L), least(lit(1000000L),
          lit(500000L) +
            call_function("div",
              call_function("div", zraw, lit(1000000L)), lit(4L))))
        val r = (p - col("_y6")).as("_r")
        val row = base.select(r +: xs.indices.map(j => col(s"_x$j")): _*)
          .agg(int128Sum(col("_r")).as("_g0"),
            xs.indices.map(j =>
              int128SumProd(col("_r"), col(s"_x$j")).as(s"_g${j + 1}")): _*)
          .head()
        def g(i: Int): BigInt =
          BigInt(row.getDecimal(i).toBigInteger)
        val lr = BigInt(lrX1e6)
        val nB = BigInt(n)
        val tw = BigInt(1000000000000L)
        // decay reads the iteration-START weights (w is about to mutate)
        val wStart = w.clone()
        w(0) -= ((lr * ((g(0) * 1000000L) / nB)) / tw).toLong
        for (j <- 1 to k) w(j) -= ((lr * (g(j) / nB)) / tw).toLong
        if (l2X1e6 > 0)
          for (j <- 1 to k) w(j) -=
            ((BigInt(l2X1e6) * BigInt(wStart(j))) / BigInt(1000000L))
              .toLong
        require(w.forall(v => math.abs(v) < Bound),
          s"logisticTrain: a weight left [-2^29, 2^29] micros " +
            s"(${w.mkString(", ")}) - lower lr_x1e6=$lrX1e6 or rescale " +
            "features; continuing would wrap the integer score")
      }
    }
    ("__bias" +: features.map(_._1)).zipWithIndex
      .map { case (name, i) => LogitWeight(i, name, w(i), n) }
      .toDF().orderBy(col("idx"))
  }

  /** Quantize-once feature micros shared by training and deploy: NaN /
    * ±Inf mask to NULL (train drops the row complete-case; a scored row
    * gets a NULL score rather than a silently-zeroed feature). */
  private def quantize(c: Column): Column = {
    val v = c.cast("double")
    val fin = when(!isnan(v) &&
      abs(v) =!= lit(Double.PositiveInfinity), v)
    floor(fin * lit(1e6)).cast("long")
  }

  /** DEPLOY half of [[logisticTrain]]: the hard-sigmoid score in micros
    * for a row under trained weights — the same forward pass the
    * training loop runs (quantize-once features, truncating divisions),
    * so scoring is ENGINE-EXACT integers end to end: any engine replays
    * `clamp(500000 + ((w₀·10⁶ + Σ wⱼ·xⱼ) / 10⁶) / 4, 0, 10⁶)` with its
    * truncating integer division. `weightsX1e6(0)` is the bias, then
    * one weight per feature in order ([[logisticTrain]]'s output rows
    * by `idx`). Predict positive at score ≥ 500000 (z ≥ 0). A NULL or
    * non-finite feature yields a NULL score (the training-side
    * complete-case drop, surfaced instead of a silently-zeroed
    * feature). Same 2²⁹-micro bounds contract as training (the trainer
    * enforces them; a caller feeding foreign weights owns the check). */
  def hardSigmoidScoreX1e6(weightsX1e6: Seq[Long],
      features: Seq[Column]): Column = {
    require(weightsX1e6.size == features.size + 1,
      s"need 1 bias + ${features.size} feature weights, got " +
        s"${weightsX1e6.size}")
    val zraw = features.zipWithIndex
      .map { case (c, j) => lit(weightsX1e6(j + 1)) * quantize(c) }
      .foldLeft(lit(weightsX1e6.head) * lit(1000000L): Column)(_ + _)
    greatest(lit(0L), least(lit(1000000L),
      lit(500000L) + call_function("div",
        call_function("div", zraw, lit(1000000L)), lit(4L))))
  }
}
