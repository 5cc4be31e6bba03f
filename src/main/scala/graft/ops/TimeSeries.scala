package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling — the missing-sensor-reading / sparse-metric
  * repair pass (north-star extension; sibling of the date-spine
  * densification `q_date_spine`).
  *
  * Both operators are per-key ordered windows: ONE hash exchange on the
  * key; forward and backward frames share the partitioning and sort, so
  * Spark plans them without a second exchange or sort. Keys are
  * high-cardinality (users, devices, series ids) ⇒ skew-proof at scale.
  * `orderCols` must be a TOTAL order per key (add a tie-breaker column —
  * the W1 dedup determinism rule) or fill values at equal timestamps are
  * tie-ambiguous.
  */
object TimeSeries {

  /** Last-observation-carried-forward: fill NULLs in each of `valueCols`
    * with the latest preceding non-NULL value of the same key. Leading
    * NULLs (no prior observation) stay NULL. */
  def locf(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Linear interpolation of NULL `valueCol` rows between their nearest
    * non-NULL neighbors in time:
    * `v = v0 + (v1 − v0) · (t − t0) / (t1 − t0)` with `t` taken from the
    * NUMERIC `timeNum` column (e.g. epoch micros — engine-portable,
    * unlike timestamp arithmetic). Edges degrade gracefully: only a
    * preceding neighbor ⇒ carry it forward (LOCF), only a following one
    * ⇒ carry it backward, neither ⇒ NULL. Non-NULL rows pass through
    * untouched. */
  def interpolate(df: DataFrame, keyCol: String, timeNum: String,
      orderCols: Seq[Column], valueCol: String): DataFrame = {
    val back = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = col(timeNum).cast("double")
    val observedT = when(col(valueCol).isNotNull, col(timeNum))
    val v0 = last(col(valueCol), ignoreNulls = true).over(back)
    val t0 = last(observedT, ignoreNulls = true).over(back).cast("double")
    val v1 = first(col(valueCol), ignoreNulls = true).over(fwd)
    val t1 = first(observedT, ignoreNulls = true).over(fwd).cast("double")
    df.withColumn(valueCol,
      when(col(valueCol).isNotNull, col(valueCol))
        .when(v0.isNotNull && v1.isNotNull && t1 =!= t0,
          v0 + (v1 - v0) * (t - t0) / (t1 - t0))
        .when(v0.isNotNull && v1.isNotNull, v0) // degenerate t1 == t0
        .when(v0.isNotNull, v0)
        .otherwise(v1))
  }

  /** SIMPLE EXPONENTIAL SMOOTHING of per-period activity — the
    * baseline forecasting primitive beside [[cusum]]/
    * [[seasonalDecompose]]: s₁ = x₁, sᵢ = ⌊(α·xᵢ + (10⁶−α)·sᵢ₋₁)/10⁶⌋
    * over the DENSE period spine (gaps count 0), where each sᵢ is also
    * the one-step-ahead forecast for period i+1. One ordered row per
    * period: (`period`, `n`, `smooth_x1e6`). `alphaX1e6` is the
    * caller's smoothing weight in micros (0 < α ≤ 10⁶).
    *
    * Exactness: x enters as n·10⁶ and the recurrence floors at every
    * step in arbitrary-precision integers (no overflow at any count),
    * so an external engine replays it bit-for-bit via a recursive CTE.
    *
    * Shape: distributed period count + spine join; the floored
    * recurrence is order-dependent and non-associative, so it runs on
    * the DRIVER over the calendar-bounded period grid with a loud
    * `maxSteps` cap — the [[cusum]] posture. */
  def exponentialSmooth(events: DataFrame, tsUsCol: String,
      periodUs: Long, alphaX1e6: Long, maxSteps: Int = 10000)
      : DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(alphaX1e6 > 0 && alphaX1e6 <= 1000000L,
      s"alphaX1e6 must be in (0, 1e6], got $alphaX1e6")
    val spark = events.sparkSession
    import spark.implicits._
    val period = Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val counts = events.select(period.as("period"))
      .groupBy(col("period")).agg(count(lit(1)).as("n"))
    val bounds = counts.agg(min(col("period")).as("_lo"),
      max(col("period")).as("_hi"))
    val dense = bounds
      .select(explode(sequence(col("_lo"), col("_hi"))).as("period"))
      .join(counts, Seq("period"), "left")
      .select(col("period"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("period"))
    val steps = dense.collect()
    require(steps.length <= maxSteps,
      s"smoothing grid has ${steps.length} periods > maxSteps=$maxSteps" +
        " - coarsen periodUs or raise the cap (the driver chain is " +
        "grid-sized by design)")
    val (a, b) = (BigInt(alphaX1e6), BigInt(1000000L - alphaX1e6))
    var s: BigInt = null
    val out = steps.map { r =>
      val (p, n) = (r.getLong(0), r.getLong(1))
      val x = BigInt(n) * 1000000L
      s = if (s == null) x else (a * x + b * s) / 1000000L
      (p, n, s.toLong)
    }
    out.toSeq.toDF("period", "n", "smooth_x1e6")
  }

  /** CUSUM change detection over per-period activity — the classical
    * SPC drift alarm beside [[seasonalDecompose]]: one-sided cumulative
    * sums S⁺ ← max(0, S⁺ + (x − μ₀ − k)) and S⁻ ← max(0, S⁻ + (μ₀ − x
    * − k)) over the DENSE period spine (gaps count 0), signaling when
    * either exceeds `h` — catches small sustained level shifts a
    * per-period threshold misses. One ordered row per period:
    * (`period`, `n`, `cusum_pos_x1e6`, `cusum_neg_x1e6`, `signal`).
    * μ₀ is the spine mean in exact floored micros; `kX1e6` (slack) and
    * `hX1e6` (alarm) are caller micros.
    *
    * Exactness: x enters as n·10⁶, μ₀ as ⌊10⁶·total/periods⌋
    * ([[Fixed.ldiv]]) — the recurrence is pure integer max/add, so an
    * external engine replays it bit-for-bit via a recursive CTE.
    *
    * Shape: one period-keyed count + spine join (distributed); the
    * max-recurrence is order-dependent and non-associative, so it runs
    * on the DRIVER over the period grid — calendar-bounded
    * (sf-independent) and guarded by a loud `maxSteps` cap, the
    * [[graft.analytics.EventFunnel.kaplanMeier]] argument. */
  def cusum(events: DataFrame, tsUsCol: String, periodUs: Long,
      kX1e6: Long, hX1e6: Long, maxSteps: Int = 10000): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(kX1e6 >= 0, s"kX1e6 must be >= 0, got $kX1e6")
    require(hX1e6 > 0, s"hX1e6 must be positive, got $hX1e6")
    val spark = events.sparkSession
    import spark.implicits._
    val period = Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val counts = events.select(period.as("period"))
      .groupBy(col("period")).agg(count(lit(1)).as("n"))
    val bounds = counts.agg(min(col("period")).as("_lo"),
      max(col("period")).as("_hi"))
    val dense = bounds
      .select(explode(sequence(col("_lo"), col("_hi"))).as("period"))
      .join(counts, Seq("period"), "left")
      .select(col("period"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("period"))
    val steps = dense.collect()
    require(steps.length <= maxSteps,
      s"CUSUM grid has ${steps.length} periods > maxSteps=$maxSteps" +
        " - coarsen periodUs or raise the cap (the driver chain is " +
        "grid-sized by design)")
    // arbitrary-precision recurrence (the exponentialSmooth posture):
    // total·10⁶ wraps a Long past ~9.2e12 events, silently corrupting
    // μ₀ and every alarm — BigInt stays exact at any count, and the
    // output conversion fails LOUD (longValueExact) rather than wrap
    val total = steps.iterator.map(r => BigInt(r.getLong(1))).sum
    val mu0: BigInt = if (steps.isEmpty) BigInt(0)
      else (total * 1000000L) / steps.length // total ≥ 0 ⇒ floor
    val (k, zero) = (BigInt(kX1e6), BigInt(0))
    var (sp, sn) = (zero, zero)
    val out = steps.map { r =>
      val (p, n) = (r.getLong(0), r.getLong(1))
      val x = BigInt(n) * 1000000L
      sp = zero.max(sp + (x - mu0 - k))
      sn = zero.max(sn + (mu0 - x - k))
      (p, n, sp.bigInteger.longValueExact(), sn.bigInteger.longValueExact(),
        sp > hX1e6 || sn > hX1e6)
    }
    out.toSeq.toDF("period", "n", "cusum_pos_x1e6", "cusum_neg_x1e6",
      "signal")
  }

  /** CLASSICAL additive SEASONAL DECOMPOSITION of an event log's
    * per-period activity — observed = trend + seasonal + residual, the
    * dashboard de-noising pass beside [[locf]]/[[interpolate]]. One row
    * per period on the DENSE spine (gaps count 0): (`period`, `n`,
    * `trend_x1e6`, `seasonal_x1e6`, `resid_x1e6`), ordered.
    *
    * - trend: centered `trendWindow`-period moving average (window must
    *   be odd); NULL at the `trendWindow/2` edge periods where the full
    *   frame doesn't exist — the classical convention, not imputation.
    * - seasonal: mean detrended value per season position
    *   (`period mod seasonLen`, floor-mod so pre-1970 periods land in
    *   0..len−1), zero-centered by subtracting the positions' mean.
    * - residual: observed − trend − seasonal where both exist.
    *
    * Exactness: counts enter as micro integers; every mean is a
    * [[graft.ops.Fixed.ldiv]] floor — the whole output is integers an
    * external engine replays exactly.
    *
    * Shape: one period-keyed count, a spine join, then windows over the
    * PERIOD GRID — calendar-bounded (days in the observation window),
    * not data-sized, which is what justifies the partition-less frame
    * (the Kaplan–Meier grid argument); the seasonal table (≤ seasonLen
    * rows) broadcasts back. */
  def seasonalDecompose(events: DataFrame, tsUsCol: String,
      periodUs: Long, seasonLen: Int = 7, trendWindow: Int = 7)
      : DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(seasonLen >= 2, s"seasonLen must be >= 2, got $seasonLen")
    require(trendWindow >= 3 && trendWindow % 2 == 1,
      s"trendWindow must be odd >= 3, got $trendWindow")
    val h = trendWindow / 2
    val period = Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val counts = events.select(period.as("period"))
      .groupBy(col("period")).agg(count(lit(1)).as("n"))
    val bounds = counts.agg(min(col("period")).as("_lo"),
      max(col("period")).as("_hi"))
    val spine = bounds
      .select(explode(sequence(col("_lo"), col("_hi"))).as("period"))
    val dense = spine.join(counts, Seq("period"), "left")
      .select(col("period"), coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.orderBy(col("period")).rowsBetween(-h, h)
    val trended = dense
      .withColumn("trend_x1e6",
        when(count(lit(1)).over(w) === trendWindow,
          Fixed.ldiv(sum(col("n")).over(w) * lit(1000000L),
            lit(trendWindow.toLong))))
      .withColumn("_pos", pmod(col("period"), lit(seasonLen.toLong)))
      .withColumn("_detr",
        col("n") * lit(1000000L) - col("trend_x1e6"))
      .localCheckpoint(false) // feeds the seasonal means AND the output
    val seasonal = trended.filter(col("_detr").isNotNull)
      .groupBy(col("_pos"))
      .agg(Fixed.ldiv(sum(col("_detr")), count(lit(1))).as("_smean"))
    val center = seasonal.agg(
      Fixed.ldiv(sum(col("_smean")), count(lit(1))).as("_c"))
    val seas = broadcast(seasonal.crossJoin(broadcast(center))
      .select(col("_pos"), (col("_smean") - col("_c"))
        .as("seasonal_x1e6")))
    trended.join(seas, Seq("_pos"), "left")
      .select(col("period"), col("n"), col("trend_x1e6"),
        col("seasonal_x1e6"),
        (col("_detr") - col("seasonal_x1e6")).as("resid_x1e6"))
      .orderBy(col("period"))
  }

  /** Exact floor division in arbitrary precision (BigInt `/` truncates
    * toward zero — wrong for the negative trend terms Holt produces). */
  private def fdiv(a: BigInt, d: BigInt): BigInt = {
    val q = a / d
    if ((a % d).signum != 0 && a.signum * d.signum < 0) q - 1 else q
  }

  /** HOLT double exponential smoothing (level + linear trend) of
    * per-period activity — the trend-aware forecaster beside
    * [[exponentialSmooth]] (which a trending series lags by design):
    * over the DENSE period spine (gaps count 0),
    *   l₁ = x₁, b₁ = x₂ − x₁ (classical init; b₁ = 0 on a 1-period
    *   spine),
    *   lᵢ = ⌊(α·xᵢ + (10⁶−α)·(lᵢ₋₁ + bᵢ₋₁)) / 10⁶⌋,
    *   bᵢ = ⌊(β·(lᵢ − lᵢ₋₁) + (10⁶−β)·bᵢ₋₁) / 10⁶⌋,
    * one ordered row per period: (`period`, `n`, `level_x1e6`,
    * `trend_x1e6`, `forecast_x1e6` = lᵢ + bᵢ — the one-step-ahead
    * forecast for period i+1). `alphaX1e6`/`betaX1e6` in micros.
    *
    * Exactness: x enters as n·10⁶; every step FLOORS (floor, not
    * truncate — trend terms go negative) in arbitrary precision, so an
    * external engine replays it bit-for-bit via a recursive CTE with
    * the explicit negative-remainder floor adjustment. Output
    * conversion fails LOUD past long range (longValueExact).
    *
    * Shape: distributed period count + spine join; the coupled
    * recurrence is order-dependent and non-associative, so it runs on
    * the DRIVER over the calendar-bounded period grid with a loud
    * `maxSteps` cap — the [[exponentialSmooth]]/[[cusum]] posture. */
  def holt(events: DataFrame, tsUsCol: String, periodUs: Long,
      alphaX1e6: Long, betaX1e6: Long, maxSteps: Int = 10000)
      : DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(alphaX1e6 > 0 && alphaX1e6 <= 1000000L,
      s"alphaX1e6 must be in (0, 1e6], got $alphaX1e6")
    require(betaX1e6 > 0 && betaX1e6 <= 1000000L,
      s"betaX1e6 must be in (0, 1e6], got $betaX1e6")
    val spark = events.sparkSession
    import spark.implicits._
    val steps = denseSpine(events, tsUsCol, periodUs)
    require(steps.length <= maxSteps,
      s"Holt grid has ${steps.length} periods > maxSteps=$maxSteps" +
        " - coarsen periodUs or raise the cap (the driver chain is " +
        "grid-sized by design)")
    val M = BigInt(1000000L)
    val (a, a1) = (BigInt(alphaX1e6), M - alphaX1e6)
    val (bw, bw1) = (BigInt(betaX1e6), M - betaX1e6)
    var l: BigInt = null
    var b: BigInt = null
    val out = steps.zipWithIndex.map { case (r, i) =>
      val (p, n) = (r.getLong(0), r.getLong(1))
      val x = BigInt(n) * 1000000L
      if (i == 0) {
        l = x
        b = if (steps.length > 1)
          BigInt(steps(1).getLong(1)) * 1000000L - x
        else BigInt(0)
      } else {
        val lPrev = l
        l = fdiv(a * x + a1 * (lPrev + b), M)
        b = fdiv(bw * (l - lPrev) + bw1 * b, M)
      }
      (p, n, l.bigInteger.longValueExact(), b.bigInteger.longValueExact(),
        (l + b).bigInteger.longValueExact())
    }
    out.toSeq.toDF("period", "n", "level_x1e6", "trend_x1e6",
      "forecast_x1e6")
  }

  /** HOLT–WINTERS additive triple smoothing — the seasonal member that
    * completes the forecasting family ([[exponentialSmooth]] flat,
    * [[holt]] trended, this one trended + seasonal): over the dense
    * spine x₁..x_N (micros), with season length L,
    *   init: l_L = ⌊Σ_{i≤L} xᵢ / L⌋, b_L = 0,
    *         sᵢ = xᵢ − l_L for i = 1..L (raw indices, not normalized —
    *         a deterministic classical init, documented not hidden),
    *   for i > L:
    *     lᵢ = ⌊(α(xᵢ − sᵢ₋L) + (10⁶−α)(lᵢ₋₁ + bᵢ₋₁))/10⁶⌋
    *     bᵢ = ⌊(β(lᵢ − lᵢ₋₁) + (10⁶−β)bᵢ₋₁)/10⁶⌋
    *     sᵢ = ⌊(γ(xᵢ − lᵢ) + (10⁶−γ)sᵢ₋L)/10⁶⌋
    * One ordered row per period i > L: (`period`, `n`, `level_x1e6`,
    * `trend_x1e6`, `seasonal_x1e6`, `forecast_x1e6` = lᵢ + bᵢ +
    * sᵢ₊₁₋L — the one-step-ahead forecast). The spine must cover more
    * than one season (LOUD require).
    *
    * Exactness: every step floors (floor, not truncate — trend and
    * seasonal go negative) in arbitrary precision; an external engine
    * replays it bit-for-bit via a recursive CTE carrying the L
    * seasonal states as a LIST. Output conversion fails LOUD past long
    * range.
    *
    * Shape: the [[holt]] posture — distributed count + spine join,
    * order-dependent recurrence on the DRIVER over the
    * calendar-bounded grid with a loud `maxSteps` cap. */
  def holtWinters(events: DataFrame, tsUsCol: String, periodUs: Long,
      alphaX1e6: Long, betaX1e6: Long, gammaX1e6: Long, seasonLen: Int,
      maxSteps: Int = 10000): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    for ((nm, v) <- Seq("alpha" -> alphaX1e6, "beta" -> betaX1e6,
        "gamma" -> gammaX1e6))
      require(v > 0 && v <= 1000000L,
        s"${nm}X1e6 must be in (0, 1e6], got $v")
    require(seasonLen >= 2, s"seasonLen must be >= 2, got $seasonLen")
    val spark = events.sparkSession
    import spark.implicits._
    val steps = denseSpine(events, tsUsCol, periodUs)
    require(steps.length <= maxSteps,
      s"Holt-Winters grid has ${steps.length} periods > " +
        s"maxSteps=$maxSteps - coarsen periodUs or raise the cap")
    require(steps.length > seasonLen,
      s"Holt-Winters needs more than one season of data: " +
        s"${steps.length} periods <= seasonLen=$seasonLen")
    val M = BigInt(1000000L)
    val (a, a1) = (BigInt(alphaX1e6), M - alphaX1e6)
    val (bw, bw1) = (BigInt(betaX1e6), M - betaX1e6)
    val (g, g1) = (BigInt(gammaX1e6), M - gammaX1e6)
    val xs = steps.map(r => BigInt(r.getLong(1)) * 1000000L)
    val L = seasonLen
    var l = xs.take(L).sum / L // non-negative ⇒ floor
    var b = BigInt(0)
    val ring = Array.tabulate(L)(j => xs(j) - l)
    val out = (L until steps.length).map { p =>
      val sPrev = ring(p % L)
      val lPrev = l
      l = fdiv(a * (xs(p) - sPrev) + a1 * (lPrev + b), M)
      b = fdiv(bw * (l - lPrev) + bw1 * b, M)
      val sNew = fdiv(g * (xs(p) - l) + g1 * sPrev, M)
      ring(p % L) = sNew
      (steps(p).getLong(0), steps(p).getLong(1),
        l.bigInteger.longValueExact(), b.bigInteger.longValueExact(),
        sNew.bigInteger.longValueExact(),
        (l + b + ring((p + 1) % L)).bigInteger.longValueExact())
    }
    out.toDF("period", "n", "level_x1e6", "trend_x1e6",
      "seasonal_x1e6", "forecast_x1e6")
  }

  /** The dense (period, n) grid, ordered, collected — the shared spine
    * of the driver-recurrence family (one construction: the collected
    * form IS [[denseSpineDF]]). */
  private def denseSpine(events: DataFrame, tsUsCol: String,
      periodUs: Long): Array[org.apache.spark.sql.Row] =
    denseSpineDF(events, tsUsCol, periodUs)
      .orderBy(col("period"))
      .collect()

  /** ONE-STEP-AHEAD FORECAST EVALUATION of [[exponentialSmooth]] on its
    * own series — the backtest that closes the forecasting family: for
    * each period i ≥ 2 the model forecast is sᵢ₋₁ and the naive
    * baseline forecast is xᵢ₋₁. ONE output row:
    * (`n_periods`, `mae_x1e6`, `rmse_x1e6`, `mae_naive_x1e6`,
    * `mase_x1e6`) where
    *   mae  = ⌊Σ|xᵢ·10⁶ − sᵢ₋₁| / (n−1)⌋,
    *   rmse = ⌊√(⌊Σe²/(n−1)⌋)⌋ (e in micros ⇒ Σe²/(n−1) is micro²;
    *   the square root lands back on the micro scale),
    *   mase = ⌊mae·10⁶ / mae_naive⌋ (NULL when the naive error is 0 —
    *   a constant series has nothing to beat). A spine with < 2
    *   periods yields NULL errors.
    *
    * Exactness: errors are exact micro integers off the replayable
    * [[exponentialSmooth]] recurrence; Σe² rides
    * [[graft.functions.Int128SumProd]] (e² can exceed long); the only
    * double is the final IEEE sqrt, identical in any engine.
    *
    * Shape: the error frame is the calendar-bounded period grid (the
    * driver already holds it — [[exponentialSmooth]]'s contract), so
    * the lag + aggregate run at grid size, never data size. */
  def forecastEval(events: DataFrame, tsUsCol: String, periodUs: Long,
      alphaX1e6: Long, maxSteps: Int = 10000): DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    val sm = exponentialSmooth(events, tsUsCol, periodUs, alphaX1e6,
      maxSteps)
    // the true grid size (a LocalRelation — counting it is free):
    // deriving it as error-count+1 would report 1 for EMPTY input,
    // indistinguishable from a genuine one-period series
    val nPeriods = sm.count()
    // grid-sized frame (≤ maxSteps rows): the partition-less window is
    // the documented calendar-bounded exception, not a scale hazard
    val w = Window.orderBy(col("period"))
    val err = sm
      .withColumn("_f", lag(col("smooth_x1e6"), 1).over(w))
      .withColumn("_fn", lag(col("n") * lit(1000000L), 1).over(w))
      .filter(col("_f").isNotNull)
      .select((col("n") * lit(1000000L) - col("_f")).as("_e"),
        (col("n") * lit(1000000L) - col("_fn")).as("_en"))
    val agg = err.agg(
      lit(nPeriods).as("n_periods"),
      int128Sum(abs(col("_e"))).as("_sae"),
      int128SumProd(col("_e"), col("_e")).as("_se2"),
      int128Sum(abs(col("_en"))).as("_saen"),
      count(lit(1)).as("_k"))
    // exact floor divisions (Fixed.ldiv — decimal-capable); the divisor
    // is the grid count, the one long-range-sensitive ratio (mase) gets
    // a decimal numerator so mae·10⁶ can't wrap
    val mae = Fixed.ldiv(col("_sae"), col("_k"))
    val maeN = Fixed.ldiv(col("_saen"), col("_k"))
    agg.select(col("n_periods"),
      when(col("_k") > 0L, mae).as("mae_x1e6"),
      when(col("_k") > 0L,
        // decimal floor (NOT the long-typed ldiv): the mean SQUARED
        // error can exceed long range; the scale-6 decimal quotient
        // floors exactly because the divisor is grid-sized (≤ maxSteps
        // ≪ 2e6, so the fractional part can never sit within the
        // HALF_UP rounding step of 1)
        floor(sqrt(floor(col("_se2") / col("_k")).cast("double")))
          .cast("long")).as("rmse_x1e6"),
      when(col("_k") > 0L, maeN).as("mae_naive_x1e6"),
      when(col("_k") > 0L && col("_saen") > 0L,
        Fixed.ldiv(mae.cast("decimal(38,0)") * lit(1000000L), maeN))
        .as("mase_x1e6"))
  }

  /** SEASONAL-RESIDUAL ANOMALY FLAGS — the robust outlier detector the
    * [[seasonalDecompose]] output exists for: a period is anomalous
    * when its |residual| exceeds `kX1e6` (micros) times the MAD-style
    * scale, where the scale is the LOWER MEDIAN of the non-null
    * |residual|s (the rank-⌊(cnt+1)/2⌋ order statistic — exact,
    * engine-portable, no interpolation). One ordered row per period
    * with a non-null residual: (`period`, `n`, `resid_x1e6`,
    * `mad_x1e6`, `anomaly`). A zero MAD (more than half the residuals
    * exactly 0) flags every non-zero residual — the conventional
    * degenerate-MAD behavior, documented not hidden.
    *
    * Exactness: residuals are the all-integer [[seasonalDecompose]]
    * output; the threshold compare is exact decimal (|r|·10⁶ vs
    * k·MAD — no doubles anywhere).
    *
    * Shape: everything after the decomposition runs on the
    * calendar-bounded period grid (the partition-less rank is the
    * documented grid-size exception); the MAD row broadcasts back. */
  def seasonalAnomaly(events: DataFrame, tsUsCol: String, periodUs: Long,
      kX1e6: Long, seasonLen: Int = 7, trendWindow: Int = 7): DataFrame = {
    require(kX1e6 > 0, s"kX1e6 must be positive, got $kX1e6")
    val dec = seasonalDecompose(events, tsUsCol, periodUs, seasonLen,
      trendWindow)
      .filter(col("resid_x1e6").isNotNull)
      .localCheckpoint(false) // feeds the MAD AND the output
    val ranked = dec.select(abs(col("resid_x1e6")).as("_ar"))
      .withColumn("_rn", row_number().over(
        Window.orderBy(col("_ar"))))
    val cnt = dec.count()
    val madRow = ranked.filter(col("_rn") === lit((cnt + 1L) / 2L))
      .select(col("_ar").as("mad_x1e6"))
    dec.crossJoin(broadcast(madRow))
      .select(col("period"), col("n"), col("resid_x1e6"), col("mad_x1e6"),
        (abs(col("resid_x1e6")).cast("decimal(38,0)") * lit(1000000L) >
          col("mad_x1e6").cast("decimal(38,0)") * lit(kX1e6))
          .as("anomaly"))
      .orderBy(col("period"))
  }

  /** The dense (period, n) grid as a DATAFRAME — the distributed twin
    * of [[denseSpine]] for the pair/lag operators whose math IS
    * associative (unlike the driver recurrences). */
  private def denseSpineDF(events: DataFrame, tsUsCol: String,
      periodUs: Long): DataFrame = {
    val period = Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val counts = events.select(period.as("period"))
      .groupBy(col("period")).agg(count(lit(1)).as("n"))
    counts.agg(min(col("period")).as("_lo"), max(col("period")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("period"))
      .join(counts, Seq("period"), "left")
      .select(col("period"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** AUTOCORRELATION FUNCTION of per-period activity, lags 1..`maxLag`
    * — the seasonality detector that tells you WHICH `seasonLen` to
    * hand [[seasonalDecompose]] (the lag-7 spike is the weekly cycle):
    * over the DENSE period spine (gaps count 0), with dᵢ = xᵢ·10⁶ − μ
    * and μ = ⌊Σxᵢ·10⁶ / N⌋,
    *   acf(k) = ⌊Σᵢ dᵢ·dᵢ₋ₖ · 10⁶ / Σᵢ dᵢ²⌋.
    * One row per lag that has ≥1 pair: (`lag`, `n_pairs`,
    * `acf_x1e6`), ordered; a constant series (zero variance) yields
    * NULL acf. acf ∈ [−10⁶, 10⁶] by Cauchy–Schwarz only at lag-full
    * overlap — the truncated-sum estimator can exceed it slightly;
    * values are the textbook non-normalized-per-lag form.
    *
    * Exactness: integers end-to-end — the mean is a single global
    * floor, deviation products ride [[graft.functions.Int128SumProd]]
    * (d can reach ±Σx·10⁶; products need 128 bits), and the final
    * ratio is one exact decimal floor division ([[Fixed.ldiv]] —
    * negative-capable). No doubles anywhere.
    *
    * Shape: fully DISTRIBUTED (the sums are associative — no driver
    * chain): one period-keyed count, a spine join, an `explode` of the
    * ≤`maxLag` shift values, one equi-join back on the shifted period,
    * and a lag-keyed aggregate; the (μ, Σd²) scalar row broadcasts.
    * Everything after the count runs at grid×maxLag size —
    * calendar-bounded, never data-sized. */
  def acf(events: DataFrame, tsUsCol: String, periodUs: Long,
      maxLag: Int): DataFrame = {
    import graft.functions.Int128SumProd.int128SumProd
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(maxLag >= 1 && maxLag <= 10000,
      s"maxLag must be in [1, 10000], got $maxLag")
    import graft.functions.Int128Sum.int128Sum
    val spine = denseSpineDF(events, tsUsCol, periodUs)
      .localCheckpoint(false) // feeds the scalar row AND both join sides
    // Σn rides the int128 aggregate and n·10⁶ is guarded LOUDLY — the
    // cusum silent-wrap class (total·10⁶ past long range) cannot recur
    // the overflow guard lives INSIDE the consumed column — a separate
    // guard column would be pruned away unevaluated
    val scalars = broadcast(spine
      .agg(count(lit(1)).as("_cnt"), int128Sum(col("n")).as("_sx"),
        max(col("n")).as("_mx"))
      .select(when(col("_mx") > lit(9223372036854L), raise_error(concat(
          lit("acf: a period count exceeds long micro range: "),
          col("_mx").cast("string"))).cast("long"))
        .otherwise(Fixed.ldiv(col("_sx") * lit(1000000L), col("_cnt")))
        .as("_mu")))
    val d = spine.crossJoin(scalars)
      .select(col("period"), (col("n") * 1000000L - col("_mu"))
        .as("_d"))
      .localCheckpoint(false) // base side, shifted side, and the Σd² row
    val den = broadcast(d.agg(
      int128SumProd(col("_d"), col("_d")).as("_den")))
    val shifted = d.select(explode(sequence(lit(1L),
        lit(maxLag.toLong))).as("lag"),
      (col("period")).as("_p0"), col("_d").as("_dlag"))
      .select(col("lag"), (col("_p0") + col("lag")).as("period"),
        col("_dlag"))
    d.join(shifted, Seq("period"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        int128SumProd(col("_d"), col("_dlag")).as("_num"))
      .crossJoin(den)
      .select(col("lag"), col("n_pairs"),
        when(col("_den") > 0,
          Fixed.ldiv(col("_num") * lit(1000000L), col("_den")))
          .as("acf_x1e6"))
      .orderBy(col("lag"))
  }

  /** THEIL–SEN robust trend line of per-period activity — the
    * outlier-proof alternative to OLS on the spine (one spiky day
    * drags a least-squares slope; the pairwise-slope median shrugs):
    * over the dense spine, slope = LOWER MEDIAN (rank ⌊(m+1)/2⌋ — the
    * exact engine-portable order statistic, no interpolation) of
    * `⌊(xⱼ−xᵢ)·10⁶ / (j−i)⌋` over all period pairs i<j, and
    * intercept = lower median of `xᵢ·10⁶ − slope·periodᵢ`. ONE row:
    * (`n_periods`, `n_pairs`, `slope_x1e6`, `intercept_x1e6`) — slope
    * in micro-events per period, intercept the level at period 0. A
    * spine with < 2 periods yields NULL slope/intercept.
    *
    * Exactness: integers end-to-end; both floors are [[Fixed.ldiv]]
    * (negative-capable — declining series).
    *
    * Shape: the all-pairs frame is GRID-bounded (`maxSteps` caps the
    * spine LOUDLY, so pairs ≤ maxSteps²/2 — a knob, not data; the
    * cross join never sees event rows) and both medians ride the
    * skew-safe [[graft.ops.Rank.globalRank]] range-exchange machinery
    * rather than a single-task global window. */
  def theilSen(events: DataFrame, tsUsCol: String, periodUs: Long,
      maxSteps: Int = 2000): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val spine = denseSpineDF(events, tsUsCol, periodUs)
      .localCheckpoint(false) // pair sides + intercept residuals
    val nPeriods = spine.count()
    require(nPeriods <= maxSteps,
      s"Theil-Sen grid has $nPeriods periods > maxSteps=$maxSteps" +
        " - coarsen periodUs or raise the cap (pairs are grid^2/2)")
    val a = spine.select(col("period").as("_pa"), col("n").as("_na"))
    val b = spine.select(col("period").as("_pb"), col("n").as("_nb"))
    val pairs = a.crossJoin(b).filter(col("_pa") < col("_pb"))
      .select(Fixed.ldiv((col("_nb") - col("_na")) * 1000000L,
        col("_pb") - col("_pa")).as("_slope"),
        col("_pa"), col("_pb"))
    val ranked = Rank.globalRank(pairs,
      Seq(col("_slope").asc, col("_pa").asc, col("_pb").asc), "_rk")
    val m = nPeriods * (nPeriods - 1L) / 2L
    val slopeRow = broadcast(ranked
      .filter(col("_rk") === lit((m + 1L) / 2L))
      .select(col("_slope").as("slope_x1e6")))
    val resid = spine.crossJoin(slopeRow)
      .select((col("n") * 1000000L -
        col("slope_x1e6") * col("period")).as("_ic"))
    val icRow = broadcast(Rank.globalRank(resid, Seq(col("_ic").asc), "_rk")
      .filter(col("_rk") === lit((nPeriods + 1L) / 2L))
      .select(col("_ic").as("intercept_x1e6")))
    val empty = nPeriods < 2
    spine.agg(count(lit(1)).as("n_periods"))
      .select(col("n_periods"), lit(m).as("n_pairs"))
      .join(if (empty) slopeRow else slopeRow.crossJoin(icRow),
        lit(!empty), "left")
      .select(col("n_periods"), col("n_pairs"),
        col("slope_x1e6"),
        (if (empty) lit(null).cast("long") else col("intercept_x1e6"))
          .as("intercept_x1e6"))
  }

  /** MANN–KENDALL TREND TEST — the nonparametric significance
    * companion to [[theilSen]] (Theil–Sen says HOW STEEP, Mann–Kendall
    * says WHETHER the monotone trend is real): over the dense spine,
    *   S = Σ_{i<j} sign(xⱼ − xᵢ),
    *   Var(S) = [N(N−1)(2N+5) − Σₜ t(t−1)(2t+5)] / 18 (tie-corrected;
    *   t = size of each tied-value group),
    *   z = (S∓1)/√Var(S) (continuity-corrected toward 0; z = 0 at
    *   S = 0, NULL when Var(S) = 0 — an all-tied series has no test).
    * ONE row: (`n_periods`, `s_stat`, `var_s_num18` = 18·Var(S) as an
    * exact integer, `z_x1e6` = ⌊z·10⁶⌋).
    *
    * Exactness: S and the variance numerator are exact longs; z is the
    * one double chain — divide, √, divide, all IEEE
    * correctly-rounded ops on exact integer inputs (the cosine/sqrt
    * discipline), so any engine replays the identical bits; the floor
    * to micros is the last step.
    *
    * Shape: the same grid-bounded pair frame as [[theilSen]] (LOUD
    * `maxSteps` cap); ties come from one value-keyed aggregate. */
  def mannKendall(events: DataFrame, tsUsCol: String, periodUs: Long,
      maxSteps: Int = 2000): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val spine = denseSpineDF(events, tsUsCol, periodUs)
      .localCheckpoint(false) // pair sides + the tie-group aggregate
    val nPeriods = spine.count()
    require(nPeriods <= maxSteps,
      s"Mann-Kendall grid has $nPeriods periods > maxSteps=$maxSteps" +
        " - coarsen periodUs or raise the cap (pairs are grid^2/2)")
    val a = spine.select(col("period").as("_pa"), col("n").as("_na"))
    val b = spine.select(col("period").as("_pb"), col("n").as("_nb"))
    val sRow = a.crossJoin(b).filter(col("_pa") < col("_pb"))
      .agg(coalesce(sum(signum(col("_nb") - col("_na")).cast("long")),
        lit(0L)).as("s_stat"))
    val tieRow = spine.groupBy(col("n"))
      .agg(count(lit(1)).as("_t"))
      .agg(coalesce(sum(col("_t") * (col("_t") - 1L) *
        (lit(2L) * col("_t") + 5L)), lit(0L)).as("_tie"))
    val np = lit(nPeriods)
    val z = {
      val varS = (col("var_s_num18").cast("double") / lit(18.0))
      val corr = when(col("s_stat") > 0, col("s_stat") - 1L)
        .when(col("s_stat") < 0, col("s_stat") + 1L).otherwise(lit(0L))
      when(col("var_s_num18") > 0,
        floor(corr.cast("double") / sqrt(varS) * lit(1e6)).cast("long"))
    }
    sRow.crossJoin(broadcast(tieRow))
      .select(np.as("n_periods"), col("s_stat"),
        (np * (np - 1L) * (lit(2L) * np + 5L) - col("_tie"))
          .as("var_s_num18"))
      .select(col("n_periods"), col("s_stat"), col("var_s_num18"),
        z.as("z_x1e6"))
  }

  /** KENDALL τ-b between per-period activity and a per-period metric
    * (count vs revenue: "do busy days also earn?") — the rank
    * correlation that [[graft.analytics.Regression]]'s Spearman
    * complements: over the dense spine with xₜ = count and
    * yₜ = Σ⌊metric·10⁶⌋ (gaps 0/0),
    *   τ_b = (C − D) / √((n₀−n₁)(n₀−n₂)),
    * C/D = concordant/discordant pairs, n₀ = n(n−1)/2, n₁/n₂ = tied
    * pairs within x/y value groups. ONE row: (`n_periods`, `n_pairs`,
    * `concordant`, `discordant`, `tau_b_x1e6`); NULL τ when either
    * margin is all-tied.
    *
    * Exactness: C, D and the tie terms are exact longs; τ is one IEEE
    * divide/√/multiply chain on them (C−D ≤ n₀ < 2⁵³ ⇒ the double
    * conversions are exact), floored to micros — the Mann–Kendall
    * discipline.
    *
    * Shape: the same LOUD `maxSteps`-capped grid pair frame as
    * [[theilSen]]; ties come from two value-keyed aggregates. */
  def kendallTau(events: DataFrame, tsUsCol: String, metricCol: String,
      periodUs: Long, maxSteps: Int = 2000): DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val period = Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val m = col(s"`$metricCol`").cast("double")
    val fin = when(!isnan(m) && abs(m) =!= lit(Double.PositiveInfinity), m)
    val counts = events
      .select(period.as("period"), floor(fin * lit(1e6)).as("_vm"))
      .groupBy(col("period"))
      .agg(count(lit(1)).as("x"),
        // int128 sum, loudly narrowed: a period's revenue micro total
        // past long range must fail, not wrap (the acf guard rule)
        int128Sum(coalesce(col("_vm"), lit(0L))).cast("long").as("y"))
    val spine = counts
      .agg(min(col("period")).as("_lo"), max(col("period")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("period"))
      .join(counts, Seq("period"), "left")
      .select(col("period"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint(false) // pair sides + both tie aggregates
    val nPeriods = spine.count()
    require(nPeriods <= maxSteps,
      s"Kendall grid has $nPeriods periods > maxSteps=$maxSteps" +
        " - coarsen periodUs or raise the cap (pairs are grid^2/2)")
    val a = spine.select(col("period").as("_pa"), col("x").as("_xa"),
      col("y").as("_ya"))
    val b = spine.select(col("period").as("_pb"), col("x").as("_xb"),
      col("y").as("_yb"))
    val prod = signum(col("_xb") - col("_xa")) *
      signum(col("_yb") - col("_ya"))
    val cd = a.crossJoin(b).filter(col("_pa") < col("_pb"))
      .agg(coalesce(sum(when(prod > 0, 1L)), lit(0L)).as("concordant"),
        coalesce(sum(when(prod < 0, 1L)), lit(0L)).as("discordant"))
    def tiePairs(c: String) = spine.groupBy(col(c))
      .agg(count(lit(1)).as("_t"))
      .agg(coalesce(sum(col("_t") * (col("_t") - 1L)), lit(0L))
        .as(s"_tie2_$c")) // 2× the tied-pair count (kept integral)
    val n02 = nPeriods * (nPeriods - 1L) // 2·n₀
    val tau = {
      val d1 = (lit(n02) - col("_tie2_x")).cast("double")
      val d2 = (lit(n02) - col("_tie2_y")).cast("double")
      when(col("_tie2_x") < n02 && col("_tie2_y") < n02,
        floor((col("concordant") - col("discordant")).cast("double") *
          lit(2.0) / sqrt(d1 * d2) * lit(1e6)).cast("long"))
    }
    cd.crossJoin(broadcast(tiePairs("x")))
      .crossJoin(broadcast(tiePairs("y")))
      .select(lit(nPeriods).as("n_periods"),
        lit(n02 / 2L).as("n_pairs"),
        col("concordant"), col("discordant"), tau.as("tau_b_x1e6"))
  }
}
