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
    val total = steps.iterator.map(_.getLong(1)).sum
    val mu0 = if (steps.isEmpty) 0L
      else Math.floorDiv(total * 1000000L, steps.length.toLong)
    var (sp, sn) = (0L, 0L)
    val out = steps.map { r =>
      val (p, n) = (r.getLong(0), r.getLong(1))
      val x = n * 1000000L
      sp = math.max(0L, sp + (x - mu0 - kX1e6))
      sn = math.max(0L, sn + (mu0 - x - kX1e6))
      (p, n, sp, sn, sp > hX1e6 || sn > hX1e6)
    }
    out.toSeq.toDF("period", "n", "cusum_pos_x1e6", "cusum_neg_x1e6",
      "signal")
  }

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
}
