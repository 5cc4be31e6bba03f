package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Int128Sum.int128Sum
import graft.ops.Fixed.ldiv

/** Model/classifier EVALUATION over scored event or prediction logs —
  * the offline-eval pass of a training pipeline (score a heldout set,
  * compute ranking quality and probability calibration per segment).
  * Both operators are exact-fixed-point deterministic: every statistic
  * derives from integer ranks/counts (ties handled analytically), so a
  * DuckDB oracle reproduces them bit-for-bit. */
object Evaluation {

  /** AUC-ROC per group via the Mann–Whitney rank-sum identity:
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), with R⁺ the sum of the
    * positives' AVERAGE ranks under ascending score (ties share the
    * average of their positions — the analytically-correct tie
    * treatment, equal to the trapezoidal ROC area). One row per group:
    * `n_pos`, `n_neg`, `auc` rounded at 6; a group without both classes
    * yields NULL auc. Rows with NULL score or label drop.
    *
    * Exactness: a tie group spanning positions [a, b] has
    * 2·avgrank = a + b = 2·rank + count − 1, an INTEGER — so twice the
    * rank-sum accumulates exactly in [[graft.functions.Int128Sum]]
    * (2n² can pass a long at ~10¹⁰ rows) and doubles appear only in the
    * single closed-form division.
    *
    * Shape: one range exchange per group for the rank window (the tie
    * count rides the same partition), one map-side-combined aggregate. */
  def aucByGroup(df: DataFrame, groupCols: Seq[String], labelCol: Column,
      scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "aucByGroup needs at least one group column")
    val s = col(s"`$scoreCol`").cast("double")
    val base = df.filter(s.isNotNull && labelCol.isNotNull)
      .select(groupCols.map(c => col(s"`$c`")) ++ Seq(
        labelCol.cast("boolean").as("_y"), s.as("_s")): _*)
    val wRank = Window.partitionBy(groupCols.map(c => col(s"`$c`")): _*)
      .orderBy(col("_s").asc)
    val wTie = Window.partitionBy(
      (groupCols.map(c => col(s"`$c`")) :+ col("_s")): _*)
    val ranked = base
      .withColumn("_a", rank().over(wRank).cast("long"))
      .withColumn("_cnt", count(lit(1)).over(wTie))
      .withColumn("_r2", lit(2L) * col("_a") + col("_cnt") - lit(1L))
    val agg = ranked.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(count(when(col("_y"), lit(1))).as("n_pos"),
        count(when(!col("_y"), lit(1))).as("n_neg"),
        int128Sum(when(col("_y"), col("_r2"))).as("_rp2"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    agg.select(
      groupCols.map(c => col(s"`$c`")) ++ Seq(
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0, round(
          (col("_rp2").cast("double") - np * (np + 1.0))
            / (lit(2.0) * np * nn), 6)).as("auc")): _*)
  }

  /** CALIBRATION (reliability) TABLE over [0,1] scores — "when the
    * model says 0.7, does it happen 70% of the time?": equal-width bins
    * over the unit interval, one row per NON-EMPTY bin with `bin`
    * (0-based), `n`, `n_pos`, `mean_score_x1e6` (the bin's exact mean
    * predicted score in integer micro-units — floor-quantized per row,
    * int128-summed, floor-divided) and `pos_rate` rounded at 6. Plot
    * mean score vs pos_rate; the diagonal is perfect calibration. Rows
    * with NULL or out-of-[0,1] scores or NULL labels drop.
    *
    * Shape: one hash aggregate on the bin id — the 100 TB cost is the
    * scan. */
  def calibrationTable(df: DataFrame, labelCol: Column, scoreCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val s = col(s"`$scoreCol`").cast("double")
    val base = df.filter(s.isNotNull && labelCol.isNotNull &&
        s >= 0.0 && s <= 1.0)
      .select(labelCol.cast("boolean").as("_y"),
        // score exactly 1.0 belongs to the top bin, not a phantom one
        least(floor(s * lit(bins)), lit(bins - 1L)).as("_bin"),
        floor(s * lit(1e6)).as("_m"))
    base.groupBy(col("_bin").cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        count(when(col("_y"), lit(1))).as("n_pos"),
        int128Sum(col("_m")).as("_sm"))
      .select(col("bin"), col("n"), col("n_pos"),
        ldiv(col("_sm"), col("n")).as("mean_score_x1e6"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
  }
}
