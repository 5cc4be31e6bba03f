package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment analysis over an event log — the A/B readout that sits on
  * top of the funnel/retention family: did variant B convert better
  * than variant A, and is the difference real?
  *
  * Two-proportion z-test with pooled variance,
  * {{{ z = (p_b − p_a) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) }}}
  * where p̂ pools both variants. Counts are exact integers from the
  * log; doubles enter only in the final arithmetic as a FIXED sequence
  * of correctly-rounded ops from those integers (the q_stats_agg
  * portability argument), rounded to 6 decimals. |z| ≥ 1.96 ⇒ p < .05
  * two-sided — the conventional significance line, reported as a flag
  * so dashboards don't re-derive it.
  */
object Experiment {

  /** Per-variant user conversion + the pairwise z-test, ALWAYS exactly
    * one output row — an all-one-variant log yields zero counts and
    * NULL rate/z for the missing side rather than an empty frame.
    * Columns: (`n_a`, `n_b`, `conv_a`, `conv_b`, `rate_a`, `rate_b`,
    * `z_score`, `significant`). A USER converts if ANY of their rows satisfies
    * `converted` (exposure = appearing in the log at all); users are
    * deduplicated per variant, so event volume doesn't bias rates. A
    * user appearing in both variants (a bucketing bug) counts in each —
    * run the assignment-integrity check separately ([[Profiler]] tools).
    *
    * `isB` splits variants (true = B). Shape: one user-level aggregate
    * (max of the converted flag per user) + one 2-row variant aggregate
    * + single-row math. */
  def abTest(events: DataFrame, userCol: String, isB: Column,
      converted: Column): DataFrame = {
    val users = events
      .groupBy(col(userCol).as("_u"), isB.as("_b"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("_c"))
    // ONE conditional aggregation to a single row (never a crossJoin of
    // possibly-empty variant frames — an all-one-variant log must yield
    // one explicit zero/NULL row, not silently vanish)
    val d = (c: Column) => c.cast("double")
    users.agg(
        coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
        coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"),
        coalesce(sum(when(!col("_b"), col("_c"))), lit(0L)).as("conv_a"),
        coalesce(sum(when(col("_b"), col("_c"))), lit(0L)).as("conv_b"))
      .withColumn("rate_a",
        when(col("n_a") > 0L, round(d(col("conv_a")) / d(col("n_a")), 6)))
      .withColumn("rate_b",
        when(col("n_b") > 0L, round(d(col("conv_b")) / d(col("n_b")), 6)))
      // z is undefined (NULL) with an empty variant; exactly 0 when both
      // sides exist but pooled variance is 0 (all or none convert). The
      // pooled/se expressions live INSIDE the guard branch: ANSI mode
      // raises DIVIDE_BY_ZERO even for doubles, and when() evaluates
      // branches conditionally
      .withColumn("z_score", {
        val pool = d(col("conv_a") + col("conv_b")) /
          d(col("n_a") + col("n_b"))
        val se = sqrt(pool * (lit(1.0) - pool)
          * (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
        when(col("n_a") > 0L && col("n_b") > 0L, round(
          when(se > 0.0,
            (d(col("conv_b")) / d(col("n_b"))
              - d(col("conv_a")) / d(col("n_a"))) / se)
            .otherwise(lit(0.0)), 6))
      })
      .withColumn("significant",
        when(col("z_score").isNotNull, abs(col("z_score")) >= 1.96))
      .select("n_a", "n_b", "conv_a", "conv_b", "rate_a", "rate_b",
        "z_score", "significant")
  }
}
