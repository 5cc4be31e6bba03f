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

  /** Per-variant user conversion + the pairwise z-test, one output row:
    * (`n_a`, `n_b`, `conv_a`, `conv_b`, `rate_a`, `rate_b`, `z_score`,
    * `significant`). A USER converts if ANY of their rows satisfies
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
    val variants = users.groupBy(col("_b"))
      .agg(count(lit(1)).as("n"), sum(col("_c")).as("conv"))
    val a = variants.filter(!col("_b"))
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = variants.filter(col("_b"))
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    val d = (c: Column) => c.cast("double")
    a.crossJoin(b)
      .withColumn("rate_a", round(d(col("conv_a")) / d(col("n_a")), 6))
      .withColumn("rate_b", round(d(col("conv_b")) / d(col("n_b")), 6))
      .withColumn("_p",
        d(col("conv_a") + col("conv_b")) / d(col("n_a") + col("n_b")))
      .withColumn("_se", sqrt(col("_p") * (lit(1.0) - col("_p"))
        * (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))))
      .withColumn("z_score", round(
        when(col("_se") > 0.0,
          (d(col("conv_b")) / d(col("n_b"))
            - d(col("conv_a")) / d(col("n_a"))) / col("_se"))
          .otherwise(lit(0.0)), 6))
      .withColumn("significant", abs(col("z_score")) >= 1.96)
      .select("n_a", "n_b", "conv_a", "conv_b", "rate_a", "rate_b",
        "z_score", "significant")
  }
}
