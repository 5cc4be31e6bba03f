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

  /** MIXTURE SPRT (always-valid p-value) — the SEQUENTIAL companion to
    * [[abTest]]'s fixed-horizon z: peeking at a z-test inflates false
    * positives, so experimentation platforms monitor the mixture
    * likelihood ratio instead (Robbins 1970; the "always-valid
    * inference" construction), which is a supermartingale under H₀ —
    * `p = min(1, 1/Λ)` is valid at EVERY look, not just a planned one.
    * For the two-proportion difference Δ̂ with estimated variance V and
    * a N(0, τ²) mixing prior over effects:
    * {{{
    *   Λ = √(V/(V+τ²)) · exp(Δ̂²·τ² / (2·V·(V+τ²)))
    * }}}
    * One row: `n_a`, `n_b`, `conv_a`, `conv_b`, `delta` (round 6),
    * `lambda` (round 6, NULL on an empty/degenerate arm or V = 0) and
    * `p_always_valid` (round 6). `tauSq` is the prior effect-size
    * variance knob (default 0.0001 = τ of one percentage point — the
    * conventional industrial setting).
    *
    * Shape: the [[abTest]] user aggregate + single-row math; the
    * 100 TB cost is the scan. Doubles only in the pinned final op
    * sequence, so both engines replay it. */
  def msprt(events: DataFrame, userCol: String, isB: Column,
      converted: Column, tauSq: Double = 0.0001): DataFrame = {
    require(tauSq > 0.0, s"tauSq must be positive, got $tauSq")
    val users = events
      .groupBy(col(userCol).as("_u"), isB.as("_b"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("_c"))
    val d = (c: Column) => c.cast("double")
    users.agg(
        coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
        coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"),
        coalesce(sum(when(!col("_b"), col("_c"))), lit(0L)).as("conv_a"),
        coalesce(sum(when(col("_b"), col("_c"))), lit(0L)).as("conv_b"))
      .withColumn("delta", when(col("n_a") > 0L && col("n_b") > 0L,
        round(d(col("conv_b")) / d(col("n_b"))
          - d(col("conv_a")) / d(col("n_a")), 6)))
      .withColumn("lambda", {
        val pool = d(col("conv_a") + col("conv_b")) /
          d(col("n_a") + col("n_b"))
        val v = pool * (lit(1.0) - pool) *
          (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))
        val dl = d(col("conv_b")) / d(col("n_b")) -
          d(col("conv_a")) / d(col("n_a"))
        when(col("n_a") > 0L && col("n_b") > 0L,
          when(v > 0.0, round(
            sqrt(v / (v + lit(tauSq))) *
              exp(dl * dl * lit(tauSq) /
                (lit(2.0) * v * (v + lit(tauSq)))), 6)))
      })
      .withColumn("p_always_valid", when(col("lambda").isNotNull,
        round(least(lit(1.0), lit(1.0) / col("lambda")), 6)))
      .select("n_a", "n_b", "conv_a", "conv_b", "delta", "lambda",
        "p_always_valid")
  }

  /** TWO-SAMPLE EVENT-RATE z-TEST — [[abTest]] compares CONVERSION
    * (did the user do it at all); this compares INTENSITY (events per
    * active user-day between arms — the engagement metric a conversion
    * test can't see). Exposure = distinct (user, day) active units per
    * arm; under the Poisson model for counts, Var(n/t) = n/t², so
    * z = (r_B − r_A) / √(n_A/t_A² + n_B/t_B²) — the standard
    * two-sample rate comparison. One row always: `n_a`, `t_a`, `n_b`,
    * `t_b`, exact `rate_a_x1e6`/`rate_b_x1e6`
    * (⌊10⁶·n/t⌋), `z_score` rounded at 6 (NULL when either arm has no
    * exposure; 0 when both arms are event-free) and `significant` at
    * |z| ≥ 1.96. NULL users drop (no exposure attribution).
    *
    * Shape: one distinct (arm, user, day) aggregate + one conditional
    * reduce to a single row — the 100 TB cost is the scan. */
  def rateTest(events: DataFrame, userCol: String, tsUsCol: String,
      isB: Column, periodUs: Long = 86400000000L): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val day = graft.ops.Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val d = (c: Column) => c.cast("double")
    val base = events.filter(col(userCol).isNotNull)
      .select(isB.as("_b"), col(userCol).as("_u"), day.as("_d"))
    val counts = base.agg(
      coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"))
    val expo = base.distinct().agg(
      coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("t_a"),
      coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("t_b"))
    counts.crossJoin(expo)
      .withColumn("rate_a_x1e6", when(col("t_a") > 0L,
        graft.ops.Fixed.ldiv(col("n_a") * lit(1000000L), col("t_a"))))
      .withColumn("rate_b_x1e6", when(col("t_b") > 0L,
        graft.ops.Fixed.ldiv(col("n_b") * lit(1000000L), col("t_b"))))
      // se lives inside the guard branch (ANSI division); both arms
      // event-free ⇒ se = 0 ⇒ z pinned to 0
      .withColumn("z_score", {
        val se = sqrt(d(col("n_a")) / (d(col("t_a")) * d(col("t_a")))
          + d(col("n_b")) / (d(col("t_b")) * d(col("t_b"))))
        when(col("t_a") > 0L && col("t_b") > 0L, round(
          when(se > 0.0,
            (d(col("n_b")) / d(col("t_b"))
              - d(col("n_a")) / d(col("t_a"))) / se)
            .otherwise(lit(0.0)), 6))
      })
      .withColumn("significant",
        when(col("z_score").isNotNull, abs(col("z_score")) >= 1.96))
      .select("n_a", "t_a", "n_b", "t_b", "rate_a_x1e6", "rate_b_x1e6",
        "z_score", "significant")
  }

  /** COVARIATE BALANCE TABLE (standardized mean differences) — the
    * table every causal readout shows FIRST ([[stratifiedAte]] adjusts
    * for confounding; this measures how much confounding there was to
    * adjust: arms that differ on pre-treatment covariates beyond
    * |SMD| ≈ 0.1 are not exchangeable without adjustment): one row per
    * covariate with `n_a`/`n_b`, the arm means, Cohen's-d-style
    * `smd = (m_B − m_A)/√((s²_A + s²_B)/2)` rounded at 6, and
    * `balanced` = |rounded smd| < 0.1 (the conventional line). NULL
    * smd/balanced when either arm has < 2 finite rows or both
    * variances are 0. Rows with NULL arm or non-finite covariate drop
    * PER COVARIATE (each covariate keeps its own complete cases).
    *
    * Exactness: covariates stack via one in-array explode (no
    * per-covariate scan), each quantizes once to micros with
    * [[welchTTest]]'s Int128 power-sum discipline, doubles only in
    * the final pinned chain.
    *
    * Shape: one explode (×|covariates|, a literal-bounded fan-out) +
    * one (covariate) conditional aggregate — the 100 TB cost is the
    * scan. Rows covariate-asc. */
  def covariateBalance(df: DataFrame, isB: Column,
      covariateCols: Seq[String]): DataFrame = {
    require(covariateCols.nonEmpty,
      "covariateBalance needs at least one covariate")
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    val stacked = df.filter(isB.isNotNull)
      .select(isB.cast("boolean").as("_b"),
        explode(array(covariateCols.map(c =>
          struct(lit(c).as("_cov"),
            col(s"`$c`").cast("double").as("_y"))): _*)).as("_s"))
      .select(col("_b"), col("_s._cov").as("_cov"), col("_s._y").as("_y"))
      .filter(col("_y").isNotNull && !isnan(col("_y")) &&
        abs(col("_y")) =!= lit(Double.PositiveInfinity))
      .select(col("_cov"), col("_b"), floor(col("_y") * lit(1e6)).as("_ym"))
    val agg = stacked.groupBy(col("_cov"))
      .agg(
        coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
        coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"),
        int128Sum(when(!col("_b"), col("_ym"))).as("_sa"),
        int128Sum(when(col("_b"), col("_ym"))).as("_sb"),
        int128SumProd(when(!col("_b"), col("_ym")).otherwise(lit(0L)),
          when(!col("_b"), col("_ym")).otherwise(lit(0L))).as("_qa"),
        int128SumProd(when(col("_b"), col("_ym")).otherwise(lit(0L)),
          when(col("_b"), col("_ym")).otherwise(lit(0L))).as("_qb"))
    def d(c: Column) = c.cast("double") / lit(1e6)
    def d12(c: Column) = c.cast("double") / lit(1e12)
    def nD(c: Column) = c.cast("double")
    def svar(n: Column, s: Column, q: Column) =
      (nD(n) * d12(q) - d(s) * d(s)) / (nD(n) * (nD(n) - 1.0))
    val (na, nb) = (col("n_a"), col("n_b"))
    val (ma, mb) = (d(col("_sa")) / nD(na), d(col("_sb")) / nD(nb))
    val sp2 = (svar(na, col("_sa"), col("_qa")) +
      svar(nb, col("_sb"), col("_qb"))) / 2.0
    val ok = na > 1L && nb > 1L && sp2 > 0.0
    agg.select(col("_cov").as("covariate"), na, nb,
        when(na > 0L, round(ma, 6)).as("mean_a"),
        when(nb > 0L, round(mb, 6)).as("mean_b"),
        when(ok, round((mb - ma) / sqrt(sp2), 6)).as("smd"))
      .withColumn("balanced",
        when(col("smd").isNotNull, abs(col("smd")) < 0.1))
      .orderBy(col("covariate"))
  }

  /** SIMPSON'S-PARADOX REVERSAL CHECK — the aggregation-integrity
    * screen for any segmented readout ([[abTest]] pools; [[metaEffect]]
    * pools with weights; this asks whether pooling FLIPS the sign —
    * the classic admissions/kidney-stone trap where every segment
    * favors A but the pool favors B because arms are unevenly
    * distributed over segments): one row per segment with the arm
    * counts, the conversion-rate difference
    * `diff_x1e6 = ⌊10⁶·(x_B·n_A − x_A·n_B)/(n_A·n_B)⌋`, the pooled
    * difference repeated (`pooled_diff_x1e6`), and `reversed` = this
    * segment's STRICT sign opposes the pool's strict sign (NULL when
    * either side of the comparison is undefined — a missing arm or a
    * zero difference asserts nothing). Any reversed = true row means
    * "do not quote the pooled number without a weighting argument."
    *
    * Exactness: signs come from the integer cross product
    * x_B·n_A − x_A·n_B — no division, no doubles anywhere; the micro
    * differences use [[graft.ops.Fixed.ldiv]] (decimal operands — no
    * overflow at any count). User-level conversion via the [[abTest]]
    * convention.
    *
    * Shape: one user aggregate, one (segment) conditional aggregate +
    * a 1-row pooled broadcast. Returns rows segment-asc. */
  def simpsonCheck(events: DataFrame, segmentCol: String,
      userCol: String, isB: Column, converted: Column): DataFrame = {
    val users = events
      .groupBy(col(s"`$segmentCol`").as("_g"), col(userCol).as("_u"),
        isB.as("_b"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("_c"))
    val seg = users.groupBy(col("_g"))
      .agg(
        coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
        coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"),
        coalesce(sum(when(!col("_b"), col("_c"))), lit(0L)).as("x_a"),
        coalesce(sum(when(col("_b"), col("_c"))), lit(0L)).as("x_b"))
    val pool = broadcast(seg.agg(
      sum(col("n_a")).as("_pna"), sum(col("n_b")).as("_pnb"),
      sum(col("x_a")).as("_pxa"), sum(col("x_b")).as("_pxb")))
    def dec(c: Column) = c.cast("decimal(38,0)")
    def cross(xb: Column, na: Column, xa: Column, nb: Column) =
      dec(xb) * dec(na) - dec(xa) * dec(nb)
    def diff(xb: Column, na: Column, xa: Column, nb: Column) =
      when(na > 0L && nb > 0L,
        graft.ops.Fixed.ldiv(cross(xb, na, xa, nb) * lit(1000000L),
          dec(na) * dec(nb)).cast("long"))
    val segCross = cross(col("x_b"), col("n_a"), col("x_a"), col("n_b"))
    val poolCross = cross(col("_pxb"), col("_pna"), col("_pxa"),
      col("_pnb"))
    seg.crossJoin(pool)
      .select(col("_g").as(segmentCol), col("n_a"), col("x_a"),
        col("n_b"), col("x_b"),
        diff(col("x_b"), col("n_a"), col("x_a"), col("n_b"))
          .as("diff_x1e6"),
        diff(col("_pxb"), col("_pna"), col("_pxa"), col("_pnb"))
          .as("pooled_diff_x1e6"),
        when(col("n_a") > 0L && col("n_b") > 0L &&
            col("_pna") > 0L && col("_pnb") > 0L &&
            segCross =!= 0 && poolCross =!= 0,
          (segCross > 0) =!= (poolCross > 0)).as("reversed"))
  }

  /** RISK RATIO / ODDS RATIO with log-normal CIs — the effect-SIZE
    * readout beside [[abTest]]'s significance z (a z-score says "not
    * chance"; RR = r_B/r_A and OR = odds_B/odds_A say "how big", in
    * the units epidemiology and growth teams quote): 95% intervals
    * via the delta method on the log scale,
    * ln RR ± 1.96·√(1/x_B − 1/n_B + 1/x_A − 1/n_A) and
    * ln OR ± 1.96·√(1/x_B + 1/(n_B−x_B) + 1/x_A + 1/(n_A−x_A)).
    * ONE row: (`n_a`, `x_a`, `n_b`, `x_b`, `rr`, `rr_lo`, `rr_hi`,
    * `odds_ratio`, `or_lo`, `or_hi`, rounded at 6). Any zero
    * contingency cell (no conversions, or full conversion, on either
    * arm) makes the log-scale se undefined → NULL readouts (the
    * standard add-0.5 correction is a modeling choice left to the
    * caller). User-level conversion via the [[abTest]] convention
    * (max over a user's rows; NULL-`isB` rows don't assign).
    *
    * Determinism: counts are exact; ratios/CIs are one pinned-order
    * double chain (ln/exp replay across engines — the corpus-stats
    * logprob precedent). Shape: one user aggregate + one conditional
    * reduction — a scalar readout at any scale. */
  def riskRatio(events: DataFrame, userCol: String, isB: Column,
      converted: Column): DataFrame = {
    val users = events
      .groupBy(col(userCol).as("_u"), isB.as("_b"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("_c"))
    val d = (c: Column) => c.cast("double")
    val agg = users.agg(
      coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"),
      coalesce(sum(when(!col("_b"), col("_c"))), lit(0L)).as("x_a"),
      coalesce(sum(when(col("_b"), col("_c"))), lit(0L)).as("x_b"))
    val cellsOk = col("x_a") > 0L && col("x_b") > 0L &&
      col("x_a") < col("n_a") && col("x_b") < col("n_b")
    def ci(logPoint: Column, se: Column, sign: Double) =
      when(cellsOk, round(exp(logPoint + lit(sign * 1.96) * se), 6))
    val lnRr = log((d(col("x_b")) / d(col("n_b"))) /
      (d(col("x_a")) / d(col("n_a"))))
    val seRr = sqrt(lit(1.0) / d(col("x_b")) - lit(1.0) / d(col("n_b"))
      + lit(1.0) / d(col("x_a")) - lit(1.0) / d(col("n_a")))
    val lnOr = log((d(col("x_b")) * d(col("n_a") - col("x_a"))) /
      (d(col("x_a")) * d(col("n_b") - col("x_b"))))
    val seOr = sqrt(lit(1.0) / d(col("x_b")) +
      lit(1.0) / d(col("n_b") - col("x_b")) +
      lit(1.0) / d(col("x_a")) +
      lit(1.0) / d(col("n_a") - col("x_a")))
    agg.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      when(cellsOk, round(exp(lnRr), 6)).as("rr"),
      ci(lnRr, seRr, -1.0).as("rr_lo"), ci(lnRr, seRr, 1.0).as("rr_hi"),
      when(cellsOk, round(exp(lnOr), 6)).as("odds_ratio"),
      ci(lnOr, seOr, -1.0).as("or_lo"), ci(lnOr, seOr, 1.0).as("or_hi"))
  }

  /** SAMPLE-RATIO-MISMATCH (SRM) CHECK — the assignment-integrity gate
    * that must pass before any readout from [[abTest]]/[[cuped]] is
    * trusted: if the observed variant split deviates from the designed
    * ratio more than chance allows, the bucketing itself is broken
    * (redirect loss, bot filtering skew, a crashed logger) and every
    * downstream metric is biased (Fabijan et al. 2019's "most useful
    * A/A alarm"). One-df chi-square goodness-of-fit of the per-USER
    * variant counts against the designed `ratioNumB/ratioDen` B-share.
    *
    * EXACT integer arithmetic end-to-end: with d = n_b·den − n·num,
    * {{{ χ² = d²·den / (n·num·(den−num)) }}}
    * (the two GOF terms share the same |observed−expected| mass, and
    * 1/num + 1/(den−num) = den/(num·(den−num))), floored to micros —
    * no doubles anywhere, any engine replays it bit-for-bit. The
    * `srm` flag fires at `critX1e6` (default 3841459 = χ²₁ critical
    * value 3.8414588… at α=.05, floored to micros).
    *
    * A user's variant is max(isB) over their rows (the [[abTest]] /
    * logRank convention — a mixed-variant user is ONE user, counted
    * once, in B); NULL-`isB` rows don't assign. ONE row: (`n_a`,
    * `n_b`, `expected_b_x1e6`, `chi2_x1e6`, `srm`) — NULL chi2/srm on
    * an empty log. Shape: one user-level aggregate + one 2-row
    * conditional aggregate + single-row decimal math. */
  def srmCheck(events: DataFrame, userCol: String, isB: Column,
      ratioNumB: Long = 1L, ratioDen: Long = 2L,
      critX1e6: Long = 3841459L): DataFrame = {
    require(ratioNumB > 0 && ratioNumB < ratioDen,
      s"designed B share must satisfy 0 < num < den, " +
        s"got $ratioNumB/$ratioDen")
    val users = events.filter(isB.isNotNull)
      .groupBy(col(userCol).as("_u"))
      .agg(max(isB.cast("boolean")).as("_b"))
    val counts = users.agg(
      coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val n = col("n_a") + col("n_b")
    val d = dec(col("n_b")) * lit(ratioDen) - dec(n) * lit(ratioNumB)
    counts
      .withColumn("expected_b_x1e6", when(n > 0L,
        graft.ops.Fixed.ldiv(n * lit(ratioNumB) * lit(1000000L),
          lit(ratioDen))))
      .withColumn("chi2_x1e6", when(n > 0L,
        graft.ops.Fixed.ldiv(d * d * lit(ratioDen) * lit(1000000L),
          dec(n) * lit(ratioNumB * (ratioDen - ratioNumB)))
          .cast("long")))
      .withColumn("srm",
        when(col("chi2_x1e6").isNotNull,
          col("chi2_x1e6") >= lit(critX1e6)))
  }

  /** CUPED (Controlled-experiment Using Pre-Experiment Data) — the
    * industry-standard variance-reduction adjustment for continuous
    * experiment metrics: with a pre-experiment covariate x correlated
    * with the metric y, the adjusted metric ŷ = y − θ·(x − x̄) has
    * variance (1 − ρ²)·var(y), tightening the same comparison without
    * touching the treatment effect (θ and x̄ are POOLED across variants,
    * so the adjustment is assignment-independent — the Deng et al. 2013
    * estimator). Input is a UNIT-level frame (one row per experiment
    * unit); rows with a NULL metric or covariate drop. Returns ONE row:
    * `n_a`, `n_b`, raw `mean_a`/`mean_b`, `adj_mean_a`/`adj_mean_b`,
    * `theta`, `var_reduction` (= ρ², the fraction of metric variance the
    * covariate removed), `diff`, `adj_diff` — means/θ/ρ²/diffs rounded
    * at 6. Zero covariate variance ⇒ NULL θ and adjusted values equal
    * the raw means; an empty variant ⇒ NULL for that side's columns.
    *
    * Exactness is the [[Regression.olsByGroup]] convention: unit values
    * quantized ONCE to exact 1e-6 fixed point, first moments via
    * [[graft.functions.Int128Sum]] and cross/second moments via
    * [[graft.functions.Int128SumProd]] over the same quantized micros,
    * doubles only in the fixed closed-form sequence. One aggregate over
    * the units — at any scale the cost is the unit-level scan. */
  def cuped(units: DataFrame, isB: Column, metricCol: String,
      covariateCol: String): DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    val y = col(s"`$metricCol`").cast("double")
    val x = col(s"`$covariateCol`").cast("double")
    // ONE quantization per value; second moments are exact int128
    // products of the quantized micros (1e-12 scale) — the welchTTest
    // consistency discipline, keeping varx·vary ≥ cov² by construction
    val base = units.filter(y.isNotNull && x.isNotNull)
      .select(isB.as("_b"),
        floor(y * lit(1e6)).as("_ym"), floor(x * lit(1e6)).as("_xm"))
    val agg = base.agg(
      coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"),
      int128Sum(when(!col("_b"), col("_ym"))).as("_sya"),
      int128Sum(when(col("_b"), col("_ym"))).as("_syb"),
      int128Sum(when(!col("_b"), col("_xm"))).as("_sxa"),
      int128Sum(when(col("_b"), col("_xm"))).as("_sxb"),
      int128SumProd(col("_xm"), col("_xm")).as("_sxx"),
      int128SumProd(col("_xm"), col("_ym")).as("_sxy"),
      int128SumProd(col("_ym"), col("_ym")).as("_syy"))
    def d(c: Column) = c.cast("double") / lit(1e6)
    def d12(c: Column) = c.cast("double") / lit(1e12)
    val n = (col("n_a") + col("n_b")).cast("double")
    val sx = d(col("_sxa") + col("_sxb"))
    val sy = d(col("_sya") + col("_syb"))
    val varx = n * d12(col("_sxx")) - sx * sx
    val vary = n * d12(col("_syy")) - sy * sy
    val cov = n * d12(col("_sxy")) - sx * sy
    val theta = cov / varx
    val xbar = sx / n
    def meanOf(s: Column, cnt: Column) = s.cast("double") / lit(1e6) /
      cnt.cast("double")
    val (ma, mb) = (meanOf(col("_sya"), col("n_a")),
      meanOf(col("_syb"), col("n_b")))
    val (xa, xb) = (meanOf(col("_sxa"), col("n_a")),
      meanOf(col("_sxb"), col("n_b")))
    def adj(m: Column, xm: Column) = m - theta * (xm - xbar)
    val hasA = col("n_a") > 0L
    val hasB = col("n_b") > 0L
    val hasVar = varx > 0.0
    agg.select(col("n_a"), col("n_b"),
      when(hasA, round(ma, 6)).as("mean_a"),
      when(hasB, round(mb, 6)).as("mean_b"),
      when(hasA, round(when(hasVar, adj(ma, xa)).otherwise(ma), 6))
        .as("adj_mean_a"),
      when(hasB, round(when(hasVar, adj(mb, xb)).otherwise(mb), 6))
        .as("adj_mean_b"),
      when(hasA && hasB && hasVar, round(theta, 6)).as("theta"),
      when(hasVar && vary > 0.0, round(cov * cov / (varx * vary), 6))
        .as("var_reduction"),
      when(hasA && hasB, round(mb - ma, 6)).as("diff"),
      when(hasA && hasB, round(
        when(hasVar, adj(mb, xb) - adj(ma, xa)).otherwise(mb - ma), 6))
        .as("adj_diff"))
  }

  /** WELCH'S t-TEST for CONTINUOUS metrics — the unequal-variance
    * companion to [[abTest]]'s two-proportion z (revenue per user,
    * session length, latency — anything that isn't a 0/1 conversion):
    * t = (ȳ_b − ȳ_a) / √(s²_a/n_a + s²_b/n_b) with the
    * Welch–Satterthwaite degrees of freedom. ONE output row:
    * (`n_a`, `n_b`, `mean_a`, `mean_b`, `var_a`, `var_b`, `t_stat`,
    * `df`, `significant`) — means/vars/t/df rounded at 6. A variant
    * with < 2 units has no sample variance ⇒ NULL t/df; both variances
    * zero ⇒ t NULL (no sampling noise to test against — the difference
    * is exact, not statistical). `significant` is the large-sample
    * |t| ≥ 1.96 line (the [[abTest]] convention; at the df this test
    * is used with, the t and normal quantiles agree to the decimals
    * reported).
    *
    * Exactness is the [[cuped]] convention: unit metrics quantized ONCE
    * to exact 1e-6 fixed point, first moments accumulated by
    * [[graft.functions.Int128Sum]] and second moments by
    * [[graft.functions.Int128SumProd]] over the SAME quantized micros
    * (so n·Σy² ≥ (Σy)² holds by construction — independent
    * re-quantization of y² can produce a negative sample variance on
    * near-constant data), doubles only in the fixed closed-form
    * sequence. One aggregate over the unit frame. */
  def welchTTest(units: DataFrame, isB: Column, metricCol: String)
      : DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    val y = col(s"`$metricCol`").cast("double")
    // ONE quantization: the second moment is Σ _ym·_ym (exact int128
    // per-row product at 1e-12 scale), derived from the SAME fixed-point
    // representation as the first — so n·Σy² ≥ (Σy)² holds by
    // construction (a second independent floor(y·y·1e6) can violate it
    // on near-constant data, yielding a negative sample variance)
    val base = units.filter(y.isNotNull && !isnan(y) &&
        abs(y) =!= lit(Double.PositiveInfinity))
      .select(isB.as("_b"), floor(y * lit(1e6)).as("_ym"))
    val agg = base.agg(
      coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"),
      int128Sum(when(!col("_b"), col("_ym"))).as("_sa"),
      int128Sum(when(col("_b"), col("_ym"))).as("_sb"),
      int128SumProd(when(!col("_b"), col("_ym")), col("_ym")).as("_qa"),
      int128SumProd(when(col("_b"), col("_ym")), col("_ym")).as("_qb"))
    def d(c: Column) = c.cast("double") / lit(1e6)
    def d12(c: Column) = c.cast("double") / lit(1e12)
    def nD(c: Column) = c.cast("double")
    // sample variance from exact power sums:
    // s² = (n·Σy² − (Σy)²) / (n·(n−1))
    def svar(n: Column, s: Column, q: Column) =
      (nD(n) * d12(q) - d(s) * d(s)) / (nD(n) * (nD(n) - 1.0))
    val (na, nb) = (col("n_a"), col("n_b"))
    val (ma, mb) = (d(col("_sa")) / nD(na), d(col("_sb")) / nD(nb))
    val (va, vb) = (svar(na, col("_sa"), col("_qa")),
      svar(nb, col("_sb"), col("_qb")))
    val (ra, rb) = (va / nD(na), vb / nD(nb))
    val se2 = ra + rb
    val tStat = (mb - ma) / sqrt(se2)
    val df = se2 * se2 /
      (ra * ra / (nD(na) - 1.0) + rb * rb / (nD(nb) - 1.0))
    val hasA = na > 0L
    val hasB = nb > 0L
    val testable = na > 1L && nb > 1L
    agg.select(na, nb,
      when(hasA, round(ma, 6)).as("mean_a"),
      when(hasB, round(mb, 6)).as("mean_b"),
      when(na > 1L, round(va, 6)).as("var_a"),
      when(nb > 1L, round(vb, 6)).as("var_b"),
      when(testable, when(se2 > 0.0, round(tStat, 6))).as("t_stat"),
      when(testable, when(se2 > 0.0, round(df, 6))).as("df"))
      .withColumn("significant",
        when(col("t_stat").isNotNull, abs(col("t_stat")) >= 1.96))
  }

  /** MANN–WHITNEY U TEST — the NONPARAMETRIC companion to
    * [[welchTTest]]: does variant B's metric stochastically dominate
    * A's, without assuming normality (heavy-tailed revenue, latency,
    * bounded scores)? Completes the two-sample family: Welch tests
    * means under normality, [[graft.analytics.Profiler.ksTest]] tests
    * whole-distribution equality, this tests rank shift.
    *
    * Statistic: U_b = W_b − n_b(n_b+1)/2 where W_b is B's rank sum with
    * AVERAGE ranks on ties; normal approximation
    * z = (U_b − n_a·n_b/2) / σ with the tie-corrected variance
    * σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1))) over tie-group sizes
    * t. ONE output row always: (`n_a`, `n_b`, `u_x2`, `z_score`,
    * `significant`) — `u_x2` is the EXACT integer 2·U_b (ties make U_b
    * a half-integer; doubling keeps it integral — the q_ks_test ×1e6
    * discipline), z rounded at 6, |z| ≥ 1.96 the conventional line.
    * An empty variant ⇒ NULL u/z; all values tied ⇒ σ² = 0 ⇒ NULL z
    * (no rank information). NULL/NaN/±Inf metric rows drop.
    *
    * Exactness: values quantize to 1e-6 fixed point (the [[welchTTest]]
    * convention) so both engines rank the SAME total order; rank sums
    * come from the tie-count identity 2·avgrank = 2·cum_total − t + 1
    * on the distinct-value table — every intermediate is an exact
    * decimal, and doubles enter only in the final closed-form z.
    *
    * Shape: one distinct-value aggregate, a two-pass range-partitioned
    * prefix sum over it ([[graft.ops.PrefixSum]] — for a continuous
    * metric the value table is ~unit-count-sized, so a global
    * running-sum window would funnel it through one task), then a
    * single-row aggregate. The final `u_x2` cast to long is
    * ANSI-checked: past |2U| = 2^63 (n_a·n_b ≈ 4.6e18 — a quintillion
    * comparisons) it fails loud rather than saturating. */
  def mannWhitneyU(units: DataFrame, isB: Column, metricCol: String)
      : DataFrame = {
    val y = col(s"`$metricCol`").cast("double")
    val base = units.filter(y.isNotNull && !isnan(y) &&
        abs(y) =!= lit(Double.PositiveInfinity))
      .select(isB.as("_b"), floor(y * lit(1e6)).as("_vm"))
    val vals = base.groupBy(col("_vm"))
      .agg(sum(when(!col("_b"), 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_b"), 1L).otherwise(0L)).as("_cb"),
        count(lit(1)).as("_t"))
    val cum = graft.ops.PrefixSum.runningSums(vals,
      Seq(col("_vm").asc), Seq("_t" -> "_ft"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    // 2·avgrank(v) = 2·cum_total(v) − t(v) + 1 (ranks of a tie group
    // straddle its cumulative span); Σ over B's members is 2·W_b
    val agg = cum.agg(
      coalesce(sum(col("_ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("_cb")), lit(0L)).as("n_b"),
      sum(dec(col("_cb")) *
        dec(lit(2L) * col("_ft") - col("_t") + lit(1L))).as("_wb2"),
      sum(dec(col("_t")) * dec(col("_t")) * dec(col("_t")) -
        dec(col("_t"))).as("_tt"))
    def d(c: Column) = c.cast("double")
    val n = col("n_a") + col("n_b")
    val u2 = col("_wb2") - dec(col("n_b")) * dec(col("n_b") + lit(1L))
    val mu2 = dec(col("n_a")) * dec(col("n_b"))
    val bothSides = col("n_a") > 0L && col("n_b") > 0L
    agg.select(col("n_a"), col("n_b"),
      when(bothSides, u2.cast("long")).as("u_x2"),
      // the σ² divisions live INSIDE the guard (the abTest ANSI
      // discipline); bothSides ⇒ n ≥ 2 ⇒ n(n−1) > 0
      when(bothSides, {
        val sig2 = d(col("n_a")) * d(col("n_b")) / lit(12.0) *
          ((d(n) + lit(1.0)) - d(col("_tt")) / (d(n) * (d(n) - lit(1.0))))
        when(sig2 > 0.0,
          round((d(u2) - d(mu2)) / (lit(2.0) * sqrt(sig2)), 6))
      }).as("z_score"))
      .withColumn("significant",
        when(col("z_score").isNotNull, abs(col("z_score")) >= 1.96))
  }

  /** CLIFF'S DELTA effect size — the magnitude companion to
    * [[mannWhitneyU]] (the z-score says whether B's values tend
    * higher; δ says by HOW MUCH, sample-size-free):
    *   δ = P(x_B > x_A) − P(x_B < x_A) = 2U_B/(n_A·n_B) − 1 ∈ [−1, 1],
    * with ties splitting as half-wins (exactly the average-rank U the
    * rank-sum identity already yields). ONE row: (`n_a`, `n_b`,
    * `u_x2`, `delta_x1e6`, `magnitude`) — the conventional Romano
    * et al. labels (|δ| < .147 negligible, < .33 small, < .474
    * medium, else large). An empty variant yields NULL δ/magnitude.
    *
    * Exactness: δ_x1e6 = ⌊(2U_B − n_A·n_B)·10⁶ / (n_A·n_B)⌋ — one
    * signed decimal floor over the exact integer 2U_B; the label
    * thresholds are exact micro compares. No doubles anywhere.
    *
    * Shape: [[mannWhitneyU]]'s value-table aggregate + single-row
    * math — nothing new reaches data size. */
  def cliffsDelta(units: DataFrame, isB: Column, metricCol: String)
      : DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val mw = mannWhitneyU(units, isB, metricCol)
    val nm = dec(col("n_a")) * dec(col("n_b"))
    val delta = graft.ops.Fixed.ldiv(
      (dec(col("u_x2")) - nm) * lit(1000000L), nm)
    val mag = abs(col("delta_x1e6"))
    mw.select(col("n_a"), col("n_b"), col("u_x2"),
        when(col("u_x2").isNotNull, delta).as("delta_x1e6"))
      .withColumn("magnitude",
        when(col("delta_x1e6").isNotNull,
          when(mag < 147000L, "negligible")
            .when(mag < 330000L, "small")
            .when(mag < 474000L, "medium")
            .otherwise("large")))
  }

  /** COHEN'S d effect size — the PARAMETRIC twin of [[cliffsDelta]]
    * (that one asks "how often does B beat A" on ranks; this asks "how
    * many pooled standard deviations apart are the means" — the
    * magnitude language power analyses and meta-analyses speak, and
    * the number [[powerMde]]'s MDE is quoted in): d = (mean_b −
    * mean_a) / s_p with the pooled SD s_p² = ((n_a−1)s_a² +
    * (n_b−1)s_b²) / (n_a+n_b−2), plus Hedges' g = J·d with the
    * small-sample bias factor J = 1 − 3/(4(n_a+n_b)−9). ONE output
    * row: (`n_a`, `n_b`, `d`, `g`, `magnitude`) — d and g rounded at
    * 6, the conventional |d| bands negligible < .2 ≤ small < .5 ≤
    * medium < .8 ≤ large; NULL d/g/magnitude when either arm has < 2
    * rows or the pooled variance is 0 (no spread to standardize by).
    *
    * Exactness: the [[welchTTest]] discipline verbatim — ONE 1e-6
    * quantization, second moments as exact int128 Σ_ym·_ym per-row
    * products (so the pooled variance is non-negative by
    * construction), doubles only in the final closed forms, and the
    * magnitude bands cut on the ROUNDED d so both engines band the
    * same number.
    *
    * Shape: one conditional aggregate (map-side combined) — a scalar
    * readout at any scale. */
  def cohenD(units: DataFrame, isB: Column, metricCol: String)
      : DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    val y = col(s"`$metricCol`").cast("double")
    val base = units.filter(y.isNotNull && !isnan(y) &&
        abs(y) =!= lit(Double.PositiveInfinity))
      .select(isB.as("_b"), floor(y * lit(1e6)).as("_ym"))
    val agg = base.agg(
      coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("n_b"),
      int128Sum(when(!col("_b"), col("_ym"))).as("_sa"),
      int128Sum(when(col("_b"), col("_ym"))).as("_sb"),
      int128SumProd(when(!col("_b"), col("_ym")), col("_ym")).as("_qa"),
      int128SumProd(when(col("_b"), col("_ym")), col("_ym")).as("_qb"))
    def d(c: Column) = c.cast("double") / lit(1e6)
    def d12(c: Column) = c.cast("double") / lit(1e12)
    def nD(c: Column) = c.cast("double")
    val (na, nb) = (col("n_a"), col("n_b"))
    val (ma, mb) = (d(col("_sa")) / nD(na), d(col("_sb")) / nD(nb))
    // (n−1)·s² = n·Σy² − (Σy)² over n — kept as the exact-ratio form
    def ssd(n: Column, s: Column, q: Column) =
      (nD(n) * d12(q) - d(s) * d(s)) / nD(n)
    val sp2 = (ssd(na, col("_sa"), col("_qa")) +
      ssd(nb, col("_sb"), col("_qb"))) / (nD(na) + nD(nb) - 2.0)
    val dStat = round((mb - ma) / sqrt(sp2), 6)
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * (nD(na) + nD(nb)) - 9.0)
    val ok = na > 1L && nb > 1L
    agg.select(na, nb,
      when(ok && sp2 > 0.0, dStat).as("d"),
      when(ok && sp2 > 0.0, round((mb - ma) / sqrt(sp2) * j, 6))
        .as("g"))
      .withColumn("magnitude",
        when(col("d").isNotNull,
          when(abs(col("d")) < 0.2, "negligible")
            .when(abs(col("d")) < 0.5, "small")
            .when(abs(col("d")) < 0.8, "medium")
            .otherwise("large")))
  }

  /** ONE-WAY ANOVA F statistic — the k-SAMPLE member of the test
    * family ([[welchTTest]]/[[mannWhitneyU]] compare two samples; this
    * asks whether ANY of k group means differ): F = (SSB/(k−1)) /
    * (SSW/(n−k)) from the between/within sum-of-squares decomposition.
    * ONE output row: (`k`, `n`, `ssb_c2`, `ssw_c2`, `f_stat`) — the
    * sums of squares in exact CENTI² units, F rounded at 6, NULL when
    * k < 2, n ≤ k, or SSW = 0 (no within-group noise to test against).
    *
    * Exactness: values quantize to 1e-2 fixed point (the gini
    * centi-unit convention — micro² squares would overflow the exact
    * range), per-group sums and sums-of-squares accumulate via
    * [[graft.functions.Int128Sum]], and the cross terms S²/n enter as
    * exact floored integers ([[graft.ops.Fixed.ldiv]]; numerators are
    * squares, so `//` parity holds) — doubles only in the final F.
    * The per-row square and the Σ(S_g²/n_g) long are ANSI-checked:
    * they fail loud past |value| ≈ 3e7 or ~1e9 rows per group rather
    * than saturating. NULL/NaN/±Inf values drop.
    *
    * Shape: one group aggregate (map-side combined) + one k-row
    * reduction. */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val v = col(s"`$valueCol`").cast("double")
    anovaCore(df.filter(v.isNotNull && !isnan(v) &&
        abs(v) =!= lit(Double.PositiveInfinity))
      .select(col(s"`$groupCol`").as("_g"),
        floor(v * lit(100.0)).as("_vc")))
  }

  /** The exact F decomposition over an already-centi-quantized
    * (`_g`, `_vc`) frame — shared by [[anovaF]] and [[brownForsythe]]
    * (re-deriving centi units from a double round-trip would slip on
    * non-representable hundredths). */
  private def anovaCore(base: DataFrame): DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    val groups = base.groupBy(col("_g"))
      .agg(count(lit(1)).as("_ng"),
        int128Sum(col("_vc")).as("_sg"),
        int128Sum(col("_vc") * col("_vc")).as("_qg"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val agg = groups.agg(
      count(lit(1)).as("k"),
      coalesce(sum(col("_ng")), lit(0L)).as("n"),
      sum(dec(col("_sg"))).as("_s"),
      sum(dec(col("_qg"))).as("_q"),
      sum(graft.ops.Fixed.ldiv(dec(col("_sg")) * dec(col("_sg")),
        col("_ng"))).as("_t"))
    def d(c: Column) = c.cast("double")
    val bothDf = col("k") >= 2L && col("n") > col("k")
    agg.select(col("k"), col("n"),
      when(bothDf, (col("_t") - graft.ops.Fixed.ldiv(
        col("_s") * col("_s"), col("n"))).cast("long")).as("ssb_c2"),
      when(bothDf, (col("_q") - col("_t")).cast("long")).as("ssw_c2"))
      .withColumn("f_stat",
        when(col("ssw_c2").isNotNull && col("ssw_c2") > 0L,
          round((d(col("ssb_c2")) / d(col("k") - lit(1L)))
            / (d(col("ssw_c2")) / d(col("n") - col("k"))), 6)))
  }

  /** BROWN–FORSYTHE (median-centered Levene) test W — the
    * VARIANCE-homogeneity member of the k-sample family ([[anovaF]]
    * asks whether any group MEAN differs; this asks whether any group
    * SPREAD differs — the equal-variance assumption anovaF itself
    * leans on): W = the one-way ANOVA F computed on the absolute
    * deviations z = |x − median_g| (median centering — Brown &
    * Forsythe 1974's robust form; mean centering is classic Levene).
    * ONE output row: (`k`, `n`, `ssb_z2`, `ssw_z2`, `w_stat`) — the
    * deviation sums of squares in exact DOUBLED-CENTI² units (see
    * below), W rounded at 6, NULL under [[anovaF]]'s degenerate
    * conditions (k < 2, n ≤ k, or all deviations equal within groups).
    *
    * Exactness: values quantize to centi fixed point; the per-group
    * median keeps the even-count middle PAIR as an exact sum (lo+hi,
    * = 2·mid when n is odd), so each deviation enters as the integer
    * |2·x_c − (lo+hi)| — doubled centi units, no half-unit doubles
    * anywhere. Doubling scales SSB and SSW by the same factor 4, so W
    * is untouched and the whole decomposition rides [[anovaCore]]'s
    * exact Int128 path.
    *
    * Shape: per-(group, value) distinct table + ONE
    * [[graft.ops.PrefixSum]] range exchange ordered (group, value) —
    * per-group cumulative counts are the global running count minus a
    * k-row exclusive group offset, so the median scan never funnels a
    * data-sized column through one task (a continuous column's
    * distinct table is ~row count — the [[graft.analytics.Profiler]]
    * KS-test posture) — then a k-row broadcast join back and the
    * shared F aggregate. */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val v = col(s"`$valueCol`").cast("double")
    val base = df.filter(v.isNotNull && !isnan(v) &&
        abs(v) =!= lit(Double.PositiveInfinity))
      .select(col(s"`$groupCol`").as("_g"),
        floor(v * lit(100.0)).as("_vc"))
      .localCheckpoint(false) // feeds the value table AND the join
    val vals = base.groupBy(col("_g"), col("_vc"))
      .agg(count(lit(1)).as("_t"))
    val cum = graft.ops.PrefixSum.runningSums(vals,
      Seq(col("_g").asc, col("_vc").asc), Seq("_t" -> "_ft"))
    // k-row exclusive offsets: rows of groups strictly before g in the
    // SAME (g, value) total order (group-count-sized window, like the
    // step/bucket grids elsewhere)
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("_g").asc)
    val offs = vals.groupBy(col("_g")).agg(sum(col("_t")).as("_ng"))
      .withColumn("_off",
        coalesce(sum(col("_ng")).over(wOff) - col("_ng"), lit(0L)))
    // rank r lives at the first value whose in-group cumulative ≥ r;
    // lower/upper middle ranks (n+1)/2 and (n+2)/2 coincide when n odd
    val cg = col("_ft") - col("_off")
    val meds = cum.join(broadcast(offs), Seq("_g"))
      .groupBy(col("_g"))
      .agg(min(when(cg >= graft.ops.Fixed.ldiv(
          col("_ng") + lit(1L), lit(2L)), col("_vc"))).as("_lo"),
        min(when(cg >= graft.ops.Fixed.ldiv(
          col("_ng") + lit(2L), lit(2L)), col("_vc"))).as("_hi"))
      .select(col("_g"), (col("_lo") + col("_hi")).as("_dm"))
    anovaCore(base.join(broadcast(meds), Seq("_g"))
      .select(col("_g"),
        abs(lit(2L) * col("_vc") - col("_dm")).as("_vc")))
      .withColumnsRenamed(Map("ssb_c2" -> "ssb_z2",
        "ssw_c2" -> "ssw_z2", "f_stat" -> "w_stat"))
  }

  /** KRUSKAL–WALLIS H test — the NONPARAMETRIC k-sample twin of
    * [[anovaF]] (rank-based, no normality assumption; reduces to
    * [[mannWhitneyU]] at k = 2): H = 12/(n(n+1)) · Σ_g R_g²/n_g −
    * 3(n+1) over pooled average ranks, divided by the tie correction
    * 1 − Σ(t³−t)/(n³−n). ONE output row: (`k`, `n`, `h_stat` rounded
    * at 6) — NULL when k < 2 or every value is tied (no rank
    * information). NULL/NaN/±Inf values drop.
    *
    * Exactness: pooled doubled average ranks via the
    * 2·avgrank = 2·cum − t + 1 identity on the micro-quantized
    * distinct-value table ([[mannWhitneyU]]'s PrefixSum discipline);
    * per-group rank sums are exact decimals, and the Σ R_g²/n_g cross
    * term enters as Σ⌊S_g²/n_g⌋/4 with the floor taken EXACTLY in
    * decimal ((S² − S² mod n)/n is an exact integer division — no long
    * overflow at any n), so both engines replay it; doubles only in
    * the final H.
    *
    * Shape: one distinct-value aggregate + PrefixSum range exchange +
    * one hash join back + one group aggregate + a k-row reduction. */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val v = col(s"`$valueCol`").cast("double")
    val base = df.filter(v.isNotNull && !isnan(v) &&
        abs(v) =!= lit(Double.PositiveInfinity))
      .select(col(s"`$groupCol`").as("_g"),
        floor(v * lit(1e6)).as("_vm"))
      .localCheckpoint(false) // feeds the value table AND the join
    val vals = base.groupBy(col("_vm")).agg(count(lit(1)).as("_t"))
    val ranked = graft.ops.PrefixSum.runningSums(vals,
        Seq(col("_vm").asc), Seq("_t" -> "_ft"))
      .select(col("_vm"),
        (lit(2L) * col("_ft") - col("_t") + lit(1L)).as("_r2"))
    import graft.functions.Int128Sum.int128Sum
    val groups = base.join(ranked, Seq("_vm"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_ng"), int128Sum(col("_r2")).as("_sg"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    // exact ⌊S²/n⌋ in DECIMAL: (S² − S² mod n)/n divides exactly, so
    // the decimal division is an exact integer at any scale — the long
    // ldiv would overflow past ~1e9 pooled rows
    val sq = dec(col("_sg")) * dec(col("_sg"))
    val term = ((sq - pmod(sq, dec(col("_ng")))) / dec(col("_ng")))
      .cast("decimal(38,0)")
    val tieTerm = vals.agg(coalesce(
      sum(dec(col("_t")) * dec(col("_t")) * dec(col("_t")) -
        dec(col("_t"))), dec(lit(0L))).as("_tt"))
    val agg = groups.agg(
        count(lit(1)).as("k"),
        coalesce(sum(col("_ng")), lit(0L)).as("n"),
        sum(term).as("_x"))
      .crossJoin(broadcast(tieTerm))
    def d(c: Column) = c.cast("double")
    val n = d(col("n"))
    agg.select(col("k"), col("n"),
      when(col("k") >= 2L && col("n") > col("k"), {
        // Σ R²/n = X/4 (ranks are halves of the doubled ranks), so
        // 12/(n(n+1)) · X/4 = 3X/(n(n+1))
        val h = lit(3.0) * d(col("_x")) / (n * (n + lit(1.0))) -
          lit(3.0) * (n + lit(1.0))
        val corr = lit(1.0) - d(col("_tt")) / (n * n * n - n)
        when(corr > 0.0, round(h / corr, 6))
      }).as("h_stat"))
  }

  /** BENJAMINI–HOCHBERG FDR correction — the multiple-testing layer
    * over the per-test family ([[abTest]]/[[welchTTest]]/
    * [[mannWhitneyU]] readouts across many metrics × segments): testing
    * 200 hypotheses at α = .05 expects 10 false positives; BH step-up
    * controls the FALSE DISCOVERY RATE instead of the per-test error.
    * One row per test: (`test_id`, `p_x1e6`, `rank`, `p_adj_x1e6`,
    * `reject`) ordered by rank, where
    * p_adj(i) = min(1, min_{j ≥ i} m·p_(j)/j) over the p-ascending
    * ranking and reject ⇔ p_adj ≤ α — the standard step-up decision.
    *
    * Exactness: p quantizes to 1e-6 fixed point; ties in p break on
    * `test_id` so the ranking is a reproducible TOTAL order; each
    * m·p/j term enters as the exact floored micro integer
    * ([[graft.ops.Fixed.ldiv]] — DuckDB's `//`), so the whole output is
    * integers + booleans, no doubles at all. The m·p product is
    * ANSI-checked: past m·10⁶ = 2^63 (~9e12 simultaneous tests) it
    * fails loud. Rows with NULL/NaN p or p outside [0,1] drop.
    *
    * Shape: ranks via [[graft.ops.PrefixSum.runningSums]] over the
    * p-ascending order and the step-up envelope via
    * [[graft.ops.PrefixSum.runningMins]] over the reversed order — two
    * range exchanges on the same key, never a single-task global
    * window; m broadcasts from a one-row aggregate. */
  def bhCorrect(tests: DataFrame, testIdCol: String, pCol: String,
      alphaX1e6: Long = 50000L): DataFrame = {
    require(alphaX1e6 >= 0L && alphaX1e6 <= 1000000L,
      s"alphaX1e6 must be a micro-probability in [0, 1e6], got $alphaX1e6")
    val p = col(s"`$pCol`").cast("double")
    val base = tests.filter(p.isNotNull && !isnan(p) &&
        p >= 0.0 && p <= 1.0)
      .select(col(s"`$testIdCol`").as("test_id"),
        floor(p * lit(1e6)).as("p_x1e6"), lit(1L).as("_one"))
    val ranked = graft.ops.PrefixSum.runningSums(base,
      Seq(col("p_x1e6").asc, col("test_id").asc), Seq("_one" -> "_rk"))
    val tot = broadcast(base.agg(count(lit(1)).as("_m")))
    val withC = ranked.crossJoin(tot)
      .withColumn("_c",
        graft.ops.Fixed.ldiv(col("_m") * col("p_x1e6"), col("_rk")))
    graft.ops.PrefixSum.runningMins(withC,
        Seq(col("p_x1e6").desc, col("test_id").desc), Seq("_c" -> "_sfx"))
      .select(col("test_id"), col("p_x1e6"), col("_rk").as("rank"),
        least(col("_sfx"), lit(1000000L)).as("p_adj_x1e6"))
      .withColumn("reject", col("p_adj_x1e6") <= lit(alphaX1e6))
      .orderBy(col("rank"))
  }

  /** POISSON-BOOTSTRAP percentile CI for a mean — the
    * distribution-free uncertainty interval the closed-form tests
    * can't give (heavy-tailed revenue, ratio metrics): each of
    * `replicas` resamples draws every row with an independent
    * Poisson(1)-distributed multiplicity (the streaming-friendly
    * bootstrap — no global resample pass, one weight per (row,
    * replica)), and the CI is the 2.5 %/97.5 % order statistics of the
    * replicate means. ONE output row: (`n`, `mean_x1e6`,
    * `n_replicas`, `ci_lo_x1e6`, `ci_hi_x1e6`).
    *
    * Determinism: the multiplicity is the Poisson(1) inverse CDF
    * looked up at the [[replicateSums]] affine replicate hash — ONE md5
    * per row, pairwise-independent uniforms per (row, replica), every
    * constant independently re-derivable from md5 by any engine (the
    * `q_stable_split` hash-seeded discipline; keys must be unique for
    * independent weights). Replicate means are exact floored micros
    * (Σw·v rides [[graft.functions.BootstrapSums]] — exact or LOUD,
    * never a wrap); CI bounds are the rank-⌈0.025·R⌉ / rank-⌈0.975·R⌉
    * order statistics — no interpolation, no doubles anywhere.
    *
    * Shape: the replica axis never becomes data rows — per row the
    * weight VECTOR (R longs) feeds an element-wise vector-sum
    * aggregate, so the whole bootstrap is ONE scan + one 2R-long
    * partial per partition (measured ~6× over the explode-then-groupBy
    * form at sf0.1); the R-row replicate table exploded from the
    * single aggregate row rides a bounded-knob rank. */
  def bootstrapCi(df: DataFrame, keyCol: String, metricCol: String,
      replicas: Int = 200): DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    require(replicas >= 40,
      s"replicas must be >= 40 (percentile CI needs tail mass), " +
        s"got $replicas")
    val y = col(s"`$metricCol`").cast("double")
    val base = df.filter(y.isNotNull && !isnan(y) &&
        abs(y) =!= lit(Double.PositiveInfinity))
      .select(col(s"`$keyCol`").cast("string").as("_k"),
        floor(y * lit(1e6)).as("_vm"))
      .withColumn("_dig", md5(concat(lit("boot:k:"), col("_k"))))
      .select(col("_vm"),
        conv(substring(col("_dig"), 1, 10), 16, 10).cast("long")
          .as("_h1"),
        conv(substring(col("_dig"), 11, 10), 16, 10).cast("long")
          .as("_h2"))
    val aggRow = base
      .agg(count(lit(1)).as("n"),
        graft.ops.Fixed.ldiv(int128Sum(col("_vm")), count(lit(1)))
          .as("mean_x1e6"),
        replicateSums("boot:", replicas, col("_vm")).as("_s"))
      .localCheckpoint(false) // feeds the point row AND the CI explode
    val point = aggRow.select(col("n"), col("mean_x1e6"))
    val reps = aggRow
      .select(explode(zip_with(col("_s.swv"), col("_s.sw"),
        (x, z) => struct(x.as("swv"), z.as("sw")))).as("_z"))
      .filter(col("_z.sw") > 0L)
      .select(graft.ops.Fixed.ldiv(col("_z.swv"), col("_z.sw"))
        .as("_rm"))
    // R-row table: the single-partition rank is bounded by the knob
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_rm"))
    val ci = reps
      .withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
      .agg(
        max(when(col("_rn") === graft.ops.Fixed.ldiv(
          col("_cnt") * 25L + 999L, lit(1000L)), col("_rm")))
          .as("ci_lo_x1e6"),
        max(when(col("_rn") === graft.ops.Fixed.ldiv(
          col("_cnt") * 975L + 999L, lit(1000L)), col("_rm")))
          .as("ci_hi_x1e6"),
        count(lit(1)).as("n_replicas"))
    point.crossJoin(ci)
      .select(col("n"), col("mean_x1e6"), col("n_replicas"),
        col("ci_lo_x1e6"), col("ci_hi_x1e6"))
  }

  /** Modulus of the affine replicate hash — the largest prime below
    * 2²⁰: coefficients live in [0, P), row slices in [0, 2⁴⁰), so
    * a·h ≤ 2⁶⁰ and the affine form never leaves long range. */
  private val BootP = 1048573L

  /** Poisson(1) inverse-CDF thresholds at the P scale (⌊CDF_k·P⌋,
    * k = 0..6; multiplicities cap at 7 — the bootstrapCi contract). */
  private val bootThresholds = Array(385748L, 771496L, 964371L,
    1028662L, 1044735L, 1047949L, 1048485L)

  /** Replica coefficient: the 40-bit head of md5("<seed><tag>:<r>")
    * mod P — DRIVER-computed here, but re-derivable verbatim by any
    * engine with md5 (`('0x' || substr(md5(seed || tag || ':' || r),
    * 1, 10))::BIGINT % 1048573` in DuckDB), so the oracle carries no
    * constant table that could drift. */
  private def affineCoeff(seed: String, tag: String, r: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed$tag:$r"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 10), 16) % BootP
  }

  /** The per-replica (Σw·v, Σw) struct for seed-scoped affine
    * bootstrap weights — a thin wrapper over the fused
    * [[graft.functions.BootstrapSums]] aggregate: replica r's weight
    * is the Poisson(1) inverse-CDF bucket of
    * u_r = (a_r·h₁ + b_r·h₂ + c_r) mod P, with (h₁, h₂) the row's
    * 40-bit md5 slices (columns `_h1`/`_h2` of the caller's frame) and
    * (a, b, c) md5-derived per-replica coefficients ([[affineCoeff]]
    * — 3R digests TOTAL, not per row). The affine family is
    * 2-universal: pairwise-independent uniforms across rows within
    * every replica and across replicas for every row — the moments
    * bootstrap variance rests on, at ONE md5 per row (the
    * R-digests-per-row form measured ~15 s at sf0.1; this measures
    * well under a second of weight work). u is EXACTLY uniform on
    * [0, P) (c_r alone guarantees it); P and the ⌊CDF·P⌋ thresholds
    * are shared literals any engine replays. */
  private def replicateSums(seed: String, replicas: Int,
      vm: Column): Column =
    graft.functions.BootstrapSums.bootstrapSums(
      col("_h1"), col("_h2"), vm,
      (1 to replicas).map(affineCoeff(seed, "a", _)),
      (1 to replicas).map(affineCoeff(seed, "b", _)),
      (1 to replicas).map(affineCoeff(seed, "c", _)),
      BootP, bootThresholds.toSeq)

  /** POISSON-BOOTSTRAP percentile CI for the DIFFERENCE of means
    * (B − A) — the uncertainty interval on an experiment's uplift that
    * [[welchTTest]]'s normal approximation can't give on heavy-tailed
    * metrics: each replica draws one Poisson(1) weight per row (the
    * [[bootstrapCi]] machinery, seed `"uplift:"`), computes BOTH
    * variants' weighted means, and contributes their difference;
    * replicas where either variant draws zero total weight drop (no
    * mean to difference). ONE row: (`n_a`, `n_b`, `mean_a_x1e6`,
    * `mean_b_x1e6`, `uplift_x1e6` = mean_b − mean_a, `n_replicas`,
    * `ci_lo_x1e6`, `ci_hi_x1e6`). Rows with NULL/NaN/Inf metric or
    * NULL `isB` drop; an empty variant yields NULL means/uplift/CI.
    *
    * Determinism/exactness: the [[bootstrapCi]] discipline end-to-end
    * — the [[replicateSums]] affine replicate hash (one md5 per row),
    * exact floored-micro means ([[graft.functions.BootstrapSums]] —
    * exact or loud), CI bounds as exact order statistics of the
    * replicate differences. No doubles anywhere.
    *
    * Shape: identical to [[bootstrapCi]] — the replica axis stays a
    * COLUMN into four conditional vector-sum aggregates of one scan;
    * the R-row replicate table rides a bounded-knob rank. */
  def bootstrapUpliftCi(df: DataFrame, keyCol: String, isB: Column,
      metricCol: String, replicas: Int = 200): DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    require(replicas >= 40,
      s"replicas must be >= 40 (percentile CI needs tail mass), " +
        s"got $replicas")
    val y = col(s"`$metricCol`").cast("double")
    val base = df.filter(y.isNotNull && !isnan(y) &&
        abs(y) =!= lit(Double.PositiveInfinity) && isB.isNotNull)
      .select(col(s"`$keyCol`").cast("string").as("_k"),
        isB.cast("boolean").as("_b"), floor(y * lit(1e6)).as("_vm"))
      .withColumn("_dig", md5(concat(lit("uplift:k:"), col("_k"))))
      .select(col("_b"), col("_vm"),
        conv(substring(col("_dig"), 1, 10), 16, 10).cast("long")
          .as("_h1"),
        conv(substring(col("_dig"), 11, 10), 16, 10).cast("long")
          .as("_h2"))
    val ldiv = graft.ops.Fixed.ldiv _
    // per-variant replicate sums: NULL-masked vm skips the row inside
    // the fused aggregate (its SQL-SUM null contract)
    val aggRow = base
      .agg(
        count(when(!col("_b"), lit(1))).as("n_a"),
        count(when(col("_b"), lit(1))).as("n_b"),
        int128Sum(when(!col("_b"), col("_vm")).otherwise(lit(0L)))
          .as("_sa"),
        int128Sum(when(col("_b"), col("_vm")).otherwise(lit(0L)))
          .as("_sb"),
        replicateSums("uplift:", replicas,
          when(!col("_b"), col("_vm"))).as("_ra"),
        replicateSums("uplift:", replicas,
          when(col("_b"), col("_vm"))).as("_rb"))
      .localCheckpoint(false) // feeds the point row AND the CI explode
    val point = aggRow
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0, ldiv(col("_sa"), col("n_a")))
          .as("mean_a_x1e6"),
        when(col("n_b") > 0, ldiv(col("_sb"), col("n_b")))
          .as("mean_b_x1e6"))
      .withColumn("uplift_x1e6",
        col("mean_b_x1e6") - col("mean_a_x1e6"))
    val reps = aggRow
      .select(explode(zip_with(
        zip_with(col("_ra.swv"), col("_ra.sw"),
          (x, z) => struct(x.as("swv"), z.as("sw"))),
        zip_with(col("_rb.swv"), col("_rb.sw"),
          (x, z) => struct(x.as("swv"), z.as("sw"))),
        (p, q) => struct(p.as("a"), q.as("b")))).as("_z"))
      .filter(col("_z.a.sw") > 0L && col("_z.b.sw") > 0L)
      .select((ldiv(col("_z.b.swv"), col("_z.b.sw")) -
        ldiv(col("_z.a.swv"), col("_z.a.sw"))).as("_rm"))
    // R-row table: the single-partition rank is bounded by the knob
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_rm"))
    val ci = reps
      .withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
      .agg(
        max(when(col("_rn") === graft.ops.Fixed.ldiv(
          col("_cnt") * 25L + 999L, lit(1000L)), col("_rm")))
          .as("ci_lo_x1e6"),
        max(when(col("_rn") === graft.ops.Fixed.ldiv(
          col("_cnt") * 975L + 999L, lit(1000L)), col("_rm")))
          .as("ci_hi_x1e6"),
        count(lit(1)).as("n_replicas"))
    point.crossJoin(ci)
      .select(col("n_a"), col("n_b"), col("mean_a_x1e6"),
        col("mean_b_x1e6"), col("uplift_x1e6"), col("n_replicas"),
        col("ci_lo_x1e6"), col("ci_hi_x1e6"))
  }

  /** Normal quantiles for the supported α (two-sided) and power
    * levels — shortest-round-trip double literals both engines consume
    * verbatim (the driver-literal discipline; an engine-side inverse
    * normal would diverge in the last ulp). Public so the declared
    * query can embed the SAME literals in its oracle SQL. */
  val zAlpha: Map[Long, Double] = Map(
    10000L -> 2.5758293035489004, // α = .01
    50000L -> 1.9599639845400545, // α = .05
    100000L -> 1.6448536269514722) // α = .10
  val zPower: Map[Long, Double] = Map(
    800000L -> 0.8416212335729143, // power = .80
    900000L -> 1.2815515655446004, // power = .90
    950000L -> 1.6448536269514722) // power = .95

  /** EXPERIMENT POWER / MDE READOUT for a conversion metric — the
    * pre-test sizing question ("how long must this A/B run?") answered
    * from the observed baseline: with p the quantized baseline rate,
    * n_arm = ⌊N/2⌋ the per-arm size of an equal split, and
    * z = z_{α/2} + z_{power},
    *   mde_abs = z·√(2p(1−p)/n_arm) — the absolute rate lift the
    *   CURRENT sample can detect,
    *   n_required_per_arm = ⌈2p(1−p)·z²/δ²⌉ with δ = relMde·p — the
    *   per-arm size needed to detect a `relMdeX1e6` relative lift.
    * ONE row: (`n_units`, `n_conv`, `p_x1e6`, `n_per_arm`,
    * `mde_abs_x1e6`, `delta_x1e6`, `n_required_per_arm`). NULL
    * mde/n_required when the quantity is undefined (empty input,
    * δ = 0).
    *
    * Exactness: p and δ are exact floored micros; the double chain
    * consumes the QUANTIZED p (the [[welchTTest]] discipline — both
    * engines share the same integer inputs) and the driver-literal z
    * sums/squares, in a fixed left-associated operation order, so
    * every IEEE step is correctly rounded on identical inputs.
    *
    * Shape: one conditional aggregate — the 100 TB cost is the scan. */
  def powerMde(units: DataFrame, convCol: Column,
      relMdeX1e6: Long = 100000L, alphaX1e6: Long = 50000L,
      powerX1e6: Long = 800000L): DataFrame = {
    require(relMdeX1e6 > 0, s"relMdeX1e6 must be > 0, got $relMdeX1e6")
    require(zAlpha.contains(alphaX1e6),
      s"alphaX1e6 must be one of ${zAlpha.keys.toSeq.sorted}, " +
        s"got $alphaX1e6")
    require(zPower.contains(powerX1e6),
      s"powerX1e6 must be one of ${zPower.keys.toSeq.sorted}, " +
        s"got $powerX1e6")
    val zsum = zAlpha(alphaX1e6) + zPower(powerX1e6)
    val zsq = zsum * zsum
    val ldiv = graft.ops.Fixed.ldiv _
    val agg = units.filter(convCol.isNotNull)
      .agg(count(lit(1)).as("n_units"),
        count(when(convCol.cast("boolean"), lit(1))).as("n_conv"))
      .select(col("n_units"), col("n_conv"),
        when(col("n_units") > 0,
          ldiv(col("n_conv") * lit(1000000L), col("n_units")))
          .as("p_x1e6"),
        ldiv(col("n_units"), lit(2L)).as("n_per_arm"))
    val pd = col("p_x1e6").cast("double") / lit(1e6)
    val s2 = lit(2.0) * pd * (lit(1.0) - pd)
    agg
      .withColumn("mde_abs_x1e6",
        when(col("n_per_arm") > 0,
          floor(lit(zsum) * sqrt(s2 / col("n_per_arm").cast("double"))
            * lit(1e6)).cast("long")))
      .withColumn("delta_x1e6",
        ldiv(lit(relMdeX1e6) * col("p_x1e6"), lit(1000000L)))
      .withColumn("n_required_per_arm", {
        val d = col("delta_x1e6").cast("double") / lit(1e6)
        when(col("delta_x1e6") > 0,
          ceil(s2 * lit(zsq) / (d * d)).cast("long"))
      })
  }

  /** FIXED-EFFECT META-ANALYSIS across segments — the rollup layer of
    * the test family ([[welchTTest]] reads ONE experiment;
    * [[bhCorrect]] controls many TESTS; this POOLS many segment-level
    * effects of the SAME metric into one estimate and asks whether
    * the segments even agree): per segment the Welch effect
    * θ_i = m_B − m_A with se²_i = s²_A/n_A + s²_B/n_B; the pooled
    * effect is the inverse-variance mean θ̂ = Σw_iθ_i/Σw_i (w = 1/se²),
    * heterogeneity is Cochran's Q = Σw_i(θ_i − θ̂)² and
    * I² = max(0, (Q − (k−1))/Q) — the standard "is one number even
    * meaningful" readout — plus the RANDOM-EFFECTS pair: DerSimonian–
    * Laird τ² = max(0, (Q − (k−1))/(Σw − Σw²/Σw)) and the re-weighted
    * (w* = 1/(se² + τ²)) pooled `theta_re`/`se_re` (≡ FE when the
    * segments agree, wider when they don't). ONE row: (`k`,
    * `theta_fe`, `se_fe`, `q_stat`, `i2`, `tau2`, `theta_re`,
    * `se_re`, rounded at 6) over the k segments with BOTH arms
    * ≥ 2 rows and positive se² (others carry no effect estimate);
    * NULL readouts when k = 0, and NULL `i2` when Q = 0 or k = 1.
    *
    * Exactness: per-segment power sums are exact
    * ([[welchTTest]]'s one-quantization Int128 discipline); every
    * cross-segment sum quantizes its per-segment double term to
    * floored micros FIRST (Σ⌊w·10⁶⌋, Σ⌊wθ·10⁶⌋, Σ⌊w(θ−θ̂)²·10⁶⌋) so
    * the k-fold sums are order-free integers — a double Σ over
    * segments would be partition-order-dependent. Like
    * [[graft.analytics.Regression.olsByGroup]], floor(double)→long
    * saturates past ±2⁶³ (a ~zero-variance segment makes w explode);
    * the caller owns that range.
    *
    * Shape: one (segment, arm) conditional aggregate (k rows), then
    * three k-row reductions (Q needs θ̂, the RE pass needs τ² — 1-row
    * broadcasts). The 100 TB cost is the scan. */
  def metaEffect(df: DataFrame, segmentCols: Seq[String], isB: Column,
      metricCol: String): DataFrame = {
    require(segmentCols.nonEmpty, "metaEffect needs segment columns")
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    val y = col(s"`$metricCol`").cast("double")
    val gs = segmentCols.map(c => col(s"`$c`"))
    val base = df.filter(y.isNotNull && !isnan(y) &&
        abs(y) =!= lit(Double.PositiveInfinity) && isB.isNotNull)
      .select(gs :+ isB.cast("boolean").as("_b") :+
        floor(y * lit(1e6)).as("_ym"): _*)
    val seg = base.groupBy(gs: _*)
      .agg(
        coalesce(sum(when(!col("_b"), 1L)), lit(0L)).as("_na"),
        coalesce(sum(when(col("_b"), 1L)), lit(0L)).as("_nb"),
        int128Sum(when(!col("_b"), col("_ym"))).as("_sa"),
        int128Sum(when(col("_b"), col("_ym"))).as("_sb"),
        int128SumProd(when(!col("_b"), col("_ym")).otherwise(lit(0L)),
          when(!col("_b"), col("_ym")).otherwise(lit(0L))).as("_qa"),
        int128SumProd(when(col("_b"), col("_ym")).otherwise(lit(0L)),
          when(col("_b"), col("_ym")).otherwise(lit(0L))).as("_qb"))
    def d(c: Column) = c.cast("double") / lit(1e6)
    def d12(c: Column) = c.cast("double") / lit(1e12)
    def nD(c: Column) = c.cast("double")
    def svar(n: Column, s: Column, q: Column) =
      (nD(n) * d12(q) - d(s) * d(s)) / (nD(n) * (nD(n) - 1.0))
    val theta = d(col("_sb")) / nD(col("_nb")) -
      d(col("_sa")) / nD(col("_na"))
    val se2 = svar(col("_na"), col("_sa"), col("_qa")) / nD(col("_na")) +
      svar(col("_nb"), col("_sb"), col("_qb")) / nD(col("_nb"))
    val ok = col("_na") > 1L && col("_nb") > 1L && se2 > 0.0
    val terms = seg.filter(ok)
      .select(theta.as("_th"), se2.as("_s2"), (lit(1.0) / se2).as("_w"))
      .select(col("_th"), col("_s2"), col("_w"),
        floor(col("_w") * lit(1e6)).as("_tw"),
        floor(col("_w") * col("_th") * lit(1e6)).as("_twt"),
        floor(col("_w") * col("_w") * lit(1e6)).as("_tw2"))
      .localCheckpoint(eager = false) // feeds all three reductions
    val first = terms.agg(count(lit(1)).as("k"),
      coalesce(sum(col("_tw").cast("decimal(38,0)")), lit(0L)
        .cast("decimal(38,0)")).as("_swm"),
      coalesce(sum(col("_twt").cast("decimal(38,0)")), lit(0L)
        .cast("decimal(38,0)")).as("_swtm"),
      coalesce(sum(col("_tw2").cast("decimal(38,0)")), lit(0L)
        .cast("decimal(38,0)")).as("_sw2m"))
    // ANSI divide raises on a zero divisor even for doubles, and this
    // column exists before the k>0 gate — guard the empty-panel case
    val withHat = first
      .withColumn("_that", when(col("_swm") =!= 0,
        col("_swtm").cast("double") / col("_swm").cast("double")))
    val q = terms.crossJoin(broadcast(withHat.select(col("_that"))))
      .agg(coalesce(sum(floor(col("_w") *
          (col("_th") - col("_that")) * (col("_th") - col("_that")) *
          lit(1e6)).cast("decimal(38,0)")),
        lit(0L).cast("decimal(38,0)")).as("_qm"))
    // DerSimonian–Laird: τ² = max(0, (Q − (k−1)) / (Σw − Σw²/Σw));
    // a third pass re-weights by w* = 1/(se² + τ²). k ≤ 1 or a
    // non-positive moment denominator pins τ² = 0 (RE ≡ FE there).
    val scalars = withHat.crossJoin(broadcast(q))
      .withColumn("_tau2", {
        val sw = col("_swm").cast("double") / lit(1e6)
        val sw2 = col("_sw2m").cast("double") / lit(1e6)
        val den = sw - sw2 / sw
        when(col("k") > 1L && col("_swm") =!= 0 && den > 0.0,
          greatest((col("_qm").cast("double") / lit(1e6) -
            nD(col("k") - lit(1L))) / den, lit(0.0)))
          .otherwise(lit(0.0))
      })
    val re = terms.crossJoin(broadcast(scalars.select(col("_tau2"))))
      .agg(
        coalesce(sum(floor(lit(1.0) / (col("_s2") + col("_tau2")) *
          lit(1e6)).cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("_srw"),
        coalesce(sum(floor(col("_th") / (col("_s2") + col("_tau2")) *
          lit(1e6)).cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("_srwt"))
    scalars.crossJoin(broadcast(re))
      .select(col("k"),
        when(col("k") > 0L, round(col("_that"), 6)).as("theta_fe"),
        when(col("k") > 0L && col("_swm") =!= 0, round(
          sqrt(lit(1e6) / col("_swm").cast("double")), 6)).as("se_fe"),
        when(col("k") > 0L, round(
          col("_qm").cast("double") / lit(1e6), 6)).as("q_stat"),
        when(col("k") > 1L && col("_qm") > 0L, round(
          greatest((col("_qm").cast("double") / lit(1e6) -
            nD(col("k") - lit(1L))) /
            (col("_qm").cast("double") / lit(1e6)), lit(0.0)), 6))
          .as("i2"),
        when(col("k") > 0L, round(col("_tau2"), 6)).as("tau2"),
        when(col("k") > 0L && col("_srw") =!= 0, round(
          col("_srwt").cast("double") / col("_srw").cast("double"), 6))
          .as("theta_re"),
        when(col("k") > 0L && col("_srw") =!= 0, round(
          sqrt(lit(1e6) / col("_srw").cast("double")), 6)).as("se_re"))
  }

  /** PROPENSITY-STRATIFIED ATE — the observational-causal member of
    * the family ([[abTest]]/[[cuped]] assume randomized assignment;
    * [[diffInDiff]] leans on parallel trends; this one adjusts for
    * measured confounding by comparing arms only WITHIN strata of a
    * propensity/confounder score — Rosenbaum & Rubin's
    * subclassification): rows stratify into `buckets` score-quantile
    * bands and each stratum contributes
    * `ate_term_x1e6 = ⌊10⁶·(n_b/N)·(ȳ_T,b − ȳ_C,b)⌋`; Σ terms is the
    * stratified ATE. One row per stratum: (`stratum`, `n_t`, `n_c`,
    * `mean_t`, `mean_c` rounded at 6, `ate_term_x1e6`) — a stratum
    * missing an arm yields NULL means for that arm and a NULL term
    * (the positivity violation made visible instead of silently
    * imputed). Rows with NULL score/arm or non-finite outcome drop.
    *
    * Strata are VALUE bands, not rank bands: every row of one
    * (micro-quantized) score value lands in the stratum of that
    * value's starting rank, `⌊start·B/N⌋` — bands are
    * near-equal-sized yet never split a tied score, so outcome sums
    * stay exact with no per-row tie convention (the
    * [[graft.analytics.Evaluation.liftTable]] overlap machinery is
    * unnecessary here because whole values move together).
    *
    * Exactness: outcomes quantize once to micros
    * ([[graft.functions.Int128Sum]] sums); the term is one
    * pinned-order double expression over exact integers, floored to
    * micros so the ATE total is an order-free integer sum.
    *
    * Shape: one (score, arm) hash aggregate, ONE
    * [[graft.ops.PrefixSum]] range exchange over the distinct-score
    * table (the continuous-score q_ks_test posture), a hash join
    * back, and a B-row final aggregate. */
  def stratifiedAte(df: DataFrame, treatCol: Column, scoreCol: String,
      outcomeCol: String, buckets: Int = 5): DataFrame = {
    require(buckets >= 2, s"stratifiedAte needs >= 2 buckets, got $buckets")
    import graft.functions.Int128Sum.int128Sum
    val ldiv = graft.ops.Fixed.ldiv _
    val s = col(s"`$scoreCol`").cast("double")
    val y = col(s"`$outcomeCol`").cast("double")
    val base = df.filter(s.isNotNull && treatCol.isNotNull &&
        y.isNotNull && !isnan(y) &&
        abs(y) =!= lit(Double.PositiveInfinity))
      .select(floor(s * lit(1e6)).as("_q"),
        treatCol.cast("boolean").as("_w"), floor(y * lit(1e6)).as("_ym"))
    val runs = base.groupBy(col("_q"), col("_w"))
      .agg(count(lit(1)).as("_t"), int128Sum(col("_ym")).as("_s"))
      .localCheckpoint(eager = false) // feeds the value table AND join
    val vals = runs.groupBy(col("_q")).agg(sum(col("_t")).as("_vt"))
    val cum = graft.ops.PrefixSum.runningSums(vals, Seq(col("_q").asc),
      Seq("_vt" -> "_ft"))
    val tot = broadcast(base.agg(count(lit(1)).as("_n")))
    val strat = cum.crossJoin(tot)
      .select(col("_q"), col("_n"),
        ldiv((col("_ft") - col("_vt")) * lit(buckets.toLong), col("_n"))
          .as("stratum"))
    val agg = runs.join(strat, Seq("_q"))
      .groupBy(col("stratum"))
      .agg(max(col("_n")).as("_n"),
        sum(when(col("_w"), col("_t")).otherwise(0L)).as("n_t"),
        sum(when(!col("_w"), col("_t")).otherwise(0L)).as("n_c"),
        sum(when(col("_w"), col("_s").cast("decimal(38,0)"))).as("_st"),
        sum(when(!col("_w"), col("_s").cast("decimal(38,0)"))).as("_sc"))
    def mean(sm: Column, n: Column) =
      sm.cast("double") / lit(1e6) / n.cast("double")
    val both = col("n_t") > 0L && col("n_c") > 0L
    agg.select(col("stratum"), col("n_t"), col("n_c"),
      when(col("n_t") > 0L, round(mean(col("_st"), col("n_t")), 6))
        .as("mean_t"),
      when(col("n_c") > 0L, round(mean(col("_sc"), col("n_c")), 6))
        .as("mean_c"),
      when(both, floor((col("n_t") + col("n_c")).cast("double") /
        col("_n").cast("double") *
        (mean(col("_st"), col("n_t")) - mean(col("_sc"), col("n_c"))) *
        lit(1e6)).cast("long")).as("ate_term_x1e6"))
  }

  /** DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator for
    * when assignment wasn't randomized but a pre-period exists
    * (feature launched to segment B at time T: did B's metric move
    * MORE than A's?):
    *   DiD = (ȳ_B,post − ȳ_B,pre) − (ȳ_A,post − ȳ_A,pre),
    *   z = DiD / √(Σ_cells s²_cell/n_cell)
    * (the standard two-period two-group form; parallel-trends is the
    * caller's identifying assumption). ONE row: per-cell counts and
    * exact floored-micro means, `did_x1e6` (exact arithmetic of the
    * quantized cell means), and `z_x1e6` (NULL unless every cell has
    * n ≥ 2 and positive pooled variance). Rows with NULL/NaN/Inf
    * metric or NULL `isB`/`isPost` drop.
    *
    * Exactness: the [[welchTTest]] discipline — one quantization per
    * value, second moments as [[graft.functions.Int128SumProd]] of the
    * SAME micros (cell variance ≥ 0 by construction), doubles only in
    * the fixed left-associated closed-form chain.
    *
    * Shape: ONE conditional aggregate (12 cell sums) — the 100 TB cost
    * is the scan. */
  def diffInDiff(df: DataFrame, isB: Column, isPost: Column,
      metricCol: String): DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    val y = col(s"`$metricCol`").cast("double")
    val ldiv = graft.ops.Fixed.ldiv _
    val base = df.filter(y.isNotNull && !isnan(y) &&
        abs(y) =!= lit(Double.PositiveInfinity) &&
        isB.isNotNull && isPost.isNotNull)
      .select(isB.cast("boolean").as("_b"),
        isPost.cast("boolean").as("_p"), floor(y * lit(1e6)).as("_vm"))
    val cells = Seq("a_pre" -> (!col("_b") && !col("_p")),
      "a_post" -> (!col("_b") && col("_p")),
      "b_pre" -> (col("_b") && !col("_p")),
      "b_post" -> (col("_b") && col("_p")))
    val aggCols = cells.flatMap { case (nm, cond) => Seq(
      count(when(cond, lit(1))).as(s"n_$nm"),
      int128Sum(when(cond, col("_vm"))).as(s"_s_$nm"),
      int128SumProd(when(cond, col("_vm")).otherwise(lit(0L)),
        when(cond, col("_vm")).otherwise(lit(0L))).as(s"_q_$nm")) }
    val agg = base.agg(aggCols.head, aggCols.tail: _*)
    def mean(nm: String) = when(col(s"n_$nm") > 0,
      ldiv(col(s"_s_$nm"), col(s"n_$nm")))
    val withMeans = agg.select(
      cells.map { case (nm, _) => col(s"n_$nm") } ++
        cells.map { case (nm, _) => mean(nm).as(s"mean_${nm}_x1e6") } ++
        cells.flatMap { case (nm, _) =>
          Seq(col(s"_s_$nm"), col(s"_q_$nm")) }: _*)
    // variance of each cell mean from the same quantized micros:
    // (n·Σy² − (Σy)²) / 10¹² / (n²·(n−1))
    def vMean(nm: String): Column = {
      val dn = col(s"n_$nm").cast("double")
      val ds = col(s"_s_$nm").cast("double")
      val dq = col(s"_q_$nm").cast("double")
      (dn * dq - ds * ds) / lit(1e12) / (dn * dn * (dn - lit(1.0)))
    }
    val did = (col("mean_b_post_x1e6") - col("mean_b_pre_x1e6")) -
      (col("mean_a_post_x1e6") - col("mean_a_pre_x1e6"))
    val allCells = cells.map { case (nm, _) => col(s"n_$nm") > 1L }
      .reduce(_ && _)
    val out = withMeans
      .withColumn("did_x1e6", did)
      .withColumn("z_x1e6", when(allCells, {
        val se2 = vMean("a_pre") + vMean("a_post") +
          vMean("b_pre") + vMean("b_post")
        when(se2 > 0.0,
          floor(col("did_x1e6").cast("double") / lit(1e6) /
            sqrt(se2) * lit(1e6)).cast("long"))
      }))
    out.select(cells.map { case (nm, _) => col(s"n_$nm") } ++
      cells.map { case (nm, _) => col(s"mean_${nm}_x1e6") } ++
      Seq(col("did_x1e6"), col("z_x1e6")): _*)
  }
}
