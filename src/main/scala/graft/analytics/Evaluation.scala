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

  /** AVERAGE PRECISION (the PR-AUC companion to [[aucByGroup]]) per
    * group: AP = (1/n⁺) Σ_{k positive} Precision@k over the score-DESC
    * ranking. Where AUC-ROC weighs positives against negatives
    * symmetrically, AP concentrates on the top of the ranking — the
    * metric of record for imbalanced retrieval/detection evals. One row
    * per group: `n_pos`, `n_neg`, `ap` rounded at 6; a group with no
    * positives yields NULL ap. Rows with NULL score or label drop.
    *
    * Ties: the ranking is made a reproducible TOTAL order by breaking
    * score ties on `idCol` (the [[ndcgByQuery]] discipline) — the
    * analytic tie-sharing of the rank-sum identity has no closed form
    * for AP, so determinism comes from the explicit tie-break, which an
    * external engine reproduces exactly.
    *
    * Exactness: Precision@k = cum⁺(k)/k is a rational; each positive's
    * term enters as the exact integer floor(10⁶·cum⁺/k)
    * ([[graft.ops.Fixed.ldiv]] — DuckDB's `//`), the per-group sum is
    * exact ([[graft.functions.Int128Sum]]), and doubles appear only in
    * the final /(10⁶·n⁺) division.
    *
    * Shape: ONE rank window per group (row_number and the running
    * positive count ride the same (group, score desc, id) sort — no
    * second exchange), then a map-side-combined aggregate. The running
    * sum is per-GROUP, bounded by group size: the global-window trap
    * does not apply. */
  def averagePrecisionByGroup(df: DataFrame, groupCols: Seq[String],
      labelCol: Column, scoreCol: String, idCol: String): DataFrame = {
    require(groupCols.nonEmpty,
      "averagePrecisionByGroup needs at least one group column")
    val s = col(s"`$scoreCol`").cast("double")
    val base = df.filter(s.isNotNull && labelCol.isNotNull)
      .select(groupCols.map(c => col(s"`$c`")) ++ Seq(
        labelCol.cast("boolean").as("_y"), s.as("_s"),
        col(s"`$idCol`").as("_id")): _*)
    val wRank = Window.partitionBy(groupCols.map(c => col(s"`$c`")): _*)
      .orderBy(col("_s").desc, col("_id").asc)
    val ranked = base
      .withColumn("_k", row_number().over(wRank).cast("long"))
      .withColumn("_cp", sum(when(col("_y"), lit(1L)).otherwise(lit(0L)))
        .over(wRank.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val agg = ranked.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(count(when(col("_y"), lit(1))).as("n_pos"),
        count(when(!col("_y"), lit(1))).as("n_neg"),
        int128Sum(when(col("_y"),
          ldiv(lit(1000000L) * col("_cp"), col("_k")))).as("_ts"))
    agg.select(
      groupCols.map(c => col(s"`$c`")) ++ Seq(
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0, round(
          col("_ts").cast("double")
            / (lit(1e6) * col("n_pos").cast("double")), 6)).as("ap")): _*)
  }

  /** MRR@k + HitRate@k per group — the first-relevant-result metrics
    * of retrieval eval (RAG chunk retrieval, search suggest): each
    * (group, query) ranking contributes RR = 1/rank of its FIRST
    * relevant item within the top `k` (0 when none — the standard
    * mean-over-all-queries convention, not mean-over-hits), and the
    * group aggregates queries. One row per group: (`n_queries`,
    * `n_hit`, `mrr_x1e6` = ⌊ΣRR·10⁶ / n_queries⌋, `hit_rate_x1e6`).
    * Rows with NULL score or label drop; a query with no rows left
    * contributes nothing.
    *
    * Exactness: each RR enters as the exact integer ⌊10⁶/rank⌋
    * ([[graft.ops.Fixed.ldiv]]), sums ride
    * [[graft.functions.Int128Sum]], and both output ratios are exact
    * floor divisions — no doubles anywhere.
    *
    * Determinism: score ties break on `idCol` (the family's total-order
    * discipline), so "first relevant" is reproducible in any engine.
    *
    * Shape: one rank window per (group, query) — bounded by candidates
    * per query, never global — then two map-side-combined hash
    * aggregates (query level, then group level). The 100 TB cost is
    * the scan plus one exchange on the query key. */
  def mrrByGroup(df: DataFrame, groupCols: Seq[String],
      queryCols: Seq[String], labelCol: Column, scoreCol: String,
      idCol: String, k: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "mrrByGroup needs at least one group col")
    require(queryCols.nonEmpty, "mrrByGroup needs at least one query col")
    require(k >= 1, s"k must be >= 1, got $k")
    val gc = groupCols.map(c => col(s"`$c`"))
    val qc = queryCols.map(c => col(s"`$c`"))
    val s = col(s"`$scoreCol`").cast("double")
    val base = df.filter(s.isNotNull && labelCol.isNotNull)
      .select(gc ++ qc ++ Seq(labelCol.cast("boolean").as("_y"),
        s.as("_s"), col(s"`$idCol`").as("_id")): _*)
    val w = Window.partitionBy((gc ++ qc): _*)
      .orderBy(col("_s").desc, col("_id").asc)
    val perQuery = base
      .withColumn("_k", row_number().over(w).cast("long"))
      .groupBy((gc ++ qc): _*)
      .agg(min(when(col("_y") && col("_k") <= k, col("_k")))
        .as("_firstRel"))
    perQuery
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_queries"),
        count(col("_firstRel")).as("n_hit"),
        int128Sum(coalesce(ldiv(lit(1000000L), col("_firstRel")),
          lit(0L))).as("_srr"))
      .select(gc ++ Seq(col("n_queries"), col("n_hit"),
        ldiv(col("_srr"), col("n_queries")).as("mrr_x1e6"),
        ldiv(col("n_hit") * lit(1000000L), col("n_queries"))
          .as("hit_rate_x1e6")): _*)
  }

  /** PRECISION@k / RECALL@k per group — the set-retrieval completion of
    * the family ([[mrrByGroup]] scores the FIRST hit, [[ndcgByQuery]]
    * the graded order, [[averagePrecisionByGroup]] the full curve;
    * these two ask simply: of the k retrieved, how many were relevant —
    * and of the relevant, how many made the cut?). Per query:
    * precision@k = hits@k / k (the fixed-slot convention — a query
    * with < k candidates is penalized for the empty slots) and
    * recall@k = hits@k / n_rel; the group readout macro-averages
    * each as exact floored micros: `precision_at_k_x1e6 =
    * ⌊Σ_q ⌊10⁶·hits/k⌋ / n_queries⌋` over ALL queries, and
    * `recall_at_k_x1e6` over the queries WITH at least one relevant
    * (NULL when none — no-relevant queries have no recall to average;
    * they still count against precision). One row per group:
    * (`n_queries`, `n_rel_queries`, `precision_at_k_x1e6`,
    * `recall_at_k_x1e6`). Rows with NULL score or label drop.
    *
    * Determinism/shape: the [[mrrByGroup]] contract verbatim — score
    * ties break on `idCol` for a reproducible total order, ONE rank
    * window per (group, query) partition (bounded by query candidate
    * count, never data-sized), exact integer terms summed by
    * [[graft.functions.Int128Sum]]. */
  def precisionRecallAtK(df: DataFrame, groupCols: Seq[String],
      queryCols: Seq[String], labelCol: Column, scoreCol: String,
      idCol: String, k: Int = 10): DataFrame = {
    require(groupCols.nonEmpty,
      "precisionRecallAtK needs at least one group col")
    require(queryCols.nonEmpty,
      "precisionRecallAtK needs at least one query col")
    require(k >= 1, s"k must be >= 1, got $k")
    val gc = groupCols.map(c => col(s"`$c`"))
    val qc = queryCols.map(c => col(s"`$c`"))
    val s = col(s"`$scoreCol`").cast("double")
    val base = df.filter(s.isNotNull && labelCol.isNotNull)
      .select(gc ++ qc ++ Seq(labelCol.cast("boolean").as("_y"),
        s.as("_s"), col(s"`$idCol`").as("_id")): _*)
    val w = Window.partitionBy((gc ++ qc): _*)
      .orderBy(col("_s").desc, col("_id").asc)
    val perQuery = base
      .withColumn("_k", row_number().over(w).cast("long"))
      .groupBy((gc ++ qc): _*)
      .agg(sum(when(col("_y") && col("_k") <= k, 1L).otherwise(0L))
          .as("_hits"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("_nrel"))
    perQuery
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("_nrel") > 0L, 1L).otherwise(0L))
          .as("n_rel_queries"),
        int128Sum(ldiv(col("_hits") * lit(1000000L), lit(k.toLong)))
          .as("_sp"),
        int128Sum(when(col("_nrel") > 0L,
          ldiv(col("_hits") * lit(1000000L), col("_nrel")))
          .otherwise(lit(0L))).as("_sr"))
      .select(gc ++ Seq(col("n_queries"), col("n_rel_queries"),
        ldiv(col("_sp"), col("n_queries")).cast("long")
          .as("precision_at_k_x1e6"),
        when(col("n_rel_queries") > 0L,
          ldiv(col("_sr"), col("n_rel_queries")).cast("long"))
          .as("recall_at_k_x1e6")): _*)
  }

  /** NDCG@k per query — the graded-relevance ranking metric of retrieval
    * eval (search/RAG regression suites): DCG@k = Σᵣ (2^rel − 1)/log₂(r+1)
    * over the score-DESC ranking, normalized by the ideal (rel-DESC)
    * ordering's IDCG@k. One row per query with `n_docs`, `dcg_x1e6`,
    * `idcg_x1e6` (exact micro-unit fixed point) and `ndcg` rounded at 6;
    * a query whose candidates are all rel=0 yields NULL ndcg. Rows with
    * NULL rel/score drop; `rel` must be a small non-negative integer
    * (gain = 2^rel − 1 must fit a long).
    *
    * Determinism: the 1/log₂(r+1) discounts are DRIVER-computed double
    * literals (libm log differences across engines can flip the last
    * ulp — the Benford-constants discipline), gains are exact integers,
    * each rank's term is one double product floored to micro-units, and
    * the per-query sums are exact ([[graft.functions.Int128Sum]]).
    * Score ties break on `idCol` so the ranking — and therefore DCG —
    * is reproducible; ideal-ranking ties are between equal gains and
    * cannot affect IDCG.
    *
    * Shape: two rank windows over the same query partition + one
    * aggregate; only the top-k rows per query carry terms. */
  def ndcgByQuery(df: DataFrame, queryCols: Seq[String], idCol: String,
      relCol: String, scoreCol: String, k: Int = 10): DataFrame = {
    require(queryCols.nonEmpty, "ndcgByQuery needs at least one query col")
    require(k >= 1, s"k must be >= 1, got $k")
    val qc = queryCols.map(c => col(s"`$c`"))
    val rel = col(s"`$relCol`").cast("int")
    val s = col(s"`$scoreCol`").cast("double")
    val base = df.filter(rel.isNotNull && s.isNotNull && rel >= 0)
      .select(qc ++ Seq(col(s"`$idCol`").as("_id"), rel.as("_rel"),
        s.as("_s")): _*)
    // driver-computed literal discounts: both engines consume the same
    // shortest-repr double constants, never their own log2
    val discounts = (1 to k).map(r => 1.0 / (math.log(r + 1.0) /
      math.log(2.0)))
    val dArr = array(discounts.map(lit): _*)
    // SQL-form shiftleft: the DSL overload only takes a literal shift
    val gain = (expr("shiftleft(1L, _rel)") - lit(1L)).cast("double")
    val wScore = Window.partitionBy(qc: _*)
      .orderBy(col("_s").desc, col("_id").asc)
    val wIdeal = Window.partitionBy(qc: _*)
      .orderBy(col("_rel").desc, col("_id").asc)
    val agg = base
      .withColumn("_dm", when(row_number().over(wScore) <= k,
        floor(gain * element_at(dArr, row_number().over(wScore))
          * lit(1e6))))
      .withColumn("_im", when(row_number().over(wIdeal) <= k,
        floor(gain * element_at(dArr, row_number().over(wIdeal))
          * lit(1e6))))
      .groupBy(qc: _*)
      .agg(count(lit(1)).as("n_docs"),
        int128Sum(col("_dm")).as("_dcg"),
        int128Sum(col("_im")).as("_idcg"))
    agg.select(qc ++ Seq(
      col("n_docs"),
      coalesce(col("_dcg"), lit(0)).cast("long").as("dcg_x1e6"),
      coalesce(col("_idcg"), lit(0)).cast("long").as("idcg_x1e6"),
      when(col("_idcg") > 0, round(
        col("_dcg").cast("double") / col("_idcg").cast("double"), 6))
        .as("ndcg")): _*)
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

  /** BRIER SCORE with the MURPHY DECOMPOSITION — the proper-scoring
    * summary beside [[calibrationTable]]'s per-bin view: one row with
    * `n`, `n_pos`, `brier_x1e12` (the exact mean squared error of the
    * micro-quantized score against the 0/1 outcome),
    * `reliability_x1e12` (Σ_b n_b·(s̄_b − ȳ_b)² / N — how far each
    * bin's mean score sits from its realized rate; 0 is perfectly
    * calibrated), `resolution_x1e12` (Σ_b n_b·(ȳ_b − ȳ)² / N — how much
    * the bins separate outcomes; bigger is better) and
    * `uncertainty_x1e12` (ȳ·(1 − ȳ) — the no-skill floor). The Murphy
    * identity REL − RES + UNC equals the brier of the BIN-MEAN forecast
    * (the classical binned decomposition); `brier_x1e12` is the raw
    * unbinned score reported beside it.
    *
    * Exactness: per-row squares accumulate in
    * [[graft.functions.Int128SumProd]]; bin rates/means are floor-micro
    * [[graft.ops.Fixed.ldiv]] integers, so the decomposition sums are
    * a pinned integer chain any engine replays bit-for-bit ((10⁶)²·N
    * stays inside int128 past 10²⁴ rows). Rows with NULL or
    * out-of-[0,1] scores or NULL labels drop.
    *
    * Shape: one hash aggregate to ≤`bins` rows, then literal-sized
    * reductions — the 100 TB cost is the scan. */
  def brierDecomposition(df: DataFrame, labelCol: Column,
      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    import graft.functions.Int128SumProd.int128SumProd
    val s = col(s"`$scoreCol`").cast("double")
    val base = df.filter(s.isNotNull && labelCol.isNotNull &&
        s >= 0.0 && s <= 1.0)
      .select(labelCol.cast("boolean").as("_y"),
        least(floor(s * lit(bins)), lit(bins - 1L)).as("_bin"),
        floor(s * lit(1e6)).as("_m"))
      .withColumn("_d",
        col("_m") - when(col("_y"), lit(1000000L)).otherwise(lit(0L)))
    val perBin = base.groupBy(col("_bin"))
      .agg(count(lit(1)).as("_n"),
        count(when(col("_y"), lit(1))).as("_p"),
        int128Sum(col("_m")).as("_sm"),
        int128SumProd(col("_d"), col("_d")).as("_sq"))
      .select(col("_n"), col("_p"), col("_sq"),
        ldiv(col("_sm"), col("_n")).as("_sbm"),
        ldiv(col("_p") * lit(1000000L), col("_n")).as("_rbm"))
    // session-default case-insensitive resolution: the totals' names
    // must not collide with the per-bin `_n`/`_p`
    val tot = perBin.agg(sum(col("_n")).as("_tn"), sum(col("_p")).as("_tp"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    perBin.crossJoin(broadcast(tot))
      .withColumn("_ybm", ldiv(col("_tp") * lit(1000000L), col("_tn")))
      .agg(
        max(col("_tn")).as("n"), max(col("_tp")).as("n_pos"),
        max(col("_ybm")).as("_ybm2"),
        sum(col("_sq")).as("_sqs"),
        sum(dec(col("_n")) * dec(col("_sbm") - col("_rbm"))
          * dec(col("_sbm") - col("_rbm"))).as("_rel"),
        sum(dec(col("_n")) * dec(col("_rbm") - col("_ybm"))
          * dec(col("_rbm") - col("_ybm"))).as("_res"))
      .select(col("n"), col("n_pos"),
        ldiv(col("_sqs"), col("n")).as("brier_x1e12"),
        ldiv(col("_rel"), col("n")).as("reliability_x1e12"),
        ldiv(col("_res"), col("n")).as("resolution_x1e12"),
        (col("_ybm2") * (lit(1000000L) - col("_ybm2")))
          .as("uncertainty_x1e12"))
  }

  /** LOG LOSS (binary cross-entropy) — the training objective itself
    * as an eval scalar beside [[brierDecomposition]]:
    * −(1/N)·Σ[y·ln s + (1−y)·ln(1−s)]. The probability is
    * micro-quantized then CLAMPED to [1, 999999] micro (the pinned
    * ε-clamp every implementation needs — ln 0 is −∞), each row's
    * ln(s_m/10⁶) floors to micro units and int128-sums, and the output
    * is the exact floor-divided mean `logloss_x1e6` plus `n`, `n_pos`.
    * Per-row ln on the quantized operand is the
    * [[graft.text.CorpusStats.heapsLaw]]/q_zipf posture: both engines
    * take ln of the SAME rational, so the floored micro value agrees
    * (boundary mass ~10⁻⁹ per row).
    *
    * Shape: one aggregate — the 100 TB cost is the scan. */
  def logLoss(df: DataFrame, labelCol: Column, scoreCol: String)
      : DataFrame = {
    val s = col(s"`$scoreCol`").cast("double")
    val base = df.filter(s.isNotNull && labelCol.isNotNull &&
        s >= 0.0 && s <= 1.0)
      .select(labelCol.cast("boolean").as("_y"),
        greatest(least(floor(s * lit(1e6)), lit(999999L)), lit(1L))
          .as("_m"))
      .select(col("_y"), floor(lit(1e6) *
        log(when(col("_y"), col("_m")).otherwise(lit(1000000L) - col("_m"))
          .cast("double") / lit(1e6))).cast("long").as("_ll"))
    base.agg(count(lit(1)).as("n"),
        count(when(col("_y"), lit(1))).as("n_pos"),
        int128Sum(col("_ll")).as("_s"))
      .select(col("n"), col("n_pos"),
        (-ldiv(col("_s"), col("n"))).as("logloss_x1e6"))
  }

  /** EXPECTED CALIBRATION ERROR — the single number the reliability
    * plot collapses to (and the one eval reports quote):
    * ECE = Σ_b (n_b/N)·|ȳ_b − s̄_b| over the [[calibrationTable]] bins,
    * plus MCE = max_b |ȳ_b − s̄_b| (the worst bin). One row: `n`,
    * `ece_x1e6`, `mce_x1e6` — bin rates/means are the same floor-micro
    * integers as the table, so both outputs are exact integers
    * ([[brierDecomposition]] is the squared-gap sibling; ECE is the
    * absolute-gap headline).
    *
    * Shape: one hash aggregate to ≤`bins` rows + a literal-sized
    * reduce — the 100 TB cost is the scan. */
  def expectedCalibrationError(df: DataFrame, labelCol: Column,
      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val s = col(s"`$scoreCol`").cast("double")
    val perBin = df.filter(s.isNotNull && labelCol.isNotNull &&
        s >= 0.0 && s <= 1.0)
      .select(labelCol.cast("boolean").as("_y"),
        least(floor(s * lit(bins)), lit(bins - 1L)).as("_bin"),
        floor(s * lit(1e6)).as("_m"))
      .groupBy(col("_bin"))
      .agg(count(lit(1)).as("_n"),
        count(when(col("_y"), lit(1))).as("_p"),
        int128Sum(col("_m")).as("_sm"))
      .select(col("_n"),
        abs(ldiv(col("_p") * lit(1000000L), col("_n"))
          - ldiv(col("_sm"), col("_n"))).as("_gap"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    perBin.agg(sum(col("_n")).as("n"),
        sum(dec(col("_n")) * dec(col("_gap"))).as("_wg"),
        max(col("_gap")).as("mce_x1e6"))
      .select(col("n"), ldiv(col("_wg"), col("n")).as("ece_x1e6"),
        col("mce_x1e6"))
  }

  /** ISOTONIC CALIBRATION (pool-adjacent-violators) over the
    * [[calibrationTable]] bins — the standard monotone recalibration
    * map: one row per non-empty bin with `bin`, `n`, `n_pos`,
    * `rate_x1e6` (the raw floor-micro positive rate) and `iso_x1e6`
    * (the non-decreasing PAV fit — adjacent bins whose raw rates invert
    * pool into one block whose rate is the block's exact pooled
    * positives/count). Predictions recalibrate by binning a score and
    * reading `iso_x1e6`.
    *
    * Exactness: PAV pooling decisions compare exact rationals by BigInt
    * cross-multiplication (no double ever orders a merge), and the
    * emitted fit is the floor-micro of the pooled fraction — equal to
    * the minimax characterization max_{i≤k} min_{j≥k} avg(i..j), which
    * is what the DuckDB oracle replays.
    *
    * Shape: one hash aggregate to ≤`bins` rows; PAV runs on the
    * driver over that literal-bounded table (the
    * [[graft.analytics.EventFunnel.kaplanMeier]] grid argument) and the
    * result IS the output. */
  def isotonicCalibration(df: DataFrame, labelCol: Column,
      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val s = col(s"`$scoreCol`").cast("double")
    val tbl = df.filter(s.isNotNull && labelCol.isNotNull &&
        s >= 0.0 && s <= 1.0)
      .select(labelCol.cast("boolean").as("_y"),
        least(floor(s * lit(bins)), lit(bins - 1L)).as("_bin"))
      .groupBy(col("_bin").cast("int").as("bin"))
      .agg(count(lit(1)).as("n"), count(when(col("_y"), lit(1))).as("p"))
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    // PAV over ≤bins rows: blocks of (Σp, Σn, member bins); a new bin
    // pools backwards while its block's rate does not exceed the
    // previous block's (BigInt cross-products — `>=` merges equal-rate
    // plateaus, value-identical to keeping them separate)
    final case class Block(var p: BigInt, var n: BigInt,
      val members: scala.collection.mutable.ListBuffer[(Int, Long, Long)])
    val stack = scala.collection.mutable.Stack.empty[Block]
    tbl.foreach { case row @ (_, n, p) =>
      stack.push(Block(BigInt(p), BigInt(n),
        scala.collection.mutable.ListBuffer(row)))
      while (stack.length >= 2 && {
        val top = stack(0); val prev = stack(1)
        prev.p * top.n >= top.p * prev.n
      }) {
        val top = stack.pop(); val prev = stack.top
        prev.p += top.p; prev.n += top.n; prev.members ++= top.members
      }
    }
    val out = stack.toSeq.reverse.flatMap { b =>
      val iso = (b.p * 1000000L / b.n).toLong // both non-negative ⇒ floor
      b.members.map { case (bin, n, p) =>
        (bin, n, p, math.floorDiv(p * 1000000L, n), iso)
      }
    }
    out.toDF("bin", "n", "n_pos", "rate_x1e6", "iso_x1e6")
      .orderBy(col("bin"))
  }

  /** F1-OPTIMAL DECISION THRESHOLD per group — the operating-point
    * selector beside [[aucByGroup]]'s ranking quality: sweep every
    * distinct (floor-micro-quantized) score as the "predict positive if
    * score ≥ t" cutoff and return the cutoff maximizing
    * F1 = 2·tp / (2·tp + fp + fn), with precision/recall ingredients.
    * All integer: per-threshold tp/fp are cumulative counts down the
    * score order, `f1_x1e6 = ⌊2·tp·10⁶ / (2·tp+fp+fn)⌋`, argmax ties
    * break to the SMALLER threshold (and a no-positive group scans to
    * all-zero F1 and returns its smallest cutoff, f1 = 0). Rows with
    * NULL score or label drop.
    *
    * Shape: one hash aggregate to the distinct-score table (data-sized
    * for a continuous score — the q_ks_test posture), then
    * [[graft.ops.PrefixSum]] running sums over (group, score desc) —
    * ONE range exchange, never a single-task global window; per-group
    * exclusive offsets come from the compact per-group totals table.
    *
    * CONTRACT — bounded group cardinality: the per-group offsets use a
    * partition-less `Window.orderBy(groupCols)` over the ONE-ROW-PER-
    * GROUP totals table plus a `broadcast(tot)` join (the same
    * contract as [[liftTable]]/[[qiniCurve]]). That is the right plan
    * for evaluation group keys (model/segment/experiment-arm — tens to
    * thousands of groups); a DATA-SIZED group key (e.g. a user id)
    * makes the totals sort single-task and the broadcast oversized —
    * pre-aggregate such keys into bounded segments first.
    * Returns one row per group: (group…, `thr_x1e6`, `tp`, `fp`, `fn`,
    * `f1_x1e6`). */
  def bestF1Threshold(df: DataFrame, groupCols: Seq[String],
      labelCol: Column, scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty,
      "bestF1Threshold needs at least one group column")
    val s = col(s"`$scoreCol`").cast("double")
    val gs = groupCols.map(c => col(s"`$c`"))
    val d = df.filter(s.isNotNull && labelCol.isNotNull)
      .select(gs :+ labelCol.cast("boolean").as("_y") :+
        floor(s * lit(1e6)).cast("long").as("_q"): _*)
      .groupBy(gs :+ col("_q"): _*)
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("_np"),
        sum(when(col("_y"), 0L).otherwise(1L)).as("_nn"))
    val run = graft.ops.PrefixSum.runningSums(d,
      gs.map(_.asc) :+ col("_q").desc,
      Seq("_np" -> "_rp", "_nn" -> "_rn"))
    // per-group exclusive offsets from the COMPACT totals table (one
    // row per group) — the small sort that keeps the big frame on one
    // range exchange
    val w = Window.orderBy(groupCols.map(c => col(s"`$c`").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = d.groupBy(gs: _*)
      .agg(sum(col("_np")).as("_tp_all"), sum(col("_nn")).as("_tn_all"))
      .select(gs ++ Seq(
        col("_tp_all"),
        (sum(col("_tp_all")).over(w) - col("_tp_all")).as("_op"),
        (sum(col("_tn_all")).over(w) - col("_tn_all")).as("_on")): _*)
    val f = run.join(broadcast(tot), groupCols)
      .select(gs ++ Seq(col("_q"),
        (col("_rp") - col("_op")).as("_tp"),
        (col("_rn") - col("_on")).as("_fp"),
        (col("_tp_all") - (col("_rp") - col("_op"))).as("_fn")): _*)
      .withColumn("_den",
        lit(2L) * col("_tp") + col("_fp") + col("_fn"))
      .withColumn("_f1", when(col("_den") > 0L,
        ldiv(lit(2000000L) * col("_tp"), col("_den"))).otherwise(0L))
    f.groupBy(gs: _*)
      .agg(max_by(
        struct(col("_q"), col("_tp"), col("_fp"), col("_fn"), col("_f1")),
        struct(col("_f1"), (-col("_q")).as("_nq"))).as("_b"))
      .select(gs ++ Seq(col("_b._q").as("thr_x1e6"), col("_b._tp").as("tp"),
        col("_b._fp").as("fp"), col("_b._fn").as("fn"),
        col("_b._f1").as("f1_x1e6")): _*)
  }

  /** DECILE LIFT / CUMULATIVE-GAIN table per group — the
    * score-band readout beside [[aucByGroup]] (one number for the
    * whole ranking) and [[bestF1Threshold]] (one operating point):
    * "if we act on the top k/B of the ranking, how many positives do
    * we capture (gain), and how much better than random is the slice
    * (lift)?" — the campaign-targeting / model-triage table. Rows
    * rank score-DESC and split into `buckets` rank bands via
    * bucket(r) = ⌊r·B/n⌋ over 0-based ranks (band sizes differ by at
    * most 1); per band: `n`, `pos`, `cum_n`, `cum_pos`,
    * `gain_x1e6 = ⌊10⁶·cum_pos/P⌋`,
    * `lift_x1e6 = ⌊10⁶·cum_pos·N/(cum_n·P)⌋` (NULL when the group has
    * no positives). Bands with no ranks (n < B) are absent. Rows with
    * NULL score or label drop.
    *
    * Ties: rows tied on the micro-quantized score are interchangeable
    * except for their label, so the band COUNTS are fully determined
    * by the convention "positives first within a tie run" — the
    * ranking never needs a per-row tie-break, and an external engine
    * replays it with a row_number ordered (score desc, label desc).
    * Internally each (score, label) run spans the 0-based rank range
    * [s, s+t−1]; band d covers ranks [⌈d·n/B⌉, ⌈(d+1)·n/B⌉−1]; the
    * run explodes to ≤B overlap rows with exact integer overlap
    * counts — never to its t rows.
    *
    * Shape: one hash aggregate to the (group, score, label) run table
    * (data-sized for a continuous score — the [[bestF1Threshold]]
    * posture), [[graft.ops.PrefixSum]] running counts over ONE range
    * exchange with per-group offsets from the compact totals table, a
    * ≤B-wide generator, and a B-sized per-group cumulative window.
    * Group cardinality must be bounded (evaluation segments, not a
    * data-sized key) — see [[bestF1Threshold]]'s contract note.
    * Returns one row per (group…, `decile`), decile-ascending. */
  def liftTable(df: DataFrame, groupCols: Seq[String], labelCol: Column,
      scoreCol: String, buckets: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "liftTable needs at least one group column")
    require(buckets >= 2, s"liftTable needs >= 2 buckets, got $buckets")
    val s = col(s"`$scoreCol`").cast("double")
    val gs = groupCols.map(c => col(s"`$c`"))
    val bLit = lit(buckets.toLong)
    val d = df.filter(s.isNotNull && labelCol.isNotNull)
      .select(gs :+ labelCol.cast("boolean").as("_y") :+
        floor(s * lit(1e6)).cast("long").as("_q"): _*)
      .groupBy(gs :+ col("_q") :+ col("_y"): _*)
      .agg(count(lit(1)).as("_t"))
    val run = graft.ops.PrefixSum.runningSums(d,
      gs.map(_.asc) :+ col("_q").desc :+ col("_y").desc,
      Seq("_t" -> "_ft"))
    val w = Window.orderBy(groupCols.map(c => col(s"`$c`").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = d.groupBy(gs: _*)
      .agg(sum(col("_t")).as("_n"),
        sum(when(col("_y"), col("_t")).otherwise(0L)).as("_p"))
      .select(gs ++ Seq(col("_n"), col("_p"),
        (sum(col("_n")).over(w) - col("_n")).as("_off")): _*)
    val f = run.join(broadcast(tot), groupCols)
      .withColumn("_s0", col("_ft") - col("_off") - col("_t"))
      .withColumn("_b0", ldiv(col("_s0") * bLit, col("_n")))
      .withColumn("_b1",
        ldiv((col("_s0") + col("_t") - lit(1L)) * bLit, col("_n")))
    val ex = f.select(gs ++ Seq(col("_y"), col("_s0"), col("_t"),
        col("_n"), col("_p"),
        explode(sequence(col("_b0"), col("_b1"))).as("decile")): _*)
      .withColumn("_lo",
        ldiv(col("decile") * col("_n") + bLit - lit(1L), bLit))
      .withColumn("_hi",
        ldiv((col("decile") + lit(1L)) * col("_n") + bLit - lit(1L),
          bLit) - lit(1L))
      .withColumn("_ov",
        least(col("_s0") + col("_t") - lit(1L), col("_hi")) -
          greatest(col("_s0"), col("_lo")) + lit(1L))
    val agg = ex.groupBy(gs :+ col("decile"): _*)
      .agg(sum(col("_ov")).as("n"),
        sum(when(col("_y"), col("_ov")).otherwise(0L)).as("pos"),
        max(col("_n")).as("_n"), max(col("_p")).as("_p"))
    val wc = Window.partitionBy(gs: _*).orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column) = c.cast("decimal(38,0)")
    agg
      .withColumn("cum_n", sum(col("n")).over(wc))
      .withColumn("cum_pos", sum(col("pos")).over(wc))
      .select(gs ++ Seq(col("decile"), col("n"), col("pos"),
        col("cum_n"), col("cum_pos"),
        when(col("_p") > 0L, ldiv(dec(col("cum_pos")) * lit(1000000L),
          col("_p")).cast("long")).as("gain_x1e6"),
        when(col("_p") > 0L, ldiv(
          dec(col("cum_pos")) * dec(col("_n")) * lit(1000000L),
          dec(col("cum_n")) * dec(col("_p"))).cast("long"))
          .as("lift_x1e6")): _*)
  }

  /** QINI / UPLIFT CURVE per group — [[liftTable]] for TARGETING
    * models: rank treatment and control units on the SAME pooled
    * score-DESC banding (bucket(r) = ⌊r·B/n⌋, the liftTable
    * convention) and ask, band by band, how many extra conversions
    * the treated top slice produced over its control counterfactual:
    * `uplift_x1e6 = ⌊10⁶·(cum⁺_T·cum_C − cum⁺_C·cum_T)/(cum_T·cum_C)⌋`
    * (the cumulative rate difference) and the absolute-number Qini
    * `qini_x1e6 = ⌊10⁶·(cum⁺_T − cum⁺_C·cum_T/cum_C)⌋` — the curve
    * whose area against the random diagonal is the standard uplift
    * model score. Both NULL while a cumulative arm is still empty.
    * Per band also the raw (`n_t`, `pos_t`, `n_c`, `pos_c`). Rows
    * with NULL score, label, or arm drop. `groupCols` may be EMPTY
    * (one global curve — unlike the per-group evaluators, a single
    * pooled ranking is the common shape here).
    *
    * Ties: runs key on (score, arm, label) and order (score desc,
    * treatment first, positives first) — band counts are again fully
    * determined with no per-row tie-break, replayed externally by a
    * row_number over the same triple order.
    *
    * Shape: identical to [[liftTable]] — run table, ONE
    * [[graft.ops.PrefixSum]] range exchange with compact per-group
    * offsets, ≤B-row overlap generator, B-sized cumulative window.
    * Group cardinality must be bounded (evaluation segments, not a
    * data-sized key) — see [[bestF1Threshold]]'s contract note.
    * Returns one row per (group…, `decile`), decile-ascending. */
  def qiniCurve(df: DataFrame, groupCols: Seq[String], treatCol: Column,
      labelCol: Column, scoreCol: String, buckets: Int = 10)
      : DataFrame = {
    require(buckets >= 2, s"qiniCurve needs >= 2 buckets, got $buckets")
    val s = col(s"`$scoreCol`").cast("double")
    val grouped = groupCols.nonEmpty
    val inner = if (grouped) groupCols else Seq("_g_all")
    val gs = if (grouped) groupCols.map(c => col(s"`$c`"))
             else Seq(lit(0L).as("_g_all"))
    val gRef = inner.map(c => col(s"`$c`"))
    val bLit = lit(buckets.toLong)
    val d = df
      .filter(s.isNotNull && labelCol.isNotNull && treatCol.isNotNull)
      .select(gs ++ Seq(treatCol.cast("boolean").as("_w"),
        labelCol.cast("boolean").as("_y"),
        floor(s * lit(1e6)).cast("long").as("_q")): _*)
      .groupBy(gRef ++ Seq(col("_q"), col("_w"), col("_y")): _*)
      .agg(count(lit(1)).as("_t"))
    val run = graft.ops.PrefixSum.runningSums(d,
      gRef.map(_.asc) ++ Seq(col("_q").desc, col("_w").desc,
        col("_y").desc),
      Seq("_t" -> "_ft"))
    val w = Window.orderBy(gRef.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = d.groupBy(gRef: _*)
      .agg(sum(col("_t")).as("_n"))
      .select(gRef ++ Seq(col("_n"),
        (sum(col("_n")).over(w) - col("_n")).as("_off")): _*)
    val f = run.join(broadcast(tot), inner)
      .withColumn("_s0", col("_ft") - col("_off") - col("_t"))
      .withColumn("_b0", ldiv(col("_s0") * bLit, col("_n")))
      .withColumn("_b1",
        ldiv((col("_s0") + col("_t") - lit(1L)) * bLit, col("_n")))
    val ex = f.select(gRef ++ Seq(col("_w"), col("_y"), col("_s0"),
        col("_t"), col("_n"),
        explode(sequence(col("_b0"), col("_b1"))).as("decile")): _*)
      .withColumn("_lo",
        ldiv(col("decile") * col("_n") + bLit - lit(1L), bLit))
      .withColumn("_hi",
        ldiv((col("decile") + lit(1L)) * col("_n") + bLit - lit(1L),
          bLit) - lit(1L))
      .withColumn("_ov",
        least(col("_s0") + col("_t") - lit(1L), col("_hi")) -
          greatest(col("_s0"), col("_lo")) + lit(1L))
    val agg = ex.groupBy(gRef :+ col("decile"): _*)
      .agg(sum(when(col("_w"), col("_ov")).otherwise(0L)).as("n_t"),
        sum(when(col("_w") && col("_y"), col("_ov")).otherwise(0L))
          .as("pos_t"),
        sum(when(!col("_w"), col("_ov")).otherwise(0L)).as("n_c"),
        sum(when(!col("_w") && col("_y"), col("_ov")).otherwise(0L))
          .as("pos_c"))
    val wc = Window.partitionBy(gRef: _*).orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val cm = agg
      .withColumn("_cnt", sum(col("n_t")).over(wc))
      .withColumn("_cpt", sum(col("pos_t")).over(wc))
      .withColumn("_cnc", sum(col("n_c")).over(wc))
      .withColumn("_cpc", sum(col("pos_c")).over(wc))
    val numer = (dec(col("_cpt")) * dec(col("_cnc")) -
      dec(col("_cpc")) * dec(col("_cnt"))) * lit(1000000L)
    val outGs = if (grouped) gRef else Seq.empty[Column]
    cm.select(outGs ++ Seq(col("decile"), col("n_t"), col("pos_t"),
      col("n_c"), col("pos_c"),
      when(col("_cnt") > 0L && col("_cnc") > 0L,
        ldiv(numer, dec(col("_cnt")) * dec(col("_cnc"))).cast("long"))
        .as("uplift_x1e6"),
      when(col("_cnc") > 0L,
        ldiv(numer, dec(col("_cnc"))).cast("long")).as("qini_x1e6")): _*)
  }

  /** SPLIT-CONFORMAL PREDICTION INTERVAL — the distribution-free
    * uncertainty layer over any point predictor ([[calibrationTable]]
    * asks "are the probabilities honest"; this asks "how wide must a
    * band around ŷ be to contain the truth 1−α of the time" with a
    * finite-sample guarantee, no model assumptions — Vovk's split
    * conformal): on the CALIBRATION rows the threshold is the
    * ⌈(n+1)(1−α)⌉-th smallest absolute residual |y − ŷ|; the TEST rows
    * report achieved coverage |{r ≤ q̂}|/n_test. ONE output row:
    * (`n_cal`, `n_test`, `q_hat_x1e6`, `coverage_x1e6`) — NULL q̂/
    * coverage when the rank exceeds n_cal (too few calibration rows
    * for the requested α: the guarantee is impossible, said loudly).
    *
    * Exactness: residuals quantize to micros; the rank
    * k = ⌈(n+1)·(10⁶−α_µ)/10⁶⌉ is exact integer arithmetic; q̂ is the
    * smallest residual whose cumulative count reaches k (an order
    * statistic, not an interpolated quantile); coverage is
    * ⌊10⁶·hits/n_test⌋. No doubles anywhere.
    *
    * Shape: one residual distinct-value aggregate +
    * [[graft.ops.PrefixSum]] running counts (the continuous-residual
    * table is data-sized — the ks-test posture, one range exchange),
    * then two scalar aggregates joined by cross. Rows with NULL
    * prediction/actual or non-finite residual drop. */
  def conformalInterval(df: DataFrame, isCalib: Column, predCol: String,
      actualCol: String, alphaX1e6: Long = 100000L): DataFrame = {
    require(alphaX1e6 > 0L && alphaX1e6 < 1000000L,
      s"alphaX1e6 must be in (0, 1e6), got $alphaX1e6")
    val p = col(s"`$predCol`").cast("double")
    val y = col(s"`$actualCol`").cast("double")
    val r = abs(y - p)
    val base = df.filter(p.isNotNull && y.isNotNull &&
        isCalib.isNotNull && !isnan(r) &&
        r =!= lit(Double.PositiveInfinity))
      .select(isCalib.cast("boolean").as("_c"),
        floor(r * lit(1e6)).as("_r"))
      .localCheckpoint(eager = false) // feeds threshold AND coverage
    val vals = base.filter(col("_c"))
      .groupBy(col("_r")).agg(count(lit(1)).as("_t"))
    val cum = graft.ops.PrefixSum.runningSums(vals,
      Seq(col("_r").asc), Seq("_t" -> "_ft"))
    val nCal = broadcast(base.filter(col("_c"))
      .agg(count(lit(1)).as("n_cal")))
    // k = ceil((n+1)(1e6 − α)/1e6), exact: ldiv with the +999999 bump
    val k = ldiv((col("n_cal") + lit(1L)) * lit(1000000L - alphaX1e6) +
      lit(999999L), lit(1000000L))
    val qhat = cum.crossJoin(nCal)
      .filter(col("_ft") >= k)
      .agg(min(col("_r")).as("q_hat_x1e6"))
    val test = base.filter(!col("_c"))
    val hits = test.crossJoin(broadcast(qhat))
      .agg(coalesce(sum(when(col("_r") <= col("q_hat_x1e6"), 1L)
        .otherwise(0L)), lit(0L)).as("_hits"))
    qhat.crossJoin(nCal)
      .crossJoin(test.agg(count(lit(1)).as("n_test")))
      .crossJoin(broadcast(hits))
      .select(col("n_cal"), col("n_test"), col("q_hat_x1e6"),
        when(col("q_hat_x1e6").isNotNull && col("n_test") > 0L,
          ldiv(col("_hits") * lit(1000000L), col("n_test")))
          .as("coverage_x1e6"))
  }

  /** KRIPPENDORFF'S ALPHA (nominal) — the multi-rater,
    * missing-data-tolerant completion of [[cohensKappa]]: agreement over
    * long-format ratings (unit, value) where units may carry any number
    * of ratings; units with fewer than 2 drop (unpairable).
    * α = 1 − D_o/D_e with
    * `D_o·n = Σ_u (m_u² − Σ_c n_uc²)/(m_u−1)` and
    * `D_e = (n² − Σ_c n_c²)/(n(n−1))`.
    *
    * Exactness: the per-unit fractions share the BOUNDED denominator set
    * {m−1 : m = ratings per unit}, so grouping units by m turns D_o·n
    * into a ≤max-raters-term rational sum — cleared by the lcm L of the
    * denominators, everything is BigInt integer arithmetic and
    * `alpha_x1e6 = ⌊(den − num)·10⁶ / den⌋` (floor, not truncate:
    * α < 0 = systematic disagreement) replays exactly (the oracle
    * mirrors the same clearing with HUGEINT + `lcm` `list_reduce`).
    * NULL when D_e = 0 (all ratings one category) or nothing pairable.
    *
    * Shape: two hash aggregates — (unit, value) counts, then per-unit
    * m/Σn² — reduced to a ≤max-raters-row S_m table and a
    * category-bounded totals table; the final rational lands on the
    * driver (the kappa posture). Returns one row:
    * (`n_units`, `n_ratings`, `alpha_x1e6`). */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
      valueCol: String, maxCategories: Int = 1000000): DataFrame = {
    require(maxCategories >= 1,
      s"maxCategories must be >= 1, got $maxCategories")
    val spark = ratings.sparkSession
    import spark.implicits._
    val uv = ratings
      .filter(col(s"`$unitCol`").isNotNull && col(s"`$valueCol`").isNotNull)
      .groupBy(col(s"`$unitCol`").as("_u"),
        col(s"`$valueCol`").cast("string").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val per = uv.groupBy(col("_u"))
      .agg(sum(col("_c")).as("_m"), sum(col("_c") * col("_c")).as("_sq"))
      .filter(col("_m") >= 2L)
    // the per-m table is bounded by distinct panel sizes (≤ max ratings
    // per unit); the marginal table is category-sized — loud-cap the
    // latter, where a data-sized value column is the real risk
    val sm = per.groupBy(col("_m"))
      .agg(sum(col("_m") * col("_m") - col("_sq")).as("_s"),
        count(lit(1)).as("_nu"))
      .limit(maxCategories + 1)
      .as[(Long, Long, Long)].collect()
    require(sm.length <= maxCategories,
      s"krippendorffAlpha: > $maxCategories distinct per-unit rating " +
        "counts - pathological panel-size spread; raise maxCategories")
    val nc = uv.join(per.select(col("_u")), Seq("_u"), "left_semi")
      .groupBy(col("_v")).agg(sum(col("_c")).as("_cnt"))
      .limit(maxCategories + 1)
      .as[(String, Long)].collect()
    require(nc.length <= maxCategories,
      s"krippendorffAlpha: > $maxCategories distinct rating values - " +
        "the driver marginal table is category-sized by design; bucket " +
        "the value column into a bounded category set or raise " +
        "maxCategories")
    val nUnits = sm.iterator.map(_._3).sum
    val n = BigInt(sm.iterator.map(r => r._1 * r._3).sum)
    val alpha: Option[Long] =
      if (n < 2) None
      else {
        val l = sm.iterator.map(r => BigInt(r._1 - 1))
          .reduce((a, b) => a * b / a.gcd(b))
        val doN = sm.iterator.map(r => BigInt(r._2) * (l / (r._1 - 1))).sum
        val d2 = n * n - nc.iterator.map(r => BigInt(r._2).pow(2)).sum
        val den = l * d2
        if (den <= 0) None
        else {
          val num2 = (den - (n - 1) * doN) * 1000000
          val q = num2 / den
          Some((if (num2 % den != 0 && num2 < 0) q - 1 else q).toLong)
        }
      }
    Seq((nUnits, n.toLong, alpha))
      .toDF("n_units", "n_ratings", "alpha_x1e6")
  }

  /** PER-RATER MAJORITY AGREEMENT — the rater-level diagnostic beside
    * the panel-level kappas ([[cohensKappa]]/[[fleissKappa]]/
    * [[krippendorffAlpha]] say whether the PANEL agrees; this says
    * WHICH rater drags it down — the annotation-QA triage table):
    * each unit's gold is the majority label over all its ratings
    * (ties break label-asc — deterministic, engine-replayable), and
    * each rater scores `agree_x1e6 = ⌊10⁶·#{matches}/#{rated}⌋`
    * against it. Single-rating units keep their (trivially
    * self-agreeing) vote — the caller filters if that flatters;
    * rows with NULL unit/rater/value drop. One row per rater:
    * (`rater`, `n_rated`, `n_agree`, `agree_x1e6`), rater asc.
    *
    * Shape: a (unit, value) count aggregate, a unit-keyed `min_by`
    * majority reduction, one hash join back, and a rater aggregate —
    * all exact integers. */
  def raterAgreement(ratings: DataFrame, unitCol: String,
      raterCol: String, valueCol: String): DataFrame = {
    val base = ratings.filter(col(s"`$unitCol`").isNotNull &&
        col(s"`$raterCol`").isNotNull && col(s"`$valueCol`").isNotNull)
      .select(col(s"`$unitCol`").as("_u"),
        col(s"`$raterCol`").cast("string").as("_r"),
        col(s"`$valueCol`").cast("string").as("_v"))
      .localCheckpoint(eager = false) // feeds majority AND the join
    val majority = base.groupBy(col("_u"), col("_v"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("_u"))
      .agg(min_by(col("_v"),
        struct((-col("_c")).as("_nc"), col("_v"))).as("_gold"))
    base.join(majority, Seq("_u"))
      .groupBy(col("_r"))
      .agg(count(lit(1)).as("n_rated"),
        sum(when(col("_v") === col("_gold"), 1L).otherwise(0L))
          .as("n_agree"))
      .select(col("_r").as("rater"), col("n_rated"), col("n_agree"),
        ldiv(col("n_agree") * lit(1000000L), col("n_rated"))
          .as("agree_x1e6"))
  }

  /** FLEISS' KAPPA — chance-corrected agreement for a FIXED-SIZE rater
    * panel, completing the family: [[cohensKappa]] is two NAMED raters
    * (per-rater marginals), [[krippendorffAlpha]] tolerates missing
    * ratings, Fleiss is n interchangeable raters per unit with POOLED
    * marginals (at n = 2 it is Scott's pi, not Cohen's kappa — the two
    * disagree exactly when the raters' marginals differ). Long-format
    * input (unit, value); units with a rating count ≠ `raters` DROP
    * (Fleiss is undefined off the fixed panel — the
    * [[krippendorffAlpha]] unpairable-unit posture).
    *
    * κ = (P̄ − P̄e)/(1 − P̄e) with P̄ = (A − Nn)/(Nn(n−1)) over
    * A = Σ_u Σ_c n_uc², and P̄e = Σ_c (c_c/(Nn))². Cleared by
    * N²n²(n−1): `kappa_x1e6 = ⌊((A−Nn)·Nn − (n−1)·Σc²)·10⁶ /
    * (N²n²(n−1) − (n−1)·Σc²)⌋` — exact BigInt, floor (κ < 0 =
    * below-chance). NULL when no unit fits the panel or P̄e = 1 (one
    * category everywhere).
    *
    * Shape: two hash aggregates — (unit, value) counts, per-unit
    * m/Σn² — to a 1-row A/N readout plus category-bounded pooled
    * totals; the final rational lands on the driver (the kappa
    * posture). Returns one row: (`n_units`, `n_ratings`,
    * `kappa_x1e6`). */
  def fleissKappa(ratings: DataFrame, unitCol: String, valueCol: String,
      raters: Int, maxCategories: Int = 1000000): DataFrame = {
    require(raters >= 2, s"fleiss needs a panel of >= 2 raters, got $raters")
    require(maxCategories >= 1,
      s"maxCategories must be >= 1, got $maxCategories")
    val spark = ratings.sparkSession
    import spark.implicits._
    val uv = ratings
      .filter(col(s"`$unitCol`").isNotNull && col(s"`$valueCol`").isNotNull)
      .groupBy(col(s"`$unitCol`").as("_u"),
        col(s"`$valueCol`").cast("string").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val per = uv.groupBy(col("_u"))
      .agg(sum(col("_c")).as("_m"), sum(col("_c") * col("_c")).as("_sq"))
      .filter(col("_m") === raters.toLong)
    val (nUnits, a) = per
      .agg(count(lit(1)), coalesce(sum(col("_sq")), lit(0L)))
      .as[(Long, Long)].head()
    // loud cap: the pooled-marginal table is category-sized; a
    // data-sized label column would make it data-sized
    val nc = uv.join(per.select(col("_u")), Seq("_u"), "left_semi")
      .groupBy(col("_v")).agg(sum(col("_c")).as("_cnt"))
      .limit(maxCategories + 1)
      .as[(String, Long)].collect()
    require(nc.length <= maxCategories,
      s"fleissKappa: > $maxCategories distinct rating values - the " +
        "driver marginal table is category-sized by design; bucket the " +
        "value column into a bounded category set or raise maxCategories")
    val n = BigInt(raters)
    val bigN = BigInt(nUnits)
    val sq2 = nc.iterator.map(r => BigInt(r._2).pow(2)).sum
    val den = bigN * bigN * n * n * (n - 1) - (n - 1) * sq2
    val kappa: Option[Long] = if (den == 0) None else {
      val num = ((BigInt(a) - bigN * n) * bigN * n - (n - 1) * sq2) *
        1000000
      val q = num / den
      Some((if (num % den != 0 && (num.signum != den.signum)) q - 1
            else q).toLong)
    }
    Seq(((nUnits, nUnits * raters, kappa)))
      .toDF("n_units", "n_ratings", "kappa_x1e6")
  }

  /** COHEN'S KAPPA — chance-corrected inter-rater agreement between two
    * categorical raters (label-QA for annotation pipelines: human vs
    * model labels, two annotators, heuristic vs stored metadata).
    * κ = (p₀ − pₑ)/(1 − pₑ); denominators cleared to pure integers:
    * `kappa_x1e6 = ⌊(n·agree − Σ_c aᶜ·bᶜ)·10⁶ / (n² − Σ_c aᶜ·bᶜ)⌋`
    * with aᶜ/bᶜ the per-category marginals — exact at any scale via
    * BigInt, floor (not truncate: κ < 0 means below-chance agreement).
    * NULL when pₑ = 1 (both raters constant — κ undefined). Rows with a
    * NULL rating on either side drop (no agreement evidence).
    *
    * Shape: ONE distributed aggregate to the (a, b) confusion matrix —
    * category-space-sized, never data-sized — then marginal products on
    * the driver (the calendar-grid-bounded driver-chain posture).
    * Returns one row: (`n_items`, `agree`, `kappa_x1e6`). */
  def cohensKappa(df: DataFrame, raterA: String, raterB: String,
      maxCells: Int = 1000000): DataFrame = {
    require(maxCells >= 1, s"maxCells must be >= 1, got $maxCells")
    val spark = df.sparkSession
    import spark.implicits._
    // loud cap (explicit form of the category²-bound): a data-sized
    // label column would make the confusion matrix data-sized — pull
    // at most cap+1 rows, never an unbounded driver materialize
    val cm = df
      .filter(col(s"`$raterA`").isNotNull && col(s"`$raterB`").isNotNull)
      .groupBy(col(s"`$raterA`").cast("string").as("_a"),
        col(s"`$raterB`").cast("string").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .limit(maxCells + 1)
      .as[(String, String, Long)].collect()
    require(cm.length <= maxCells,
      s"cohensKappa: > $maxCells distinct (raterA, raterB) label pairs " +
        "- the driver confusion matrix is category-space-sized by " +
        "design; bucket the label columns into a bounded category set " +
        "or raise maxCells")
    val n = cm.iterator.map(r => BigInt(r._3)).sum
    val agree = cm.iterator.filter(r => r._1 == r._2)
      .map(r => BigInt(r._3)).sum
    val ma = cm.groupBy(_._1).view
      .mapValues(_.iterator.map(r => BigInt(r._3)).sum).toMap
    val mb = cm.groupBy(_._2).view
      .mapValues(_.iterator.map(r => BigInt(r._3)).sum).toMap
    val pe = ma.keySet.intersect(mb.keySet).iterator
      .map(c => ma(c) * mb(c)).sum
    val den = n * n - pe
    val kappa: Option[Long] = if (den == 0) None else {
      val num = (n * agree - pe) * 1000000
      // BigInt / truncates toward zero; correct to the floor
      val q = num / den
      Some((if (num % den != 0 && (num.signum != den.signum)) q - 1
            else q).toLong)
    }
    Seq((n.toLong, agree.toLong, kappa))
      .toDF("n_items", "agree", "kappa_x1e6")
  }
}
