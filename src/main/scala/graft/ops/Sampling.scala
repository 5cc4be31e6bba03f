package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus construction — the "data
  * mixing" step of a training pipeline (downsample over-represented
  * strata to target proportions, cap sources at token budgets, repeat
  * under-represented sources for multiple epochs) without RNG state:
  * sample membership is a pure function of the row's key, so re-runs,
  * retries, and other engines agree row-for-row (same portability
  * argument as the md5 train/eval split, `q_stable_split`).
  */
object Sampling {

  /** Keep EXACTLY floor(fraction·(n−1))+1 rows of each stratum (n = the
    * stratum's row count; a 1-row stratum is always kept — except at
    * fraction 0.0, which drops the stratum), selected
    * deterministically by an md5-keyed pseudo-random order.
    *
    * Scale shape — the q_pack lesson applied to sampling: a single
    * per-stratum window would serialize each stratum onto one task (a
    * ~5-value language column ⇒ 5 tasks own the whole corpus at 100 TB).
    * Instead, two passes:
    *
    *  1. rank within (stratum, shard), where shard = 2 hex chars of the
    *     row's md5 — 256 balanced shards per stratum, so the data-sized
    *     window is keyed on high cardinality;
    *  2. aggregate the tiny (stratum, shard) counts, prefix-sum them in
    *     shard order (strata × 256 rows — driver-scale), broadcast back,
    *     and keep rows whose shard-offset global rank clears the
    *     stratum's quota.
    *
    * The induced permutation (shards concatenated in hex order, md5 order
    * within a shard) is a fixed deterministic function of the keys, and
    * every ingredient — md5, substring, row_number, prefix sums — is
    * ANSI-portable, so the operator is oracle-checkable bit-for-bit.
    * Exact per-stratum quotas are this operator's contract; when ~fraction
    * in expectation is enough, a plain `md5(key) < threshold` filter is
    * row-local and needs no window at all (see `q_stable_split`). */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    stratifiedBy(df, strataCol, keyCol, lit(fraction))
  }

  /** Per-stratum fractions — the DATA-MIXING operator proper: downsample
    * each source to its target weight in one pass (e.g. keep all of a
    * high-quality source, 10% of a crawl). Strata are matched on their
    * string form; strata absent from `fractions` keep `defaultFraction`,
    * and a fraction of exactly 0.0 drops its stratum entirely (no
    * keep-at-least-one floor — the default 0.0 means "not in the mix").
    * Same exact-quota, shard-balanced machinery as [[stratified]] —
    * the fraction only enters the final quota comparison, so the plan
    * shape (and the 100 TB posture) is identical. */
  def stratifiedWeighted(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0,1], got $f"))
    stratifiedBy(df, strataCol, keyCol,
      perStratum(strataCol, fractions, defaultFraction))
  }

  /** Temperature-based mixture resampling — the multilingual/multi-domain
    * rebalancing rule (sample strata ∝ n^α, α ∈ (0,1]): α = 1 keeps the
    * natural distribution, α → 0 flattens toward uniform, and the
    * standard α = 0.5…0.7 lifts low-resource strata without letting a
    * giant crawl stratum dominate the budget. Selects a TOTAL of ≈
    * `budget` rows (floor-rounding per stratum, capped at the stratum's
    * size — this is sampling without replacement; pair with [[upsample]]
    * when a recipe wants multi-epoch repetition of tiny strata).
    *
    * Determinism/portability: per-stratum integer weight
    * w = ⌊n^α · 10⁶⌋ — for the default α = 0.5 that is ⌊√n · 10⁶⌋, and
    * IEEE-754 requires √ to be correctly rounded, so w is bit-exact on
    * every engine (other α go through `pow`, ≤1-ulp on practical libms —
    * documented, not oracle-declared). Targets are then EXACT integer
    * arithmetic in decimal space, t = (budget·w) div Σw (no long
    * overflow even at 10⁹-row budgets × 10¹²-row strata), and membership
    * rides [[stratified]]'s md5 shard-major rank — one data-sized window
    * on (stratum, shard), broadcast offsets, broadcast targets. */
  def temperatureResample(df: DataFrame, strataCol: String, keyCol: String,
      budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val nPow =
      if (alpha == 0.5) sqrt(col("_sn").cast("double"))
      else pow(col("_sn").cast("double"), lit(alpha))
    val strata = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_sn"))
      .withColumn("_w", floor(nPow * lit(1000000.0)))
    val totRow = strata.agg(
      sum(col("_w").cast("decimal(38,0)")).as("_tw"))
    val targets = broadcast(strata.crossJoin(broadcast(totRow))
      .select(col(strataCol).as("_t_strata"),
        least(
          Fixed.ldiv(
            lit(budget).cast("decimal(38,0)") * col("_w"), col("_tw")),
          col("_sn")).as("_tgt")))
    withGlobalRank(df, strataCol, keyCol)
      .join(targets, col(strataCol) <=> col("_t_strata"))
      .filter(col("_grank") <= col("_tgt"))
      .drop("_grank", "_n", "_t_strata", "_tgt")
  }

  /** Token-budget mixing: keep each stratum's rows, in the deterministic
    * md5 order, until the CUMULATIVE WEIGHT (token count) reaches the
    * stratum's budget — "give me at most 10 B tokens of crawl, 2 B of
    * code". A row is kept iff the running total INCLUDING it is ≤ the
    * budget, so kept weight never exceeds the budget (a first row larger
    * than the whole budget is dropped). Budgets match the stratum's
    * string form; absent strata get `defaultBudget` (default unlimited).
    *
    * Same two-pass shard scheme as [[stratified]], with ranks generalized
    * to weighted prefix sums: within-shard running weight (window keyed
    * on (stratum, shard) — high cardinality), plus broadcast per-shard
    * exclusive weight offsets. ANSI-portable ⇒ bit-exact oracle. */
  def tokenBudget(df: DataFrame, strataCol: String, keyCol: String,
      weightCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue): DataFrame = {
    (budgets.values ++ Seq(defaultBudget)).foreach(b =>
      require(b >= 0L, s"budgets must be >= 0, got $b"))
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, b)) =>
        when(col(strataCol).cast("string") === stratum, lit(b)).otherwise(acc)
    }
    val w = col(weightCol).cast("long")
    val withH = withShard(df, keyCol)
    val wShard = Window.partitionBy(col(strataCol), col("_shard"))
      .orderBy(col("_h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, 0) // inclusive running sum
    val ranked = withH.withColumn("_cum_local", sum(w).over(wShard))
    val totals = withH.groupBy(col(strataCol), col("_shard"))
      .agg(sum(w).as("_sw"))
    val wOff = Window.partitionBy(col(strataCol)).orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum(col("_sw")).over(wOff), lit(0L)))
      .select(col(strataCol).as("_o_strata"), col("_shard").as("_o_shard"),
        col("_off"))
    ranked.join(broadcast(offsets),
        col(strataCol) <=> col("_o_strata") && col("_shard") === col("_o_shard"))
      .filter(col("_off") + col("_cum_local") <= budget)
      .drop("_h", "_shard", "_cum_local", "_off", "_o_strata", "_o_shard")
  }

  /** Epoch mixing — the general per-source repeat/downsample operator of
    * an LLM data recipe (e.g. Wikipedia ×3.5 epochs, crawl ×0.3): each
    * stratum's weight w expands every row to ⌊w⌋ copies, and the first
    * ⌊frac(w)·n⌋ rows of the stratum's deterministic md5 order get one
    * extra copy — so the stratum contributes ⌊w⌋·n + ⌊frac(w)·n⌋ ≈ w·n
    * rows total. Weights < 1 therefore downsample (0 base copies, the
    * fractional quota survives) and weights > 1 upsample; output carries
    * an `epoch` column (0-based copy index) so downstream shuffles/splits
    * can tell copies apart.
    *
    * NOTE the fractional quota is ⌊frac·n⌋ (never rounds a 0-fraction up
    * — weight 2.0 means EXACTLY 2 copies of everything), unlike
    * [[stratified]]'s keep-at-least-one ⌊f·(n−1)⌋+1 contract.
    *
    * Scale: the quota machinery is [[stratified]]'s (sharded rank +
    * broadcast offsets); the copy expansion is a row-local
    * explode(sequence) — no extra shuffle, output size is the mixed
    * corpus itself. */
  def upsample(df: DataFrame, strataCol: String, keyCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    (weights.values ++ Seq(defaultWeight)).foreach(w =>
      require(w >= 0.0, s"weights must be >= 0, got $w"))
    val weight = perStratum(strataCol, weights, defaultWeight)
    val base = floor(weight).cast("long")
    val ranked = withGlobalRank(df, strataCol, keyCol)
    val extraQuota = floor((weight - base) * col("_n"))
    ranked
      .withColumn("_copies",
        base + when(col("_grank") <= extraQuota, 1L).otherwise(0L))
      .filter(col("_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_grank", "_n", "_copies")
  }

  /** String-matched per-stratum constant (fraction/weight) lookup. */
  private def perStratum(strataCol: String, values: Map[String, Double],
      default: Double): Column =
    values.foldLeft(lit(default)) { case (acc, (stratum, v)) =>
      when(col(strataCol).cast("string") === stratum, lit(v)).otherwise(acc)
    }

  // md5(NULL) is NULL → a NULL shard would fall out of the offsets join
  // below while still counting toward _n, silently shrinking its
  // stratum's quota; hash NULL keys via a sentinel instead. Rank order
  // among equal keys (duplicates or several NULLs) is arbitrary-but-
  // quota-exact; keys are expected unique for full determinism.
  private def withShard(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("_h",
        md5(coalesce(col(keyCol).cast("string"), lit(" null"))))
      .withColumn("_shard", substring(col("_h"), 9, 2))

  /** The shared two-pass construction: every row gains its stratum-global
    * deterministic rank `_grank` (1-based, shard-major md5 order) and the
    * stratum size `_n`. The data-sized window keys on (stratum, shard);
    * only the strata × 256 count rows ride stratum-keyed windows. */
  private def withGlobalRank(df: DataFrame, strataCol: String,
      keyCol: String): DataFrame = {
    val withH = withShard(df, keyCol)
    val wShard = Window.partitionBy(col(strataCol), col("_shard"))
      .orderBy(col("_h"), col(keyCol))
    val ranked = withH.withColumn("_rn", row_number().over(wShard))
    val counts = withH.groupBy(col(strataCol), col("_shard"))
      .agg(count(lit(1)).as("_c"))
    val wOff = Window.partitionBy(col(strataCol)).orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col(strataCol))
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(wTot))
      .select(col(strataCol).as("_o_strata"), col("_shard").as("_o_shard"),
        col("_off"), col("_n"))
    // null-SAFE equality on the stratum: windows and groupBy treat NULL
    // as a normal group, but a null-unsafe join key would silently drop
    // the whole NULL stratum — violating the every-stratum contract
    ranked.join(broadcast(offsets),
        col(strataCol) <=> col("_o_strata") && col("_shard") === col("_o_shard"))
      .withColumn("_grank", col("_rn") + col("_off"))
      .drop("_h", "_shard", "_rn", "_off", "_o_strata", "_o_shard")
  }

  // quota floor(f·(n−1))+1 keeps at least one row of every NONZERO-weight
  // stratum (the documented contract); fraction 0 means DROP THE STRATUM —
  // without the explicit zero case the +1 would leak one row per unlisted
  // stratum through stratifiedWeighted's defaultFraction = 0.0 (at 10⁶ web
  // domains that is 10⁶ unwanted documents in a "wiki only" mix)
  private def stratifiedBy(df: DataFrame, strataCol: String, keyCol: String,
      fraction: Column): DataFrame =
    withGlobalRank(df, strataCol, keyCol)
      .filter(fraction > 0.0 &&
        col("_grank") <= floor(fraction * (col("_n") - 1)) + 1)
      .drop("_grank", "_n")

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement: keep the
    * k rows of each stratum whose A-ES key ln(u)/w is LARGEST, where u is
    * a per-row deterministic uniform and w the row's weight — each row's
    * inclusion probability is then proportional to its weight (exactly
    * the A-ES reservoir semantics), so "sample 10k docs per language
    * biased toward high quality" is one declarative pass with no RNG
    * state. u derives from a seeded md5 (48-bit prefix, exactly
    * representable in a double; +0.5 keeps u in (0,1) so ln never sees
    * 0), making the draw a pure function of (seed, key) — re-runs,
    * retries, and other engines agree row-for-row. Rows with NULL or
    * non-positive weight are dropped (they have zero inclusion mass).
    *
    * Scale — the [[stratified]] lesson: a stratum-keyed top-k window
    * would serialize each stratum onto one task, so selection runs in
    * two prunes: (1) top-k within (stratum, md5-shard) — 256 balanced
    * shards, high-cardinality window key, and the rank≤k filter rewrites
    * to WindowGroupLimit so per-task state is a bounded heap; (2) top-k
    * among the ≤256·k survivors per stratum — input size independent of
    * corpus size. Stage 1 can only over-select (a stratum's true top-k
    * rows are each top-k within their own shard), so the composition
    * equals the single-window form — spec-asserted. ln and / are the
    * only float ops and both are ≤1-ulp on every engine; a selection
    * flip needs two keys within 1 ulp at the k-th boundary, so the
    * operator stays oracle-checkable in practice. */
  def weightedSample(df: DataFrame, strataCol: String, keyCol: String,
      weightCol: String, k: Int, seed: String = "wsample"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = shuffleKey(col(keyCol), seed)
    val u48 = conv(substring(h, 1, 12), 16, 10).cast("long").cast("double")
    val aesKey = log((u48 + lit(0.5)) / lit(281474976710656.0)) /
      col(weightCol).cast("double")
    val keyed = df
      .filter(col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0.0)
      .withColumn("_skey", aesKey)
      .withColumn("_shard", substring(h, 9, 2))
    val wShard = Window.partitionBy(col(strataCol), col("_shard"))
      .orderBy(col("_skey").desc, col(keyCol))
    val wStratum = Window.partitionBy(col(strataCol))
      .orderBy(col("_skey").desc, col(keyCol))
    keyed
      .withColumn("_rn", row_number().over(wShard))
      .filter(col("_rn") <= k)
      .withColumn("_rk", row_number().over(wStratum))
      .filter(col("_rk") <= k)
      .drop("_skey", "_shard", "_rn", "_rk")
  }

  /** Deterministic pseudo-random sort key for `id` under `seed` — the
    * engine-portable stand-in for `rand()`-ordering: same seed ⇒ same
    * permutation on every engine, every retry. NULL ids hash via the
    * [[withShard]] sentinel (a bare concat_ws would silently SKIP the
    * null and collapse to md5(seed), diverging from SQL `||` semantics);
    * all NULL ids share one key, so keys are expected unique for full
    * determinism. */
  def shuffleKey(id: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed),
      coalesce(id.cast("string"), lit(" null"))))

  /** Deterministic global shuffle — training corpora are written in a
    * pseudo-random order so batches decorrelate from crawl/source order,
    * and a seeded md5 order makes that reproducible run-to-run (resume,
    * re-shard, or audit a batch composition months later). At scale this
    * is Spark's sort machinery: one range-partitioned exchange + local
    * sorts, no single-task bottleneck. Tie-break on `idCol` keeps the
    * order total even under (astronomically unlikely) digest collisions. */
  def globalShuffle(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.orderBy(shuffleKey(col(idCol), seed).asc, col(idCol).asc)

  /** Assign each row a shard in [0, numShards) by seeded hash — the
    * write-side partitioner for training shards (`.write.partitionBy` or
    * `repartition(col)` on the result). Pure function of (seed, id):
    * adding rows never moves existing ones between shards, so shards can
    * be built incrementally. Narrow projection, no shuffle. */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int,
      seed: String = "shard"): DataFrame = {
    require(numShards > 0, s"numShards must be > 0, got $numShards")
    df.withColumn("shard",
      (conv(substring(shuffleKey(col(idCol), seed), 1, 8), 16, 10)
        .cast("long") % numShards).cast("int"))
  }

  /** Write `df` as the training-shard layout: `<path>/shard=<k>/...`
    * parquet directories under [[shardAssign]]'s seeded-hash assignment.
    * Readers address one shard as a directory (partition pruning at
    * file-listing time — the IVF-index discipline applied to training
    * data); because the assignment is a pure function of (seed, id),
    * re-running over a grown corpus rewrites each shard with its rows'
    * membership unchanged. One exchange on the shard id so each shard
    * writes from its own tasks rather than every task appending to every
    * shard directory (numShards × tasks small files otherwise). */
  def writeShards(df: DataFrame, idCol: String, numShards: Int,
      path: String, seed: String = "shard"): Unit =
    shardAssign(df, idCol, numShards, seed)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Proportional source interleaving — the data-loader "interleave
    * datasets" order as a STABLE, reproducible column: each source's
    * i-th row (under `order`, within-source) gets fractional position
    * `(i − 0.5)/n_source` in [0, 1], and the global order sorts by that
    * fraction — so every prefix of the epoch holds each source in
    * proportion to its size (a 2:1 corpus reads 2:1 in every window, not
    * in alternating famines), with no RNG and no coordination. Append
    * `posCol` = the 1-based global position.
    *
    * Scale: both passes are the skew-safe rank machinery — a grouped
    * rank per source and a global rank on the fraction ([[Rank]]);
    * nothing keys a data-sized window on the low-cardinality source.
    * Deterministic whenever `order` is total within each source (add an
    * id tiebreak). */
  def interleaveBySource(df: DataFrame, sourceCol: String,
      order: Seq[Column], posCol: String = "pos"): DataFrame = {
    val rk = Iterator.iterate("_il_rk")(_ + "_")
      .dropWhile(df.columns.contains).next()
    val n = Iterator.iterate("_il_n")(_ + "_")
      .dropWhile(df.columns.contains).next()
    val frac = Iterator.iterate("_il_frac")(_ + "_")
      .dropWhile(df.columns.contains).next()
    val ranked = Rank.groupedRank(df, Seq(sourceCol), order, rk,
        countCol = Some(n))
      .withColumn(frac,
        (col(rk).cast("double") - lit(0.5)) / col(n).cast("double"))
    Rank.globalRank(ranked,
        Seq(col(frac).asc, col(sourceCol).asc, col(rk).asc), posCol)
      .drop(rk, n, frac)
  }

  /** SCORE-ordered top fraction per group — "keep the best 30% per
    * source", the relative-threshold quality gate (an absolute cut like
    * `quality >= 0.5` keeps different volumes per domain; a percentile
    * cut keeps the SHAPE of the mix). Keeps rows whose percent-rank
    * `(rank − 1)/(n − 1)` over (score desc, tieBreak asc) is ≤ `frac`;
    * the unique tie-break makes the kept set deterministic,
    * engine-portable, and EQUAL to SQL `percent_rank() <= frac`
    * (row_number == rank under a total order; single-row groups rank 0,
    * percent_rank's own convention).
    *
    * Scale: the rank comes from [[graft.ops.Rank.groupedRank]] — a range
    * exchange on (group, score, tieBreak) with broadcast prefix offsets —
    * never a window on the group key alone, so a 100 TB source does NOT
    * become one sorted task (the low-cardinality-window trap this used to
    * have). */
  def topFractionPerGroup(df: DataFrame, groupCol: String, score: Column,
      tieBreak: String, frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    // fresh temp names (AsOfJoin/ZOrder discipline): never clobber user
    // columns that happen to share the names
    val rk = Iterator.iterate("_pfg_rk")(_ + "_")
      .dropWhile(df.columns.contains).next()
    val n = Iterator.iterate("_pfg_n")(_ + "_")
      .dropWhile(df.columns.contains).next()
    Rank.groupedRank(df, Seq(groupCol),
        Seq(score.desc, col(tieBreak).asc), rk, countCol = Some(n))
      .filter(when(col(n) === 1L, lit(0.0))
        .otherwise((col(rk) - lit(1L)).cast("double") /
          (col(n) - lit(1L)).cast("double")) <= frac)
      .drop(rk, n)
  }
}
