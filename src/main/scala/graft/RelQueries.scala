package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.{EventFunnel, Tables}
import graft.ops.{AsOfJoin, Salt, Scd2}

/** Remaining relational [EXT] operators (SURVEY §2.3/2.6/2.7): global
  * sort+limit, set operations, banded range join, as-of join, approx
  * distinct. */
object RelQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.withEpochMicros(t(s, dir, "events"))

  // STAGED-WAVE cache (the PipelineQueries.stage posture, blessed since
  // r11): every wave file a real-stream gate query stages is a PURE
  // FUNCTION of (testdata dir, wave spec) — byte-identical across
  // invocations — so it is WRITTEN once per (dir, key) per JVM and each
  // run COPIES the bytes into its fresh workspace (copy, not symlink:
  // the file-stream's mod-time ordering needs a per-run mtime on a
  // per-run inode). The bench's min-of-N then times the streaming
  // computation, not a repeated fixture write; checkpoints, stream
  // state, and outputs stay per-invocation.
  private val stagedWaves = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.nio.file.Path]()

  private def stagedWaveFile(dir: String, key: String)(df: => DataFrame)
      : java.nio.file.Path =
    stagedWaves.computeIfAbsent((dir, key), _ => {
      val d = java.nio.file.Files.createTempDirectory(
        s"graft_wave_${ProcessHandle.current().pid()}_$key")
      df.coalesce(1).write.parquet(d.resolve("data").toString)
      d.resolve("data").toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
    })

  private def placeWave(src: java.nio.file.Path,
      dest: java.nio.file.Path, mtime: Long): Unit = {
    java.nio.file.Files.copy(src, dest)
    dest.toFile.setLastModified(mtime)
    ()
  }

  /** Session clone with the stateful-stream shuffle partition count
    * sized to the stream's INPUT BYTES instead of inherited from the
    * batch default. A stateful streaming operator fixes its state-store
    * partition count forever at the first checkpointed batch — the one
    * partitioning decision AQE can never coalesce — and every
    * micro-batch then pays one state-store open/commit per partition
    * PER OPERATOR, so an input holding a few hundred keys spread over
    * `cpus` stores is pure per-batch overhead at ANY scale (measured
    * locally: 32 -> sized stores halves the stateful gate streams).
    * Sizing: one state partition per ~32 MB of input, floored at 1,
    * capped at the session's default parallelism (the same
    * bytes-per-partition posture as AQE's advisory size; grows with
    * the data, not with the local core count). The clone shares the
    * SparkContext (and its SparkConf defaults — nanosAsLong, UTC TZ);
    * only the cloned SQLConf's shuffle partitions differ, so batch
    * queries on the base session are untouched. Results are
    * partitioning-independent by construction (integer aggregates,
    * per-key state) and oracle-checked. */
  private def statefulStreamSession(s: SparkSession, inputBytes: Long)
      : SparkSession = {
    val parts = Math.max(1L, Math.min(
      s.sparkContext.defaultParallelism.toLong,
      inputBytes / (32L * 1024 * 1024) + 1))
    val ns = s.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", parts.toString)
    ns
  }

  // memo for the data-derived watermark-pin scalars of the same gate
  // queries: pure functions of the testdata, recomputed per run only to
  // be compared against the stream's progress — cache per (dir, key)
  private val memoLong = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Long]()
  private def memoizedLong(dir: String, key: String)(v: => Long): Long =
    memoLong.computeIfAbsent((dir, key), _ => v)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- [EXT]: first-touch conversion funnel — deepest ordered prefix of
    //    signup → view → purchase completed within 3 days of the first
    //    signup (the ClickHouse-windowFunnel-class sequence query)
    "q_funnel" -> ((s, dir) => {
      EventFunnel.funnel(events(s, dir), "user_id", "event_type", "ts_us",
          steps = Seq("signup", "view", "purchase"),
          windowUs = 3L * 86400000000L)
        .orderBy(col("user_id"))
    }),

    // -- [EXT]: the funnel REPORT — per-step reach + conversion rates
    //    over the sliding-anchor funnel (the dashboard numbers)
    "q_funnel_steps" -> ((s, dir) => {
      EventFunnel.funnelReport(
        EventFunnel.funnelSliding(events(s, dir), "user_id", "event_type",
          "ts_us", steps = Seq("signup", "view", "purchase"),
          windowUs = 86400000000L),
        nSteps = 3)
        .orderBy(col("step"))
    }),

    // -- [EXT]: sliding-anchor funnel (ClickHouse windowFunnel
    //    semantics) — deepest chain from ANY signup anchor within 1 day;
    //    tighter window than q_funnel so the two semantics actually
    //    diverge on the data (a later anchor rescues chains the
    //    first-touch model rejects)
    "q_funnel_sliding" -> ((s, dir) => {
      EventFunnel.funnelSliding(events(s, dir), "user_id", "event_type",
          "ts_us", steps = Seq("signup", "view", "purchase"),
          windowUs = 86400000000L)
        .orderBy(col("user_id"))
    }),

    // -- [EXT]: funnel A/B — per-step reach, conversion vs each
    //    variant's base, and the pooled two-proportion z between
    //    user-parity variants over the sliding-anchor funnel
    "q_funnel_ab" -> ((s, dir) => {
      EventFunnel.funnelAb(events(s, dir), "user_id",
        col("user_id") % 2 === 1, "event_type", "ts_us",
        steps = Seq("signup", "view", "purchase"),
        windowUs = 86400000000L)
    }),

    // -- [EXT]: path analysis — top 20 first-5-event user journeys by
    //    user count (the sankey/flow query that motivates which funnels
    //    to define)
    "q_event_paths" -> ((s, dir) => {
      EventFunnel.eventPaths(events(s, dir), "user_id", "event_type",
          "ts_us", maxEvents = 5)
        .orderBy(col("n_users").desc, col("path").asc)
        .limit(20)
    }),

    // -- [EXT]: daily cohort retention matrix — users cohorted by
    //    first-event day, per (cohort, day offset) active count/fraction
    "q_retention" -> ((s, dir) => {
      EventFunnel.retention(events(s, dir), "user_id", "ts_us",
          periodUs = 86400000000L)
        .orderBy(col("cohort_period"), col("k"))
    }),

    // -- [EXT]: exponential smoothing of daily activity (α = .3) — the
    //    baseline forecast; exact floored micro recurrence, dense spine
    "q_expsmooth" -> ((s, dir) => {
      graft.ops.TimeSeries.exponentialSmooth(events(s, dir), "ts_us",
        periodUs = 86400000000L, alphaX1e6 = 300000L)
        .orderBy(col("period"))
    }),

    // -- [EXT]: CUSUM drift alarm over daily activity — one-sided
    //    cumulative sums vs the spine mean (slack 5, alarm 50 events);
    //    exact integer recurrence, dense day spine
    "q_cusum" -> ((s, dir) => {
      graft.ops.TimeSeries.cusum(events(s, dir), "ts_us",
        periodUs = 86400000000L, kX1e6 = 5000000L, hX1e6 = 50000000L)
        .orderBy(col("period"))
    }),

    // -- [EXT]: classical seasonal decomposition of daily activity —
    //    7-day centered moving-average trend, weekday seasonals,
    //    residual; dense day spine, all-integer micro output
    "q_seasonal_daily" -> ((s, dir) => {
      graft.ops.TimeSeries.seasonalDecompose(events(s, dir), "ts_us",
        periodUs = 86400000000L, seasonLen = 7, trendWindow = 7)
    }),

    // -- [EXT]: Holt double exponential smoothing (α=.3, β=.2) — the
    //    trend-aware forecaster the flat smoother lags by design;
    //    exact floored micro recurrence (floor, not truncate — trends
    //    go negative), dense day spine
    "q_holt" -> ((s, dir) => {
      graft.ops.TimeSeries.holt(events(s, dir), "ts_us",
        periodUs = 86400000000L, alphaX1e6 = 300000L,
        betaX1e6 = 200000L)
        .orderBy(col("period"))
    }),

    // -- [EXT]: Holt–Winters additive triple smoothing (α=.3, β=.1,
    //    γ=.2, weekly season) — level + trend + seasonal state, exact
    //    floored micro recurrence; the oracle carries the 7 seasonal
    //    states through a recursive CTE as a LIST
    "q_holt_winters" -> ((s, dir) => {
      graft.ops.TimeSeries.holtWinters(events(s, dir), "ts_us",
        periodUs = 86400000000L, alphaX1e6 = 300000L,
        betaX1e6 = 100000L, gammaX1e6 = 200000L, seasonLen = 7)
        .orderBy(col("period"))
    }),

    // -- [EXT]: one-step-ahead backtest of the α=.3 smoother —
    //    MAE/RMSE vs the naive last-value baseline and the MASE ratio,
    //    exact micros off the replayable recurrence (Σe² rides the
    //    int128 product sum)
    "q_forecast_eval" -> ((s, dir) => {
      graft.ops.TimeSeries.forecastEval(events(s, dir), "ts_us",
        periodUs = 86400000000L, alphaX1e6 = 300000L)
    }),

    // -- [EXT]: seasonal-residual anomaly flags — |residual| > 3× the
    //    MAD-style lower-median scale over the 7-day decomposition;
    //    exact integers end-to-end
    "q_seasonal_anomaly" -> ((s, dir) => {
      graft.ops.TimeSeries.seasonalAnomaly(events(s, dir), "ts_us",
        periodUs = 86400000000L, kX1e6 = 3000000L)
    }),

    // -- [EXT]: Poisson-bootstrap 95% CI for the mean event value —
    //    200 hash-seeded deterministic resamples, replicate means as
    //    exact floored micros, CI = the 2.5%/97.5% order statistics
    "q_bootstrap_ci" -> ((s, dir) => {
      graft.analytics.Experiment.bootstrapCi(events(s, dir),
        "event_id", "value", replicas = 200)
    }),

    // -- [EXT]: bootstrap uplift CI — percentile interval on the B−A
    //    mean difference (user-parity variants) from the same
    //    hash-seeded Poisson resamples; exact replicate-difference
    //    order statistics, no normal approximation
    "q_uplift_ci" -> ((s, dir) => {
      graft.analytics.Experiment.bootstrapUpliftCi(events(s, dir),
        "event_id", col("user_id") % 2 === 1, "value", replicas = 200)
    }),

    // -- [EXT]: power/MDE readout — the "how long must this test run"
    //    sizing numbers from the observed per-user purchase conversion
    //    (α=.05 two-sided, power=.80, 10% relative MDE); quantized-p
    //    double chain with driver-literal z constants
    "q_power_mde" -> ((s, dir) => {
      graft.analytics.Experiment.powerMde(
        t(s, dir, "events").groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", lit(1L)))
            .as("conv")),
        col("conv").isNotNull)
    }),

    // -- [EXT]: autocorrelation function, lags 1..7 — the seasonality
    //    detector (a lag-7 spike = weekly cycle) feeding
    //    seasonalDecompose's seasonLen; exact integer deviations,
    //    int128 product sums, one decimal floor per lag
    "q_acf" -> ((s, dir) => {
      graft.ops.TimeSeries.acf(events(s, dir), "ts_us",
        periodUs = 86400000000L, maxLag = 7)
    }),

    // -- [EXT]: Theil–Sen robust trend — lower-median pairwise slope +
    //    intercept over the dense day spine (outlier-proof vs OLS);
    //    grid-bounded pairs, skew-safe global-rank medians
    "q_theilsen" -> ((s, dir) => {
      graft.ops.TimeSeries.theilSen(events(s, dir), "ts_us",
        periodUs = 86400000000L)
    }),

    // -- [EXT]: Mann–Kendall trend test — tie-corrected S/Var(S) and
    //    the continuity-corrected z, the significance companion to
    //    q_theilsen; exact longs + one IEEE div/sqrt/div chain
    "q_mk_trend" -> ((s, dir) => {
      graft.ops.TimeSeries.mannKendall(events(s, dir), "ts_us",
        periodUs = 86400000000L)
    }),

    // -- [EXT]: Kendall τ-b between daily activity and daily revenue —
    //    "do busy days also earn?"; exact concordant/discordant/tie
    //    counts over the grid pair frame, one IEEE chain for τ
    "q_kendall" -> ((s, dir) => {
      graft.ops.TimeSeries.kendallTau(events(s, dir), "ts_us",
        "value", periodUs = 86400000000L)
    }),

    // -- [EXT]: difference-in-differences — B's post-vs-pre lift net
    //    of A's (pre/post split at the observed day-range midpoint);
    //    exact quantized cell means, welch-discipline variance chain
    "q_did" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("_day",
        graft.ops.Fixed.ldiv(col("ts_us"), lit(86400000000L)))
      val bnd = broadcast(ev.agg(graft.ops.Fixed.ldiv(
        min(col("_day")) + max(col("_day")) + lit(1L), lit(2L))
        .as("_bnd")))
      graft.analytics.Experiment.diffInDiff(ev.crossJoin(bnd),
        col("user_id") % 2 === 1, col("_day") >= col("_bnd"), "value")
    }),

    // -- [EXT]: fixed-effect meta-analysis of the treatment effect
    //    across event-type segments — inverse-variance pooled θ̂ plus
    //    Cochran's Q / I² heterogeneity; per-segment terms floored to
    //    micros so the cross-segment sums are order-free integers
    "q_meta_effect" -> ((s, dir) => {
      graft.analytics.Experiment.metaEffect(t(s, dir, "events"),
        Seq("event_type"), col("user_id") % 2 === 1, "value")
    }),

    // -- [EXT]: Bradley–Terry preference strengths — the
    //    reward-modeling primitive on pairwise comparisons. Preferences
    //    derive deterministically per user (of two event types both
    //    used, the more-used one wins; equal counts abstain); 10 exact
    //    fixed-point MM rounds
    "q_bradley_terry" -> ((s, dir) => {
      val ut = t(s, dir, "events").filter(col("event_type").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val a = ut.select(col("user_id"), col("event_type").as("ta"),
        col("c").as("ca"))
      val b = ut.select(col("user_id"), col("event_type").as("tb"),
        col("c").as("cb"))
      val prefs = a.join(b, Seq("user_id"))
        .filter(col("ta") < col("tb") && col("ca") =!= col("cb"))
        .select(
          when(col("ca") > col("cb"), col("ta")).otherwise(col("tb"))
            .as("winner"),
          when(col("ca") > col("cb"), col("tb")).otherwise(col("ta"))
            .as("loser"))
      graft.analytics.Preference.bradleyTerry(prefs, "winner", "loser",
        iters = 10)
    }),

    // -- [EXT]: split-conformal prediction interval around a per-type
    //    mean predictor fit on the even-event_id calibration half —
    //    exact order-statistic threshold at 90%, achieved coverage on
    //    the odd half; no doubles beyond the residual itself
    "q_conformal" -> ((s, dir) => {
      val v = col("value").cast("double")
      val ev = t(s, dir, "events")
        .filter(v.isNotNull && !isnan(v) &&
          abs(v) =!= lit(Double.PositiveInfinity))
      val isCal = col("event_id") % 2 === 0
      val model = ev.filter(isCal).groupBy(col("event_type"))
        .agg(graft.ops.Fixed.ldiv(sum(floor(v * lit(1e6))),
          count(lit(1))).as("_pm"))
      val scored = ev.join(broadcast(model), Seq("event_type"))
        .withColumn("pred", col("_pm").cast("double") / lit(1e6))
      graft.analytics.Evaluation.conformalInterval(scored, isCal,
        "pred", "value", alphaX1e6 = 100000L)
    }),

    // -- [EXT]: propensity-stratified ATE — subclassification on a
    //    deterministic md5 pseudo-propensity into quintile VALUE bands
    //    (no tie splits), per-stratum arm means + floored-micro ATE
    //    terms
    "q_strat_ate" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("ate:"),
          col("event_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Experiment.stratifiedAte(
          t(s, dir, "events").withColumn("pscore", score),
          col("user_id") % 2 === 1, "pscore", "value", buckets = 5)
        .orderBy(col("stratum"))
    }),

    // -- [EXT]: RFM segmentation — per-user recency/frequency/monetary
    //    quintile codes via rank-arithmetic ntile (skew-safe ranks)
    "q_rfm" -> ((s, dir) => {
      EventFunnel.rfm(events(s, dir), "user_id", "ts_us", "value")
        .orderBy(col("user_id"))
    }),

    // -- [EXT]: Kaplan–Meier survival over user lifetimes — censoring-
    //    aware churn (day periods; last-period users right-censored)
    "q_kaplan_meier" -> ((s, dir) => {
      EventFunnel.kaplanMeier(events(s, dir), "user_id", "ts_us",
          periodUs = 86400000000L)
        .orderBy(col("duration"))
    }),

    // -- [EXT]: Nelson–Aalen cumulative hazard — the hazard-space twin
    //    of q_kaplan_meier (integer hazard-step sums, fully declarative:
    //    no driver recurrence)
    "q_nelson_aalen" -> ((s, dir) => {
      EventFunnel.nelsonAalen(events(s, dir), "user_id", "ts_us",
          periodUs = 86400000000L)
        .orderBy(col("duration"))
    }),

    // -- [EXT]: log-rank test — do the user-parity variants' survival
    //    curves differ? Exact per-step floored E/V micros over the
    //    duration grid, one IEEE div/sqrt/div chain for z
    "q_logrank" -> ((s, dir) => {
      EventFunnel.logRank(events(s, dir), "user_id",
        col("user_id") % 2 === 1, "ts_us", periodUs = 86400000000L)
    }),

    // -- [EXT]: concurrency curve — peak simultaneous 30-minute
    //    sessions per day (half-open intervals, ends before starts at
    //    a tied instant, carry-in covered); the global running sum
    //    rides the skew-safe PrefixSum machinery
    "q_concurrency" -> ((s, dir) => {
      EventFunnel.concurrency(events(s, dir), "ts_us",
        durationUs = 1800000000L, periodUs = 86400000000L)
    }),

    // -- [EXT]: cohort LTV curve — daily cohorts, exact micro-unit
    //    revenue, cumulative + per-member lifetime value
    "q_ltv_curve" -> ((s, dir) => {
      EventFunnel.ltvCurve(events(s, dir), "user_id", "ts_us",
          "value", periodUs = 86400000000L)
        .orderBy(col("cohort_period"), col("k"))
    }),

    // -- [EXT] §2.6: global sort + limit (TakeOrderedAndProject — top-k on
    //    each partition then k-merge on the driver, never a full sort)
    "q_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // -- [EXT] §2.7: EXCEPT (distinct) — buyers with open orders minus
    //    buyers with finished orders
    "q_set_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
        .except(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    }),

    // -- [EXT] §2.7: INTERSECT (distinct)
    "q_set_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    }),

    // -- [EXT] §2.7b: NATIVE recursive CTE (Spark 4.1 WITH RECURSIVE,
    //    UNION ALL member — driver-coordinated iteration, each step a
    //    distributed job; see RecursiveCteSpec for the expressible
    //    class). A hierarchy ROLLUP over the 10-ary key tree derived
    //    from customer keys (parent = custkey DIV 10, truncating — the
    //    rolled-up-account-code shape): the closure pairs every node
    //    with each ancestor, then aggregates descendant count, max
    //    depth, and exact micro balance per ancestor. Depth is
    //    O(log10 keys) ≈ 6, so recursion rows are n·log n — linear-ish
    //    per level, one shuffle per level, no path explosion (tree, not
    //    cyclic graph; cyclic closures stay with ConnectedComponents).
    "q_recursive_cte" -> ((s, dir) => {
      s.sql(
        s"""WITH RECURSIVE up(custkey, anc, depth) AS (
           |  SELECT c_custkey, c_custkey DIV 10, 1
           |  FROM parquet.`$dir/customer.parquet` WHERE c_custkey >= 10
           |  UNION ALL
           |  SELECT custkey, anc DIV 10, depth + 1 FROM up
           |  WHERE anc >= 10)
           |SELECT u.anc AS anc,
           |  count(*) AS n_desc,
           |  CAST(max(u.depth) AS BIGINT) AS max_depth,
           |  CAST(sum(CAST(floor(c.c_acctbal * 1000000.0) AS BIGINT))
           |    AS BIGINT) AS bal_x1e6
           |FROM up u JOIN parquet.`$dir/customer.parquet` c
           |  ON c.c_custkey = u.custkey
           |WHERE u.anc >= 1
           |GROUP BY u.anc ORDER BY u.anc""".stripMargin)
    }),

    // -- J5 [EXT]: range join with an equi-key anchor — pairs of events of
    //    the same user within a 60 s band. The user_id equi-component keeps
    //    it a hash/sort-merge join (the band is a residual filter); a pure
    //    theta join would degenerate to a nested-loop cross product. At
    //    scale with NO equi key, bucketize time (join on bucket ± 1) to
    //    recover an equi join.
    "q_range_join" -> ((s, dir) => {
      // explicit dataset aliases: both sides descend from the same plan,
      // so a bare a("user_id") === b("user_id") dedups to a trivially-true
      // self-comparison; alias-qualified columns keep the equi-key real
      val e = events(s, dir)
      val a = e.select(col("user_id"), col("event_id").as("id_a"),
        col("ts_us").as("t_a")).alias("ra")
      val b = e.select(col("user_id"), col("event_id").as("id_b"),
        col("ts_us").as("t_b")).alias("rb")
      a.join(b, col("ra.user_id") === col("rb.user_id") &&
          col("id_a") < col("id_b") &&
          abs(col("t_a") - col("t_b")) <= 60000000L)
        .groupBy(col("ra.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // -- J5b [EXT]: interval OVERLAP join with NO equi key — the case the
    //    anchored range join can't express. Each event carries a 120 s
    //    interval; pairs overlap iff |t_a − t_b| <= 120 s. Bucketized to
    //    a (bucket) equi join with a report-once edge condition (see
    //    ops.IntervalJoin) — no CartesianProduct, no output dedup.
    "q_interval_join" -> ((s, dir) => {
      val W = 120000000L // 120 s in µs
      val e = events(s, dir)
      val a = e.select(col("event_id").as("id_a"), col("ts_us").as("s_a"),
        (col("ts_us") + W).as("e_a"))
      val b = e.select(col("event_id").as("id_b"), col("ts_us").as("s_b"),
        (col("ts_us") + W).as("e_b"))
      val pairs = graft.ops.IntervalJoin
        .overlapJoin(a, b, "s_a", "e_a", "s_b", "e_b", W)
        .filter(col("id_a") =!= col("id_b"))
      e.select(col("event_id"))
        .join(pairs.groupBy(col("id_a")).agg(count(lit(1)).as("n")),
          col("event_id") === col("id_a"), "left")
        .select(col("event_id"),
          coalesce(col("n"), lit(0L)).as("n_overlaps"))
        .orderBy(col("event_id"))
    }),

    // -- J6 [EXT]: as-of join — latest order per user at or before each
    //    event time (union + ordered window; see ops.AsOfJoin scale notes)
    "q_asof_join" -> ((s, dir) => {
      val left = events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val right = t(s, dir, "orders")
        .select(col("o_custkey").as("user_id"),
          // o_orderdate is TIMESTAMP_NTZ; session tz is pinned UTC, so the
          // cast reads the same wall-clock instant DuckDB's epoch_us sees
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
          col("o_orderkey"), col("o_totalprice"))
      AsOfJoin(left, right, key = "user_id",
        leftTime = "ts_us", rightTime = "o_us",
        payload = Seq("o_orderkey", "o_totalprice"),
        rightOrderCol = "o_orderkey")
        .orderBy(col("event_id"))
    }),

    // -- J6b [EXT]: as-of join with a staleness TOLERANCE (the pandas
    //    merge_asof bound) — matches staler than 8400 days come back
    //    NULL (orders carry TPC-H-era dates decades before the events,
    //    so the bound splits the corpus near its median staleness)
    "q_asof_tolerance" -> ((s, dir) => {
      val left = events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val right = t(s, dir, "orders")
        .select(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
          col("o_orderkey"), col("o_totalprice"))
      AsOfJoin(left, right, key = "user_id",
        leftTime = "ts_us", rightTime = "o_us",
        payload = Seq("o_orderkey", "o_totalprice"),
        rightOrderCol = "o_orderkey",
        tolerance = Some(8400L * 86400000000L))
        .orderBy(col("event_id"))
    }),

    // -- J6c [EXT]: FORWARD as-of join (pandas merge_asof
    //    direction='forward') — each order's user's first event AT or
    //    AFTER the order instant; right-row ties take the smallest id
    "q_asof_forward" -> ((s, dir) => {
      val left = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
      val right = events(s, dir)
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("m_eid"), col("value").as("m_value"))
      AsOfJoin(left, right, key = "user_id",
        leftTime = "o_us", rightTime = "ts_us",
        payload = Seq("m_eid", "m_value"), rightOrderCol = "m_eid",
        direction = "forward")
        .orderBy(col("o_orderkey"))
    }),

    // -- J6d [EXT]: NEAREST as-of join — odd events match their user's
    //    closest even event in absolute time; equal distance takes the
    //    backward match (both windows share one hash exchange)
    "q_asof_nearest" -> ((s, dir) => {
      val ev = events(s, dir)
      val left = ev.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val right = ev.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), col("ts_us").as("r_us"),
          col("event_id").as("m_eid"), col("value").as("m_value"))
      AsOfJoin(left, right, key = "user_id",
        leftTime = "ts_us", rightTime = "r_us",
        payload = Seq("m_eid", "m_value"), rightOrderCol = "m_eid",
        direction = "nearest")
        .orderBy(col("event_id"))
    }),

    // -- W2 [EXT]: ranking family. rank/dense_rank rank over a TIED key
    //    (values deterministic even though intra-tie row order is not);
    //    ntile gets a unique order so bucket assignment is deterministic.
    //    NO data-sized window keys on the 5-value segment: rank/dense_rank
    //    are pure functions of the per-(segment, bucket) counts (a tiny
    //    aggregate, windowed there, broadcast back), and ntile derives
    //    from the skew-safe groupedRank via the SQL ntile formula
    //    (first n%k tiles get one extra row) — so at 100 TB no segment
    //    ever serializes through a single task.
    "q_rank_family" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000).cast("long"))
      val ranked = graft.ops.Rank.groupedRank(c, Seq("c_mktsegment"),
        Seq(col("c_acctbal").desc, col("c_custkey").asc), "_ur",
        countCol = Some("_n"))
      val wSeg = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("bal_bucket").desc)
      val bucketRanks = c
        .groupBy(col("c_mktsegment"), col("bal_bucket"))
        .agg(count(lit(1)).as("_bc"))
        .withColumn("rnk", (coalesce(sum(col("_bc")).over(
            wSeg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          + lit(1L)).cast("int"))
        .withColumn("drnk", row_number().over(wSeg))
        .drop("_bc")
      // ntile(k): n = qk + r; first r tiles take q+1 rows (SQL
      // semantics). All-integer arithmetic — no double division that
      // could misfloor at huge group sizes.
      val quartile = expr(
        """CAST(CASE WHEN _ur <= (_n % 4) * ((_n DIV 4) + 1)
          |  THEN ((_ur - 1) DIV ((_n DIV 4) + 1)) + 1
          |  ELSE (_n % 4)
          |    + ((_ur - ((_n % 4) * ((_n DIV 4) + 1)) - 1) DIV (_n DIV 4))
          |    + 1 END AS INT)""".stripMargin)
      ranked.join(broadcast(bucketRanks), Seq("c_mktsegment", "bal_bucket"))
        .withColumn("quartile", quartile)
        // percent_rank/cume_dist close the SQL rank family: under the
        // tie-broken (acctbal, custkey) TOTAL order they are pure
        // functions of (_ur, _n) — (r−1)/(n−1) and r/n — so they too
        // ride the skew-safe rank, never a data-sized window. n=1 →
        // percent_rank 0 (the SQL convention; greatest guards 0/0).
        .withColumn("pct_rank", round((col("_ur") - 1).cast("double") /
          greatest(col("_n") - 1, lit(1L)).cast("double"), 6))
        .withColumn("cume", round(col("_ur").cast("double") /
          col("_n").cast("double"), 6))
        .filter(col("rnk") <= 20)
        .select(col("c_mktsegment"), col("c_custkey"), col("bal_bucket"),
          col("rnk"), col("drnk"), col("quartile"), col("pct_rank"),
          col("cume"))
        .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
    }),

    // -- F7 [EXT]: date_trunc month rollup over order timestamps
    "q_date_trunc" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .orderBy(col("month"))
    }),

    // -- A4 [EXT]: explicit GROUPING SETS — the general form rollup/cube
    //    specialize: exactly the (status, priority) and (status) and
    //    grand-total groupings, no others (cube would add (priority))
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    }),

    // -- A7 [EXT]: EXACT grouped percentiles (percentile_cont) at corpus
    //    scale — the skew-safe groupedRank supplies (rank, n) per group,
    //    the quartile positions p·(n−1) select at most two rows per
    //    (group, p), and a tiny aggregate interpolates exactly like SQL:
    //    lo + (hi − lo)·frac. No per-group sort through one task, no
    //    approximation (q_approx_percentile covers the sketch form).
    "q_exact_percentile" -> ((s, dir) => {
      graft.ops.Percentiles.exactPercentiles(
          t(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity",
          Seq(0.25, 0.5, 0.75))
        .orderBy(col("l_returnflag"), col("p"))
    }),

    // -- A4 [EXT]: cube grouping sets (rollup's sibling; q_rollup covers
    //    the hierarchy case)
    "q_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    }),

    // -- J2 [EXT]: full outer join — per-custkey order/event presence
    "q_join_full" -> ((s, dir) => {
      val o = t(s, dir, "orders").groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_orders"))
      val e = events(s, dir).groupBy(col("user_id").as("k"))
        .agg(count(lit(1)).as("n_events"))
      o.join(e, Seq("k"), "full")
        .select(col("k"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy(col("k"))
    }),

    // -- [EXT] §2.7: UNION (distinct)
    "q_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
        .union(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .distinct()
        .orderBy(col("custkey"))
    }),

    // -- A3 [EXT]: HyperLogLog approx distinct. FULL ORACLE via the
    //    portable dense HLL (md5 hash family, exact-integer harmonic
    //    sum): DuckDB rebuilds the registers and the estimate formula
    //    bit-for-bit, so the driver verifies the ESTIMATES themselves —
    //    stronger than the usual sketch posture (error-bound specs
    //    only). Estimates round to whole counts before compare so a
    //    last-ulp ln() difference cannot flip the match.
    "q_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(udaf(new graft.analytics.PortableHll.HllAggregator(12))
            .apply(graft.functions.HashExpressions
              .md5lo(col("l_partkey").cast("string"))).as("_regs"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"),
          round(graft.analytics.PortableHll.hllEstimate(col("_regs"), 12), 0)
            .cast("long").as("approx_parts"),
          col("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // -- A3 [EXT]: approximate quantile sketch (Greenwald-Khanna via
    //    approx_percentile) — the mergeable-quantile path for 100 TB
    //    profiling where the exact `percentile` sort-per-group is too
    //    heavy. FULL ORACLE via the exactness-forcing configuration
    //    (the q_kll_profile promotion pattern): at accuracy 1e8 the GK
    //    guarantee |rank(returned) − target| ≤ n/accuracy is < 1 rank
    //    for every driver SF, pinning the returned element to the exact
    //    percentile_disc order statistic (empirically bit-equal to
    //    DuckDB quantile_disc at sf0.01 AND sf0.1). The production
    //    default (accuracy 1000, KB-sized summaries) keeps its
    //    rank-error-band spec in SketchSpec.
    "q_approx_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr(
          "approx_percentile(l_quantity, array(0.5, 0.9), 100000000)")
          .as("qtiles"), count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"),
          element_at(col("qtiles"), 1).as("med_qty"),
          element_at(col("qtiles"), 2).as("p90_qty"), col("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // -- A3 [EXT]: count-min-sketch frequency scoring — the point-frequency
    //    member of the mergeable-sketch family (HLL distinct ✓, GK
    //    quantiles ✓, Bloom membership ✓). One ~1 MB sketch over every
    //    token occurrence (single map-side-combined aggregate; counter
    //    adds are exact ⇒ merge-order independent), then each document's
    //    frequent-token share scores in a MAP-ONLY second pass — no
    //    vocabulary join, which at 100 TB is a billions-of-rows build side.
    //    FULL ORACLE via the portable CMS (md5 double hashing,
    //    exact-integer counters — PortableCms): DuckDB rebuilds the
    //    counter table and every min-over-rows estimate exactly, so the
    //    one-sided error contract is driver-verified on real scoring
    //    output, not just spec-asserted. The built-in-hash twin
    //    (Sketches.cmsSketch) keeps its bound/linearity specs.
    "q_cms_frequent_ratio" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val terms = docs.select(explode(
          split(graft.text.TextOps.normalize(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val (counters, nTokens) =
        graft.analytics.Sketches.portableCmsSketch(terms, col("term"))
      // corpus-relative threshold: "appears in ≥0.1% of token mass" is
      // stable across scale factors where an absolute count is not
      graft.analytics.Sketches.frequentTokenRatioPortable(docs, "doc_id",
          "text", counters, minCount = math.max(1L, nTokens / 1000))
        .orderBy(col("doc_id"))
    }),

    // -- A3 [EXT]: HLL sketch-table rollup — per-(lang, source) mergeable
    //    distinct-token sketches built ONCE from the data, then BOTH the
    //    per-lang and the corpus-wide distinct estimates answered from the
    //    KB-sized sketch table alone (register-max union over binary
    //    sketch rows — the raw corpus is not rescanned). At 100 TB the
    //    sketch table is the persisted artifact: a new ingest batch
    //    appends its rows, and register-max merges make re-unions
    //    double-count-proof. FULL ORACLE via the portable dense HLL
    //    (md5 family, exact-integer harmonic sum — see
    //    q_approx_distinct); the DataSketches-backed twin
    //    (Sketches.hllSketchTable) keeps its mergeability / error /
    //    round-trip specs in SketchSpec.
    "q_hll_rollup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val terms = docs.select(col("lang"), col("source"), explode(
          split(graft.text.TextOps.normalize(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val sketches = graft.analytics.Sketches
        .portableHllSketchTable(terms, col("term"), Seq("lang", "source"))
      // ONE rollup aggregate over the sketch table yields every level:
      // per-lang rows + the corpus grand total (lang NULL → "*")
      graft.analytics.Sketches.portableHllRollupEstimate(sketches, Seq("lang"))
        .select(coalesce(col("lang"), lit("*")).as("lang"),
          round(col("distinct_est"), 0).cast("long").as("distinct_est"),
          col("n_rows"))
        .orderBy(col("lang"))
    }),

    // -- A3 [EXT]: HLL sketch-set OVERLAP — pairwise vocabulary
    //    intersection between languages by inclusion–exclusion on the
    //    same mergeable register rows (union = register max; the raw
    //    corpus is never rescanned)
    "q_hll_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val terms = docs.select(col("lang"), explode(
          split(graft.text.TextOps.normalize(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val sketches = graft.analytics.Sketches
        .portableHllSketchTable(terms, col("term"), Seq("lang"))
      graft.analytics.Sketches.portableHllOverlap(sketches, "lang")
        .orderBy(col("key_a"), col("key_b"))
    }),

    // -- A3 [EXT]: KLL quantile sketch-table rollup — the quantile member
    //    of the persisted-sketch-table family (HLL = distinct). Per-(lang,
    //    source) mergeable sketches of document length, then per-lang AND
    //    corpus-wide p10/p50/p90/p99 answered from the KB-sized sketch
    //    rows in one rollup — raw data scanned once, rescans never.
    //    FULL ORACLE via the exact-capacity configuration (the
    //    nprobe=nlist promotion pattern): a KLL sketch whose k exceeds
    //    the stream size never compacts, so it retains every value and
    //    its INCLUSIVE quantiles are the exact order statistics —
    //    identical to SQL percentile_disc. k=65535 (the DataSketches
    //    maximum) ≥ every SF the driver runs; the production default
    //    (k=200, ~2.2 % rank error, few-KB rows) is exercised by
    //    SketchSpec's rank-error-bound / mergeability / round-trip specs.
    "q_kll_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sketches = graft.analytics.Sketches
        .kllSketchTable(docs, col("n_chars"), Seq("lang", "source"),
          k = 65535)
      graft.analytics.Sketches
        .kllRollupQuantiles(sketches, Seq("lang"),
          Seq(0.1, 0.5, 0.9, 0.99), k = 65535)
        .select(coalesce(col("lang"), lit("*")).as("lang"),
          col("n_rows"),
          element_at(col("quantiles"), 1).as("p10"),
          element_at(col("quantiles"), 2).as("p50"),
          element_at(col("quantiles"), 3).as("p90"),
          element_at(col("quantiles"), 4).as("p99"))
        .orderBy(col("lang"))
    }),

    // -- A [EXT]: fixed-width histogram/binning — the numeric-profiling
    //    pass (distribution of document lengths); one hash aggregate on
    //    the bin id
    "q_histogram" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(floor(col("n_chars") / 50).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .select(col("bin"), (col("bin") * 50).as("lo"),
          (col("bin") * 50 + 50).as("hi"), col("n"))
        .orderBy(col("bin"))
    }),

    // -- A [EXT]: pivot (conditional aggregation to columns). Explicit
    //    value list = no extra distinct-values job and a deterministic
    //    column order; absent combos coalesce to 0 like the FILTER'd
    //    counts in the oracle.
    "q_pivot" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val p = events(s, dir).groupBy(col("user_id"))
        .pivot("event_type", types).count()
      types.foldLeft(p)((d, t) =>
        d.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t))
        .orderBy(col("user_id"))
    }),

    // -- F7 [EXT]: date-spine densification — a generated calendar
    //    (`sequence` over the observed min/max) left-joined to the daily
    //    aggregate so gap days appear as explicit zeros; the standard
    //    time-series densification every warehouse needs. The spine is
    //    tiny (one row per day) and broadcastable at any fact scale.
    "q_date_spine" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumn("d", to_date(col("o_orderdate")))
      val agg = o.groupBy(col("d")).agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      val bounds = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      spine.join(agg, Seq("d"), "left")
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy(col("day"))
    }),

    // -- A [EXT]: grouped array aggregation (collect_list/array_agg).
    //    Sorted before joining so the result is order-independent (a
    //    grouped collect has no deterministic order under parallelism);
    //    string-joined so the oracle compare stays scalar.
    "q_array_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          concat_ws("|", sort_array(collect_set(col("event_type"))))
            .as("types"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // -- A [EXT]: unpivot/melt — wide metrics to (metric, value) rows,
    //    the inverse of q_pivot (Dataset.unpivot, Spark 3.4+). Values
    //    pre-cast to one type (unpivot requires it); decimal-exact sums.
    "q_unpivot" -> ((s, dir) => {
      def dsum(c: Column): Column =
        sum(c.cast("decimal(18,2)")).cast("double")
      val agged = t(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).cast("double").as("n_items"))
      agged.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_items")),
        "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // -- A [EXT]: EXACT grouped percentiles (Spark `percentile`, the
    //    sort-based exact form — approx_percentile is the sketch analog).
    //    Both engines define the continuous quantile as linear
    //    interpolation at rank p*(n-1); round(6) absorbs last-ulp
    //    interpolation-order differences.
    "q_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("round(percentile(l_quantity, 0.5), 6)").as("med_qty"),
          expr("round(percentile(l_quantity, 0.9), 6)").as("p90_qty"),
          expr("round(percentile(l_extendedprice, 0.25), 6)").as("p25_price"))
        .orderBy(col("l_returnflag"))
    }),

    // -- A [EXT]: robust per-stratum outlier scoring — median/MAD z-score
    //    (mean/stddev move with the outliers they should flag; the median
    //    pair does not). Exact percentile form for oracle parity; the
    //    100 TB path flips `exact = false` (mergeable GK sketches).
    //    Single double division on identical operands both engines,
    //    rounded at 6.
    "q_robust_z" -> ((s, dir) => {
      graft.ops.Robust.robustZ(t(s, dir, "documents"), "n_chars",
          Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("robust_z"), 6).as("robust_z"),
          (abs(col("robust_z")) > 3.5).as("is_outlier"))
        .orderBy(col("doc_id"))
    }),

    // -- A [EXT]: statistical aggregates (stddev, correlation) computed
    //    from EXACT decimal power sums, then finished in double with the
    //    identical expression on both engines — the builtin stddev/corr
    //    are merge-order-dependent in floating point and cannot
    //    hash-match across engines; power sums shuffle the same one
    //    row per group and are deterministic at any parallelism.
    // -- [EXT]: SCD Type-2 history compaction — per user, collapse the
    //    event stream into validity intervals over event_type (a CDC
    //    change stream compacted into the history-preserving silver
    //    shape). ONE shuffle on user_id; the lag (change detection) and
    //    lead (interval close) windows share partitioning+sort, so the
    //    second WindowExec adds no exchange (PlanSpec). valid_to is
    //    coalesced to -1 for the open interval so the compare never sorts
    //    or hashes a null.
    "q_scd2" -> ((s, dir) => {
      Scd2.scd2(events(s, dir), "user_id", "ts_us", "event_id",
          Seq("event_type"))
        .select(col("user_id"), col("src_event_id"), col("event_type"),
          col("valid_from"),
          coalesce(col("valid_to"), lit(-1L)).as("valid_to"),
          col("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("src_event_id"))
    }),

    // -- [EXT]: SCD2 temporal join — every event joined to the history
    //    interval (from q_scd2's compaction) valid at its timestamp:
    //    the dimension-history lookup pattern. Equi-anchored on user_id
    //    (hash join + residual range filter, no nested loop); each fact
    //    hits exactly one interval by construction.
    "q_scd2_join" -> ((s, dir) => {
      val e = events(s, dir)
      val dim = Scd2.scd2(e, "user_id", "ts_us", "event_id",
        Seq("event_type"))
      val facts = e.select(col("event_id"), col("user_id"),
        col("ts_us"), col("event_type").as("fact_type"))
      Scd2.temporalJoin(facts, dim
            .select(col("user_id"), col("src_event_id"), col("event_type"),
              col("valid_from"), col("valid_to")),
          "user_id", "ts_us")
        .select(col("event_id"), col("user_id"), col("src_event_id"),
          col("event_type").as("dim_type"), col("valid_from"))
        .orderBy(col("event_id"))
    }),

    // -- [EXT]: LEFT temporal join (the r13 capability, on the gate):
    //    the dim history is THINNED to even event_ids, so some users
    //    have no history at all and many facts precede their user's
    //    first interval — under "left" those facts survive with the
    //    interval/attribute columns null-filled instead of dropping
    //    (inner = the q_scd2_join row above). Same hash join + residual
    //    range filter; cardinality-preserving because at most one
    //    interval matches per fact.
    "q_scd2_join_left" -> ((s, dir) => {
      val e = events(s, dir)
      val dim = Scd2.scd2(e.filter(col("event_id") % 2 === 0),
        "user_id", "ts_us", "event_id", Seq("event_type"))
      val facts = e.select(col("event_id"), col("user_id"), col("ts_us"))
      Scd2.temporalJoin(facts, dim
            .select(col("user_id"), col("src_event_id"), col("event_type"),
              col("valid_from"), col("valid_to")),
          "user_id", "ts_us", "left")
        .select(col("event_id"), col("user_id"), col("src_event_id"),
          col("event_type").as("dim_type"), col("valid_from"))
        .orderBy(col("event_id"))
    }),

    // -- [EXT]: LOCF gap fill — NULLs (synthetically punched into every
    //    5th event's value; the corpus has no natural NULLs) carry the
    //    latest preceding per-user observation forward. One key-hash
    //    exchange; leading NULLs stay NULL.
    "q_locf" -> ((s, dir) => {
      val e = events(s, dir).withColumn("v",
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("value")))
      graft.ops.TimeSeries.locf(e, "user_id",
          Seq(col("ts_us").asc, col("event_id").asc), Seq("v"))
        .select(col("event_id"), col("user_id"),
          round(col("v"), 6).as("v_filled"))
        .orderBy(col("event_id"))
    }),

    // -- [EXT]: linear interpolation between the nearest per-user
    //    observations (same punched NULLs); edges degrade to carry-
    //    forward/backward. Forward and backward frames share one
    //    exchange + sort (PlanSpec).
    "q_interpolate" -> ((s, dir) => {
      val e = events(s, dir).withColumn("v",
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("value")))
      graft.ops.TimeSeries.interpolate(e, "user_id", "ts_us",
          Seq(col("ts_us").asc, col("event_id").asc), "v")
        .select(col("event_id"), col("user_id"),
          round(col("v"), 6).as("v_interp"))
        .orderBy(col("event_id"))
    }),

    // -- [EXT]: skew-safe salted equi-join — facts salted into 8 sub-keys,
    //    the per-key dim replicated once per salt, joined on
    //    (key, salt): a hot key's rows spread over 8 shuffle partitions
    //    instead of one task. Result is IDENTICAL to the plain join (the
    //    oracle runs the unsalted form); OpsSpec asserts row-for-row
    //    equality with broadcast disabled and PlanSpec the salted key set.
    "q_salted_join" -> ((s, dir) => {
      val e = events(s, dir)
      val dim = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_count"))
      Salt.saltedJoin(
          e.select(col("event_id"), col("event_type")), dim,
          Seq("event_type"), col("event_id"), factor = 8)
        .select(col("event_id"), col("event_type"), col("type_count"))
        .orderBy(col("event_id"))
    }),

    // -- [EXT]: per-stratum percentile winsorization — clamp the price
    //    column into its [p05, p95] band per return flag (the
    //    keep-the-row robust preprocessing move; bounds via the exact
    //    distributed percentile machinery, broadcast back).
    "q_winsorize" -> ((s, dir) => {
      graft.ops.Robust.winsorize(t(s, dir, "lineitem"),
          "l_extendedprice", Seq("l_returnflag"), pLo = 0.05, pHi = 0.95)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("winsorized"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // -- [EXT]: skew diagnosis — top-20 heaviest event keys with share of
    //    the table (the measurement behind salting factors / AQE skew
    //    thresholds). Map-side-combined count + TakeOrderedAndProject
    //    head + one broadcast total row; the rank window runs over the
    //    <= k-row head only.
    "q_skew_report" -> ((s, dir) => {
      Salt.heavyKeys(t(s, dir, "events"), Seq("user_id"), k = 20)
        .orderBy(col("rank"))
    }),

    "q_stats_agg" -> ((s, dir) => {
      def d(c: Column): Column = c.cast("decimal(38,6)")
      val g = t(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(d(col("l_quantity"))).cast("double").as("sx"),
        sum(d(col("l_quantity") * col("l_quantity"))).cast("double").as("sxx"),
        sum(d(col("l_extendedprice"))).cast("double").as("sy"),
        sum(d(col("l_extendedprice") * col("l_extendedprice")))
          .cast("double").as("syy"),
        sum(d(col("l_quantity") * col("l_extendedprice")))
          .cast("double").as("sxy"))
      g.select(col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
          / (col("n") - 1)), 6).as("std_qty"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
            * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // -- [EXT]: fixed-point PageRank over the supplier→customer shipment
    //    graph (supplier ships a lineitem to the ordering customer). The
    //    graph-quality-prior operator of crawl curation, exercised here
    //    on the star schema's natural digraph; customers are all dangling
    //    (no out-edges), so the teleport/dangling redistribution path is
    //    genuinely load-bearing, not decorative.
    "q_pagerank" -> ((s, dir) => {
      graft.analytics.Graph.pageRank(
          shipmentEdges(s, dir), "src", "dst", iters = 3)
        .select(decodeNode(col("node")).as("node"), col("rank_fp"))
        .orderBy(col("rank_fp").desc, col("node"))
    }),

    // -- [EXT]: per-node degree summary of the same digraph (the
    //    link-farm / hub diagnosis pass)
    "q_graph_degrees" -> ((s, dir) => {
      graft.analytics.Graph.degrees(shipmentEdges(s, dir), "src", "dst")
        .select(decodeNode(col("node")).as("node"), col("out_deg"),
          col("in_deg"))
        .orderBy(col("node"))
    }),

    // -- [EXT]: k-core of the shipment graph — iterative synchronous
    //    peel to the maximal subgraph where every node keeps >= k
    //    neighbors (the cohesion filter before community/influence
    //    analysis); oracle replays the peel rounds as unrolled CTEs
    "q_kcore" -> ((s, dir) => {
      graft.analytics.Graph.kCore(shipmentEdges(s, dir), "src", "dst",
          k = 25)
        .select(decodeNode(col("node")).as("node"), col("core_degree"))
        .orderBy(col("node"))
    }),

    // -- [EXT]: funnel completion-latency percentiles — exact p50/p90/p99
    //    of signup→purchase time among completing users (the SLA numbers
    //    next to the funnel's reach counts), on the skew-safe exact
    //    percentile machinery
    "q_funnel_latency" -> ((s, dir) => {
      val completed = EventFunnel.funnel(events(s, dir), "user_id",
          "event_type", "ts_us",
          steps = Seq("signup", "view", "purchase"),
          windowUs = 3L * 86400000000L)
        .filter(col("step_reached") === 3)
        .select(lit("all").as("cohort"),
          (col("t3_us") - col("t1_us")).as("latency_us"))
      graft.ops.Percentiles.exactPercentiles(completed, Seq("cohort"),
          "latency_us", Seq(0.5, 0.9, 0.99))
        .orderBy(col("p"))
    }),

    // -- [EXT]: event transition matrix (the Markov/sankey backend) —
    //    consecutive-pair counts within user timelines + exact ×10⁶
    //    conditional probabilities P(to | from)
    "q_event_transitions" -> ((s, dir) => {
      EventFunnel.transitions(events(s, dir), "user_id", "event_type",
          "ts_us", orderCol = "event_id")
        .orderBy(col("from_type"), col("to_type"))
    }),

    // -- [EXT]: k-anonymity census over customer quasi-identifiers
    //    (nation × market segment — the linkage-attack bound before
    //    publishing person-adjacent data)
    "q_k_anonymity" -> ((s, dir) => {
      graft.analytics.Profiler.kAnonymity(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), threshold = 5L)
    }),

    // -- [EXT]: l-diversity census — the homogeneity-attack companion
    //    to q_k_anonymity: per (nation × segment) class, at least l
    //    distinct account-balance bands must appear
    "q_l_diversity" -> ((s, dir) => {
      graft.analytics.Profiler.lDiversity(
        t(s, dir, "customer")
          .withColumn("balance_band",
            floor(col("c_acctbal") / lit(1000.0)).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "balance_band",
        threshold = 3L)
    }),

    // -- [EXT]: t-closeness census — the skewness-attack companion:
    //    worst per-class total-variation gap between the class's
    //    balance-band distribution and the table's; exact
    //    common-denominator micros, absent-value tail in closed form
    "q_t_closeness" -> ((s, dir) => {
      graft.analytics.Profiler.tCloseness(
        t(s, dir, "customer")
          .withColumn("balance_band",
            floor(col("c_acctbal") / lit(1000.0)).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "balance_band",
        thresholdX1e6 = 200000L)
    }),

    // -- [EXT]: Cliff's delta — the sample-size-free effect size for
    //    q_mannwhitney's comparison (ties as half-wins via the same
    //    average-rank 2U identity); exact signed micro floor + the
    //    Romano magnitude label
    "q_cliffs_delta" -> ((s, dir) => {
      val v = col("value").cast("double")
      val fin = when(!isnan(v) && abs(v) =!= lit(Double.PositiveInfinity), v)
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((sum(floor(fin * lit(1e6))).cast("double")
            / lit(1e6)).as("y"))
        .withColumn("_isb", col("user_id") % 2 === 1)
      graft.analytics.Experiment.cliffsDelta(units, col("_isb"), "y")
    }),

    // -- [EXT]: Cohen's d / Hedges' g — the PARAMETRIC effect size on
    //    the same per-user spend frame (pooled-SD standardized mean
    //    difference, the unit power analyses quote); exact welch-style
    //    power sums, conventional magnitude bands on the rounded d
    "q_cohen_d" -> ((s, dir) => {
      val v = col("value").cast("double")
      val fin = when(!isnan(v) && abs(v) =!= lit(Double.PositiveInfinity), v)
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((sum(floor(fin * lit(1e6))).cast("double")
            / lit(1e6)).as("y"))
        .withColumn("_isb", col("user_id") % 2 === 1)
      graft.analytics.Experiment.cohenD(units, col("_isb"), "y")
    }),

    // -- [EXT]: Benford's-law first-digit screen over order amounts —
    //    the classic fabricated-data / truncation anomaly check; digit
    //    from the decimal string form (no float log), χ² vs the
    //    log10(1+1/d) expectation
    "q_benford" -> ((s, dir) => {
      graft.analytics.Profiler.benford(t(s, dir, "orders"),
          "o_totalprice")
        .orderBy(col("digit"))
    }),

    // -- [EXT]: pairwise Pearson correlation matrix over the lineitem
    //    measures — one-scan power sums (decimal-exact), long-form
    //    pairs, doubles only in the rounded final formula
    "q_corr_matrix" -> ((s, dir) => {
      graft.analytics.Profiler.correlationMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_a"), col("col_b"))
    }),

    // -- [EXT]: Spearman rank correlation — the monotone-association
    //    companion to q_corr_matrix's Pearson; exact average-rank ties
    //    over the micro-quantized value tables, PrefixSum range exchange
    "q_spearman" -> ((s, dir) => {
      graft.analytics.Profiler.spearman(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice")
    }),

    // -- [EXT]: grouped OLS — closed-form simple regression per
    //    l_returnflag (price-vs-quantity slope/intercept/r2), power sums
    //    in exact floor-micro fixed point via Int128Sum, doubles only in
    //    the rounded closed form
    "q_ols_group" -> ((s, dir) => {
      graft.analytics.Regression.olsByGroup(t(s, dir, "lineitem"),
          Seq("l_returnflag"), "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag"))
    }),

    // -- [EXT]: Cramér's V — bounded association strength between the
    //    document source and language (the absolute-scale companion to
    //    q_mutual_info); exact contingency counts, per-cell χ² terms
    //    fixed-point-summed so the cross-cell total is order-independent
    "q_cramers_v" -> ((s, dir) => {
      graft.analytics.Profiler.cramersV(t(s, dir, "documents"),
        "source", "lang")
    }),

    // -- [EXT]: Gini coefficient of order value per priority class —
    //    the concentration/inequality census; centi-unit quantization,
    //    exact rank·value sums via Int128Sum
    "q_gini" -> ((s, dir) => {
      graft.analytics.Profiler.gini(t(s, dir, "orders"),
          "o_orderpriority", "o_totalprice")
        .orderBy(col("o_orderpriority"))
    }),

    // -- [EXT]: AUC-ROC per variant — Mann–Whitney rank-sum with exact
    //    average-rank tie handling (2·avgrank is an integer); is the
    //    event `value` predictive of purchase within each user-parity
    //    variant?
    "q_auc" -> ((s, dir) => {
      graft.analytics.Evaluation.aucByGroup(
          t(s, dir, "events")
            .withColumn("variant", col("user_id") % 2),
          Seq("variant"), col("event_type") === "purchase", "value")
        .orderBy(col("variant"))
    }),

    // -- [EXT]: F1-optimal decision threshold per variant — sweep every
    //    distinct quantized score as the cutoff, exact integer tp/fp/fn
    //    prefix counts (skew-safe PrefixSum, no single-task window),
    //    argmax f1 with smaller-threshold ties
    "q_best_f1" -> ((s, dir) => {
      graft.analytics.Evaluation.bestF1Threshold(
          t(s, dir, "events").withColumn("variant", col("user_id") % 2),
          Seq("variant"), col("event_type") === "purchase", "value")
        .orderBy(col("variant"))
    }),

    // -- [EXT]: decile lift / cumulative gain per variant — the
    //    score-band targeting table beside q_auc/q_best_f1; exact
    //    rank-band split (positives-first tie convention), all-integer
    //    gain/lift micros
    "q_decile_lift" -> ((s, dir) => {
      graft.analytics.Evaluation.liftTable(
          t(s, dir, "events").withColumn("variant", col("user_id") % 2),
          Seq("variant"), col("event_type") === "purchase", "value")
        .orderBy(col("variant"), col("decile"))
    }),

    // -- [EXT]: Qini / uplift curve — the targeting-model readout on
    //    the pooled score banding (treatment-first, positives-first tie
    //    convention); exact integer cumulative rate differences
    "q_qini" -> ((s, dir) => {
      graft.analytics.Evaluation.qiniCurve(
          t(s, dir, "events"), Seq.empty, col("user_id") % 2 === 1,
          col("event_type") === "purchase", "value")
        .orderBy(col("decile"))
    }),

    // -- [EXT]: average precision (PR-AUC) — the top-of-ranking
    //    companion to q_auc; exact per-positive micro-unit Precision@k
    //    terms, event_id tie-break
    "q_avg_precision" -> ((s, dir) => {
      graft.analytics.Evaluation.averagePrecisionByGroup(
          t(s, dir, "events")
            .withColumn("variant", col("user_id") % 2),
          Seq("variant"), col("event_type") === "purchase", "value",
          "event_id")
        .orderBy(col("variant"))
    }),

    // -- [EXT]: two-sample Kolmogorov–Smirnov — exact rational max-CDF-
    //    gap between the even/odd event-id value distributions (the
    //    binning-free companion to q_numeric_drift)
    "q_ks_test" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.analytics.Profiler.ksTest(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1), "value")
    }),

    // -- [EXT]: numeric drift — the binned-PSI monitor for a continuous
    //    column (event value, even vs odd event ids): equal-width bins
    //    over the pooled range, Laplace-smoothed micro rates, psi_terms
    "q_numeric_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.analytics.Profiler.numericDrift(
          ev.filter(col("event_id") % 2 === 0),
          ev.filter(col("event_id") % 2 === 1),
          "value", bins = 10)
        .orderBy(col("bin"))
    }),

    // -- [EXT]: multi-touch attribution — first/last/linear channel
    //    credit per purchase conversion, credit window resetting at each
    //    conversion; exact integer credits (floor micro-units per
    //    (conversion, channel)), '(direct)' for touchless conversions
    "q_attribution" -> ((s, dir) => {
      graft.analytics.EventFunnel.attribution(events(s, dir),
          "user_id", "event_type", "ts_us", "event_id", "purchase")
        .orderBy(col("channel"))
    }),

    // -- [EXT]: Markov removal-effect attribution — data-driven channel
    //    credit: first-order chain over journeys (reverse-count groups,
    //    trailing suffix -> __null), channel credit = conversion-
    //    probability drop when the channel's node is removed; integer
    //    fixed-point absorption recurrence, engine-replayable
    "q_markov_attrib" -> ((s, dir) => {
      graft.analytics.EventFunnel.markovAttribution(events(s, dir),
          "user_id", "event_type", "ts_us", "event_id", "purchase")
        .orderBy(col("channel"))
    }),

    // -- [EXT]: CUPED variance-reduced A/B readout — per-user spend
    //    adjusted by activity count (the pooled Deng et al. estimator);
    //    unit metrics in portable micro fixed point, power sums exact
    // -- [EXT]: Welch's t-test on per-user spend — the continuous-metric
    //    companion to q_ab_test's proportion z (unequal variances,
    //    Welch–Satterthwaite df); exact micro-unit power sums
    "q_welch_ttest" -> ((s, dir) => {
      val v = col("value").cast("double")
      val fin = when(!isnan(v) && abs(v) =!= lit(Double.PositiveInfinity), v)
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((sum(floor(fin * lit(1e6))).cast("double")
            / lit(1e6)).as("y"))
        .withColumn("_isb", col("user_id") % 2 === 1)
      graft.analytics.Experiment.welchTTest(units, col("_isb"), "y")
    }),

    // -- [EXT]: one-way ANOVA across event types — the k-sample member
    //    of the test family; exact centi-unit sum-of-squares
    //    decomposition, F in the final doubles only
    "q_anova" -> ((s, dir) => {
      graft.analytics.Experiment.anovaF(t(s, dir, "events"),
        "event_type", "value")
    }),

    // -- [EXT]: Kruskal–Wallis H across event types — the NONPARAMETRIC
    //    k-sample twin of q_anova; pooled average ranks, exact decimal
    //    floor cross terms, tie-corrected
    "q_kruskal" -> ((s, dir) => {
      graft.analytics.Experiment.kruskalWallis(t(s, dir, "events"),
        "event_type", "value")
    }),

    // -- [EXT]: Brown–Forsythe (median-centered Levene) across event
    //    types — the VARIANCE-homogeneity check q_anova's F leans on;
    //    exact doubled-centi |x − median| deviations through the same
    //    Int128 F decomposition
    "q_levene" -> ((s, dir) => {
      graft.analytics.Experiment.brownForsythe(t(s, dir, "events"),
        "event_type", "value")
    }),

    // -- [EXT]: Mann–Whitney U on per-user spend — the NONPARAMETRIC
    //    two-sample companion (rank shift, no normality assumption);
    //    exact micro-quantized ranks, tie-corrected z
    "q_mannwhitney" -> ((s, dir) => {
      val v = col("value").cast("double")
      val fin = when(!isnan(v) && abs(v) =!= lit(Double.PositiveInfinity), v)
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((sum(floor(fin * lit(1e6))).cast("double")
            / lit(1e6)).as("y"))
        .withColumn("_isb", col("user_id") % 2 === 1)
      graft.analytics.Experiment.mannWhitneyU(units, col("_isb"), "y")
    }),

    // -- [EXT]: Benjamini–Hochberg FDR across a family of tests. The
    //    p-values here are deterministic pseudo-p's (micro-fraction of
    //    each test cell's spend sum) — the operator is a pure transform
    //    on (test_id, p); real use feeds per-metric test outputs
    "q_bh_fdr" -> ((s, dir) => {
      val v = col("value").cast("double")
      val fin = when(!isnan(v) && abs(v) =!= lit(Double.PositiveInfinity), v)
      val tests = t(s, dir, "events")
        .groupBy(concat(col("event_type"), lit("_"),
          (col("user_id") % 25).cast("string")).as("tid"))
        .agg((pmod(sum(floor(fin * lit(1e6))), lit(1000000L))
            .cast("double") / lit(1e6)).as("p"))
      graft.analytics.Experiment.bhCorrect(tests, "tid", "p")
    }),

    "q_cuped" -> ((s, dir) => {
      // non-finite spend maps to NULL (contributes nothing) — floor(NaN)
      // silently lands 0 in Spark but errors DuckDB's BIGINT cast
      val v = col("value").cast("double")
      val fin = when(!isnan(v) && abs(v) =!= lit(Double.PositiveInfinity), v)
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((sum(floor(fin * lit(1e6))).cast("double")
            / lit(1e6)).as("y"),
          count(lit(1)).as("x"))
        .withColumn("_isb", col("user_id") % 2 === 1)
      graft.analytics.Experiment.cuped(units, col("_isb"), "y", "x")
    }),

    // -- [EXT]: NDCG@10 per source — graded-relevance retrieval eval
    //    with driver-literal log2 discounts (libm-portable), exact
    //    micro-unit DCG/IDCG sums; rel = n_chars % 4, score = md5
    //    fraction, ties broken on doc_id
    "q_ndcg" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("ndcg:"),
          col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Evaluation.ndcgByQuery(
          t(s, dir, "documents")
            .withColumn("rel", col("n_chars") % 4)
            .withColumn("score", score),
          Seq("source"), "doc_id", "rel", "score", k = 10)
        .orderBy(col("source"))
    }),

    // -- [EXT]: calibration (reliability) table — 10 equal-width bins
    //    of a deterministic md5-fraction score vs the purchase rate;
    //    exact bin counts + exact micro-unit mean scores
    "q_calibration" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("cal:"),
          col("event_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Evaluation.calibrationTable(
          t(s, dir, "events").withColumn("score", score),
          col("event_type") === "purchase", "score", bins = 10)
        .orderBy(col("bin"))
    }),

    // -- [EXT]: Brier score + Murphy decomposition — the proper-scoring
    //    scalar beside q_calibration's bins (same md5 score fixture);
    //    exact int128 squared-error sums, floor-micro bin rates
    "q_brier" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("cal:"),
          col("event_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Evaluation.brierDecomposition(
        t(s, dir, "events").withColumn("score", score),
        col("event_type") === "purchase", "score", bins = 10)
    }),

    // -- [EXT]: isotonic (PAV) recalibration over the same bins — the
    //    monotone fit the reliability plot motivates; BigInt-exact
    //    pooling, minimax-characterized oracle
    "q_isotonic" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("cal:"),
          col("event_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Evaluation.isotonicCalibration(
        t(s, dir, "events").withColumn("score", score),
        col("event_type") === "purchase", "score", bins = 10)
    }),

    // -- [EXT]: MRR@10 + HitRate@10 per variant — first-relevant-rank
    //    retrieval eval over per-user rankings (query = user, relevant
    //    = purchase, deterministic md5 score, event_id tie-break);
    //    exact ⌊10⁶/rank⌋ terms, no doubles anywhere
    "q_mrr" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("mrr:"),
          col("event_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Evaluation.mrrByGroup(
          t(s, dir, "events")
            .withColumn("variant", col("user_id") % 2)
            .withColumn("score", score),
          Seq("variant"), Seq("user_id"),
          col("event_type") === "purchase", "score", "event_id", k = 10)
        .orderBy(col("variant"))
    }),

    // -- [EXT]: precision@10 / recall@10 — the set-retrieval readout on
    //    the same deterministic md5-scored ranking as q_mrr; exact
    //    per-query floored-micro terms, macro-averaged
    "q_prec_recall_k" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("mrr:"),
          col("event_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Evaluation.precisionRecallAtK(
          t(s, dir, "events")
            .withColumn("variant", col("user_id") % 2)
            .withColumn("score", score),
          Seq("variant"), Seq("user_id"),
          col("event_type") === "purchase", "score", "event_id", k = 10)
        .orderBy(col("variant"))
    }),

    // -- [EXT]: A/B experiment readout — two-proportion z-test on
    //    user-level purchase conversion, variants split by user_id
    //    parity; exact integer counts, doubles only in the final fixed
    //    op sequence
    "q_ab_test" -> ((s, dir) => {
      graft.analytics.Experiment.abTest(t(s, dir, "events"),
        "user_id", col("user_id") % 2 === 1,
        col("event_type") === "purchase")
    }),

    // -- [EXT]: mixture-SPRT always-valid p — the sequential monitor
    //    beside q_ab_test's fixed-horizon z (peeking-safe by the
    //    supermartingale construction); same user-dedup aggregate,
    //    doubles only in the pinned closed form
    "q_msprt" -> ((s, dir) => {
      graft.analytics.Experiment.msprt(t(s, dir, "events"),
        "user_id", col("user_id") % 2 === 1,
        col("event_type") === "purchase")
    }),

    // -- [EXT]: expected calibration error — the headline scalar of the
    //    q_calibration reliability table (+ max-bin MCE); exact
    //    floor-micro bin gaps
    "q_ece" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("cal:"),
          col("event_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Evaluation.expectedCalibrationError(
        t(s, dir, "events").withColumn("score", score),
        col("event_type") === "purchase", "score", bins = 10)
    }),

    // -- [EXT]: binary log loss — the training objective as an eval
    //    scalar beside q_brier; pinned micro ε-clamp, per-row ln of the
    //    quantized probability, exact floored mean
    "q_logloss" -> ((s, dir) => {
      val score = pmod(conv(substring(md5(concat(lit("cal:"),
          col("event_id").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(1000000L)).cast("double") / lit(1000000.0)
      graft.analytics.Evaluation.logLoss(
        t(s, dir, "events").withColumn("score", score),
        col("event_type") === "purchase", "score")
    }),

    // -- [EXT]: two-sample event-rate z-test — events per active
    //    user-day between the parity arms (intensity, where q_ab_test
    //    reads conversion); exact counts/exposures, doubles only in the
    //    pinned final op sequence
    "q_rate_test" -> ((s, dir) => {
      graft.analytics.Experiment.rateTest(events(s, dir),
        "user_id", "ts_us", col("user_id") % 2 === 1)
    }),

    // -- [EXT]: DAU/MAU stickiness per 30-day window — the engagement
    //    intensity ratio beside q_retention; exact distinct counts and
    //    floored-micro ratios
    "q_stickiness" -> ((s, dir) => {
      EventFunnel.stickiness(events(s, dir), "user_id", "ts_us")
        .orderBy(col("win"))
    }),

    // -- [EXT]: covariate balance table — standardized mean differences
    //    of value / hour-of-day / props length between the arms (the
    //    exchangeability check shown before any causal readout); exact
    //    Int128 power sums, the |SMD| < .1 convention
    "q_cov_balance" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("hour_of_day",
          pmod(graft.ops.Fixed.ldiv(col("ts_us"), lit(3600000000L)),
            lit(24L)).cast("double"))
        .withColumn("props_len", length(col("props")).cast("double"))
      graft.analytics.Experiment.covariateBalance(ev,
        col("user_id") % 2 === 1,
        Seq("value", "hour_of_day", "props_len"))
    }),

    // -- [EXT]: Simpson's-paradox reversal check across hour-of-day
    //    segments — does pooling flip the conversion-difference sign?
    //    Exact integer cross-products, no doubles anywhere
    "q_simpson" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("hour_seg",
        pmod(graft.ops.Fixed.ldiv(col("ts_us"), lit(3600000000L)),
          lit(24L)))
      graft.analytics.Experiment.simpsonCheck(ev, "hour_seg",
          "user_id", col("user_id") % 2 === 1,
          col("event_type") === "purchase")
        .orderBy(col("hour_seg"))
    }),

    // -- [EXT]: risk ratio / odds ratio with log-normal 95% CIs — the
    //    effect-size readout beside q_ab_test's z; exact counts, one
    //    pinned ln/exp double chain
    "q_risk_ratio" -> ((s, dir) => {
      graft.analytics.Experiment.riskRatio(t(s, dir, "events"),
        "user_id", col("user_id") % 2 === 1,
        col("event_type") === "purchase")
    }),

    // -- [EXT]: sample-ratio-mismatch check — the assignment-integrity
    //    gate before any A/B readout, against a deliberately non-even
    //    1/3 design (exercises the general num/(den-num) algebra); the
    //    chi-square is exact integer micros end-to-end
    "q_srm" -> ((s, dir) => {
      graft.analytics.Experiment.srmCheck(t(s, dir, "events"),
        "user_id", col("user_id") % 3 === 0,
        ratioNumB = 1L, ratioDen = 3L)
    }),

    // -- [EXT]: approximate heavy hitters (frequent-items sketch) — top
    //    users per event type from KB-sized mergeable sketch rows,
    //    declared at the exactness-forcing configuration (distinct
    //    items ≤ 0.75·maxMapSize, the map's purge threshold ⇒ no
    //    eviction ⇒ estimates and bounds all equal the true counts —
    //    the sketch-family promotion pattern; 32768·0.75 = 24576 covers
    //    the ≤15k distinct users at every declared scale)
    "q_freq_topk" -> ((s, dir) => {
      val table = graft.analytics.FrequentItems.sketchTable(
        t(s, dir, "events"), "user_id", Seq("event_type"),
        maxMapSize = 32768)
      graft.analytics.FrequentItems.topK(table, "event_type", k = 10)
        .orderBy(col("event_type"), col("rank"))
    }),

    // -- [EXT]: the STATEFUL streaming funnel on the declared surface —
    //    a real flatMapGroupsWithState writeStream execution over the
    //    events file stream (AvailableNow), per-user write-once frontier
    //    state; final per-user depths == the batch first-touch funnel
    //    (its progress rows append via foreachBatch; max(depth) per user
    //    is the funnel state at stream end)
    "q_stream_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val path = s"$dir/events.parquet"
      val schema = s.read.parquet(path).schema
      val tmp = java.nio.file.Files.createTempDirectory("graft-streamfun")
      // state partitions sized to the input (see statefulStreamSession)
      // — the flatMapGroupsWithState per-user funnel state stores
      val f = new java.io.File(path)
      val bytes =
        if (f.isDirectory) f.listFiles().map(_.length()).sum else f.length()
      val ss = statefulStreamSession(s, bytes)
      val stream =
        if (f.isDirectory)
          ss.readStream.schema(schema).parquet(path)
        else ss.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
      val out = tmp.resolve("out").toString
      graft.streaming.StreamOps.funnelWithState(
          graft.analytics.Tables.withEpochMicros(stream),
          "user_id", "event_type", "ts_us",
          steps = Seq("signup", "view", "purchase"),
          windowUs = 3L * 86400000000L)
        .toDF()
        .writeStream
        .outputMode("update") // flatMapGroupsWithState(Update) contract
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .option("checkpointLocation", tmp.resolve("cp").toString)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(out)
        .groupBy(col("key").cast("long").as("user_id"))
        .agg(max(col("stepReached")).as("depth"))
        .orderBy(col("user_id"))
    }),

    // -- [EXT]: T4 watermark late-data DROP on the oracle gate — the
    //    one §2 row whose semantics were spec-only. A REAL two-batch
    //    stream (two staged wave files, maxFilesPerTrigger=1, mod-time
    //    ordered): batch 1 (event_id % 3 != 0) advances the watermark
    //    to max(ts)-delay; batch 2 (% 3 == 0) arrives "late" — rows
    //    whose hour window closed at or before that watermark are
    //    DROPPED by the stateful aggregation; append mode emits exactly
    //    the windows the FINAL watermark closed. The oracle replays the
    //    contract in SQL: Spark tracks the watermark in MILLISECONDS
    //    (max event-time ms − delay ms), drops a late row when its
    //    window end <= watermark, and emits a window when its end <=
    //    the final watermark. delay = 3599999 ms (deliberately not a
    //    round hour) so the ms-floored watermark can never collide with
    //    an hour-aligned window boundary.
    "q_stream_late_drop" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = graft.analytics.Tables.withEpochMicros(
          graft.analytics.Tables(s, dir, "events"))
        .select(col("event_id"), col("ts_us"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-latedrop")
      try {
      val in = tmp.resolve("in"); java.nio.file.Files.createDirectories(in)
      def wave(name: String, df: => DataFrame, mtime: Long): Unit =
        placeWave(stagedWaveFile(dir, s"latedrop_$name")(df),
          in.resolve(s"$name.parquet"), mtime)
      val now = System.currentTimeMillis()
      wave("w1", ev.filter(col("event_id") % 3 =!= 0), now - 600000L)
      // the empty middle batch consumes Spark's one-batch LAG between
      // the eviction watermark and the late-events watermark (since
      // 3.4 the late filter uses the PREVIOUS batch's watermark, so a
      // late wave arriving in the immediately-next batch would not be
      // filtered at all — probed empirically)
      wave("mid", ev.limit(0), now - 300000L)
      wave("w2", ev.filter(col("event_id") % 3 === 0), now)
      val out = tmp.resolve("out").toString
      // state partitions sized to the staged input (see
      // statefulStreamSession) — the windowed aggregate's state stores
      val ss = statefulStreamSession(s,
        in.toFile.listFiles().map(_.length()).sum)
      val stream = ss.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(in.toString)
      val q = stream
        .withColumn("ev_time", timestamp_micros(col("ts_us")))
        .withWatermark("ev_time", "3599999 milliseconds")
        .groupBy(window(col("ev_time"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("n"))
        .writeStream
        .outputMode("append") // emit-on-close: the watermark contract
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .option("checkpointLocation", tmp.resolve("cp").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // PIN the probed Spark internals the oracle depends on, so a
      // Spark upgrade that changes them fails THIS require loud with a
      // name instead of silently hash-mismatching the gate. The
      // oracle's replay assumes exactly: (1) one micro-batch per staged
      // file in mod-time order plus ONE trailing no-data batch doing
      // the final eviction (4 progresses); (2) the w2 batch runs
      // against the ms-floored watermark of w1's data — max(w1 ts)//
      // 1000 − delay — i.e. the empty 'mid' batch consumed Spark's
      // one-batch late-filter lag and nothing fresher leaked in; (3)
      // the final watermark advanced to max(all ts)//1000 − delay (the
      // emit-on-close bound the oracle's HAVING replays). NOT pinned
      // via numRowsDroppedByWatermark: that metric counts pre-shuffle
      // window-PARTIALS, so its value depends on input partitioning.
      val delayMs = 3599999L
      def wmExpect(key: String, f: => DataFrame): Long =
        memoizedLong(dir, s"latedrop_$key")(f
          .agg(max(floor(col("ts_us") / 1000L)).as("m"))
          .collect()(0).getLong(0)) - delayMs
      val wm1Ms = wmExpect("wm1", ev.filter(col("event_id") % 3 =!= 0))
      val wmfMs = wmExpect("wmf", ev)
      val progs = q.recentProgress.toSeq.sortBy(_.batchId)
      def wmOf(i: Int): Long = java.time.Instant
        .parse(progs(i).eventTime.get("watermark")).toEpochMilli
      require(progs.length == 4 && wmOf(2) == wm1Ms && wmOf(3) == wmfMs,
        s"q_stream_late_drop: the stream ran ${progs.length} " +
          "micro-batches with trigger watermarks " +
          progs.map(p => p.eventTime.get("watermark")).mkString("[",
            ", ", "]") +
          s"; the oracle's replay needs 4 (w1, mid, w2, final-evict) " +
          s"with the w2 batch at wm=${wm1Ms}ms and the final batch at " +
          s"wm=${wmfMs}ms - Spark's watermark propagation changed " +
          "(the one-batch late-filter lag / ms floor / no-data final " +
          "batch this query pins); re-probe with tools/LateDropProbe " +
          "and update the oracle")
      s.read.parquet(out).orderBy(col("win_start_us"))
        // the result leaves the temp workspace before the finally
        // deletes it
        .localCheckpoint(true)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile); ()
      }
    }),

    // -- [EXT]: T6 stateful streaming dedup ON THE GATE — a REAL
    //    two-wave `dropDuplicatesWithinWatermark` stream (the
    //    q_stream_late_drop staging pattern: maxFilesPerTrigger=1,
    //    mod-time order, an empty middle batch consuming the one-batch
    //    late-filter lag). Wave 1 registers one row per key (keys
    //    unique per wave, so the within-batch first-wins arbitrariness
    //    never applies); wave 2 replays every key three ways (m = key
    //    % 3): m=0 at +2h (emitted iff the key's state EXPIRED — probed
    //    eviction: expiresAt = ts+delay, evicted iff expiresAt <= wm,
    //    µs-exact — AND the +2h replay is not itself late, which it is
    //    for keys more than 3h older than wave 1's maximum),
    //    m=1 at the same time (late-dropped or state-dropped,
    //    never emitted), m=2 at +30m (provably in the gap where it is
    //    either late or its state is alive — never emitted). The oracle
    //    replays the pinned arithmetic: wm = ms-floored max(w1 ts) −
    //    delay (µs-scaled), late drop iff ts <= wm (µs-exact, probed),
    //    so the result is wave 1 plus the expired-state re-emits.
    //    Probes: tools/DedupWmProbe (eviction strictness, µs vs ms
    //    comparisons, the lag).
    "q_stream_dedup_wm" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val delayMs = 3600000L
      val delayUs = delayMs * 1000L
      val base = graft.analytics.Tables.withEpochMicros(
          graft.analytics.Tables(s, dir, "events"))
        .groupBy(pmod(col("event_id"), lit(499L)).as("k"))
        .agg(max(col("ts_us")).as("ts_us"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-dedupwm")
      try {
      val in = tmp.resolve("in"); java.nio.file.Files.createDirectories(in)
      def wave(name: String, df: => DataFrame, mtime: Long): Unit =
        placeWave(stagedWaveFile(dir, s"dedupwm_$name")(df),
          in.resolve(s"$name.parquet"), mtime)
      val now = System.currentTimeMillis()
      val w2 = base.withColumn("ts_us",
        when(pmod(col("k"), lit(3L)) === 0L, col("ts_us") + 2L * delayUs)
          .when(pmod(col("k"), lit(3L)) === 1L, col("ts_us"))
          .otherwise(col("ts_us") + delayUs / 2L))
      wave("w1", base, now - 600000L)
      wave("mid", base.limit(0), now - 300000L)
      wave("w2", w2, now)
      val out = tmp.resolve("out").toString
      // state partitions sized to the staged input (see
      // statefulStreamSession) — the dedup-state stores
      val ss = statefulStreamSession(s,
        in.toFile.listFiles().map(_.length()).sum)
      val stream = ss.readStream
        .schema(base.schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(in.toString)
      val q = stream
        .withColumn("ev_time", timestamp_micros(col("ts_us")))
        .withWatermark("ev_time", s"$delayMs milliseconds")
        .dropDuplicatesWithinWatermark("k")
        .select(col("k"), col("ts_us"))
        .writeStream
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .option("checkpointLocation", tmp.resolve("cp").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // pin the probed internals (the q_stream_late_drop posture): 4
      // micro-batches, the w2 batch filtering and evicting against the
      // ms-floored watermark of wave 1's data, the final batch at the
      // +2h wave's watermark
      def wmExpect(key: String, f: => DataFrame): Long =
        memoizedLong(dir, s"dedupwm_$key")(f
          .agg(max(floor(col("ts_us") / 1000L)).as("m"))
          .collect()(0).getLong(0)) - delayMs
      val wm1Ms = wmExpect("wm1", base)
      val wmfMs = wmExpect("wmf", w2)
      val progs = q.recentProgress.toSeq.sortBy(_.batchId)
      def wmOf(i: Int): Long = java.time.Instant
        .parse(progs(i).eventTime.get("watermark")).toEpochMilli
      require(progs.length == 4 && wmOf(2) == wm1Ms && wmOf(3) == wmfMs,
        s"q_stream_dedup_wm: the stream ran ${progs.length} " +
          "micro-batches with trigger watermarks " +
          progs.map(p => p.eventTime.get("watermark")).mkString("[",
            ", ", "]") +
          s"; the oracle's replay needs 4 (w1, mid, w2, final) with " +
          s"the w2 batch at wm=${wm1Ms}ms and the final at " +
          s"wm=${wmfMs}ms - Spark's watermark/dedup-state mechanics " +
          "changed; re-probe with tools/DedupWmProbe and update the " +
          "oracle")
      s.read.parquet(out).orderBy(col("k"), col("ts_us"))
        .localCheckpoint(true)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile); ()
      }
    }),

    // -- [EXT]: T5 AT MART CADENCE — a REAL watermarked session_window
    //    stream maintaining a session-grain mart store
    //    ([[graft.pipeline.GoldAggOps.sessionMartSink]]): append mode
    //    emits each session exactly once when the watermark passes its
    //    end (last event + gap), and the sink appends the closed
    //    sessions to the mart. The oracle is the q_session_gap
    //    gap-island SQL (same boundary convention — an event exactly at
    //    last+gap merges, probed by tools/SessionGapProbe) restricted
    //    to CLOSED sessions: end <= final watermark (ms-floored max ts
    //    − delay, µs-scaled — the emit-on-close bound
    //    q_stream_late_drop pins).
    "q_stream_session_mart" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val delayMs = 3599999L
      val ev = graft.analytics.Tables.withEpochMicros(
          graft.analytics.Tables(s, dir, "events"))
        .select(col("user_id"), col("ts_us"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sessmart")
      try {
      val in = tmp.resolve("in"); java.nio.file.Files.createDirectories(in)
      placeWave(stagedWaveFile(dir, "sessmart_w1")(ev),
        in.resolve("w1.parquet"), System.currentTimeMillis())
      val store = tmp.resolve("store").toString
      // state partitions sized to the staged input (see
      // statefulStreamSession) — the session-window state stores
      val ss = statefulStreamSession(s,
        in.toFile.listFiles().map(_.length()).sum)
      val q = graft.pipeline.GoldAggOps.sessionMartSink(
          ss.readStream.schema(ev.schema).parquet(in.toString)
            .withColumn("ev_time", timestamp_micros(col("ts_us"))),
          "ev_time", "30 minutes", s"$delayMs milliseconds",
          Seq("user_id"), Seq(count(lit(1)).as("n_events")),
          store, tmp.resolve("cp").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // pin: one data batch + the trailing no-data eviction batch, the
      // final watermark at ms-floored max ts − delay
      val wmfMs = memoizedLong(dir, "sessmart_wmf")(
        ev.agg(max(floor(col("ts_us") / 1000L)).as("m"))
          .collect()(0).getLong(0)) - delayMs
      val progs = q.recentProgress.toSeq.sortBy(_.batchId)
      def wmOf(i: Int): Long = java.time.Instant
        .parse(progs(i).eventTime.get("watermark")).toEpochMilli
      require(progs.length == 2 && wmOf(1) == wmfMs,
        s"q_stream_session_mart: the stream ran ${progs.length} " +
          "micro-batches with trigger watermarks " +
          progs.map(p => p.eventTime.get("watermark")).mkString("[",
            ", ", "]") +
          s"; the oracle's replay needs 2 (w1, final-evict) with the " +
          s"final at wm=${wmfMs}ms - Spark's watermark/session " +
          "mechanics changed; re-probe with tools/SessionGapProbe " +
          "and update the oracle")
      graft.pipeline.GoldAggOps.readSessionMart(s, store, Seq("user_id"))
        .orderBy(col("user_id"), col("sess_start_us"))
        .localCheckpoint(true)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile); ()
      }
    }),

    // -- [EXT]: personalized PageRank (TrustRank) — teleport/dangling
    //    mass returns only to the trusted seed set (suppliers of
    //    nations 0-4); rank = proximity to trust, the seed-biased
    //    quality prior
    "q_ppr" -> ((s, dir) => {
      val seeds = t(s, dir, "supplier")
        .filter(col("s_nationkey") < 5)
        .select((col("s_suppkey").cast("long") * 2L).as("node"))
      graft.analytics.Graph.personalizedPageRank(
          shipmentEdges(s, dir), "src", "dst", seeds, "node", iters = 3)
        .select(decodeNode(col("node")).as("node"), col("rank_fp"))
        .orderBy(col("rank_fp").desc, col("node"))
    }),

    // -- [EXT]: semi-supervised label propagation — a third of the
    //    suppliers carry a trusted nation label; 3 synchronous
    //    majority-vote rounds spread labels through the bipartite
    //    shipment graph (customers vote from seeded suppliers, then
    //    unseeded suppliers vote back from labeled customers)
    "q_label_prop" -> ((s, dir) => {
      val seeds = t(s, dir, "supplier")
        .filter(col("s_suppkey") % 3 === 0)
        .join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select((col("s_suppkey").cast("long") * 2L).as("node"),
          col("n_name").as("lbl"))
      graft.analytics.Graph.labelPropagate(
          shipmentEdges(s, dir), "src", "dst",
          seeds, "node", "lbl", iters = 3)
        .select(decodeNode(col("node")).as("node"), col("label"))
        .orderBy(col("node"))
    }),

    // -- [EXT]: Newman modularity of the label-prop communities — did
    //    propagation find real structure? Single exact decimal floor
    //    via Q = (4m·Σe_c − Σd_c²)/(4m²); unreached nodes count as
    //    singleton communities
    "q_modularity" -> ((s, dir) => {
      val seeds = t(s, dir, "supplier")
        .filter(col("s_suppkey") % 3 === 0)
        .join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select((col("s_suppkey").cast("long") * 2L).as("node"),
          col("n_name").as("lbl"))
      // ONE materialized edge frame for propagation AND scoring — the
      // raw lineitem⋈orders derivation would otherwise run twice
      val edges = shipmentEdges(s, dir).localCheckpoint(false)
      val communities = graft.analytics.Graph.labelPropagate(
        edges, "src", "dst", seeds, "node", "lbl", iters = 3)
      graft.analytics.Graph.modularity(edges,
        "src", "dst", communities, "node", "label")
    }),

    // -- [EXT]: degree assortativity of the shipment graph — do hubs
    //    link to hubs (positive) or to leaves (negative, the link-farm
    //    signature)? Exact int128 power sums, one floor division
    "q_assortativity" -> ((s, dir) => {
      graft.analytics.Graph.assortativity(shipmentEdges(s, dir),
        "src", "dst")
    }),

    // -- [EXT]: SALSA hub/authority scores — the degree-normalized HITS
    //    variant (stochastic half-steps conserve mass, so the whole
    //    recurrence stays in overflow-free Long fixed-point); oracle
    //    replays the unrolled half-step CTE chain
    "q_salsa" -> ((s, dir) => {
      graft.analytics.Graph.salsa(shipmentEdges(s, dir), "src", "dst",
          iters = 2)
        .select(decodeNode(col("node")).as("node"), col("hub_fp"),
          col("auth_fp"))
        .orderBy(col("node"))
    }),

    // -- [EXT]: multi-source BFS — shortest hop count from the trusted
    //    seed suppliers over the undirected shipment graph, bounded
    //    depth (crawl-frontier distance / contamination blast radius);
    //    oracle is a genuine recursive CTE with UNION-dedup layering
    "q_graph_hops" -> ((s, dir) => {
      val seeds = t(s, dir, "supplier")
        .filter(col("s_suppkey") % 97 === 0)
        .select((col("s_suppkey").cast("long") * 2L).as("node"))
      graft.analytics.Graph.shortestHops(shipmentEdges(s, dir),
          "src", "dst", seeds, "node", maxHops = 4)
        .select(decodeNode(col("node")).as("node"), col("hops"))
        .orderBy(col("hops"), col("node"))
    }),

    // -- [EXT]: exact-rank z-order values — the multi-dimensional
    //    clustering key (Delta OPTIMIZE ZORDER BY / liquid clustering
    //    analog) in its deterministic form: equal-frequency buckets from
    //    exact ranks, bits interleaved so (o_totalprice, o_orderdate)
    //    share skipping power. The layout itself (repartitionByRange on
    //    this key) is exercised in ZOrderSpec; the key computation is
    //    what's oracle-checkable.
    "q_zorder" -> ((s, dir) => {
      graft.ops.ZOrder.exactZValues(t(s, dir, "orders"),
          Seq("o_totalprice", "o_orderdate"), tieCol = "o_orderkey")
        .select(col("o_orderkey"), col("zval"))
        .orderBy(col("zval"), col("o_orderkey"))
    }),

    // -- [EXT]: schema-generic table profile (the deequ-style census:
    //    per-column nulls / exact distincts / typed min-max / mean
    //    length) — one scan, long-form output diffable across snapshots.
    //    exactDistinct here because the gate wants exact numbers; the
    //    production default is the HLL form (no Expand blowup).
    // -- [EXT]: row-level snapshot diff by PK — "what changed between
    //    dataset v1 and v2" (added/removed/changed; unchanged keys emit
    //    nothing). v2 is derived deterministically from orders: keys
    //    %97 removed, status flipped at %101, synthetic keys added at
    //    %499
    "q_snapshot_diff" -> ((s, dir) => {
      val a = t(s, dir, "orders")
      val surviving = a.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 101 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      val added = a.filter(col("o_orderkey") % 499 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      graft.analytics.Profiler.snapshotDiff(a,
          surviving.unionByName(added), Seq("o_orderkey"),
          Seq("o_orderstatus", "o_orderpriority", "o_custkey"))
        .orderBy(col("o_orderkey"))
    }),

    // -- [EXT]: leakage-free K-fold target encoding — the tabular-ML
    //    feature-prep op: per (category, fold), the smoothed mean of the
    //    target over all OTHER folds' rows, in exact micro-units; md5
    //    folds, decimal-exact sums
    "q_target_encode" -> ((s, dir) => {
      graft.ops.Encoding.targetEncodeTable(t(s, dir, "orders"),
          "o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy(col("category"), col("fold"))
    }),

    // -- [EXT]: weight-of-evidence / information value of the market
    //    segment against negative account balance — the risk-scorecard
    //    feature screen beside q_target_encode; pinned double op order,
    //    integer micro IV terms
    "q_woe_iv" -> ((s, dir) => {
      graft.ops.Encoding.woeTable(t(s, dir, "customer"),
          "c_mktsegment", col("c_acctbal") < 0.0)
        .orderBy(col("bin"))
    }),

    // -- [EXT]: referential-integrity sweep over the star schema's FK
    //    edges (inclusion dependencies) — 0 orphans ⇔ the FK holds; the
    //    reversed customer→orders edge is included as the deliberately
    //    violated case (customers without orders ARE orphans there)
    "q_fk_integrity" -> ((s, dir) => {
      import graft.analytics.Profiler.inclusion
      inclusion(t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey", "lineitem.l_orderkey->orders")
        .unionByName(inclusion(t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey", "orders.o_custkey->customer"))
        .unionByName(inclusion(t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey", "lineitem.l_partkey->part"))
        .unionByName(inclusion(t(s, dir, "lineitem"), "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey", "lineitem.l_suppkey->supplier"))
        .unionByName(inclusion(t(s, dir, "customer"), "c_custkey",
          t(s, dir, "orders"), "o_custkey", "customer.c_custkey->orders"))
        .orderBy(col("relation"))
    }),

    // -- [EXT]: co-occurrence / association mining — parts co-ordered in
    //    the same order, with exact fixed-point jaccard / confidence /
    //    lift (lift = exp(PMI)); the within-basket self-join is guarded
    //    by the max-basket-size contract
    "q_copurchase" -> ((s, dir) => {
      graft.analytics.Association.coOccurrence(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2L)
        .orderBy(col("n_ab").desc, col("item_a"), col("item_b"))
    }),

    // -- [EXT]: item-item collaborative similarity — "bought X also
    //    bought Y" top-5 neighbors per part by binary-cosine over
    //    order baskets (exact counts; one IEEE mul/sqrt/div)
    "q_item_sim" -> ((s, dir) => {
      graft.analytics.Association.itemSimilarityTopK(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          k = 5, minSupport = 2L)
    }),

    // -- [EXT]: triangle census over the co-purchase item graph —
    //    degree-oriented wedge counting (each triangle closed exactly
    //    once from its minimal member; out-degrees capped at O(√m), so
    //    a hub's d² wedges never materialize), per-node counts + exact
    //    micro-unit clustering coefficients
    "q_triangles" -> ((s, dir) => {
      val edges = graft.analytics.Association.coOccurrence(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          minSupport = 2L)
        .select(col("item_a"), col("item_b"))
      graft.analytics.Graph.triangles(edges, "item_a", "item_b")
        .orderBy(col("node"))
    }),

    // -- [EXT]: link prediction on the co-purchase graph — common
    //    neighbors + capped-universe Jaccard for non-adjacent pairs
    "q_link_predict" -> ((s, dir) => {
      val edges = graft.analytics.Association.coOccurrence(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          minSupport = 2L)
        .select(col("item_a"), col("item_b"))
      // minCommon = 1: the TPC-H co-purchase graph is sparse (median
      // degree 1 even at sf0.1), so 2-witness pairs vanish at scale
      graft.analytics.Graph.linkPrediction(edges, "item_a", "item_b",
          maxCenterDegree = 64L, minCommon = 1L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_table_profile" -> ((s, dir) => {
      graft.analytics.Profiler.profile(t(s, dir, "lineitem"),
          exactDistinct = true)
        // decimal → double for the driver's pandas compare (decimal
        // parquet loads as object Decimals there); decimal→double is
        // nearest-rounding on both engines, so still bit-exact
        .withColumn("min_num", col("min_num").cast("double"))
        .withColumn("max_num", col("max_num").cast("double"))
        .orderBy(col("col_name"))
    })
  )

  /** supplier→customer edge list: one edge per (supplier, customer) pair
    * connected by at least one lineitem. The DECLARED node ids are
    * type-tagged strings ("s<k>"/"c<k>") because supplier and customer
    * key spaces overlap numerically — but every byte of those strings
    * rides every per-iteration shuffle, join, and aggregate of the
    * graph family. Internally the tag is ONE PARITY BIT (supplier →
    * 2k, customer → 2k+1, bijective), so the hot path hashes and
    * compares 8-byte longs (opt guide §2.3, narrower types), and
    * [[decodeNode]] reconstructs the exact declared strings on the
    * node-sized OUTPUT only. Safe because every consumer's result is
    * independent of the internal node ORDER (rank/degree/peel/vote
    * arithmetic; tie-breaks are on labels or counting-invariant) —
    * order-SENSITIVE pair outputs (linkPrediction's id_a < id_b) ride
    * their own numeric co-purchase graph, not this encoding. */
  private def shipmentEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey").cast("long") * 2L).as("src"),
        (col("o_custkey").cast("long") * 2L + 1L).as("dst"))

  /** Inverse of the [[shipmentEdges]] parity encoding: 2k → "s<k>",
    * 2k+1 → "c<k>" — the declared string node ids, bit-exact. */
  private def decodeNode(c: Column): Column =
    concat(when(c % 2L === 0L, lit("s")).otherwise(lit("c")),
      shiftright(c, 1).cast("string"))

  /** The unrolled-CTE k-core oracle: one (degrees, peel set, surviving
    * edges) CTE triple per SYNCHRONOUS peel round — the peel fixpoint is
    * unique and round-deterministic, so any `rounds` ≥ the convergence
    * round replays [[graft.analytics.Graph.kCore]] exactly (converged
    * rounds are no-ops). Equality therefore also PROVES convergence
    * within `rounds` on this graph. Every CTE is `AS MATERIALIZED`:
    * each round references its predecessor several times, and an
    * INLINED 20-round chain expands the base scan exponentially
    * (measured: DuckDB exhausts file handles before finishing). */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val sb = new StringBuilder(
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT
        |    least('s' || CAST(l_suppkey AS VARCHAR),
        |          'c' || CAST(o_custkey AS VARCHAR)) AS a,
        |    greatest('s' || CAST(l_suppkey AS VARCHAR),
        |             'c' || CAST(o_custkey AS VARCHAR)) AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin)
    for (i <- 0 until rounds) {
      sb.append(s""",
        |d$i AS MATERIALIZED (SELECT n, count(*) AS d FROM (
        |  SELECT a AS n FROM e$i UNION ALL SELECT b FROM e$i) GROUP BY 1),
        |bad$i AS MATERIALIZED (SELECT n FROM d$i WHERE d < $k),
        |e${i + 1} AS MATERIALIZED (SELECT * FROM e$i
        |  WHERE a NOT IN (SELECT n FROM bad$i)
        |    AND b NOT IN (SELECT n FROM bad$i))""".stripMargin)
    }
    sb.append(s""",
      |dfin AS (SELECT n, count(*) AS d FROM (
      |  SELECT a AS n FROM e$rounds UNION ALL SELECT b FROM e$rounds)
      |  GROUP BY 1)
      |SELECT n AS node, CAST(d AS BIGINT) AS core_degree
      |FROM dfin ORDER BY node""".stripMargin)
    sb.toString
  }

  /** The unrolled-CTE PageRank oracle: one (dangling, contributions,
    * ranks) CTE triple per iteration — DuckDB replays the integer
    * fixed-point recurrence of [[graft.analytics.Graph.pageRank]]
    * bit-for-bit (`//` there ≡ `div` here on the all-positive ranks). */
  /** The Markov removal-effect replay: journeys → (from, to) counts →
    * per-variant redirected chains ('__base' + one variant per channel,
    * inbound → __null, outbound dropped, a __conv self-loop pinning the
    * absorber) → `iters` unrolled rounds of the non-negative integer
    * recurrence `p(s) = Σ cnt·p(t) // out(s)` → removal effects and
    * shares. Everything non-negative, so `//` IS the floor. */
  private def markovAttribOracle(iters: Int): String = {
    // every repeatedly-referenced CTE is MATERIALIZED: the default
    // inlining would re-expand the whole p(N−1) chain at each of its
    // references — exponential in the iteration depth
    def step(n: Int): String =
      s"""p$n AS MATERIALIZED (
         |  SELECT t.v, t.f AS s,
         |    SUM(t.c * COALESCE(pp.p, 0)) // MAX(o.o) AS p
         |  FROM trv t
         |  JOIN outd o ON o.v = t.v AND o.f = t.f
         |  LEFT JOIN p${n - 1} pp ON pp.v = t.v AND pp.s = t.tt
         |  GROUP BY t.v, t.f)""".stripMargin
    val steps = (1 to iters).map(step).mkString(",\n")
    s"""WITH e AS (
       |  SELECT user_id AS u, event_type AS t, epoch_us(ts) AS ts,
       |    event_id AS eid
       |  FROM events),
       |g AS (SELECT *, sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)
       |        OVER (PARTITION BY u ORDER BY ts, eid
       |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS grp
       |      FROM e),
       |tch AS (SELECT * FROM g WHERE t <> 'purchase'),
       |pairs AS (
       |  SELECT COALESCE(lag(t) OVER (PARTITION BY u, grp
       |      ORDER BY ts, eid), '__start') AS f, t AS tt
       |  FROM tch),
       |lastt AS (SELECT u, grp, t AS lt FROM (
       |    SELECT u, grp, t, row_number() OVER (PARTITION BY u, grp
       |      ORDER BY ts DESC, eid DESC) AS rn FROM tch) WHERE rn = 1),
       |j AS (SELECT DISTINCT u, grp FROM g),
       |term AS (
       |  SELECT COALESCE(l.lt, '__start') AS f,
       |    CASE WHEN j.grp >= 1 THEN '__conv' ELSE '__null' END AS tt
       |  FROM j LEFT JOIN lastt l ON j.u = l.u AND j.grp = l.grp),
       |tr0 AS MATERIALIZED (
       |  SELECT f, tt, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT * FROM pairs UNION ALL SELECT * FROM term)
       |  GROUP BY f, tt),
       |ch AS MATERIALIZED (
       |  SELECT DISTINCT s AS chan FROM (
       |    SELECT f AS s FROM tr0 UNION SELECT tt FROM tr0)
       |  WHERE s NOT IN ('__start', '__conv', '__null')),
       |vari AS MATERIALIZED (
       |  SELECT chan AS v FROM ch UNION ALL SELECT '__base'),
       |trv AS MATERIALIZED (
       |  SELECT vari.v, tr0.f,
       |    CASE WHEN tr0.tt = vari.v THEN '__null' ELSE tr0.tt END AS tt,
       |    CAST(SUM(tr0.c) AS HUGEINT) AS c
       |  FROM vari JOIN tr0 ON tr0.f <> vari.v
       |  GROUP BY 1, 2, 3
       |  UNION ALL
       |  SELECT v, '__conv', '__conv', 1 FROM vari),
       |outd AS MATERIALIZED (
       |  SELECT v, f, SUM(c) AS o FROM trv GROUP BY v, f),
       |p0 AS MATERIALIZED (
       |  SELECT v, '__conv' AS s, CAST(1000000 AS HUGEINT) AS p
       |  FROM vari),
       |$steps,
       |res AS (
       |  SELECT ch.chan, COALESCE(pr.p, 0) AS prem, b.p AS base
       |  FROM ch
       |  LEFT JOIN p$iters pr ON pr.v = ch.chan AND pr.s = '__start'
       |  LEFT JOIN p$iters b ON b.v = '__base' AND b.s = '__start'),
       |re AS (SELECT chan,
       |    CASE WHEN base > 0 THEN
       |      greatest(0, 1000000 - (prem * 1000000) // base) END AS rem
       |  FROM res),
       |tot AS (SELECT SUM(rem) AS sre FROM re)
       |SELECT chan AS channel, CAST(rem AS BIGINT) AS removal_x1e6,
       |  CASE WHEN sre > 0 THEN
       |    CAST((rem * 1000000) // sre AS BIGINT) END AS share_x1e6
       |FROM re CROSS JOIN tot ORDER BY channel""".stripMargin
  }

  private[graft] def pageRankOracle(iters: Int,
      edgesSql: String =
        """SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
          |                'c' || CAST(o_custkey AS VARCHAR) AS dst
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
          .stripMargin,
      topK: Option[Int] = None): String = {
    val base =
      s"""WITH edges AS MATERIALIZED (
        |$edgesSql),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |edeg AS (SELECT e.src, e.dst, g.outdeg
        |         FROM edges e JOIN deg g ON e.src = g.node),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |tp AS (SELECT (15 * 1000000000000) // (100 * n) AS tp FROM nn),
        |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes CROSS JOIN nn)"""
        .stripMargin
    val iterations = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""d$i AS (SELECT COALESCE(SUM(r), 0) AS dang
         |        FROM $p LEFT JOIN deg ON $p.node = deg.node
         |        WHERE deg.node IS NULL),
         |c$i AS (SELECT e.dst AS node, SUM(p.r // e.outdeg) AS c
         |        FROM edeg e JOIN $p p ON e.src = p.node GROUP BY e.dst),
         |r$i AS (SELECT nodes.node,
         |          tp.tp + (85 * (COALESCE(c.c, 0) + d.dang // nn.n)) // 100
         |            AS r
         |        FROM nodes CROSS JOIN nn CROSS JOIN tp CROSS JOIN d$i d
         |        LEFT JOIN c$i c ON nodes.node = c.node)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val limit = topK.map(k => s"\nLIMIT $k").getOrElse("")
    s"""$base$iterations
       |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r$iters
       |ORDER BY rank_fp DESC, node$limit""".stripMargin
  }

  /** Unrolled-CTE replay of [[graft.analytics.Preference.bradleyTerry]]
    * on the per-user usage-preference pairs: each MM round is one
    * denom/praw/normalize CTE triple; every division floors on
    * non-negative HUGEINTs so DuckDB's `//` IS the engine's BigInt
    * floor. */
  private def bradleyTerryOracle(iters: Int): String = {
    val base =
      """WITH ut AS (
        |  SELECT user_id, event_type AS et, count(*) AS c
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |pr AS (SELECT
        |         CASE WHEN x.c > y.c THEN x.et ELSE y.et END AS w,
        |         CASE WHEN x.c > y.c THEN y.et ELSE x.et END AS l
        |       FROM ut x JOIN ut y ON x.user_id = y.user_id
        |         AND x.et < y.et AND x.c <> y.c),
        |cm AS MATERIALIZED (
        |  SELECT w, l, count(*)::BIGINT AS c FROM pr GROUP BY 1, 2),
        |it AS MATERIALIZED (
        |  SELECT w AS item FROM cm UNION SELECT l FROM cm),
        |kk AS (SELECT count(*)::BIGINT AS k FROM it),
        |wn AS (SELECT it.item,
        |         CAST(COALESCE(ws.s, 0) AS BIGINT) AS wins,
        |         CAST(COALESCE(ls.s, 0) AS BIGINT) AS losses
        |       FROM it
        |       LEFT JOIN (SELECT w AS item, SUM(c) AS s FROM cm
        |                  GROUP BY 1) ws USING (item)
        |       LEFT JOIN (SELECT l AS item, SUM(c) AS s FROM cm
        |                  GROUP BY 1) ls USING (item)),
        |nm AS (SELECT a, b, CAST(SUM(c) AS BIGINT) AS c FROM (
        |         SELECT w AS a, l AS b, c FROM cm
        |         UNION ALL SELECT l, w, c FROM cm) GROUP BY 1, 2),
        |p0 AS MATERIALIZED (
        |  SELECT item, 1000000 // (SELECT k FROM kk) AS p FROM it)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""d$i AS (SELECT nm.a AS item,
         |          SUM((CAST(nm.c AS HUGEINT) * 1000000000000)
         |            // (pi.p + pj.p)) AS denom
         |        FROM nm JOIN p${i - 1} pi ON nm.a = pi.item
         |        JOIN p${i - 1} pj ON nm.b = pj.item
         |        WHERE pi.p + pj.p > 0 GROUP BY 1),
         |r$i AS (SELECT it.item,
         |          CASE WHEN COALESCE(d.denom, 0) > 0
         |            THEN (CAST(wn.wins AS HUGEINT) * 1000000000000)
         |              // d.denom
         |            ELSE 0 END AS praw
         |        FROM it JOIN wn USING (item)
         |        LEFT JOIN d$i d USING (item)),
         |s$i AS (SELECT SUM(praw) AS s FROM r$i),
         |p$i AS MATERIALIZED (
         |  SELECT item, CASE WHEN (SELECT s FROM s$i) > 0
         |    THEN (praw * 1000000) // (SELECT s FROM s$i)
         |    ELSE 0 END AS p
         |  FROM r$i)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rounds
       |SELECT wn.item, wn.wins, wn.losses,
       |  CAST(p.p AS BIGINT) AS strength_x1e6
       |FROM p$iters p JOIN wn USING (item)
       |ORDER BY strength_x1e6 DESC, item ASC""".stripMargin
  }

  /** Unrolled half-step CTE replay of [[graft.analytics.Graph.salsa]]:
    * a_i from h_{i-1} over out-degrees, h_i from a_i over in-degrees —
    * every value a positive Long so DuckDB's truncating `//` IS the
    * floor. Sums CAST back to BIGINT (the HUGEINT dtype gate). */
  private def salsaOracle(iters: Int): String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |                  'c' || CAST(o_custkey AS VARCHAR) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |odeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
        |ideg AS (SELECT dst, COUNT(*) AS idg FROM edges GROUP BY dst),
        |edeg AS (SELECT e.src, e.dst, o.od, i.idg FROM edges e
        |         JOIN odeg o USING (src) JOIN ideg i USING (dst)),
        |ns AS (SELECT COUNT(DISTINCT src) AS ns FROM edges),
        |h0 AS (SELECT src AS node, 1000000000000 // ns AS h
        |       FROM (SELECT DISTINCT src FROM edges) CROSS JOIN ns)"""
        .stripMargin
    val iterations = (1 to iters).map { i =>
      s"""a$i AS (SELECT e.dst AS node, SUM(h.h // e.od) AS a
         |        FROM edeg e JOIN h${i - 1} h ON e.src = h.node
         |        GROUP BY e.dst),
         |h$i AS (SELECT e.src AS node, SUM(a.a // e.idg) AS h
         |        FROM edeg e JOIN a$i a ON e.dst = a.node
         |        GROUP BY e.src)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$iterations
       |SELECT COALESCE(h.node, a.node) AS node,
       |  CAST(h.h AS BIGINT) AS hub_fp, CAST(a.a AS BIGINT) AS auth_fp
       |FROM h$iters h FULL JOIN a$iters a ON h.node = a.node
       |ORDER BY node""".stripMargin
  }

  /** Bit-interleave replay of [[graft.ops.ZOrder.exactZValues]]: bucket
    * b of column i lands at bit position b·ncols+i. */
  private def zorderOracle(bits: Int): String = {
    val terms = (0 until bits).flatMap { b =>
      Seq(s"(((bx >> $b) & 1) << ${2 * b})",
        s"(((by >> $b) & 1) << ${2 * b + 1})")
    }.mkString(" + ")
    s"""WITH n AS (SELECT count(*) AS n FROM orders),
       |b AS (SELECT o_orderkey,
       |  ((row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1)
       |     * ${1L << bits}) // n.n AS bx,
       |  ((row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1)
       |     * ${1L << bits}) // n.n AS by
       |  FROM orders CROSS JOIN n)
       |SELECT o_orderkey, $terms AS zval FROM b
       |ORDER BY zval, o_orderkey""".stripMargin
  }

  /** One UNION ALL branch per lineitem column, replaying
    * [[graft.analytics.Profiler.profile]]'s metric typing: numeric
    * min/max as DECIMAL(38,6), timestamp min/max as strings, mean string
    * length in exact integer micro-units via HUGEINT floor division. */
  private def profileOracle: String = {
    val cols = Seq(
      ("l_orderkey", "bigint", "num"), ("l_partkey", "bigint", "num"),
      ("l_suppkey", "bigint", "num"), ("l_linenumber", "int", "num"),
      ("l_quantity", "double", "num"), ("l_extendedprice", "double", "num"),
      ("l_discount", "double", "num"), ("l_tax", "double", "num"),
      ("l_returnflag", "string", "str"), ("l_linestatus", "string", "str"),
      ("l_shipdate", "timestamp_ntz", "ts"))
    val branches = cols.map { case (n, dt, kind) =>
      val (minNum, maxNum) =
        if (kind == "num")
          (s"CAST(CAST(min($n) AS DECIMAL(38,6)) AS DOUBLE)",
            s"CAST(CAST(max($n) AS DECIMAL(38,6)) AS DOUBLE)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      val (minStr, maxStr) =
        if (kind == "num") ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        else (s"CAST(min($n) AS VARCHAR)", s"CAST(max($n) AS VARCHAR)")
      val avgLen =
        if (kind == "str")
          s"""CAST(CASE WHEN count($n) > 0 THEN
             |    (CAST(sum(length($n)) AS HUGEINT) * 1000000)
             |      // CAST(count($n) AS HUGEINT)
             |    END AS BIGINT)""".stripMargin
        else "CAST(NULL AS BIGINT)"
      s"""SELECT '$n' AS col_name, '$dt' AS data_type,
         |  count(*) AS n_rows, count(*) - count($n) AS n_nulls,
         |  count(DISTINCT $n) AS n_distinct,
         |  $minNum AS min_num, $maxNum AS max_num,
         |  $minStr AS min_str, $maxStr AS max_str,
         |  $avgLen AS avg_len_x1e6
         |FROM lineitem""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** The personalized variant of [[pageRankOracle]]: teleport/dangling
    * gated on seed membership, |S ∩ V| as the denominator, zero start
    * mass off the seed set. */
  private def pprOracle(iters: Int): String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |                  'c' || CAST(o_custkey AS VARCHAR) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |edeg AS (SELECT e.src, e.dst, g.outdeg
        |         FROM edges e JOIN deg g ON e.src = g.node),
        |seeds AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |          FROM supplier WHERE s_nationkey < 5),
        |nf AS (SELECT nodes.node, (seeds.node IS NOT NULL) AS is_seed
        |       FROM nodes LEFT JOIN seeds ON nodes.node = seeds.node),
        |dd AS (SELECT SUM(CASE WHEN is_seed THEN 1 ELSE 0 END) AS d FROM nf),
        |r0 AS (SELECT node, is_seed,
        |         CASE WHEN is_seed THEN 1000000000000 // d ELSE 0 END AS r
        |       FROM nf CROSS JOIN dd)""".stripMargin
    val iterations = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""d$i AS (SELECT COALESCE(SUM(r), 0) AS dang
         |        FROM $p LEFT JOIN deg ON $p.node = deg.node
         |        WHERE deg.node IS NULL),
         |c$i AS (SELECT e.dst AS node, SUM(p.r // e.outdeg) AS c
         |        FROM edeg e JOIN $p p ON e.src = p.node GROUP BY e.dst),
         |r$i AS (SELECT nf.node, nf.is_seed,
         |          (CASE WHEN nf.is_seed
         |             THEN (15 * 1000000000000) // (100 * dd.d) ELSE 0 END)
         |          + (85 * (COALESCE(c.c, 0)
         |                   + CASE WHEN nf.is_seed
         |                       THEN d.dang // dd.d ELSE 0 END)) // 100
         |            AS r
         |        FROM nf CROSS JOIN dd CROSS JOIN d$i d
         |        LEFT JOIN c$i c ON nf.node = c.node)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$iterations
       |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r$iters
       |ORDER BY rank_fp DESC, node""".stripMargin
  }

  /** Unrolled-CTE replay of [[graft.analytics.Graph.labelPropagate]]:
    * per round, a neighbor-label count, a (n DESC, label) rank-1 pick,
    * and the seed-clamped merge. */
  private def labelPropOracle(iters: Int): String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |                  'c' || CAST(o_custkey AS VARCHAR) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |und AS (SELECT DISTINCT u, v FROM (
        |          SELECT src AS u, dst AS v FROM edges
        |          UNION ALL SELECT dst, src FROM edges)
        |        WHERE u <> v),
        |nodes AS (SELECT DISTINCT u AS node FROM und),
        |seeds AS (
        |  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node,
        |         n_name AS lbl
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE s_suppkey % 3 = 0),
        |l0 AS (SELECT nodes.node, seeds.lbl
        |       FROM nodes LEFT JOIN seeds ON nodes.node = seeds.node)"""
        .stripMargin
    val iterations = (1 to iters).map { i =>
      val p = s"l${i - 1}"
      s"""v$i AS (SELECT e.v AS node, l.lbl AS cand, count(*) AS n
         |        FROM und e JOIN $p l ON e.u = l.node
         |        WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
         |w$i AS (SELECT node, cand FROM (
         |          SELECT node, cand, row_number() OVER (
         |            PARTITION BY node ORDER BY n DESC, cand) AS rk
         |          FROM v$i) WHERE rk = 1),
         |l$i AS (SELECT nodes.node, COALESCE(seeds.lbl, w.cand) AS lbl
         |        FROM nodes LEFT JOIN w$i w ON nodes.node = w.node
         |        LEFT JOIN seeds ON nodes.node = seeds.node)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$iterations
       |SELECT node, lbl AS label FROM l$iters ORDER BY node""".stripMargin
  }

  /** Modularity of the [[labelPropOracle]] communities: the same
    * propagation CTE chain, then the exact single-floor identity
    * Q = (4m·Σe_c − Σd_c²)/(4m²) with singleton communities for
    * unlabeled nodes (the engine's contract). */
  private def modularityOracle(iters: Int): String = {
    val prop = labelPropOracle(iters)
    val chain = prop.substring(0, prop.lastIndexOf("\nSELECT node"))
    s"""$chain,
       |lab AS (SELECT node, lbl FROM l$iters),
       |canon AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
       |          FROM und),
       |mm AS (SELECT count(*) AS m FROM canon),
       |deg AS (SELECT node, count(*) AS d FROM (
       |          SELECT a AS node FROM canon
       |          UNION ALL SELECT b FROM canon) GROUP BY 1),
       |nl AS (SELECT deg.node, deg.d,
       |         COALESCE(lab.lbl, '_singleton_' || deg.node) AS comm
       |       FROM deg LEFT JOIN lab ON deg.node = lab.node),
       |dc AS (SELECT comm, sum(d) AS dc FROM nl GROUP BY 1),
       |sd AS (SELECT sum(CAST(dc AS HUGEINT) * dc) AS sd2,
       |         count(*) AS ncomm FROM dc),
       |nn AS (SELECT count(*) AS n_nodes FROM nl),
       |ie AS (SELECT count(*) AS intra FROM canon
       |       JOIN nl na ON canon.a = na.node
       |       JOIN nl nb ON canon.b = nb.node
       |       WHERE na.comm = nb.comm),
       |qn AS (SELECT (4 * CAST((SELECT m FROM mm) AS HUGEINT)
       |          * (SELECT intra FROM ie)
       |          - (SELECT sd2 FROM sd)) * 1000000 AS num,
       |         4 * CAST((SELECT m FROM mm) AS HUGEINT)
       |          * (SELECT m FROM mm) AS den)
       |SELECT (SELECT n_nodes FROM nn) AS n_nodes,
       |  CAST((SELECT ncomm FROM sd) AS BIGINT) AS n_communities,
       |  (SELECT m FROM mm) AS m_edges,
       |  (SELECT intra FROM ie) AS intra_edges,
       |  CASE WHEN (SELECT m FROM mm) > 0 THEN
       |    CAST(CASE WHEN num % den <> 0 AND num < 0
       |      THEN num // den - 1 ELSE num // den END AS BIGINT)
       |  END AS q_x1e6
       |FROM qn""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q_pagerank" -> pageRankOracle(3),

    "q_salsa" -> salsaOracle(2),

    // Newman's cleared-denominator identity over exact HUGEINT power
    // sums; the spelled-out negative floor is the `ldiv` contract
    "q_assortativity" ->
      """WITH edges AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |                  'c' || CAST(o_custkey AS VARCHAR) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |canon AS (SELECT DISTINCT least(src, dst) AS a,
        |                 greatest(src, dst) AS b
        |          FROM edges WHERE src <> dst),
        |deg AS (SELECT node, COUNT(*) AS d FROM (
        |          SELECT a AS node FROM canon
        |          UNION ALL SELECT b FROM canon) GROUP BY node),
        |jk AS (SELECT da.d AS j, db.d AS k FROM canon
        |       JOIN deg da ON canon.a = da.node
        |       JOIN deg db ON canon.b = db.node),
        |s AS (SELECT COUNT(*) AS m,
        |        SUM(CAST(j AS HUGEINT) + k) AS s1,
        |        SUM(CAST(j AS HUGEINT) * j) AS sj2,
        |        SUM(CAST(k AS HUGEINT) * k) AS sk2,
        |        SUM(CAST(j AS HUGEINT) * k) AS s3 FROM jk),
        |q AS (SELECT m,
        |        (4 * CAST(m AS HUGEINT) * s3 - s1 * s1) * 1000000 AS num,
        |        2 * CAST(m AS HUGEINT) * (sj2 + sk2) - s1 * s1 AS den
        |      FROM s)
        |SELECT m AS m_edges,
        |  CASE WHEN den > 0 THEN
        |    CAST(CASE WHEN num % den <> 0 AND num < 0
        |      THEN num // den - 1 ELSE num // den END AS BIGINT)
        |  END AS r_x1e6
        |FROM q""".stripMargin,

    // genuine recursive CTE with UNION dedup: each (node, hop) pair
    // appears once, min(hop) collapses layers — the BFS level order
    "q_graph_hops" ->
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |                  'c' || CAST(o_custkey AS VARCHAR) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |canon AS (SELECT DISTINCT least(src, dst) AS a,
        |                 greatest(src, dst) AS b
        |          FROM edges WHERE src <> dst),
        |bi AS (SELECT a AS u, b AS v FROM canon
        |       UNION ALL SELECT b, a FROM canon),
        |seeds AS (SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |          FROM supplier WHERE s_suppkey % 97 = 0),
        |reach(node, hop) AS (
        |  SELECT n.node, 0 FROM (SELECT DISTINCT u AS node FROM bi) n
        |  JOIN seeds USING (node)
        |  UNION
        |  SELECT bi.v, r.hop + 1 FROM reach r
        |  JOIN bi ON r.node = bi.u WHERE r.hop < 4)
        |SELECT node, CAST(MIN(hop) AS INTEGER) AS hops FROM reach
        |GROUP BY node ORDER BY hops, node""".stripMargin,

    "q_label_prop" -> labelPropOracle(3),

    "q_modularity" -> modularityOracle(3),

    "q_ppr" -> pprOracle(3),

    "q_zorder" -> zorderOracle(6),

    "q_table_profile" -> profileOracle,

    // the oracle compares columns directly (IS DISTINCT FROM) — md5
    // signature equality on the engine side is the same predicate
    // modulo collisions
    "q_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority, o_custkey
        |  FROM orders),
        |b AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 101 = 0 THEN 'X'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    o_orderpriority, o_custkey
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_orderstatus, o_orderpriority,
        |    o_custkey
        |  FROM orders WHERE o_orderkey % 499 = 0),
        |d AS (
        |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'removed'
        |         WHEN a.o_orderkey IS NULL THEN 'added'
        |         WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |           OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
        |           OR a.o_custkey IS DISTINCT FROM b.o_custkey
        |           THEN 'changed' END AS status
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        |SELECT o_orderkey, status FROM d WHERE status IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    // md5 folds, micro-unit target sums, out-of-fold flip on the
    // aggregated table, HUGEINT smoothing division (engine side:
    // decimal(38,0) — same exact integers)
    // one bin aggregate + class totals; the engine's double op order
    // spelled out — single ln of the odds ratio, rate difference times
    // the raw ln, floored micros
    "q_woe_iv" ->
      """WITH b AS (
        |  SELECT c_mktsegment AS bin, count(*)::BIGINT AS n,
        |    SUM(CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END)::BIGINT
        |      AS pos
        |  FROM customer
        |  WHERE c_acctbal IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT bin, n, pos, n - pos AS neg,
        |        SUM(pos) OVER () AS np, SUM(n - pos) OVER () AS nn
        |      FROM b)
        |SELECT bin, n, pos, neg,
        |  CASE WHEN pos > 0 AND neg > 0 AND np > 0 AND nn > 0 THEN
        |    round(ln((neg::DOUBLE / nn::DOUBLE)
        |      / (pos::DOUBLE / np::DOUBLE)), 6) END AS woe,
        |  CASE WHEN pos > 0 AND neg > 0 AND np > 0 AND nn > 0 THEN
        |    CAST(floor((neg::DOUBLE / nn::DOUBLE
        |        - pos::DOUBLE / np::DOUBLE)
        |      * ln((neg::DOUBLE / nn::DOUBLE)
        |        / (pos::DOUBLE / np::DOUBLE)) * 1000000.0) AS BIGINT)
        |  END AS iv_x1e6
        |FROM w ORDER BY bin""".stripMargin,

    "q_target_encode" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS category,
        |    (('0x' || substr(md5('tenc:' || CAST(o_orderkey AS VARCHAR)),
        |       1, 12))::BIGINT) % 5 AS fold,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)
        |      AS t
        |  FROM orders),
        |pf AS (SELECT category, fold, COALESCE(sum(t), 0) AS s,
        |         count(t) AS n FROM r GROUP BY 1, 2),
        |bf AS (SELECT fold AS pf, sum(s) AS fsum, sum(n) AS fn
        |       FROM pf GROUP BY 1),
        |g AS (SELECT sum(s) AS gsum, sum(n) AS gn FROM pf),
        |pr AS (SELECT pf, CAST((gsum - fsum) // GREATEST(gn - fn, 1)
        |         AS BIGINT) AS prior_x1e6 FROM bf CROSS JOIN g),
        |oof AS (SELECT category, fold,
        |          sum(s) OVER (PARTITION BY category) - s AS osum,
        |          sum(n) OVER (PARTITION BY category) - n AS onn
        |        FROM pf)
        |SELECT category, fold, CAST(onn AS BIGINT) AS oof_n, prior_x1e6,
        |  CASE WHEN onn + 20 > 0 THEN
        |    CAST((CAST(osum AS HUGEINT) + CAST(prior_x1e6 AS HUGEINT) * 20)
        |         // CAST(onn + 20 AS HUGEINT) AS BIGINT)
        |  ELSE prior_x1e6 END AS enc_x1e6
        |FROM oof JOIN pr ON fold = pf
        |ORDER BY category, fold""".stripMargin,

    "q_fk_integrity" -> {
      def branch(rel: String, child: String, ck: String,
          parent: String, pk: String): String =
        s"""SELECT '$rel' AS relation,
           |  (SELECT count($ck) FROM $child) AS n_rows,
           |  (SELECT count(DISTINCT $ck) FROM $child) AS n_distinct,
           |  (SELECT count(*) - count($ck) FROM $child) AS n_null_rows,
           |  (SELECT count(*) FROM $child
           |     WHERE $ck IS NOT NULL
           |       AND $ck NOT IN (SELECT $pk FROM $parent
           |                       WHERE $pk IS NOT NULL)) AS orphan_rows,
           |  (SELECT count(DISTINCT $ck) FROM $child
           |     WHERE $ck IS NOT NULL
           |       AND $ck NOT IN (SELECT $pk FROM $parent
           |                       WHERE $pk IS NOT NULL)) AS orphan_distinct
           |""".stripMargin
      Seq(
        branch("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        branch("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        branch("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        branch("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        branch("customer.c_custkey->orders", "customer", "c_custkey",
          "orders", "o_custkey"))
        .mkString("", "UNION ALL\n", "ORDER BY relation")
    },

    // set-semantic support counts; metrics replayed in exact HUGEINT
    // micro-units (engine side uses decimal(38,0) — same integers)
    "q_copurchase" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |keep AS (SELECT bk FROM b GROUP BY bk HAVING count(*) <= 1000),
        |bb AS (SELECT b.* FROM b JOIN keep USING (bk)),
        |p AS (SELECT x.it AS a, y.it AS b2, count(*) AS n_ab
        |      FROM bb x JOIN bb y ON x.bk = y.bk AND x.it < y.it
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |ic AS (SELECT it, count(*) AS n FROM bb GROUP BY 1),
        |nb AS (SELECT count(DISTINCT bk) AS nb FROM bb)
        |SELECT a AS item_a, b2 AS item_b, n_ab, ia.n AS n_a, ib.n AS n_b,
        |  (n_ab * 1000000) // (ia.n + ib.n - n_ab) AS jaccard_x1e6,
        |  (n_ab * 1000000) // ia.n AS conf_ab_x1e6,
        |  CAST((CAST(n_ab AS HUGEINT) * nb * 1000000)
        |       // (CAST(ia.n AS HUGEINT) * ib.n) AS BIGINT) AS lift_x1e6
        |FROM p JOIN ic ia ON a = ia.it JOIN ic ib ON b2 = ib.it
        |CROSS JOIN nb
        |ORDER BY n_ab DESC, item_a, item_b""".stripMargin,

    // same pair table symmetrized; cosine replayed with the identical
    // IEEE mul/sqrt/div sequence on exact integer inputs, top-5 by the
    // total (cos desc, neighbor asc) tie order
    "q_item_sim" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |keep AS (SELECT bk FROM b GROUP BY bk HAVING count(*) <= 1000),
        |bb AS (SELECT b.* FROM b JOIN keep USING (bk)),
        |p AS (SELECT x.it AS a, y.it AS b2, count(*) AS n_ab
        |      FROM bb x JOIN bb y ON x.bk = y.bk AND x.it < y.it
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |ic AS (SELECT it, count(*) AS n FROM bb GROUP BY 1),
        |co AS (SELECT a, b2, n_ab, ia.n AS n_a, ib.n AS n_b
        |       FROM p JOIN ic ia ON a = ia.it JOIN ic ib ON b2 = ib.it),
        |sym AS (SELECT a, b2, n_ab, n_a, n_b FROM co
        |        UNION ALL
        |        SELECT b2, a, n_ab, n_b, n_a FROM co),
        |r AS (SELECT a, b2, n_ab,
        |        CAST(floor(CAST(n_ab AS DOUBLE) * 1000000
        |          / sqrt(CAST(n_a * n_b AS DOUBLE))) AS BIGINT)
        |          AS cos_x1e6
        |      FROM sym),
        |rk AS (SELECT a, b2, n_ab, cos_x1e6,
        |        row_number() OVER (PARTITION BY a
        |          ORDER BY cos_x1e6 DESC, b2 ASC) AS rank
        |       FROM r)
        |SELECT a AS item, b2 AS neighbor, n_ab, cos_x1e6,
        |  CAST(rank AS INT) AS rank
        |FROM rk WHERE rank <= 5
        |ORDER BY item, rank""".stripMargin,

    // edges = the q_copurchase pair table (support >= 2 under the same
    // basket guard); triangles enumerated directly as sorted triples
    // with three edges — the orientation is an execution strategy, not
    // a semantic, so the oracle needn't replay it
    "q_triangles" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |keep AS (SELECT bk FROM b GROUP BY bk HAVING count(*) <= 1000),
        |bb AS (SELECT b.* FROM b JOIN keep USING (bk)),
        |und AS (SELECT x.it AS a, y.it AS b2
        |        FROM bb x JOIN bb y ON x.bk = y.bk AND x.it < y.it
        |        GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, count(*) AS d FROM (
        |          SELECT a AS n FROM und
        |          UNION ALL SELECT b2 FROM und) GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b2 AS y, e2.b2 AS z
        |        FROM und e1
        |        JOIN und e2 ON e2.a = e1.b2
        |        JOIN und e3 ON e3.a = e1.a AND e3.b2 = e2.b2),
        |tn AS (SELECT n, count(*) AS t FROM (
        |          SELECT x AS n FROM tri
        |          UNION ALL SELECT y FROM tri
        |          UNION ALL SELECT z FROM tri) GROUP BY 1)
        |SELECT deg.n AS node, deg.d AS degree,
        |  COALESCE(tn.t, 0) AS triangles,
        |  CASE WHEN deg.d >= 2 THEN
        |    (COALESCE(tn.t, 0) * 2000000) // (deg.d * (deg.d - 1))
        |  END AS clustering_x1e6
        |FROM deg LEFT JOIN tn ON deg.n = tn.n
        |ORDER BY node""".stripMargin,

    // same co-occurrence graph as q_triangles; the degree-capped center
    // universe is part of the declared contract (hub exclusion)
    "q_link_predict" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |keep AS (SELECT bk FROM b GROUP BY bk HAVING count(*) <= 1000),
        |bb AS (SELECT b.* FROM b JOIN keep USING (bk)),
        |und AS (SELECT x.it AS a, y.it AS b2
        |        FROM bb x JOIN bb y ON x.bk = y.bk AND x.it < y.it
        |        GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, count(*) AS d FROM (
        |          SELECT a AS n FROM und
        |          UNION ALL SELECT b2 FROM und) GROUP BY 1),
        |adj AS (SELECT a AS c, b2 AS m FROM und
        |        UNION ALL SELECT b2, a FROM und),
        |adjf AS (SELECT adj.c, adj.m, deg.d FROM adj
        |         JOIN deg ON deg.n = adj.c WHERE deg.d <= 64),
        |degf AS (SELECT m, count(*) AS df FROM adjf GROUP BY 1),
        |cand AS (SELECT x.m AS id_a, y.m AS id_b,
        |           count(*)::BIGINT AS common,
        |           CAST(SUM(1000000 // x.d) AS BIGINT) AS ra_x1e6
        |         FROM adjf x JOIN adjf y ON x.c = y.c AND x.m < y.m
        |         GROUP BY 1, 2 HAVING count(*) >= 1),
        |newp AS (SELECT * FROM cand WHERE NOT EXISTS (
        |           SELECT 1 FROM und
        |           WHERE und.a = cand.id_a AND und.b2 = cand.id_b))
        |SELECT id_a, id_b, common,
        |  da.df AS deg_a, db.df AS deg_b,
        |  (common * 1000000) // (da.df + db.df - common) AS jaccard_x1e6,
        |  ra_x1e6
        |FROM newp
        |JOIN degf da ON da.m = newp.id_a
        |JOIN degf db ON db.m = newp.id_b
        |ORDER BY id_a, id_b""".stripMargin,

    "q_graph_degrees" ->
      """WITH edges AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |                  'c' || CAST(o_custkey AS VARCHAR) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |o AS (SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY 1),
        |i AS (SELECT dst AS node, COUNT(*) AS in_deg FROM edges GROUP BY 1)
        |SELECT COALESCE(o.node, i.node) AS node,
        |  COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg
        |FROM o FULL OUTER JOIN i ON o.node = i.node
        |ORDER BY node""".stripMargin,

    "q_kcore" -> kCoreOracle(k = 25, rounds = 20),

    // the min-ts cascade (first-touch funnel): each step's min qualifying
    // ts joins the previous frontier; window anchored on the first step
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type IN ('signup', 'view', 'purchase')),
        |s1 AS (SELECT user_id, min(ts_us) AS t1_us FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts_us) AS t2_us
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND ts_us > t1_us
        |         AND ts_us - t1_us <= 259200000000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts_us) AS t3_us
        |       FROM e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts_us > t2_us
        |         AND ts_us - t1_us <= 259200000000 GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id, t1_us, t2_us, t3_us,
        |  (CASE WHEN t1_us IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN t2_us IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN t3_us IS NULL THEN 0 ELSE 1 END)::INTEGER
        |    AS step_reached
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // the q_funnel cascade restricted to completers, then the exact
    // percentile_cont machinery over the single 'all' cohort
    "q_funnel_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type IN ('signup', 'view', 'purchase')),
        |s1 AS (SELECT user_id, min(ts_us) AS t1_us FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts_us) AS t2_us
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND ts_us > t1_us
        |         AND ts_us - t1_us <= 259200000000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts_us) AS t3_us
        |       FROM e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts_us > t2_us
        |         AND ts_us - t1_us <= 259200000000 GROUP BY 1),
        |r AS (SELECT (t3_us - t1_us) AS v,
        |        row_number() OVER (ORDER BY t3_us - t1_us) AS rk,
        |        count(*) OVER () AS n
        |      FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)),
        |ps AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE])
        |  AS p),
        |need AS (SELECT p,
        |    CAST(floor(p * (n - 1)::DOUBLE) AS BIGINT) + 1 AS lo,
        |    CAST(ceil(p * (n - 1)::DOUBLE) AS BIGINT) + 1 AS hi,
        |    p * (n - 1)::DOUBLE - floor(p * (n - 1)::DOUBLE) AS frac
        |  FROM (SELECT DISTINCT n FROM r) CROSS JOIN ps)
        |SELECT 'all' AS cohort, need.p,
        |  max(CASE WHEN r.rk = need.lo THEN r.v END)
        |    + (coalesce(max(CASE WHEN r.rk = need.hi THEN r.v END),
        |        max(CASE WHEN r.rk = need.lo THEN r.v END))
        |      - max(CASE WHEN r.rk = need.lo THEN r.v END)) * max(need.frac)
        |    AS value
        |FROM need JOIN r ON r.rk IN (need.lo, need.hi)
        |GROUP BY need.p
        |ORDER BY need.p""".stripMargin,

    // consecutive pairs via lead over (ts, event_id); integer floor
    // probabilities
    "q_event_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type AS from_type, epoch_us(ts) AS t,
        |    event_id,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |p AS (SELECT from_type, to_type, count(*) AS n FROM o
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type AS ff, sum(n) AS ft FROM p GROUP BY 1)
        |SELECT from_type, to_type, n,
        |  CAST((n * 1000000) // ft AS BIGINT) AS p_x1e6
        |FROM p JOIN f ON from_type = ff
        |ORDER BY from_type, to_type""".stripMargin,

    "q_k_anonymity" ->
      """WITH c AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS sz
        |  FROM customer GROUP BY 1, 2)
        |SELECT min(sz) AS k_anonymity, count(*) AS n_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT)
        |    AS rows_below_k,
        |  CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN 1 END), 0) AS BIGINT)
        |    AS classes_below_k
        |FROM c""".stripMargin,

    // distinct-sensitive count via stacked GROUP BYs (count-distinct
    // would silently drop a NULL band); exact integer floor bands
    "q_l_diversity" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balance_band
        |  FROM customer),
        |pv AS (SELECT c_nationkey, c_mktsegment, balance_band,
        |         count(*) AS n FROM b GROUP BY 1, 2, 3),
        |pc AS (SELECT c_nationkey, c_mktsegment,
        |         count(*) AS l, sum(n) AS sz FROM pv GROUP BY 1, 2)
        |SELECT min(l) AS l_diversity, count(*) AS n_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(COALESCE(SUM(CASE WHEN l < 3 THEN sz END), 0) AS BIGINT)
        |    AS rows_below_l,
        |  CAST(COALESCE(SUM(CASE WHEN l < 3 THEN 1 END), 0) AS BIGINT)
        |    AS classes_below_l
        |FROM pc""".stripMargin,

    // exact common-denominator total variation per class; the
    // absent-value tail folds into the closed-form nc*nn term;
    // non-negative numerator => // is the floor
    "q_t_closeness" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balance_band
        |  FROM customer),
        |pv AS (SELECT c_nationkey, c_mktsegment, balance_band,
        |         count(*) AS ncv FROM b GROUP BY 1, 2, 3),
        |vt AS (SELECT balance_band, sum(ncv) AS nv FROM pv GROUP BY 1),
        |tt AS (SELECT sum(nv) AS nn FROM vt),
        |tm AS (SELECT pv.c_nationkey, pv.c_mktsegment, pv.ncv, vt.nv,
        |         sum(pv.ncv) OVER (PARTITION BY pv.c_nationkey,
        |           pv.c_mktsegment) AS nc
        |       FROM pv JOIN vt
        |         ON pv.balance_band IS NOT DISTINCT FROM vt.balance_band),
        |pc AS (SELECT c_nationkey, c_mktsegment, min(nc) AS nc,
        |         sum(abs(CAST(ncv AS HUGEINT) * (SELECT nn FROM tt)
        |               - CAST(nv AS HUGEINT) * nc)
        |             - CAST(nv AS HUGEINT) * nc) AS s
        |       FROM tm GROUP BY 1, 2),
        |d AS (SELECT nc,
        |        (s + CAST(nc AS HUGEINT) * (SELECT nn FROM tt))
        |          * 1000000
        |          // (2 * CAST(nc AS HUGEINT) * (SELECT nn FROM tt))
        |          AS dd
        |      FROM pc)
        |SELECT CAST(max(dd) AS BIGINT) AS t_closeness_x1e6,
        |  count(*) AS n_classes, CAST(sum(nc) AS BIGINT) AS n_rows,
        |  CAST(COALESCE(SUM(CASE WHEN dd > 200000 THEN nc END), 0)
        |    AS BIGINT) AS rows_above_t,
        |  CAST(COALESCE(SUM(CASE WHEN dd > 200000 THEN 1 END), 0)
        |    AS BIGINT) AS classes_above_t
        |FROM d""".stripMargin,

    // the expectation constants are the DRIVER-computed Math.log10
    // doubles interpolated as round-trip literals, so both engines use
    // bit-identical expected rates (libm log10 may differ in the last
    // ulp); digit from the decimal string form
    "q_benford" -> {
      val expVals = (1 to 9)
        .map(d => s"($d, ${math.log10(1.0 + 1.0 / d)})")
        .mkString(", ")
      s"""WITH c AS (
         |  SELECT CAST(regexp_extract(
         |      CAST(CAST(abs(o_totalprice) AS DECIMAL(38,6)) AS VARCHAR),
         |      '[1-9]', 0) AS INTEGER) AS digit, count(*) AS n
         |  FROM orders
         |  WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) > 0
         |    AND regexp_extract(
         |      CAST(CAST(abs(o_totalprice) AS DECIMAL(38,6)) AS VARCHAR),
         |      '[1-9]', 0) <> ''
         |  GROUP BY 1),
         |t AS (SELECT sum(n) AS tn FROM c),
         |e(digit, ex) AS (VALUES $expVals)
         |SELECT e.digit, COALESCE(c.n, 0) AS n,
         |  round(COALESCE(c.n, 0)::DOUBLE / tn::DOUBLE, 6) AS observed,
         |  round(ex, 6) AS expected,
         |  round((COALESCE(c.n, 0)::DOUBLE - ex * tn::DOUBLE)
         |        * (COALESCE(c.n, 0)::DOUBLE - ex * tn::DOUBLE)
         |        / (ex * tn::DOUBLE), 6) AS chi2_term
         |FROM e LEFT JOIN c USING (digit) CROSS JOIN t
         |ORDER BY e.digit""".stripMargin
    },

    // the q_stats_agg formula per pair, pairwise-complete; per-row
    // floor(v*1e6) micro-units (floor of a double is bit-portable,
    // round-half modes are not) summed exactly — HUGEINT here,
    // Int128Sum on the engine side — then the identical ::DOUBLE/1e6
    // conversion before the rounded formula
    // doubled average ranks via 2·avgrank = 2·cum − t + 1 on each
    // micro-quantized value table, exact HUGEINT power sums, then the
    // Pearson closed form in the engine's exact double-op order
    "q_spearman" ->
      """WITH b AS (
        |  SELECT CAST(floor(l_quantity * 1000000.0) AS BIGINT) AS xm,
        |    CAST(floor(l_extendedprice * 1000000.0) AS BIGINT) AS ym
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND NOT isnan(l_quantity)
        |    AND isfinite(l_quantity)
        |    AND l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
        |    AND isfinite(l_extendedprice)),
        |vx AS (SELECT xm, count(*) AS t FROM b GROUP BY 1),
        |cx AS (SELECT xm,
        |         2 * SUM(t) OVER (ORDER BY xm
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           - t + 1 AS r2x
        |       FROM vx),
        |vy AS (SELECT ym, count(*) AS t FROM b GROUP BY 1),
        |cy AS (SELECT ym,
        |         2 * SUM(t) OVER (ORDER BY ym
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           - t + 1 AS r2y
        |       FROM vy),
        |r AS (SELECT CAST(r2x AS HUGEINT) AS a, CAST(r2y AS HUGEINT) AS b2
        |      FROM b JOIN cx USING (xm) JOIN cy USING (ym)),
        |g AS (SELECT count(*)::BIGINT AS n,
        |        SUM(a) AS sa, SUM(b2) AS sb,
        |        SUM(a * a) AS saa, SUM(b2 * b2) AS sbb,
        |        SUM(a * b2) AS sab
        |      FROM r),
        |f AS (SELECT n,
        |        n::DOUBLE * saa::DOUBLE - sa::DOUBLE * sa::DOUBLE AS varx,
        |        n::DOUBLE * sbb::DOUBLE - sb::DOUBLE * sb::DOUBLE AS vary,
        |        n::DOUBLE * sab::DOUBLE - sa::DOUBLE * sb::DOUBLE AS cov
        |      FROM g)
        |SELECT n,
        |  CASE WHEN varx > 0.0 AND vary > 0.0
        |    THEN round(cov / (sqrt(varx) * sqrt(vary)), 6) END AS rho
        |FROM f""".stripMargin,

    "q_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val branches = for {
        i <- cs.indices; j <- (i + 1) until cs.size
      } yield {
        val (a, b) = (cs(i), cs(j))
        def ms(e: String) =
          s"(SUM(CAST(floor(($e) * 1000000.0) AS HUGEINT))::DOUBLE" +
            " / 1000000.0)"
        s"""SELECT * FROM (
           |  WITH g AS (
           |    SELECT count(*)::DOUBLE AS n,
           |      ${ms(a)} AS sx,
           |      ${ms(b)} AS sy,
           |      ${ms(s"$a * $a")} AS sxx,
           |      ${ms(s"$b * $b")} AS syy,
           |      ${ms(s"$a * $b")} AS sxy
           |    FROM lineitem WHERE $a IS NOT NULL AND $b IS NOT NULL)
           |  SELECT '$a' AS col_a, '$b' AS col_b, n::BIGINT AS n,
           |    CASE WHEN n * sxx - sx * sx > 0.0
           |          AND n * syy - sy * sy > 0.0
           |    THEN round((n * sxy - sx * sy)
           |      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
           |    END AS corr
           |  FROM g)""".stripMargin
      }
      branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },

    // values quantized ONCE to floor-micros; first moments HUGEINT sums
    // at 1e-6, product moments HUGEINT sums of per-row micro products at
    // 1e-12 (Int128Sum / Int128SumProd engine-side), the identical
    // closed-form double sequence
    "q_ols_group" -> {
      val (x, y) = ("l_quantity", "l_extendedprice")
      s"""WITH q AS (
         |  SELECT l_returnflag,
         |    CAST(floor(($x) * 1000000.0) AS HUGEINT) AS xm,
         |    CAST(floor(($y) * 1000000.0) AS HUGEINT) AS ym
         |  FROM lineitem
         |  WHERE $x IS NOT NULL AND $y IS NOT NULL),
         |g AS (
         |  SELECT l_returnflag, count(*) AS n,
         |    SUM(xm)::DOUBLE / 1000000.0 AS sx,
         |    SUM(ym)::DOUBLE / 1000000.0 AS sy,
         |    SUM(xm * xm)::DOUBLE / 1000000000000.0 AS sxx,
         |    SUM(ym * ym)::DOUBLE / 1000000000000.0 AS syy,
         |    SUM(xm * ym)::DOUBLE / 1000000000000.0 AS sxy
         |  FROM q
         |  GROUP BY 1)
         |SELECT l_returnflag, n,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0 THEN
         |    round((n::DOUBLE * sxy - sx * sy)
         |          / (n::DOUBLE * sxx - sx * sx), 6) END AS slope,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0 THEN
         |    round((sy - ((n::DOUBLE * sxy - sx * sy)
         |                 / (n::DOUBLE * sxx - sx * sx)) * sx)
         |          / n::DOUBLE, 6) END AS intercept,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0
         |        AND n::DOUBLE * syy - sy * sy > 0.0 THEN
         |    round(((n::DOUBLE * sxy - sx * sy)
         |           * (n::DOUBLE * sxy - sx * sy))
         |          / ((n::DOUBLE * sxx - sx * sx)
         |             * (n::DOUBLE * syy - sy * sy)), 6) END AS r2
         |FROM g ORDER BY l_returnflag""".stripMargin
    },

    // exact contingency counts; χ² in the Σo²/e − n form (empty cells
    // contribute 0 — see cramersV's scaladoc), per-cell terms floored to
    // micro-units and HUGEINT-summed (order-independent ≡ Int128Sum)
    "q_cramers_v" ->
      """WITH c AS (
        |  SELECT source AS x, lang AS y, count(*) AS n_xy
        |  FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
        |xm AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM c GROUP BY 1),
        |ym AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n,
        |        count(DISTINCT x) AS r, count(DISTINCT y) AS cc FROM c),
        |s AS (SELECT n, r, cc,
        |        SUM(CAST(floor(
        |          (n_xy::DOUBLE * n_xy::DOUBLE
        |           / (n_x::DOUBLE * n_y::DOUBLE / n::DOUBLE)) * 1000000.0)
        |          AS HUGEINT)) AS chi2m
        |      FROM c JOIN xm USING (x) JOIN ym USING (y) CROSS JOIN t
        |      GROUP BY 1, 2, 3)
        |SELECT n, r AS n_rows_x, cc AS n_cols_y,
        |  CASE WHEN r > 1 AND cc > 1 THEN
        |    round(greatest(chi2m::DOUBLE / 1000000.0 - n::DOUBLE, 0.0), 6)
        |  END AS chi2,
        |  CASE WHEN r > 1 AND cc > 1 THEN
        |    round(sqrt(greatest(chi2m::DOUBLE / 1000000.0 - n::DOUBLE, 0.0)
        |               / (n::DOUBLE * (least(r, cc) - 1)::DOUBLE)), 6)
        |  END AS cramers_v
        |FROM s""".stripMargin,

    // centi-unit values, exact HUGEINT rank·value sums, the identical
    // rank-formula double sequence
    "q_gini" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0),
        |r AS (SELECT g, v, row_number() OVER (
        |        PARTITION BY g ORDER BY v) AS i FROM c),
        |a AS (SELECT g, count(*) AS n, SUM(CAST(v AS HUGEINT)) AS s,
        |        SUM(CAST(i AS HUGEINT) * CAST(v AS HUGEINT)) AS isum
        |      FROM r GROUP BY 1)
        |SELECT g AS o_orderpriority, n, CAST(s AS BIGINT) AS total_x100,
        |  CASE WHEN s > 0 THEN
        |    round((2.0 * isum::DOUBLE) / (n::DOUBLE * s::DOUBLE)
        |          - (n::DOUBLE + 1.0) / n::DOUBLE, 6) END AS gini
        |FROM a ORDER BY o_orderpriority""".stripMargin,

    // cumulative tp/fp down the quantized-score order per variant; the
    // Spark side reconstructs the same prefixes via PrefixSum + compact
    // per-group offsets
    "q_best_f1" ->
      """WITH b AS (
        |  SELECT user_id % 2 AS variant,
        |    CAST(event_type = 'purchase' AS INT) AS y,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS q
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |d AS (SELECT variant, q, SUM(y) AS np, COUNT(*) - SUM(y) AS nn
        |      FROM b GROUP BY variant, q),
        |c AS (SELECT variant, q,
        |        SUM(np) OVER (PARTITION BY variant
        |          ORDER BY q DESC) AS tp,
        |        SUM(nn) OVER (PARTITION BY variant
        |          ORDER BY q DESC) AS fp,
        |        SUM(np) OVER (PARTITION BY variant) AS pos
        |      FROM d),
        |f AS (SELECT variant, q AS thr, tp, fp, pos - tp AS fn,
        |        CASE WHEN 2 * tp + fp + (pos - tp) > 0 THEN
        |          (2 * tp * 1000000) // (2 * tp + fp + (pos - tp))
        |        ELSE 0 END AS f1
        |      FROM c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY variant
        |        ORDER BY f1 DESC, thr ASC) AS rn FROM f)
        |SELECT variant, thr AS thr_x1e6, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        |  CAST(f1 AS BIGINT) AS f1_x1e6
        |FROM r WHERE rn = 1 ORDER BY variant""".stripMargin,

    // row-level replay of the engine's rank-band convention: 0-based
    // row_number over (score desc, label desc) — positives first
    // within tie runs — band = (r·10)//n; all-integer gain/lift
    "q_decile_lift" ->
      """WITH b AS (
        |  SELECT user_id % 2 AS variant,
        |    CAST(event_type = 'purchase' AS INT) AS y,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS q
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT variant, y,
        |        row_number() OVER (PARTITION BY variant
        |          ORDER BY q DESC, y DESC) - 1 AS rk,
        |        count(*) OVER (PARTITION BY variant) AS n
        |      FROM b),
        |a AS (SELECT variant, (rk * 10) // n AS decile,
        |        COUNT(*) AS n_d, SUM(y) AS pos_d
        |      FROM r GROUP BY 1, 2),
        |c AS (SELECT *,
        |        SUM(n_d) OVER (PARTITION BY variant
        |          ORDER BY decile) AS cum_n,
        |        SUM(pos_d) OVER (PARTITION BY variant
        |          ORDER BY decile) AS cum_pos,
        |        SUM(n_d) OVER (PARTITION BY variant) AS nn,
        |        SUM(pos_d) OVER (PARTITION BY variant) AS pp
        |      FROM a)
        |SELECT variant, decile, CAST(n_d AS BIGINT) AS n,
        |  CAST(pos_d AS BIGINT) AS pos, CAST(cum_n AS BIGINT) AS cum_n,
        |  CAST(cum_pos AS BIGINT) AS cum_pos,
        |  CASE WHEN pp > 0 THEN
        |    CAST((cum_pos * 1000000) // pp AS BIGINT) END AS gain_x1e6,
        |  CASE WHEN pp > 0 THEN
        |    CAST((CAST(cum_pos AS HUGEINT) * nn * 1000000)
        |      // (CAST(cum_n AS HUGEINT) * pp) AS BIGINT)
        |  END AS lift_x1e6
        |FROM c ORDER BY variant, decile""".stripMargin,

    // pooled-rank replay of q_decile_lift's band formula with the
    // (score desc, treatment desc, label desc) triple order; the
    // possibly-negative uplift/qini numerators spell out the floor
    "q_qini" ->
      """WITH b AS (
        |  SELECT user_id % 2 = 1 AS w,
        |    CAST(event_type = 'purchase' AS INT) AS y,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS q
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND user_id IS NOT NULL),
        |r AS (SELECT w, y,
        |        row_number() OVER (ORDER BY q DESC, w DESC, y DESC)
        |          - 1 AS rk,
        |        count(*) OVER () AS n
        |      FROM b),
        |a AS (SELECT (rk * 10) // n AS decile,
        |        SUM(CASE WHEN w THEN 1 ELSE 0 END) AS n_t,
        |        SUM(CASE WHEN w THEN y ELSE 0 END) AS pos_t,
        |        SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS n_c,
        |        SUM(CASE WHEN NOT w THEN y ELSE 0 END) AS pos_c
        |      FROM r GROUP BY 1),
        |c AS (SELECT *,
        |        SUM(n_t) OVER (ORDER BY decile) AS cnt,
        |        SUM(pos_t) OVER (ORDER BY decile) AS cpt,
        |        SUM(n_c) OVER (ORDER BY decile) AS cnc,
        |        SUM(pos_c) OVER (ORDER BY decile) AS cpc
        |      FROM a),
        |f AS (SELECT decile, n_t, pos_t, n_c, pos_c, cnt, cnc,
        |        (CAST(cpt AS HUGEINT) * cnc
        |          - CAST(cpc AS HUGEINT) * cnt) * 1000000 AS nm,
        |        CAST(cnt AS HUGEINT) * cnc AS d1,
        |        CAST(cnc AS HUGEINT) AS d2
        |      FROM c)
        |SELECT decile, CAST(n_t AS BIGINT) AS n_t,
        |  CAST(pos_t AS BIGINT) AS pos_t, CAST(n_c AS BIGINT) AS n_c,
        |  CAST(pos_c AS BIGINT) AS pos_c,
        |  CASE WHEN cnt > 0 AND cnc > 0 THEN
        |    CAST(CASE WHEN nm % d1 <> 0 AND nm < 0
        |      THEN nm // d1 - 1 ELSE nm // d1 END AS BIGINT)
        |  END AS uplift_x1e6,
        |  CASE WHEN cnc > 0 THEN
        |    CAST(CASE WHEN nm % d2 <> 0 AND nm < 0
        |      THEN nm // d2 - 1 ELSE nm // d2 END AS BIGINT)
        |  END AS qini_x1e6
        |FROM f ORDER BY decile""".stripMargin,

    // the rank-sum identity with 2·avgrank = 2·rank + tiecount − 1
    // (integer, HUGEINT-summed ≡ Int128Sum), one double division
    "q_auc" ->
      """WITH b AS (
        |  SELECT user_id % 2 AS variant,
        |    event_type = 'purchase' AS y, value AS s
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT variant, y,
        |        2 * rank() OVER (PARTITION BY variant ORDER BY s)
        |          + count(*) OVER (PARTITION BY variant, s) - 1 AS r2
        |      FROM b),
        |a AS (SELECT variant,
        |        CAST(count(*) FILTER (WHERE y) AS BIGINT) AS n_pos,
        |        CAST(count(*) FILTER (WHERE NOT y) AS BIGINT) AS n_neg,
        |        SUM(CASE WHEN y THEN CAST(r2 AS HUGEINT) END) AS rp2
        |      FROM r GROUP BY 1)
        |SELECT variant, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    round((rp2::DOUBLE - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0))
        |          / (2.0 * n_pos::DOUBLE * n_neg::DOUBLE), 6) END AS auc
        |FROM a ORDER BY variant""".stripMargin,

    // reproducible total order (score DESC, event_id ASC), exact
    // floor(1e6·cum⁺/k) terms (// ≡ Fixed.ldiv), one double division
    "q_avg_precision" ->
      """WITH b AS (
        |  SELECT user_id % 2 AS variant,
        |    event_type = 'purchase' AS y, value AS s, event_id AS id
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT variant, y,
        |        CAST(row_number() OVER w AS BIGINT) AS k,
        |        SUM(CASE WHEN y THEN 1 ELSE 0 END) OVER (
        |          PARTITION BY variant ORDER BY s DESC, id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
        |      FROM b
        |      WINDOW w AS (PARTITION BY variant ORDER BY s DESC, id ASC)),
        |a AS (SELECT variant,
        |        CAST(count(*) FILTER (WHERE y) AS BIGINT) AS n_pos,
        |        CAST(count(*) FILTER (WHERE NOT y) AS BIGINT) AS n_neg,
        |        SUM(CASE WHEN y THEN CAST((1000000 * cp) // k AS HUGEINT)
        |            END) AS ts
        |      FROM r GROUP BY 1)
        |SELECT variant, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 THEN
        |    round(ts::DOUBLE / (1000000.0 * n_pos::DOUBLE), 6) END AS ap
        |FROM a ORDER BY variant""".stripMargin,

    // exact integer CDF cross-multiplication per distinct value
    // (HUGEINT ≡ the engine's decimal(38,0)), one floor division
    "q_ks_test" ->
      """WITH v AS (
        |  SELECT value::DOUBLE AS v, event_id % 2 = 0 AS a_side
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |c AS (SELECT v,
        |        sum(CASE WHEN a_side THEN 1 ELSE 0 END) AS ca,
        |        sum(CASE WHEN NOT a_side THEN 1 ELSE 0 END) AS cb
        |      FROM v GROUP BY 1),
        |cum AS (SELECT v,
        |          sum(ca) OVER (ORDER BY v
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
        |          sum(cb) OVER (ORDER BY v
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
        |        FROM c),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |        CAST(sum(cb) AS BIGINT) AS n_b FROM c),
        |d AS (SELECT n_a, n_b,
        |        max(abs(CAST(fa AS HUGEINT) * n_b
        |                - CAST(fb AS HUGEINT) * n_a)) AS maxd
        |      FROM cum CROSS JOIN t GROUP BY 1, 2)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST((maxd * 1000000) // (CAST(n_a AS HUGEINT) * n_b)
        |      AS BIGINT) END AS ks_x1e6,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    (CAST((maxd * 1000000) // (CAST(n_a AS HUGEINT) * n_b)
        |       AS BIGINT))::DOUBLE / 1000000.0 >
        |    1.358 * sqrt((n_a + n_b)::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE))
        |  END AS significant_05
        |FROM d""".stripMargin,

    // pooled-extreme equal-width binning as a fixed double-op sequence,
    // then the exact q_drift_psi machinery over bin ids
    "q_numeric_drift" ->
      """WITH v AS (
        |  SELECT event_id, value::DOUBLE AS v FROM events
        |  WHERE value IS NOT NULL AND isfinite(value)),
        |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
        |f AS (SELECT CASE WHEN hi = lo THEN 0
        |        ELSE CAST(least(floor((v - lo) * 10 / (hi - lo)), 9)
        |          AS INT) END AS bin,
        |        event_id % 2 = 0 AS a_side
        |      FROM v CROSS JOIN mm),
        |c AS (SELECT bin,
        |        CAST(sum(CASE WHEN a_side THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN NOT a_side THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_b
        |      FROM f GROUP BY 1),
        |s AS (SELECT sum(n_a) AS na, sum(n_b) AS nb, count(*) AS k FROM c),
        |r AS (SELECT bin, n_a, n_b,
        |        CAST(((n_a + 1) * 1000000) // (na + k) AS BIGINT)
        |          AS rate_a_x1e6,
        |        CAST(((n_b + 1) * 1000000) // (nb + k) AS BIGINT)
        |          AS rate_b_x1e6,
        |        (n_a + 1)::DOUBLE / (na + k)::DOUBLE AS ra,
        |        (n_b + 1)::DOUBLE / (nb + k)::DOUBLE AS rb
        |      FROM c CROSS JOIN s)
        |SELECT bin,
        |  round(lo + bin * ((hi - lo) / 10), 6) AS bin_lo,
        |  round(lo + (bin + 1) * ((hi - lo) / 10), 6) AS bin_hi,
        |  n_a, n_b, rate_a_x1e6, rate_b_x1e6,
        |  round((ra - rb) * ln(ra / rb), 6) AS psi_term
        |FROM r CROSS JOIN mm ORDER BY bin""".stripMargin,

    "q_markov_attrib" -> markovAttribOracle(12),

    // the reverse running conversion count forms (touches…, conversion)
    // groups; first/last via tie-broken row_numbers (the engine's
    // min_by/max_by over (ts, eid) structs — same total order)
    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS t, epoch_us(ts) AS ts,
        |    event_id AS eid
        |  FROM events),
        |g AS (SELECT *, sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY u ORDER BY ts, eid
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS grp
        |      FROM e),
        |gg AS (SELECT * FROM g WHERE grp >= 1),
        |tch AS (SELECT * FROM gg WHERE t <> 'purchase'),
        |fr AS (SELECT u, grp, t,
        |         row_number() OVER (PARTITION BY u, grp
        |           ORDER BY ts, eid) AS rf,
        |         row_number() OVER (PARTITION BY u, grp
        |           ORDER BY ts DESC, eid DESC) AS rl
        |       FROM tch),
        |pc AS (SELECT u, grp, CAST(count(*) AS BIGINT) AS n FROM tch
        |       GROUP BY 1, 2),
        |pcf AS (SELECT pc.u, pc.grp, pc.n,
        |          f.t AS f, l.t AS l
        |        FROM pc
        |        JOIN fr f ON f.u = pc.u AND f.grp = pc.grp AND f.rf = 1
        |        JOIN fr l ON l.u = pc.u AND l.grp = pc.grp AND l.rl = 1),
        |cv AS (SELECT gg.u, gg.grp, pcf.n, pcf.f, pcf.l FROM gg
        |       LEFT JOIN pcf ON gg.u = pcf.u AND gg.grp = pcf.grp
        |       WHERE gg.t = 'purchase'),
        |fi AS (SELECT COALESCE(f, '(direct)') AS channel,
        |         CAST(count(*) AS BIGINT) AS n_first FROM cv GROUP BY 1),
        |la AS (SELECT COALESCE(l, '(direct)') AS channel,
        |         CAST(count(*) AS BIGINT) AS n_last FROM cv GROUP BY 1),
        |lt AS (SELECT tch.u, tch.grp, tch.t AS channel,
        |         CAST(count(*) AS BIGINT) AS cnt
        |       FROM tch GROUP BY 1, 2, 3),
        |lm AS (SELECT channel, (cnt * 1000000) // n AS m
        |       FROM lt JOIN pc ON lt.u = pc.u AND lt.grp = pc.grp
        |       UNION ALL
        |       SELECT '(direct)', 1000000 FROM cv WHERE n IS NULL),
        |li AS (SELECT channel, CAST(sum(m) AS BIGINT) AS linear_x1e6
        |       FROM lm GROUP BY 1)
        |SELECT channel,
        |  COALESCE(n_first, 0) AS n_first,
        |  COALESCE(n_last, 0) AS n_last,
        |  COALESCE(linear_x1e6, 0) AS linear_x1e6
        |FROM fi
        |FULL JOIN la USING (channel)
        |FULL JOIN li USING (channel)
        |ORDER BY channel""".stripMargin,

    // unit-level micro quantization, pooled θ/x̄ from exact HUGEINT power
    // sums, the identical closed-form double sequence as the operator
    // identical double-op sequence to Experiment.welchTTest from the
    // same exact HUGEINT micro-unit power sums
    "q_welch_ttest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    (SUM(CAST(floor(CASE WHEN isfinite(value) THEN value END
        |       * 1000000.0) AS BIGINT))::DOUBLE / 1000000.0) AS y,
        |    user_id % 2 = 1 AS b
        |  FROM events GROUP BY user_id),
        |f AS (SELECT b,
        |        CAST(floor(y * 1000000.0) AS BIGINT) AS ym
        |      FROM u WHERE y IS NOT NULL AND NOT isnan(y)
        |        AND isfinite(y)),
        |a AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b,
        |        SUM(CASE WHEN NOT b THEN CAST(ym AS HUGEINT) END) AS sa,
        |        SUM(CASE WHEN b THEN CAST(ym AS HUGEINT) END) AS sb,
        |        SUM(CASE WHEN NOT b
        |          THEN CAST(ym AS HUGEINT) * ym END) AS qa,
        |        SUM(CASE WHEN b
        |          THEN CAST(ym AS HUGEINT) * ym END) AS qb
        |      FROM f),
        |m AS (SELECT *,
        |        sa::DOUBLE / 1000000.0 / n_a::DOUBLE AS ma,
        |        sb::DOUBLE / 1000000.0 / n_b::DOUBLE AS mb,
        |        (n_a::DOUBLE * (qa::DOUBLE / 1000000000000.0)
        |          - (sa::DOUBLE / 1000000.0) * (sa::DOUBLE / 1000000.0))
        |          / (n_a::DOUBLE * (n_a::DOUBLE - 1.0)) AS va,
        |        (n_b::DOUBLE * (qb::DOUBLE / 1000000000000.0)
        |          - (sb::DOUBLE / 1000000.0) * (sb::DOUBLE / 1000000.0))
        |          / (n_b::DOUBLE * (n_b::DOUBLE - 1.0)) AS vb
        |      FROM a),
        |w AS (SELECT *,
        |        va / n_a::DOUBLE AS ra, vb / n_b::DOUBLE AS rb
        |      FROM m),
        |z AS (SELECT *, ra + rb AS se2 FROM w)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN round(ma, 6) END AS mean_a,
        |  CASE WHEN n_b > 0 THEN round(mb, 6) END AS mean_b,
        |  CASE WHEN n_a > 1 THEN round(va, 6) END AS var_a,
        |  CASE WHEN n_b > 1 THEN round(vb, 6) END AS var_b,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0.0
        |    THEN round((mb - ma) / sqrt(se2), 6) END AS t_stat,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0.0
        |    THEN round(se2 * se2 / (ra * ra / (n_a::DOUBLE - 1.0)
        |      + rb * rb / (n_b::DOUBLE - 1.0)), 6) END AS df,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0.0
        |    THEN abs(round((mb - ma) / sqrt(se2), 6)) >= 1.96
        |  END AS significant
        |FROM z""".stripMargin,

    // centi-quantized sum-of-squares decomposition; S² numerators are
    // squares so // parity with the engine's floor ldiv holds
    "q_anova" ->
      """WITH v AS (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 100.0) AS BIGINT) AS vc
        |  FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND isfinite(value)),
        |gr AS (SELECT g, count(*)::BIGINT AS ng,
        |         SUM(CAST(vc AS HUGEINT)) AS sg,
        |         SUM(CAST(vc AS HUGEINT) * vc) AS qg
        |       FROM v GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS k,
        |        CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n,
        |        SUM(sg) AS s, SUM(qg) AS q,
        |        SUM((sg * sg) // ng) AS tp
        |      FROM gr),
        |f AS (SELECT k, n,
        |        CASE WHEN k >= 2 AND n > k
        |          THEN CAST(tp - (s * s) // n AS BIGINT) END AS ssb_c2,
        |        CASE WHEN k >= 2 AND n > k
        |          THEN CAST(q - tp AS BIGINT) END AS ssw_c2
        |      FROM t)
        |SELECT k, n, ssb_c2, ssw_c2,
        |  CASE WHEN ssw_c2 IS NOT NULL AND ssw_c2 > 0 THEN
        |    round((ssb_c2::DOUBLE / (k - 1)::DOUBLE)
        |      / (ssw_c2::DOUBLE / (n - k)::DOUBLE), 6)
        |  END AS f_stat
        |FROM f""".stripMargin,

    // pooled doubled average ranks over the micro-quantized value
    // table; the S²/n cross terms floor EXACTLY in HUGEINT ((S² −
    // S² mod n)/n divides exactly), H and the tie correction in the
    // engine's double-op order
    "q_kruskal" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS vm
        |  FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND isfinite(value)),
        |v AS (SELECT vm, count(*) AS t FROM b GROUP BY 1),
        |c AS (SELECT vm,
        |        2 * SUM(t) OVER (ORDER BY vm
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          - t + 1 AS r2
        |      FROM v),
        |gr AS (SELECT g, count(*)::BIGINT AS ng,
        |         SUM(CAST(r2 AS HUGEINT)) AS sg
        |       FROM b JOIN c USING (vm) GROUP BY 1),
        |tt AS (SELECT COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0)
        |         AS tie FROM v),
        |a AS (SELECT count(*)::BIGINT AS k,
        |        CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n,
        |        SUM((sg * sg - (sg * sg) % ng) // ng) AS x
        |      FROM gr)
        |SELECT k, n,
        |  CASE WHEN k >= 2 AND n > k AND
        |    (1.0 - tie::DOUBLE / (n::DOUBLE * n::DOUBLE * n::DOUBLE
        |       - n::DOUBLE)) > 0.0
        |  THEN round(
        |    (3.0 * x::DOUBLE / (n::DOUBLE * (n::DOUBLE + 1.0))
        |      - 3.0 * (n::DOUBLE + 1.0))
        |    / (1.0 - tie::DOUBLE / (n::DOUBLE * n::DOUBLE * n::DOUBLE
        |         - n::DOUBLE)), 6)
        |  END AS h_stat
        |FROM a CROSS JOIN tt""".stripMargin,

    // per-group median kept as the exact middle-pair sum (lo+hi), so
    // deviations are the integers |2·vc − dm| (doubled centi units —
    // F is scale-invariant); then q_anova's decomposition verbatim
    "q_levene" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 100.0) AS BIGINT) AS vc
        |  FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND isfinite(value)),
        |o AS (SELECT g, vc,
        |        row_number() OVER (PARTITION BY g ORDER BY vc) AS rn,
        |        count(*) OVER (PARTITION BY g) AS ng
        |      FROM b),
        |m AS (SELECT g,
        |        SUM(CASE WHEN rn = (ng + 1) // 2 THEN vc END)
        |          + SUM(CASE WHEN rn = (ng + 2) // 2 THEN vc END) AS dm
        |      FROM o GROUP BY 1),
        |z AS (SELECT b.g, abs(2 * vc - dm) AS zc
        |      FROM b JOIN m USING (g)),
        |gr AS (SELECT g, count(*)::BIGINT AS ng,
        |         SUM(CAST(zc AS HUGEINT)) AS sg,
        |         SUM(CAST(zc AS HUGEINT) * zc) AS qg
        |       FROM z GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS k,
        |        CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n,
        |        SUM(sg) AS s, SUM(qg) AS q,
        |        SUM((sg * sg) // ng) AS tp
        |      FROM gr),
        |f AS (SELECT k, n,
        |        CASE WHEN k >= 2 AND n > k
        |          THEN CAST(tp - (s * s) // n AS BIGINT) END AS ssb_z2,
        |        CASE WHEN k >= 2 AND n > k
        |          THEN CAST(q - tp AS BIGINT) END AS ssw_z2
        |      FROM t)
        |SELECT k, n, ssb_z2, ssw_z2,
        |  CASE WHEN ssw_z2 IS NOT NULL AND ssw_z2 > 0 THEN
        |    round((ssb_z2::DOUBLE / (k - 1)::DOUBLE)
        |      / (ssw_z2::DOUBLE / (n - k)::DOUBLE), 6)
        |  END AS w_stat
        |FROM f""".stripMargin,

    // per-user spend quantized to micros (the same unit frame as
    // q_welch_ttest), distinct-value table with tie counts, average
    // ranks via 2·avgrank = 2·cum − t + 1, tie-corrected normal z
    "q_mannwhitney" ->
      """WITH u AS (
        |  SELECT user_id,
        |    (SUM(CAST(floor(CASE WHEN isfinite(value) THEN value END
        |       * 1000000.0) AS BIGINT))::DOUBLE / 1000000.0) AS y,
        |    user_id % 2 = 1 AS b
        |  FROM events GROUP BY user_id),
        |f AS (SELECT CAST(floor(y * 1000000.0) AS BIGINT) AS vm, b
        |      FROM u WHERE y IS NOT NULL AND NOT isnan(y)
        |        AND isfinite(y)),
        |v AS (SELECT vm,
        |        SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS ca,
        |        SUM(CASE WHEN b THEN 1 ELSE 0 END) AS cb,
        |        COUNT(*) AS t
        |      FROM f GROUP BY vm),
        |c AS (SELECT *,
        |        SUM(t) OVER (ORDER BY vm
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ft
        |      FROM v),
        |a AS (SELECT
        |        CAST(COALESCE(SUM(ca), 0) AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS n_b,
        |        SUM(CAST(cb AS HUGEINT)
        |          * (2 * CAST(ft AS HUGEINT) - t + 1)) AS wb2,
        |        SUM(CAST(t AS HUGEINT) * t * t - t) AS tt
        |      FROM c),
        |m AS (SELECT *,
        |        wb2 - CAST(n_b AS HUGEINT) * (n_b + 1) AS u2,
        |        CAST(n_a AS HUGEINT) * n_b AS mu2,
        |        (n_a + n_b)::DOUBLE AS n
        |      FROM a),
        |s AS (SELECT *,
        |        CASE WHEN n_a > 0 AND n_b > 0 THEN
        |          n_a::DOUBLE * n_b::DOUBLE / 12.0 *
        |            ((n + 1.0) - tt::DOUBLE / (n * (n - 1.0)))
        |        END AS sig2
        |      FROM m)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(u2 AS BIGINT) END AS u_x2,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND sig2 > 0.0
        |    THEN round((u2::DOUBLE - mu2::DOUBLE) / (2.0 * sqrt(sig2)), 6)
        |  END AS z_score,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND sig2 > 0.0
        |    THEN abs(round((u2::DOUBLE - mu2::DOUBLE)
        |      / (2.0 * sqrt(sig2)), 6)) >= 1.96
        |  END AS significant
        |FROM s""".stripMargin,

    // same average-rank 2U chain; delta = (2U - n_a*n_b)*1e6 //
    // (n_a*n_b) with the signed-floor adjustment; Romano labels
    "q_cliffs_delta" ->
      """WITH u AS (
        |  SELECT user_id,
        |    (SUM(CAST(floor(CASE WHEN isfinite(value) THEN value END
        |       * 1000000.0) AS BIGINT))::DOUBLE / 1000000.0) AS y,
        |    user_id % 2 = 1 AS b
        |  FROM events GROUP BY user_id),
        |f AS (SELECT CAST(floor(y * 1000000.0) AS BIGINT) AS vm, b
        |      FROM u WHERE y IS NOT NULL AND NOT isnan(y)
        |        AND isfinite(y)),
        |v AS (SELECT vm,
        |        SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS ca,
        |        SUM(CASE WHEN b THEN 1 ELSE 0 END) AS cb,
        |        COUNT(*) AS t
        |      FROM f GROUP BY vm),
        |c AS (SELECT *,
        |        SUM(t) OVER (ORDER BY vm
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ft
        |      FROM v),
        |a AS (SELECT
        |        CAST(COALESCE(SUM(ca), 0) AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS n_b,
        |        SUM(CAST(cb AS HUGEINT)
        |          * (2 * CAST(ft AS HUGEINT) - t + 1)) AS wb2
        |      FROM c),
        |m AS (SELECT *,
        |        wb2 - CAST(n_b AS HUGEINT) * (n_b + 1) AS u2,
        |        CAST(n_a AS HUGEINT) * n_b AS nm
        |      FROM a),
        |dd AS (SELECT n_a, n_b,
        |         CASE WHEN n_a > 0 AND n_b > 0
        |           THEN CAST(u2 AS BIGINT) END AS u_x2,
        |         CASE WHEN n_a > 0 AND n_b > 0 THEN
        |           CAST(CASE WHEN ((u2 - nm) * 1000000) % nm <> 0
        |                  AND (u2 - nm) < 0
        |             THEN ((u2 - nm) * 1000000) // nm - 1
        |             ELSE ((u2 - nm) * 1000000) // nm END AS BIGINT)
        |         END AS delta_x1e6
        |       FROM m)
        |SELECT n_a, n_b, u_x2, delta_x1e6,
        |  CASE WHEN delta_x1e6 IS NOT NULL THEN
        |    CASE WHEN abs(delta_x1e6) < 147000 THEN 'negligible'
        |         WHEN abs(delta_x1e6) < 330000 THEN 'small'
        |         WHEN abs(delta_x1e6) < 474000 THEN 'medium'
        |         ELSE 'large' END END AS magnitude
        |FROM dd""".stripMargin,

    // welch-style exact HUGEINT power sums from ONE micro quantization;
    // the double chain mirrors the engine op-for-op (d12 second
    // moments, ratio-form (n·Σy²−S²)/n, bands on the rounded d)
    "q_cohen_d" ->
      """WITH u AS (
        |  SELECT user_id,
        |    (SUM(CAST(floor(CASE WHEN isfinite(value) THEN value END
        |       * 1000000.0) AS BIGINT))::DOUBLE / 1000000.0) AS y,
        |    user_id % 2 = 1 AS b
        |  FROM events GROUP BY user_id),
        |f AS (SELECT CAST(floor(y * 1000000.0) AS BIGINT) AS ym, b
        |      FROM u WHERE y IS NOT NULL AND NOT isnan(y)
        |        AND isfinite(y)),
        |a AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b,
        |        COALESCE(SUM(CASE WHEN NOT b
        |          THEN CAST(ym AS HUGEINT) END), 0) AS sa,
        |        COALESCE(SUM(CASE WHEN b
        |          THEN CAST(ym AS HUGEINT) END), 0) AS sb,
        |        COALESCE(SUM(CASE WHEN NOT b
        |          THEN CAST(ym AS HUGEINT) * ym END), 0) AS qa,
        |        COALESCE(SUM(CASE WHEN b
        |          THEN CAST(ym AS HUGEINT) * ym END), 0) AS qb
        |      FROM f),
        |z AS (SELECT n_a, n_b,
        |        (sb::DOUBLE / 1000000.0) / n_b::DOUBLE
        |          - (sa::DOUBLE / 1000000.0) / n_a::DOUBLE AS md,
        |        ((n_a::DOUBLE * (qa::DOUBLE / 1000000000000.0)
        |            - (sa::DOUBLE / 1000000.0)
        |              * (sa::DOUBLE / 1000000.0)) / n_a::DOUBLE
        |         + (n_b::DOUBLE * (qb::DOUBLE / 1000000000000.0)
        |            - (sb::DOUBLE / 1000000.0)
        |              * (sb::DOUBLE / 1000000.0)) / n_b::DOUBLE)
        |          / (n_a::DOUBLE + n_b::DOUBLE - 2.0) AS sp2
        |      FROM a),
        |dd AS (SELECT n_a, n_b,
        |         CASE WHEN n_a > 1 AND n_b > 1 AND sp2 > 0.0
        |           THEN round(md / sqrt(sp2), 6) END AS d,
        |         CASE WHEN n_a > 1 AND n_b > 1 AND sp2 > 0.0
        |           THEN round(md / sqrt(sp2) * (1.0 - 3.0
        |             / (4.0 * (n_a::DOUBLE + n_b::DOUBLE) - 9.0)), 6)
        |         END AS g
        |       FROM z)
        |SELECT n_a, n_b, d, g,
        |  CASE WHEN d IS NOT NULL THEN
        |    CASE WHEN abs(d) < 0.2 THEN 'negligible'
        |         WHEN abs(d) < 0.5 THEN 'small'
        |         WHEN abs(d) < 0.8 THEN 'medium'
        |         ELSE 'large' END END AS magnitude
        |FROM dd""".stripMargin,

    // step-up envelope = running min over the reversed p-order; every
    // intermediate an exact floored micro integer (// = Fixed.ldiv)
    "q_bh_fdr" ->
      """WITH u AS (
        |  SELECT event_type || '_' || CAST(user_id % 25 AS VARCHAR)
        |      AS test_id,
        |    (((SUM(CAST(floor(CASE WHEN isfinite(value) THEN value END
        |        * 1000000.0) AS BIGINT)) % 1000000) + 1000000) % 1000000
        |      )::DOUBLE / 1000000.0 AS p
        |  FROM events GROUP BY 1),
        |b AS (SELECT test_id,
        |        CAST(floor(p * 1000000.0) AS BIGINT) AS p_x1e6
        |      FROM u WHERE p IS NOT NULL AND NOT isnan(p)
        |        AND p >= 0.0 AND p <= 1.0),
        |r AS (SELECT *,
        |        row_number() OVER (ORDER BY p_x1e6, test_id) AS rk,
        |        COUNT(*) OVER () AS m
        |      FROM b),
        |c AS (SELECT *, (m * p_x1e6) // rk AS cx FROM r),
        |s AS (SELECT *,
        |        min(cx) OVER (ORDER BY p_x1e6 DESC, test_id DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sfx
        |      FROM c)
        |SELECT test_id, p_x1e6, CAST(rk AS BIGINT) AS rank,
        |  least(sfx, 1000000) AS p_adj_x1e6,
        |  least(sfx, 1000000) <= 50000 AS reject
        |FROM s ORDER BY rank""".stripMargin,

    "q_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    (SUM(CAST(floor(CASE WHEN isfinite(value) THEN value END
        |       * 1000000.0) AS BIGINT))::DOUBLE / 1000000.0) AS y,
        |    count(*) AS x, user_id % 2 = 1 AS b
        |  FROM events GROUP BY user_id),
        |f AS (SELECT b,
        |        CAST(floor(y * 1000000.0) AS BIGINT) AS ym,
        |        CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT) AS xm
        |      FROM u WHERE y IS NOT NULL AND x IS NOT NULL),
        |a AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b,
        |        SUM(CASE WHEN NOT b THEN CAST(ym AS HUGEINT) END) AS sya,
        |        SUM(CASE WHEN b THEN CAST(ym AS HUGEINT) END) AS syb,
        |        SUM(CASE WHEN NOT b THEN CAST(xm AS HUGEINT) END) AS sxa,
        |        SUM(CASE WHEN b THEN CAST(xm AS HUGEINT) END) AS sxb,
        |        SUM(CAST(xm AS HUGEINT) * xm) AS sxx,
        |        SUM(CAST(xm AS HUGEINT) * ym) AS sxy,
        |        SUM(CAST(ym AS HUGEINT) * ym) AS syy
        |      FROM f),
        |m AS (SELECT *,
        |        (n_a + n_b)::DOUBLE AS n,
        |        (sxa + sxb)::DOUBLE / 1000000.0 AS sx,
        |        (sya + syb)::DOUBLE / 1000000.0 AS sy,
        |        sya::DOUBLE / 1000000.0 / n_a::DOUBLE AS ma,
        |        syb::DOUBLE / 1000000.0 / n_b::DOUBLE AS mb,
        |        sxa::DOUBLE / 1000000.0 / n_a::DOUBLE AS xa,
        |        sxb::DOUBLE / 1000000.0 / n_b::DOUBLE AS xb
        |      FROM a),
        |v AS (SELECT *,
        |        n * (sxx::DOUBLE / 1000000000000.0) - sx * sx AS varx,
        |        n * (syy::DOUBLE / 1000000000000.0) - sy * sy AS vary,
        |        n * (sxy::DOUBLE / 1000000000000.0) - sx * sy AS cov
        |      FROM m)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN round(ma, 6) END AS mean_a,
        |  CASE WHEN n_b > 0 THEN round(mb, 6) END AS mean_b,
        |  CASE WHEN n_a > 0 THEN round(CASE WHEN varx > 0.0
        |    THEN ma - (cov / varx) * (xa - sx / n) ELSE ma END, 6)
        |  END AS adj_mean_a,
        |  CASE WHEN n_b > 0 THEN round(CASE WHEN varx > 0.0
        |    THEN mb - (cov / varx) * (xb - sx / n) ELSE mb END, 6)
        |  END AS adj_mean_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND varx > 0.0 THEN
        |    round(cov / varx, 6) END AS theta,
        |  CASE WHEN varx > 0.0 AND vary > 0.0 THEN
        |    round(cov * cov / (varx * vary), 6) END AS var_reduction,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN round(mb - ma, 6) END AS diff,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN round(CASE WHEN varx > 0.0
        |    THEN (mb - (cov / varx) * (xb - sx / n))
        |         - (ma - (cov / varx) * (xa - sx / n))
        |    ELSE mb - ma END, 6) END AS adj_diff
        |FROM v""".stripMargin,

    // the same driver-computed discount literals as the engine (libm
    // log2 may differ in the last ulp across engines), exact micro sums
    "q_ndcg" -> {
      // ::DOUBLE per element: DuckDB parses bare numeric literals as
      // DECIMAL, and a decimal-typed discount changes the product; the
      // shortest-repr string ::DOUBLE round-trips to the exact double
      val discounts = (1 to 10).map(r =>
        (1.0 / (math.log(r + 1.0) / math.log(2.0))).toString + "::DOUBLE")
      val dList = discounts.mkString("[", ", ", "]")
      s"""WITH b AS (
         |  SELECT source AS q, doc_id, CAST(n_chars % 4 AS INT) AS rel,
         |    (('0x' || substr(md5('ndcg:' || CAST(doc_id AS VARCHAR)),
         |       1, 12))::BIGINT % 1000000) / 1000000.0 AS s
         |  FROM documents WHERE n_chars IS NOT NULL),
         |g AS (SELECT q, doc_id, rel,
         |        ((1::BIGINT << rel) - 1)::DOUBLE AS gain,
         |        row_number() OVER (PARTITION BY q
         |          ORDER BY s DESC, doc_id) AS rs,
         |        row_number() OVER (PARTITION BY q
         |          ORDER BY rel DESC, doc_id) AS ri
         |      FROM b),
         |a AS (SELECT q, count(*) AS n_docs,
         |        COALESCE(SUM(CASE WHEN rs <= 10 THEN
         |          CAST(floor(gain * ($dList)[rs] * 1000000.0) AS HUGEINT)
         |          END), 0) AS dcgm,
         |        COALESCE(SUM(CASE WHEN ri <= 10 THEN
         |          CAST(floor(gain * ($dList)[ri] * 1000000.0) AS HUGEINT)
         |          END), 0) AS idcgm
         |      FROM g GROUP BY 1)
         |SELECT q AS source, n_docs,
         |  CAST(dcgm AS BIGINT) AS dcg_x1e6,
         |  CAST(idcgm AS BIGINT) AS idcg_x1e6,
         |  CASE WHEN idcgm > 0 THEN
         |    round(dcgm::DOUBLE / idcgm::DOUBLE, 6) END AS ndcg
         |FROM a ORDER BY source""".stripMargin
    },

    // exact bin counts; micro-unit mean via HUGEINT floor division
    "q_calibration" ->
      """WITH b AS (
        |  SELECT event_type = 'purchase' AS y,
        |    (('0x' || substr(md5('cal:' || CAST(event_id AS VARCHAR)),
        |       1, 12))::BIGINT % 1000000) / 1000000.0 AS s
        |  FROM events WHERE event_type IS NOT NULL),
        |g AS (SELECT CAST(least(floor(s * 10), 9) AS INT) AS bin,
        |        count(*) AS n,
        |        CAST(count(*) FILTER (WHERE y) AS BIGINT) AS n_pos,
        |        SUM(CAST(floor(s * 1000000.0) AS HUGEINT)) AS sm
        |      FROM b WHERE s >= 0.0 AND s <= 1.0 GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  CAST(sm // CAST(n AS HUGEINT) AS BIGINT) AS mean_score_x1e6,
        |  round(n_pos::DOUBLE / n::DOUBLE, 6) AS pos_rate
        |FROM g ORDER BY bin""".stripMargin,

    // same score CTE as q_calibration; per-row squared errors and the
    // engine's pinned floor-micro bin-rate chain, HUGEINT throughout
    // (all operands non-negative where // applies, except the squared
    // differences which square away the sign first)
    "q_brier" ->
      """WITH b AS (
        |  SELECT event_type = 'purchase' AS y,
        |    (('0x' || substr(md5('cal:' || CAST(event_id AS VARCHAR)),
        |       1, 12))::BIGINT % 1000000) / 1000000.0 AS s
        |  FROM events WHERE event_type IS NOT NULL),
        |q AS (SELECT y, CAST(least(floor(s * 10), 9) AS INT) AS bin,
        |        CAST(floor(s * 1000000.0) AS HUGEINT) AS m
        |      FROM b WHERE s >= 0.0 AND s <= 1.0),
        |g AS (SELECT bin, count(*)::HUGEINT AS n,
        |        CAST(count(*) FILTER (WHERE y) AS HUGEINT) AS p,
        |        SUM(m) AS sm,
        |        SUM((m - CASE WHEN y THEN 1000000 ELSE 0 END)
        |          * (m - CASE WHEN y THEN 1000000 ELSE 0 END)) AS sq
        |      FROM q GROUP BY 1),
        |r AS (SELECT n, p, sq, sm // n AS sbm, (p * 1000000) // n AS rbm
        |      FROM g),
        |t AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn,
        |        CAST(SUM(p) AS HUGEINT) AS pp FROM r),
        |f AS (SELECT nn, pp, (pp * 1000000) // nn AS ybm,
        |        (SELECT SUM(sq) FROM r) AS sqs,
        |        (SELECT SUM(n * (sbm - rbm) * (sbm - rbm)) FROM r)
        |          AS rel,
        |        (SELECT SUM(n * (rbm - (t2.pp * 1000000) // t2.nn)
        |                * (rbm - (t2.pp * 1000000) // t2.nn))
        |         FROM r, t AS t2) AS res
        |      FROM t)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(pp AS BIGINT) AS n_pos,
        |  CAST(sqs // nn AS BIGINT) AS brier_x1e12,
        |  CAST(rel // nn AS BIGINT) AS reliability_x1e12,
        |  CAST(res // nn AS BIGINT) AS resolution_x1e12,
        |  CAST(ybm * (1000000 - ybm) AS BIGINT) AS uncertainty_x1e12
        |FROM f""".stripMargin,

    // PAV == the minimax characterization max_{i<=k} min_{j>=k}
    // avg(i..j): segment fractions stay (sp, sn) integer pairs ordered
    // by their double ratio (distinct rationals with these denominators
    // differ by >> double eps), and only the FINAL floor-micro division
    // is taken — so the floor never sees a rounded double
    "q_isotonic" ->
      """WITH b AS (
        |  SELECT event_type = 'purchase' AS y,
        |    (('0x' || substr(md5('cal:' || CAST(event_id AS VARCHAR)),
        |       1, 12))::BIGINT % 1000000) / 1000000.0 AS s
        |  FROM events WHERE event_type IS NOT NULL),
        |g AS (SELECT CAST(least(floor(s * 10), 9) AS INT) AS bin,
        |        count(*)::BIGINT AS n,
        |        CAST(count(*) FILTER (WHERE y) AS BIGINT) AS p
        |      FROM b WHERE s >= 0.0 AND s <= 1.0 GROUP BY 1),
        |o AS (SELECT bin, n, p, row_number() OVER (ORDER BY bin) AS k,
        |        SUM(n) OVER (ORDER BY bin) AS cn,
        |        SUM(p) OVER (ORDER BY bin) AS cp
        |      FROM g),
        |seg AS (SELECT i.k AS ki, j.k AS kj,
        |          (j.cp - i.cp + i.p) AS sp, (j.cn - i.cn + i.n) AS sn
        |        FROM o i JOIN o j ON i.k <= j.k),
        |mm AS (SELECT s.ki, o2.k AS kk,
        |         arg_min(s.sp, s.sp::DOUBLE / s.sn::DOUBLE) AS msp,
        |         arg_min(s.sn, s.sp::DOUBLE / s.sn::DOUBLE) AS msn
        |       FROM seg s JOIN o o2 ON s.ki <= o2.k AND o2.k <= s.kj
        |       GROUP BY 1, 2),
        |iso AS (SELECT kk,
        |          arg_max(msp, msp::DOUBLE / msn::DOUBLE) AS fsp,
        |          arg_max(msn, msp::DOUBLE / msn::DOUBLE) AS fsn
        |        FROM mm GROUP BY 1)
        |SELECT o.bin, o.n, o.p AS n_pos,
        |  CAST((o.p * 1000000) // o.n AS BIGINT) AS rate_x1e6,
        |  CAST((iso.fsp * 1000000) // iso.fsn AS BIGINT) AS iso_x1e6
        |FROM o JOIN iso ON o.k = iso.kk ORDER BY o.bin""".stripMargin,

    // per-(variant,user) rankings under the same md5 score + event_id
    // tie-break; RR terms as exact 1000000 // first_rank (non-negative
    // => // is the floor), HUGEINT-safe sums, floor-divided means
    "q_mrr" ->
      """WITH base AS (
        |  SELECT user_id % 2 AS variant, user_id,
        |    event_type = 'purchase' AS y, event_id,
        |    (('0x' || substr(md5('mrr:' || CAST(event_id AS VARCHAR)),
        |       1, 12))::BIGINT % 1000000) / 1000000.0 AS s
        |  FROM events WHERE event_type IS NOT NULL),
        |r AS (SELECT variant, user_id, y,
        |        row_number() OVER (PARTITION BY variant, user_id
        |          ORDER BY s DESC, event_id ASC) AS k
        |      FROM base),
        |q AS (SELECT variant, user_id,
        |        min(CASE WHEN y AND k <= 10 THEN k END) AS fr
        |      FROM r GROUP BY 1, 2),
        |g AS (SELECT variant, count(*) AS n_queries,
        |        count(fr) AS n_hit,
        |        COALESCE(sum(1000000 // fr), 0) AS srr
        |      FROM q GROUP BY 1)
        |SELECT variant, n_queries, n_hit,
        |  CAST(srr // n_queries AS BIGINT) AS mrr_x1e6,
        |  (n_hit * 1000000) // n_queries AS hit_rate_x1e6
        |FROM g ORDER BY variant""".stripMargin,

    // same ranking CTEs as q_mrr; per-query floored-micro terms (hits
    // and nrel are non-negative so // is the floor), macro means
    "q_prec_recall_k" ->
      """WITH base AS (
        |  SELECT user_id % 2 AS variant, user_id,
        |    event_type = 'purchase' AS y, event_id,
        |    (('0x' || substr(md5('mrr:' || CAST(event_id AS VARCHAR)),
        |       1, 12))::BIGINT % 1000000) / 1000000.0 AS s
        |  FROM events WHERE event_type IS NOT NULL),
        |r AS (SELECT variant, user_id, y,
        |        row_number() OVER (PARTITION BY variant, user_id
        |          ORDER BY s DESC, event_id ASC) AS k
        |      FROM base),
        |q AS (SELECT variant, user_id,
        |        SUM(CASE WHEN y AND k <= 10 THEN 1 ELSE 0 END) AS hits,
        |        SUM(CASE WHEN y THEN 1 ELSE 0 END) AS nrel
        |      FROM r GROUP BY 1, 2),
        |g AS (SELECT variant, count(*) AS n_queries,
        |        SUM(CASE WHEN nrel > 0 THEN 1 ELSE 0 END)
        |          AS n_rel_queries,
        |        SUM((hits * 1000000) // 10) AS sp,
        |        SUM(CASE WHEN nrel > 0
        |          THEN (hits * 1000000) // nrel ELSE 0 END) AS sr
        |      FROM q GROUP BY 1)
        |SELECT variant, n_queries,
        |  CAST(n_rel_queries AS BIGINT) AS n_rel_queries,
        |  CAST(sp // n_queries AS BIGINT) AS precision_at_k_x1e6,
        |  CASE WHEN n_rel_queries > 0 THEN
        |    CAST(sr // n_rel_queries AS BIGINT) END AS recall_at_k_x1e6
        |FROM g ORDER BY variant""".stripMargin,

    // pooled two-proportion z via ONE conditional aggregation (the same
    // always-one-row shape as the operator: an all-one-variant log
    // yields zero counts + NULL rate/z, never an empty result); the
    // CASEs mirror the empty-variant and zero-variance guards
    // the cleared-denominator chi-square identity replayed in HUGEINT:
    // d = n_b*den - n*num; chi2 = d^2*den / (n*num*(den-num)) — all
    // terms non-negative, so `//` is the floor
    "q_srm" ->
      """WITH u AS (
        |  SELECT user_id, max(user_id % 3 = 0) AS b
        |  FROM events GROUP BY 1),
        |c AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b
        |      FROM u),
        |m AS (SELECT n_a, n_b, n_a + n_b AS n,
        |        CAST(n_b AS HUGEINT) * 3 - CAST(n_a + n_b AS HUGEINT)
        |          AS d
        |      FROM c)
        |SELECT n_a, n_b,
        |  CASE WHEN n > 0 THEN
        |    CAST((CAST(n AS HUGEINT) * 1000000) // 3 AS BIGINT)
        |  END AS expected_b_x1e6,
        |  CASE WHEN n > 0 THEN
        |    CAST((d * d * 3 * 1000000) // (CAST(n AS HUGEINT) * 2)
        |      AS BIGINT)
        |  END AS chi2_x1e6,
        |  CASE WHEN n > 0 THEN
        |    (d * d * 3 * 1000000) // (CAST(n AS HUGEINT) * 2) >= 3841459
        |  END AS srm
        |FROM m""".stripMargin,

    // the q_ab_test user aggregate; the engine's pinned mixture-LR op
    // order (sqrt, exp, the 2V(V+tau2) denominator) with tau2 = 0.0001
    "q_msprt" ->
      """WITH u AS (
        |  SELECT user_id, user_id % 2 = 1 AS b,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b,
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN c END), 0)
        |          AS BIGINT) AS conv_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN c END), 0)
        |          AS BIGINT) AS conv_b
        |      FROM u),
        |m AS (SELECT *,
        |        (conv_a + conv_b)::DOUBLE / (n_a + n_b)::DOUBLE AS pool,
        |        conv_b::DOUBLE / n_b::DOUBLE
        |          - conv_a::DOUBLE / n_a::DOUBLE AS dl
        |      FROM w),
        |v AS (SELECT *,
        |        pool * (1.0 - pool)
        |          * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE) AS vv
        |      FROM m),
        |l AS (SELECT *,
        |        CASE WHEN n_a > 0 AND n_b > 0 AND vv > 0.0 THEN
        |          round(sqrt(vv / (vv + 0.0001))
        |            * exp(dl * dl * 0.0001
        |                  / (2.0 * vv * (vv + 0.0001))), 6)
        |        END AS lambda
        |      FROM v)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN round(dl, 6) END AS delta,
        |  lambda,
        |  CASE WHEN lambda IS NOT NULL THEN
        |    round(least(1.0, 1.0 / lambda), 6) END AS p_always_valid
        |FROM l""".stripMargin,

    // same score CTE; per-row floor(1e6*ln(p)) on the clamped micro
    // probability (floor() is a true floor for negatives), then the
    // NEGATIVE sum's floor-mean spelled out (DuckDB // truncates)
    "q_logloss" ->
      """WITH b AS (
        |  SELECT event_type = 'purchase' AS y,
        |    (('0x' || substr(md5('cal:' || CAST(event_id AS VARCHAR)),
        |       1, 12))::BIGINT % 1000000) / 1000000.0 AS s
        |  FROM events WHERE event_type IS NOT NULL),
        |q AS (SELECT y,
        |        greatest(least(CAST(floor(s * 1000000.0) AS BIGINT),
        |          999999), 1) AS m
        |      FROM b WHERE s >= 0.0 AND s <= 1.0),
        |r AS (SELECT y,
        |        CAST(floor(1000000.0 * ln(
        |          (CASE WHEN y THEN m ELSE 1000000 - m END)::DOUBLE
        |            / 1000000.0)) AS HUGEINT) AS ll
        |      FROM q),
        |g AS (SELECT count(*)::HUGEINT AS n,
        |        CAST(count(*) FILTER (WHERE y) AS BIGINT) AS n_pos,
        |        SUM(ll) AS sll
        |      FROM r)
        |SELECT CAST(n AS BIGINT) AS n, n_pos,
        |  CAST(-(CASE WHEN sll >= 0 THEN sll // n
        |         ELSE -((-sll + n - 1) // n) END) AS BIGINT)
        |    AS logloss_x1e6
        |FROM g""".stripMargin,

    // the q_calibration bin aggregate reduced to the weighted absolute
    // gap; all floors on non-negative operands
    "q_ece" ->
      """WITH b AS (
        |  SELECT event_type = 'purchase' AS y,
        |    (('0x' || substr(md5('cal:' || CAST(event_id AS VARCHAR)),
        |       1, 12))::BIGINT % 1000000) / 1000000.0 AS s
        |  FROM events WHERE event_type IS NOT NULL),
        |g AS (SELECT CAST(least(floor(s * 10), 9) AS INT) AS bin,
        |        count(*)::HUGEINT AS n,
        |        CAST(count(*) FILTER (WHERE y) AS HUGEINT) AS p,
        |        SUM(CAST(floor(s * 1000000.0) AS HUGEINT)) AS sm
        |      FROM b WHERE s >= 0.0 AND s <= 1.0 GROUP BY 1),
        |r AS (SELECT n, abs((p * 1000000) // n - sm // n) AS gap
        |      FROM g)
        |SELECT CAST(SUM(n) AS BIGINT) AS n,
        |  CAST(SUM(n * gap) // SUM(n) AS BIGINT) AS ece_x1e6,
        |  CAST(MAX(gap) AS BIGINT) AS mce_x1e6
        |FROM r""".stripMargin,

    // event counts + distinct (arm, user, day) exposures; the engine's
    // pinned Poisson-variance z chain, floors on non-negative operands
    "q_rate_test" ->
      """WITH b AS (
        |  SELECT user_id % 2 = 1 AS arm, user_id AS u,
        |    epoch_us(ts) // 86400000000 AS d
        |  FROM events WHERE user_id IS NOT NULL),
        |c AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT arm THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN arm THEN 1 END), 0)
        |          AS BIGINT) AS n_b
        |      FROM b),
        |e AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT arm THEN 1 END), 0)
        |          AS BIGINT) AS t_a,
        |        CAST(COALESCE(SUM(CASE WHEN arm THEN 1 END), 0)
        |          AS BIGINT) AS t_b
        |      FROM (SELECT DISTINCT arm, u, d FROM b)),
        |m AS (SELECT *,
        |        sqrt(n_a::DOUBLE / (t_a::DOUBLE * t_a::DOUBLE)
        |           + n_b::DOUBLE / (t_b::DOUBLE * t_b::DOUBLE)) AS se
        |      FROM c, e)
        |SELECT n_a, t_a, n_b, t_b,
        |  CASE WHEN t_a > 0 THEN CAST((n_a * 1000000) // t_a AS BIGINT)
        |  END AS rate_a_x1e6,
        |  CASE WHEN t_b > 0 THEN CAST((n_b * 1000000) // t_b AS BIGINT)
        |  END AS rate_b_x1e6,
        |  CASE WHEN t_a > 0 AND t_b > 0 THEN
        |    round(CASE WHEN se > 0.0 THEN
        |        (n_b::DOUBLE / t_b::DOUBLE - n_a::DOUBLE / t_a::DOUBLE)
        |          / se
        |      ELSE 0.0 END, 6)
        |  END AS z_score,
        |  CASE WHEN t_a > 0 AND t_b > 0 THEN
        |    abs(CASE WHEN se > 0.0 THEN
        |          round((n_b::DOUBLE / t_b::DOUBLE
        |                 - n_a::DOUBLE / t_a::DOUBLE) / se, 6)
        |        ELSE 0.0 END) >= 1.96
        |  END AS significant
        |FROM m""".stripMargin,

    // distinct (window, day, user) frame feeds both counts; 30-day
    // epoch windows; all non-negative, // is the floor
    "q_stickiness" ->
      """WITH b AS (
        |  SELECT DISTINCT (epoch_us(ts) // 86400000000) // 30 AS w,
        |    epoch_us(ts) // 86400000000 AS d, user_id AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |dau AS (SELECT w, d, count(*)::BIGINT AS dau
        |        FROM b GROUP BY 1, 2),
        |g AS (SELECT w, count(*)::BIGINT AS n_days,
        |        CAST(SUM(dau) AS BIGINT) AS sdau
        |      FROM dau GROUP BY 1),
        |m AS (SELECT w, count(DISTINCT u)::BIGINT AS mau
        |      FROM b GROUP BY 1)
        |SELECT w AS win, mau, n_days,
        |  CAST((sdau * 1000000) // n_days AS BIGINT) AS avg_dau_x1e6,
        |  CAST((sdau * 1000000) // (n_days * mau) AS BIGINT)
        |    AS stickiness_x1e6
        |FROM g JOIN m USING (w) ORDER BY win""".stripMargin,

    // UNION-ALL covariate stack, per-covariate complete cases, the
    // welch HUGEINT power sums and the engine's pinned SMD chain
    "q_cov_balance" ->
      """WITH st AS (
        |  SELECT 'value' AS covariate, user_id % 2 = 1 AS b,
        |    value AS y FROM events
        |  UNION ALL
        |  SELECT 'hour_of_day', user_id % 2 = 1,
        |    ((epoch_us(ts) // 3600000000) % 24)::DOUBLE FROM events
        |  UNION ALL
        |  SELECT 'props_len', user_id % 2 = 1,
        |    length(props)::DOUBLE FROM events),
        |f AS (SELECT covariate, b,
        |        CAST(floor(y * 1000000.0) AS BIGINT) AS ym
        |      FROM st WHERE b IS NOT NULL AND y IS NOT NULL
        |        AND NOT isnan(y) AND isfinite(y)),
        |a AS (SELECT covariate,
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b,
        |        COALESCE(SUM(CASE WHEN NOT b
        |          THEN CAST(ym AS HUGEINT) END), 0) AS sa,
        |        COALESCE(SUM(CASE WHEN b
        |          THEN CAST(ym AS HUGEINT) END), 0) AS sb,
        |        COALESCE(SUM(CASE WHEN NOT b
        |          THEN CAST(ym AS HUGEINT) * ym END), 0) AS qa,
        |        COALESCE(SUM(CASE WHEN b
        |          THEN CAST(ym AS HUGEINT) * ym END), 0) AS qb
        |      FROM f GROUP BY 1),
        |z AS (SELECT covariate, n_a, n_b,
        |        (sa::DOUBLE / 1000000.0) / n_a::DOUBLE AS ma,
        |        (sb::DOUBLE / 1000000.0) / n_b::DOUBLE AS mb,
        |        ((n_a::DOUBLE * (qa::DOUBLE / 1000000000000.0)
        |            - (sa::DOUBLE / 1000000.0)
        |              * (sa::DOUBLE / 1000000.0))
        |          / (n_a::DOUBLE * (n_a::DOUBLE - 1.0))
        |         + (n_b::DOUBLE * (qb::DOUBLE / 1000000000000.0)
        |            - (sb::DOUBLE / 1000000.0)
        |              * (sb::DOUBLE / 1000000.0))
        |          / (n_b::DOUBLE * (n_b::DOUBLE - 1.0))) / 2.0 AS sp2
        |      FROM a)
        |SELECT covariate, n_a, n_b,
        |  CASE WHEN n_a > 0 THEN round(ma, 6) END AS mean_a,
        |  CASE WHEN n_b > 0 THEN round(mb, 6) END AS mean_b,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND sp2 > 0.0
        |    THEN round((mb - ma) / sqrt(sp2), 6) END AS smd,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND sp2 > 0.0
        |    THEN abs(round((mb - ma) / sqrt(sp2), 6)) < 0.1
        |  END AS balanced
        |FROM z ORDER BY covariate""".stripMargin,

    // per-(hour, user, arm) max-conversion, segment + pooled counts,
    // HUGEINT cross-products for signs; the micro diffs spell out the
    // negative floor (DuckDB // truncates)
    "q_simpson" ->
      """WITH u AS (
        |  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour_seg,
        |    user_id, user_id % 2 = 1 AS b,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |s AS (SELECT hour_seg,
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b,
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN c END), 0)
        |          AS BIGINT) AS x_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN c END), 0)
        |          AS BIGINT) AS x_b
        |      FROM u GROUP BY 1),
        |p AS (SELECT CAST(SUM(n_a) AS BIGINT) AS pna,
        |        CAST(SUM(n_b) AS BIGINT) AS pnb,
        |        CAST(SUM(x_a) AS BIGINT) AS pxa,
        |        CAST(SUM(x_b) AS BIGINT) AS pxb FROM s),
        |d AS (SELECT s.*, p.*,
        |        CAST(x_b AS HUGEINT) * n_a
        |          - CAST(x_a AS HUGEINT) * n_b AS sc,
        |        CAST(pxb AS HUGEINT) * pna
        |          - CAST(pxa AS HUGEINT) * pnb AS pc
        |      FROM s CROSS JOIN p)
        |SELECT hour_seg, n_a, x_a, n_b, x_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(CASE WHEN (sc * 1000000)
        |          % (CAST(n_a AS HUGEINT) * n_b) <> 0 AND sc < 0
        |      THEN (sc * 1000000) // (CAST(n_a AS HUGEINT) * n_b) - 1
        |      ELSE (sc * 1000000) // (CAST(n_a AS HUGEINT) * n_b)
        |      END AS BIGINT)
        |  END AS diff_x1e6,
        |  CASE WHEN pna > 0 AND pnb > 0 THEN
        |    CAST(CASE WHEN (pc * 1000000)
        |          % (CAST(pna AS HUGEINT) * pnb) <> 0 AND pc < 0
        |      THEN (pc * 1000000) // (CAST(pna AS HUGEINT) * pnb) - 1
        |      ELSE (pc * 1000000) // (CAST(pna AS HUGEINT) * pnb)
        |      END AS BIGINT)
        |  END AS pooled_diff_x1e6,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND pna > 0 AND pnb > 0
        |      AND sc <> 0 AND pc <> 0
        |    THEN (sc > 0) <> (pc > 0) END AS reversed
        |FROM d ORDER BY hour_seg""".stripMargin,

    // the q_ab_test user CTE; the engine's ln/exp delta-method chain
    // verbatim, all guarded on non-degenerate 2×2 cells
    "q_risk_ratio" ->
      """WITH u AS (
        |  SELECT user_id, user_id % 2 = 1 AS b,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b,
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN c END), 0)
        |          AS BIGINT) AS x_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN c END), 0)
        |          AS BIGINT) AS x_b
        |      FROM u),
        |m AS (SELECT *,
        |        x_a > 0 AND x_b > 0 AND x_a < n_a AND x_b < n_b AS ok,
        |        ln((x_b::DOUBLE / n_b::DOUBLE)
        |          / (x_a::DOUBLE / n_a::DOUBLE)) AS lrr,
        |        sqrt(1.0 / x_b::DOUBLE - 1.0 / n_b::DOUBLE
        |          + 1.0 / x_a::DOUBLE - 1.0 / n_a::DOUBLE) AS srr,
        |        ln((x_b::DOUBLE * (n_a - x_a)::DOUBLE)
        |          / (x_a::DOUBLE * (n_b - x_b)::DOUBLE)) AS lor,
        |        sqrt(1.0 / x_b::DOUBLE + 1.0 / (n_b - x_b)::DOUBLE
        |          + 1.0 / x_a::DOUBLE + 1.0 / (n_a - x_a)::DOUBLE)
        |          AS sor
        |      FROM w WHERE n_a > 0 AND n_b > 0 AND x_a > 0 AND x_b > 0
        |        AND x_a < n_a AND x_b < n_b
        |      UNION ALL
        |      SELECT *, FALSE, NULL, NULL, NULL, NULL FROM w
        |      WHERE NOT (n_a > 0 AND n_b > 0 AND x_a > 0 AND x_b > 0
        |        AND x_a < n_a AND x_b < n_b))
        |SELECT n_a, x_a, n_b, x_b,
        |  CASE WHEN ok THEN round(exp(lrr), 6) END AS rr,
        |  CASE WHEN ok THEN round(exp(lrr + -1.96 * srr), 6)
        |  END AS rr_lo,
        |  CASE WHEN ok THEN round(exp(lrr + 1.96 * srr), 6)
        |  END AS rr_hi,
        |  CASE WHEN ok THEN round(exp(lor), 6) END AS odds_ratio,
        |  CASE WHEN ok THEN round(exp(lor + -1.96 * sor), 6)
        |  END AS or_lo,
        |  CASE WHEN ok THEN round(exp(lor + 1.96 * sor), 6)
        |  END AS or_hi
        |FROM m""".stripMargin,

    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id, user_id % 2 = 1 AS b,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN 1 END), 0)
        |          AS BIGINT) AS n_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN 1 END), 0)
        |          AS BIGINT) AS n_b,
        |        CAST(COALESCE(SUM(CASE WHEN NOT b THEN c END), 0)
        |          AS BIGINT) AS conv_a,
        |        CAST(COALESCE(SUM(CASE WHEN b THEN c END), 0)
        |          AS BIGINT) AS conv_b
        |      FROM u),
        |m AS (SELECT *,
        |        CAST(conv_a + conv_b AS DOUBLE)
        |          / CAST(n_a + n_b AS DOUBLE) AS p,
        |        sqrt((CAST(conv_a + conv_b AS DOUBLE)
        |               / CAST(n_a + n_b AS DOUBLE))
        |             * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
        |                 / CAST(n_a + n_b AS DOUBLE))
        |             * (1.0 / CAST(n_a AS DOUBLE)
        |                + 1.0 / CAST(n_b AS DOUBLE))) AS se
        |      FROM w)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  CASE WHEN n_a > 0 THEN
        |    round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
        |  END AS rate_a,
        |  CASE WHEN n_b > 0 THEN
        |    round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
        |  END AS rate_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    round(CASE WHEN se > 0.0 THEN
        |        (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |         - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / se
        |      ELSE 0.0 END, 6)
        |  END AS z_score,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    abs(round(CASE WHEN se > 0.0 THEN
        |        (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |         - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / se
        |      ELSE 0.0 END, 6)) >= 1.96
        |  END AS significant
        |FROM m""".stripMargin,

    // exact-config frequent-items: estimates == true counts, bounds
    // collapse onto the estimate; rank ties break on the item STRING
    "q_freq_topk" ->
      """WITH c AS (
        |  SELECT event_type, CAST(user_id AS VARCHAR) AS item,
        |         count(*) AS est
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, item, est, row_number() OVER (
        |        PARTITION BY event_type ORDER BY est DESC, item) AS rank
        |      FROM c)
        |SELECT event_type, rank, item, est, est AS lb, est AS ub
        |FROM r WHERE rank <= 10
        |ORDER BY event_type, rank""".stripMargin,

    // the streamed funnel's final state == the batch min-ts cascade,
    // restricted to users who entered the funnel (a progress row exists
    // iff depth advanced past 0)
    "q_stream_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type IN ('signup', 'view', 'purchase')),
        |s1 AS (SELECT user_id, min(ts_us) AS t1_us FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts_us) AS t2_us
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND ts_us > t1_us
        |         AND ts_us - t1_us <= 259200000000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts_us) AS t3_us
        |       FROM e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts_us > t2_us
        |         AND ts_us - t1_us <= 259200000000 GROUP BY 1)
        |SELECT s1.user_id,
        |  (1 + CASE WHEN t2_us IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN t3_us IS NULL THEN 0 ELSE 1 END)::INTEGER AS depth
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // the watermark contract replayed in SQL: wm after wave 1 =
    // ms-floored max(ts) − 3599999 ms; a wave-2 row is DROPPED when its
    // hour window's end <= that wm; emitted windows are exactly those
    // whose end <= the final wm over everything seen (late rows still
    // advance it — the stats collector sits above the scan)
    "q_stream_late_drop" ->
      """WITH w1 AS (SELECT epoch_us(ts) AS t FROM events
        |            WHERE event_id % 3 <> 0),
        |w2 AS (SELECT epoch_us(ts) AS t FROM events
        |       WHERE event_id % 3 = 0),
        |wm1 AS (SELECT ((max(t) // 1000) - 3599999) * 1000 AS v FROM w1),
        |wmf AS (SELECT ((max(t) // 1000) - 3599999) * 1000 AS v
        |        FROM (SELECT t FROM w1 UNION ALL SELECT t FROM w2)),
        |kept AS (
        |  SELECT t FROM w1
        |  UNION ALL
        |  SELECT t FROM w2
        |  WHERE ((t // 3600000000) + 1) * 3600000000 > (SELECT v FROM wm1))
        |SELECT (t // 3600000000) * 3600000000 AS win_start_us,
        |  count(*)::BIGINT AS n
        |FROM kept
        |GROUP BY 1
        |HAVING win_start_us + 3600000000 <= (SELECT v FROM wmf)
        |ORDER BY 1""".stripMargin,

    // the dropDuplicatesWithinWatermark contract replayed in SQL (all
    // comparisons µs-exact, probed by tools/DedupWmProbe): wave 1 (one
    // row per key) always emits; a wave-2 m=0 replay at +2h emits iff
    // the key's state EXPIRED before the w2 batch (expiresAt = ts +
    // delay <= wm, where wm = (ms-floored max wave-1 ts − delay)·1000)
    // AND the replay is not itself late (ts + 2·delay > wm); m=1/m=2
    // replays are provably late-dropped or state-dropped
    "q_stream_dedup_wm" ->
      """WITH base AS (
        |  SELECT event_id % 499 AS k, max(epoch_us(ts)) AS ts_us
        |  FROM events GROUP BY 1),
        |wm AS (SELECT ((max(ts_us) // 1000) - 3600000) * 1000 AS v
        |       FROM base)
        |SELECT k, ts_us FROM base
        |UNION ALL
        |SELECT k, ts_us + 7200000000 AS ts_us FROM base
        |WHERE k % 3 = 0
        |  AND ts_us + 3600000000 <= (SELECT v FROM wm)
        |  AND ts_us + 7200000000 > (SELECT v FROM wm)
        |ORDER BY k, ts_us""".stripMargin,

    // the session-mart contract replayed in SQL: gap islands (same
    // boundary rule — diff > gap starts a new island), session end =
    // last event + gap, kept iff CLOSED under the final watermark
    // (end <= (ms-floored max ts − delay)·1000 — emit-on-close)
    "q_stream_session_mart" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |        PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
        |      > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, MIN(ts_us) AS sess_start_us,
        |    MAX(ts_us) + 1800000000 AS sess_end_us,
        |    COUNT(*) AS n_events
        |  FROM sess GROUP BY user_id, session_id),
        |wmf AS (SELECT ((max(epoch_us(ts)) // 1000) - 3599999) * 1000
        |          AS v FROM events)
        |SELECT user_id, sess_start_us, sess_end_us, n_events
        |FROM agg WHERE sess_end_us <= (SELECT v FROM wmf)
        |ORDER BY user_id, sess_start_us""".stripMargin,

    // the sliding-funnel CTEs collapsed to per-step reach counts; lag's
    // third argument defaults step 1's previous count to its own value
    "q_funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS t, epoch_us(ts) AS ts_us, event_id
        |  FROM events
        |  WHERE event_type IN ('signup', 'view', 'purchase')),
        |w1 AS (SELECT *, max(CASE WHEN t = 'signup' THEN ts_us END) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a1
        |  FROM e),
        |w2 AS (SELECT *, CASE WHEN t = 'view' THEN a1 END AS s2 FROM w1),
        |w3 AS (SELECT *, max(s2) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a2
        |  FROM w2),
        |w4 AS (SELECT *, CASE WHEN t = 'purchase' THEN a2 END AS s3 FROM w3),
        |f AS (SELECT user_id, greatest(
        |    max(CASE WHEN t = 'signup' THEN 1 ELSE 0 END),
        |    max(CASE WHEN s2 IS NOT NULL AND ts_us - s2 <= 86400000000
        |      THEN 2 ELSE 0 END),
        |    max(CASE WHEN s3 IS NOT NULL AND ts_us - s3 <= 86400000000
        |      THEN 3 ELSE 0 END)) AS step_reached
        |  FROM w4 GROUP BY user_id),
        |steps(step) AS (VALUES (1), (2), (3)),
        |r AS (SELECT step,
        |    (SELECT count(*) FROM f WHERE step_reached >= step)::BIGINT
        |      AS n_reached
        |  FROM steps)
        |SELECT step, n_reached,
        |  round(n_reached::DOUBLE / NULLIF(
        |    first_value(n_reached) OVER (ORDER BY step), 0), 6)
        |    AS conv_from_first,
        |  round(n_reached::DOUBLE / NULLIF(
        |    lag(n_reached, 1, n_reached) OVER (ORDER BY step), 0), 6)
        |    AS conv_from_prev
        |FROM r ORDER BY step""".stripMargin,

    // the maximal-anchor recurrence as window functions: A1 = running max
    // signup ts strictly before (ROWS ... 1 PRECEDING); step rows carry
    // chain start s_j = A_{j-1}; depth >= j iff ts - s_j <= window
    "q_funnel_sliding" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS t, epoch_us(ts) AS ts_us, event_id
        |  FROM events
        |  WHERE event_type IN ('signup', 'view', 'purchase')),
        |w1 AS (SELECT *, max(CASE WHEN t = 'signup' THEN ts_us END) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a1
        |  FROM e),
        |w2 AS (SELECT *, CASE WHEN t = 'view' THEN a1 END AS s2 FROM w1),
        |w3 AS (SELECT *, max(s2) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a2
        |  FROM w2),
        |w4 AS (SELECT *, CASE WHEN t = 'purchase' THEN a2 END AS s3 FROM w3)
        |SELECT user_id, greatest(
        |    max(CASE WHEN t = 'signup' THEN 1 ELSE 0 END),
        |    max(CASE WHEN s2 IS NOT NULL AND ts_us - s2 <= 86400000000
        |      THEN 2 ELSE 0 END),
        |    max(CASE WHEN s3 IS NOT NULL AND ts_us - s3 <= 86400000000
        |      THEN 3 ELSE 0 END))::INTEGER AS step_reached
        |FROM w4 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the q_funnel_sliding depth CTEs, variant via max over the user's
    // rows, step-grid reach + the abTest pooled-z double sequence
    "q_funnel_ab" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS t, epoch_us(ts) AS ts_us, event_id
        |  FROM events
        |  WHERE event_type IN ('signup', 'view', 'purchase')),
        |w1 AS (SELECT *, max(CASE WHEN t = 'signup' THEN ts_us END) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a1
        |  FROM e),
        |w2 AS (SELECT *, CASE WHEN t = 'view' THEN a1 END AS s2 FROM w1),
        |w3 AS (SELECT *, max(s2) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a2
        |  FROM w2),
        |w4 AS (SELECT *, CASE WHEN t = 'purchase' THEN a2 END AS s3 FROM w3),
        |f AS (SELECT user_id, greatest(
        |    max(CASE WHEN t = 'signup' THEN 1 ELSE 0 END),
        |    max(CASE WHEN s2 IS NOT NULL AND ts_us - s2 <= 86400000000
        |      THEN 2 ELSE 0 END),
        |    max(CASE WHEN s3 IS NOT NULL AND ts_us - s3 <= 86400000000
        |      THEN 3 ELSE 0 END)) AS d2
        |  FROM w4 GROUP BY user_id),
        |v AS (SELECT user_id, max(user_id % 2 = 1) AS b
        |      FROM events GROUP BY 1),
        |c AS (SELECT v.b, f.d2, count(*) AS n
        |      FROM f JOIN v USING (user_id) GROUP BY 1, 2),
        |r AS (SELECT step,
        |        COALESCE(SUM(CASE WHEN NOT b THEN n END), 0)
        |          AS reached_a,
        |        COALESCE(SUM(CASE WHEN b THEN n END), 0) AS reached_b
        |      FROM (SELECT unnest(generate_series(1, 3)) AS step) s
        |      LEFT JOIN c ON c.d2 >= s.step GROUP BY 1),
        |wb AS (SELECT *,
        |        first_value(reached_a) OVER (ORDER BY step) AS na,
        |        first_value(reached_b) OVER (ORDER BY step) AS nb
        |      FROM r),
        |zc AS (SELECT *,
        |        (reached_a + reached_b)::DOUBLE / (na + nb)::DOUBLE
        |          AS pool
        |      FROM wb),
        |zz AS (SELECT *,
        |        sqrt(pool * (1.0 - pool)
        |          * (1.0 / na::DOUBLE + 1.0 / nb::DOUBLE)) AS se
        |      FROM zc)
        |SELECT CAST(step AS INT) AS step,
        |  CAST(reached_a AS BIGINT) AS reached_a,
        |  CAST(reached_b AS BIGINT) AS reached_b,
        |  CASE WHEN na > 0
        |    THEN round(reached_a::DOUBLE / na::DOUBLE, 6) END AS rate_a,
        |  CASE WHEN nb > 0
        |    THEN round(reached_b::DOUBLE / nb::DOUBLE, 6) END AS rate_b,
        |  CASE WHEN na > 0 AND nb > 0 THEN round(
        |    CASE WHEN se > 0.0 THEN
        |      (reached_b::DOUBLE / nb::DOUBLE
        |        - reached_a::DOUBLE / na::DOUBLE) / se
        |    ELSE 0.0 END, 6) END AS z_score,
        |  CASE WHEN na > 0 AND nb > 0 THEN abs(round(
        |    CASE WHEN se > 0.0 THEN
        |      (reached_b::DOUBLE / nb::DOUBLE
        |        - reached_a::DOUBLE / na::DOUBLE) / se
        |    ELSE 0.0 END, 6)) >= 1.96 END AS significant
        |FROM zz ORDER BY step""".stripMargin,

    // ordered string_agg per user over the row-number-pruned prefix; the
    // top-k tie-break (count desc, path asc) makes the limit deterministic
    "q_event_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, count(*)::BIGINT AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path ASC LIMIT 20""".stripMargin,

    // exact integer day buckets (epoch_us // day) on both sides
    // micro-exact revenue, per-cohort running sum, floor-divided LTV
    "q_ltv_curve" ->
      """WITH c AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS cohort_period
        |  FROM events GROUP BY 1),
        |sz AS (SELECT cohort_period, CAST(count(*) AS BIGINT)
        |         AS cohort_size FROM c GROUP BY 1),
        |r AS (SELECT c.cohort_period,
        |        (epoch_us(e.ts) // 86400000000) - c.cohort_period AS k,
        |        CAST(COALESCE(SUM(CAST(floor(
        |            CASE WHEN isfinite(e.value) THEN e.value END
        |            * 1000000.0) AS BIGINT)), 0) AS BIGINT) AS revenue_x1e6
        |      FROM events e JOIN c USING (user_id)
        |      GROUP BY 1, 2),
        |cum AS (SELECT *, CAST(sum(revenue_x1e6) OVER (
        |          PARTITION BY cohort_period ORDER BY k
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum_revenue_x1e6
        |        FROM r)
        |SELECT cohort_period, k, revenue_x1e6, cum_revenue_x1e6,
        |  cohort_size, cum_revenue_x1e6 // cohort_size AS ltv_per_user_x1e6
        |FROM cum JOIN sz USING (cohort_period)
        |ORDER BY cohort_period, k""".stripMargin,

    "q_retention" ->
      """WITH c AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS cohort_period
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS p
        |      FROM events),
        |n AS (SELECT cohort_period, p - cohort_period AS k,
        |        count(*)::BIGINT AS n_active
        |      FROM a JOIN c USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort_period, count(*)::BIGINT AS cohort_size
        |      FROM c GROUP BY 1)
        |SELECT cohort_period, k, n_active, cohort_size,
        |  round(n_active::DOUBLE / cohort_size::DOUBLE, 6) AS retention
        |FROM n JOIN s USING (cohort_period)
        |ORDER BY cohort_period, k""".stripMargin,

    // the floored smoothing recurrence replayed via a recursive CTE
    // (all terms non-negative ⇒ // parity with the engine's floor)
    "q_expsmooth" ->
      """WITH RECURSIVE c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |spine AS (SELECT unnest(generate_series((SELECT lo FROM b),
        |  (SELECT hi FROM b))) AS period),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n,
        |        row_number() OVER (ORDER BY spine.period) AS i
        |      FROM spine LEFT JOIN c USING (period)),
        |r AS (
        |  SELECT i, period, n, CAST(n AS HUGEINT) * 1000000 AS s
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.i, d.period, d.n,
        |    (300000 * (CAST(d.n AS HUGEINT) * 1000000)
        |      + 700000 * r.s) // 1000000
        |  FROM r JOIN d ON d.i = r.i + 1)
        |SELECT period, n, CAST(s AS BIGINT) AS smooth_x1e6
        |FROM r ORDER BY period""".stripMargin,

    // the integer max/add recurrence replayed via a recursive CTE; μ₀
    // as the exact floored spine mean (non-negative ⇒ // parity)
    "q_cusum" ->
      """WITH RECURSIVE c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |spine AS (SELECT unnest(generate_series((SELECT lo FROM b),
        |  (SELECT hi FROM b))) AS period),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n,
        |        row_number() OVER (ORDER BY spine.period) AS i
        |      FROM spine LEFT JOIN c USING (period)),
        |m AS (SELECT CAST((SUM(n) * 1000000) // count(*) AS BIGINT)
        |        AS mu0 FROM d),
        |r AS (
        |  SELECT i, period, n,
        |    greatest(0, n * 1000000 - (SELECT mu0 FROM m) - 5000000)
        |      AS sp,
        |    greatest(0, (SELECT mu0 FROM m) - n * 1000000 - 5000000)
        |      AS sn
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.i, d.period, d.n,
        |    greatest(0, r.sp
        |      + (d.n * 1000000 - (SELECT mu0 FROM m) - 5000000)),
        |    greatest(0, r.sn
        |      + ((SELECT mu0 FROM m) - d.n * 1000000 - 5000000))
        |  FROM r JOIN d ON d.i = r.i + 1)
        |SELECT period, n,
        |  CAST(sp AS BIGINT) AS cusum_pos_x1e6,
        |  CAST(sn AS BIGINT) AS cusum_neg_x1e6,
        |  sp > 50000000 OR sn > 50000000 AS signal
        |FROM r ORDER BY period""".stripMargin,

    // observed = trend + seasonal + residual, every mean a floor
    // division — the whole decomposition replays as integers
    "q_seasonal_daily" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |spine AS (SELECT unnest(generate_series((SELECT lo FROM b),
        |  (SELECT hi FROM b))) AS period),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n
        |      FROM spine LEFT JOIN c USING (period)),
        |t AS (SELECT *,
        |        CASE WHEN count(*) OVER w = 7
        |          THEN (sum(n) OVER w * 1000000) // 7 END AS trend_x1e6,
        |        ((period % 7) + 7) % 7 AS pos
        |      FROM d WINDOW w AS (ORDER BY period
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT *, n * 1000000 - trend_x1e6 AS detr FROM t),
        |s AS (SELECT pos,
        |        CASE WHEN SUM(detr) % count(*) <> 0 AND SUM(detr) < 0
        |          THEN SUM(detr) // count(*) - 1
        |          ELSE SUM(detr) // count(*) END AS smean
        |      FROM dt WHERE detr IS NOT NULL GROUP BY 1),
        |ctr AS (SELECT
        |          CASE WHEN SUM(smean) % count(*) <> 0 AND SUM(smean) < 0
        |            THEN SUM(smean) // count(*) - 1
        |            ELSE SUM(smean) // count(*) END AS c0
        |        FROM s),
        |sa AS (SELECT pos,
        |         CAST(smean - (SELECT c0 FROM ctr) AS BIGINT)
        |           AS seasonal_x1e6
        |       FROM s)
        |SELECT dt.period, dt.n,
        |  CAST(trend_x1e6 AS BIGINT) AS trend_x1e6,
        |  seasonal_x1e6,
        |  CAST(detr - seasonal_x1e6 AS BIGINT) AS resid_x1e6
        |FROM dt LEFT JOIN sa USING (pos)
        |ORDER BY period""".stripMargin,

    // the coupled level/trend floor recurrence replayed via a recursive
    // CTE; the nested derived tables compute l_i once and feed it into
    // b_i, each floor spelled out with the negative-remainder
    // adjustment (DuckDB // truncates toward zero — Fixed.ldiv's doc)
    "q_holt" ->
      """WITH RECURSIVE c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |spine AS (SELECT unnest(generate_series((SELECT lo FROM b),
        |  (SELECT hi FROM b))) AS period),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n,
        |        row_number() OVER (ORDER BY spine.period) AS i
        |      FROM spine LEFT JOIN c USING (period)),
        |x2 AS (SELECT CAST(n AS HUGEINT) * 1000000 AS v
        |       FROM d WHERE i = 2),
        |r AS (
        |  SELECT i, period, n,
        |    CAST(n AS HUGEINT) * 1000000 AS l,
        |    COALESCE((SELECT v FROM x2),
        |      CAST(n AS HUGEINT) * 1000000)
        |      - CAST(n AS HUGEINT) * 1000000 AS t
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT i, period, n, lnew,
        |    CASE WHEN numt % 1000000 <> 0 AND numt < 0
        |      THEN numt // 1000000 - 1 ELSE numt // 1000000 END
        |  FROM (
        |    SELECT i, period, n, lnew,
        |      200000 * (lnew - lprev) + 800000 * tprev AS numt
        |    FROM (
        |      SELECT i, period, n, lprev, tprev,
        |        CASE WHEN numl % 1000000 <> 0 AND numl < 0
        |          THEN numl // 1000000 - 1
        |          ELSE numl // 1000000 END AS lnew
        |      FROM (
        |        SELECT d.i AS i, d.period AS period, d.n AS n,
        |          r.l AS lprev, r.t AS tprev,
        |          300000 * (CAST(d.n AS HUGEINT) * 1000000)
        |            + 700000 * (r.l + r.t) AS numl
        |        FROM r JOIN d ON d.i = r.i + 1) s1) s2) s3)
        |SELECT period, n, CAST(l AS BIGINT) AS level_x1e6,
        |  CAST(t AS BIGINT) AS trend_x1e6,
        |  CAST(l + t AS BIGINT) AS forecast_x1e6
        |FROM r ORDER BY period""".stripMargin,

    // dense spine, one non-negative floor mean, HUGEINT deviation
    // products, and per-lag floored ratios with the explicit
    // negative-remainder adjustment (num can be negative)
    "q_acf" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |d0 AS (SELECT spine.period, COALESCE(c.n, 0) AS n
        |       FROM (SELECT unnest(generate_series((SELECT lo FROM b),
        |         (SELECT hi FROM b))) AS period) spine
        |       LEFT JOIN c USING (period)),
        |s AS (SELECT count(*) AS cnt,
        |        sum(CAST(n AS HUGEINT)) AS sx FROM d0),
        |m AS (SELECT (sx * 1000000) // cnt AS mu FROM s),
        |d AS (SELECT period,
        |        CAST(n AS HUGEINT) * 1000000 - (SELECT mu FROM m) AS dv
        |      FROM d0),
        |den AS (SELECT sum(dv * dv) AS den FROM d),
        |pr AS (SELECT l.lag, count(*) AS n_pairs,
        |         sum(a.dv * b2.dv) AS num
        |       FROM (SELECT unnest(generate_series(1, 7)) AS lag) l
        |       CROSS JOIN d a
        |       JOIN d b2 ON a.period = b2.period + l.lag
        |       GROUP BY 1)
        |SELECT lag, n_pairs,
        |  CASE WHEN (SELECT den FROM den) > 0 THEN
        |    CAST(CASE WHEN (num * 1000000) % (SELECT den FROM den) <> 0
        |           AND num < 0
        |      THEN (num * 1000000) // (SELECT den FROM den) - 1
        |      ELSE (num * 1000000) // (SELECT den FROM den) END
        |      AS BIGINT) END AS acf_x1e6
        |FROM pr ORDER BY lag""".stripMargin,

    // grid-bounded pair slopes with the explicit floor adjustment,
    // lower-median order statistics for slope AND intercept
    "q_theilsen" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n
        |      FROM (SELECT unnest(generate_series((SELECT lo FROM b),
        |        (SELECT hi FROM b))) AS period) spine
        |      LEFT JOIN c USING (period)),
        |pr AS (SELECT a.period AS pa, b2.period AS pb,
        |         CASE WHEN ((b2.n - a.n) * 1000000)
        |                % (b2.period - a.period) <> 0
        |             AND (b2.n - a.n) < 0
        |           THEN ((b2.n - a.n) * 1000000)
        |                // (b2.period - a.period) - 1
        |           ELSE ((b2.n - a.n) * 1000000)
        |                // (b2.period - a.period) END AS slope
        |       FROM d a JOIN d b2 ON a.period < b2.period),
        |cnt AS (SELECT count(*) AS m FROM pr),
        |np AS (SELECT count(*) AS np FROM d),
        |sl AS (SELECT slope FROM (
        |         SELECT slope, row_number()
        |           OVER (ORDER BY slope, pa, pb) AS rn FROM pr)
        |       WHERE rn = ((SELECT m FROM cnt) + 1) // 2),
        |icm AS (SELECT icv FROM (
        |          SELECT icv, row_number() OVER (ORDER BY icv) AS rn
        |          FROM (SELECT n * 1000000
        |            - (SELECT slope FROM sl) * period AS icv FROM d))
        |        WHERE rn = ((SELECT np FROM np) + 1) // 2)
        |SELECT (SELECT np FROM np) AS n_periods,
        |  (SELECT m FROM cnt) AS n_pairs,
        |  CAST((SELECT slope FROM sl) AS BIGINT) AS slope_x1e6,
        |  CAST((SELECT icv FROM icm) AS BIGINT) AS intercept_x1e6""".stripMargin,

    // exact C/D/tie counts over the same dense spine; τ replays the
    // doubled-tie-term identity with one IEEE mul/div/sqrt/mul chain
    "q_kendall" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS x,
        |    COALESCE(SUM(CAST(floor(CASE WHEN isfinite(value)
        |      THEN value END * 1000000.0) AS BIGINT)), 0) AS y
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |d AS (SELECT spine.period, COALESCE(c.x, 0) AS x,
        |        COALESCE(c.y, 0) AS y
        |      FROM (SELECT unnest(generate_series((SELECT lo FROM b),
        |        (SELECT hi FROM b))) AS period) spine
        |      LEFT JOIN c USING (period)),
        |np AS (SELECT count(*) AS np FROM d),
        |cd AS (SELECT
        |    COALESCE(SUM(CASE WHEN sign(p2.x - p1.x)
        |      * sign(p2.y - p1.y) > 0 THEN 1 END), 0) AS con,
        |    COALESCE(SUM(CASE WHEN sign(p2.x - p1.x)
        |      * sign(p2.y - p1.y) < 0 THEN 1 END), 0) AS dis
        |  FROM d p1 JOIN d p2 ON p1.period < p2.period),
        |tx AS (SELECT COALESCE(sum(t * (t - 1)), 0) AS t2
        |       FROM (SELECT count(*) AS t FROM d GROUP BY x)),
        |ty AS (SELECT COALESCE(sum(t * (t - 1)), 0) AS t2
        |       FROM (SELECT count(*) AS t FROM d GROUP BY y)),
        |n2 AS (SELECT (SELECT np FROM np)
        |         * ((SELECT np FROM np) - 1) AS n02)
        |SELECT (SELECT np FROM np) AS n_periods,
        |  (SELECT n02 FROM n2) // 2 AS n_pairs,
        |  CAST(con AS BIGINT) AS concordant,
        |  CAST(dis AS BIGINT) AS discordant,
        |  CASE WHEN (SELECT t2 FROM tx) < (SELECT n02 FROM n2)
        |        AND (SELECT t2 FROM ty) < (SELECT n02 FROM n2) THEN
        |    CAST(floor(CAST(con - dis AS DOUBLE) * 2.0
        |      / sqrt(CAST((SELECT n02 FROM n2) - (SELECT t2 FROM tx)
        |               AS DOUBLE)
        |             * CAST((SELECT n02 FROM n2) - (SELECT t2 FROM ty)
        |               AS DOUBLE))
        |      * 1000000.0) AS BIGINT) END AS tau_b_x1e6
        |FROM cd""".stripMargin,

    "q_bradley_terry" -> bradleyTerryOracle(10),

    // per-segment Welch moments in HUGEINT, the engine's double chain
    // for θ/se²/w, per-segment terms floored to micros (DuckDB floor()
    // is the mathematical floor — negative θ terms need no spell-out),
    // then order-free integer sums and the pinned Q/I² closed forms
    "q_meta_effect" ->
      """WITH b AS (
        |  SELECT event_type AS seg, user_id % 2 = 1 AS w,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS ym
        |  FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND isfinite(value) AND user_id IS NOT NULL),
        |sg AS (SELECT seg,
        |         SUM(CASE WHEN NOT w THEN 1 ELSE 0 END)::BIGINT AS na,
        |         SUM(CASE WHEN w THEN 1 ELSE 0 END)::BIGINT AS nb,
        |         COALESCE(SUM(CASE WHEN NOT w
        |           THEN CAST(ym AS HUGEINT) END), 0) AS sa,
        |         COALESCE(SUM(CASE WHEN w
        |           THEN CAST(ym AS HUGEINT) END), 0) AS sb,
        |         COALESCE(SUM(CASE WHEN NOT w
        |           THEN CAST(ym AS HUGEINT) * ym END), 0) AS qa,
        |         COALESCE(SUM(CASE WHEN w
        |           THEN CAST(ym AS HUGEINT) * ym END), 0) AS qb
        |       FROM b GROUP BY 1),
        |t AS (SELECT seg,
        |        (sb::DOUBLE / 1000000.0) / nb::DOUBLE
        |          - (sa::DOUBLE / 1000000.0) / na::DOUBLE AS th,
        |        ((na::DOUBLE * (qa::DOUBLE / 1000000000000.0)
        |            - (sa::DOUBLE / 1000000.0)
        |              * (sa::DOUBLE / 1000000.0))
        |          / (na::DOUBLE * (na::DOUBLE - 1.0))) / na::DOUBLE
        |        + ((nb::DOUBLE * (qb::DOUBLE / 1000000000000.0)
        |            - (sb::DOUBLE / 1000000.0)
        |              * (sb::DOUBLE / 1000000.0))
        |          / (nb::DOUBLE * (nb::DOUBLE - 1.0))) / nb::DOUBLE
        |          AS se2
        |      FROM sg WHERE na > 1 AND nb > 1),
        |u AS (SELECT th, se2, 1.0 / se2 AS wt FROM t WHERE se2 > 0.0),
        |v AS (SELECT th, se2, wt,
        |        CAST(floor(wt * 1000000.0) AS HUGEINT) AS tw,
        |        CAST(floor(wt * th * 1000000.0) AS HUGEINT) AS twt,
        |        CAST(floor(wt * wt * 1000000.0) AS HUGEINT) AS tw2
        |      FROM u),
        |f AS (SELECT count(*)::BIGINT AS k,
        |        COALESCE(SUM(tw), 0) AS swm,
        |        COALESCE(SUM(twt), 0) AS swtm,
        |        COALESCE(SUM(tw2), 0) AS sw2m
        |      FROM v),
        |h AS (SELECT k, swm, swtm, sw2m,
        |        swtm::DOUBLE / swm::DOUBLE AS that FROM f),
        |q AS (SELECT COALESCE(SUM(CAST(floor(wt
        |          * (th - (SELECT that FROM h))
        |          * (th - (SELECT that FROM h)) * 1000000.0)
        |          AS HUGEINT)), 0) AS qm
        |      FROM v),
        |x AS (SELECT k, swm, swtm, sw2m, that, qm,
        |        CASE WHEN k > 1 AND swm <> 0
        |            AND (swm::DOUBLE / 1000000.0
        |              - (sw2m::DOUBLE / 1000000.0)
        |                / (swm::DOUBLE / 1000000.0)) > 0.0
        |          THEN greatest((qm::DOUBLE / 1000000.0
        |              - (k - 1)::DOUBLE)
        |            / (swm::DOUBLE / 1000000.0
        |              - (sw2m::DOUBLE / 1000000.0)
        |                / (swm::DOUBLE / 1000000.0)), 0.0)
        |          ELSE 0.0 END AS tau2
        |      FROM h CROSS JOIN q),
        |re AS (SELECT
        |         COALESCE(SUM(CAST(floor(1.0
        |           / (se2 + (SELECT tau2 FROM x)) * 1000000.0)
        |           AS HUGEINT)), 0) AS srw,
        |         COALESCE(SUM(CAST(floor(th
        |           / (se2 + (SELECT tau2 FROM x)) * 1000000.0)
        |           AS HUGEINT)), 0) AS srwt
        |       FROM v)
        |SELECT k,
        |  CASE WHEN k > 0 THEN round(that, 6) END AS theta_fe,
        |  CASE WHEN k > 0 THEN
        |    round(sqrt(1000000.0 / swm::DOUBLE), 6) END AS se_fe,
        |  CASE WHEN k > 0 THEN
        |    round(qm::DOUBLE / 1000000.0, 6) END AS q_stat,
        |  CASE WHEN k > 1 AND qm > 0 THEN
        |    round(greatest((qm::DOUBLE / 1000000.0
        |        - (k - 1)::DOUBLE) / (qm::DOUBLE / 1000000.0),
        |      0.0), 6) END AS i2,
        |  CASE WHEN k > 0 THEN round(tau2, 6) END AS tau2,
        |  CASE WHEN k > 0 AND srw <> 0 THEN
        |    round(srwt::DOUBLE / srw::DOUBLE, 6) END AS theta_re,
        |  CASE WHEN k > 0 AND srw <> 0 THEN
        |    round(sqrt(1000000.0 / srw::DOUBLE), 6) END AS se_re
        |FROM x CROSS JOIN re""".stripMargin,

    // per-type floored-micro mean predictor on the even half (negative
    // floor spelled out), micro residuals, the exact ceil-rank order
    // statistic, integer coverage on the odd half
    "q_conformal" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND isfinite(value)),
        |m AS (SELECT event_type,
        |        CASE WHEN SUM(CAST(floor(value * 1000000.0) AS BIGINT))
        |            % count(*) <> 0
        |          AND SUM(CAST(floor(value * 1000000.0) AS BIGINT)) < 0
        |          THEN SUM(CAST(floor(value * 1000000.0) AS BIGINT))
        |            // count(*) - 1
        |          ELSE SUM(CAST(floor(value * 1000000.0) AS BIGINT))
        |            // count(*) END AS pm
        |      FROM e WHERE event_id % 2 = 0 GROUP BY 1),
        |rr AS (SELECT event_id % 2 = 0 AS c,
        |         CAST(floor(abs(value - pm::DOUBLE / 1000000.0)
        |           * 1000000.0) AS BIGINT) AS r
        |       FROM e JOIN m USING (event_type)),
        |nc AS (SELECT count(*)::BIGINT AS n_cal FROM rr WHERE c),
        |k AS (SELECT ((n_cal + 1) * 900000 + 999999) // 1000000 AS k
        |      FROM nc),
        |cv AS (SELECT r, SUM(count(*)) OVER (ORDER BY r
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS ft
        |       FROM rr WHERE c GROUP BY r),
        |q AS (SELECT min(r) AS q_hat_x1e6 FROM cv
        |      WHERE ft >= (SELECT k FROM k)),
        |tst AS (SELECT count(*)::BIGINT AS n_test,
        |          COALESCE(SUM(CASE WHEN r <= (SELECT q_hat_x1e6
        |            FROM q) THEN 1 ELSE 0 END), 0) AS hits
        |        FROM rr WHERE NOT c)
        |SELECT nc.n_cal, tst.n_test,
        |  CAST(q.q_hat_x1e6 AS BIGINT) AS q_hat_x1e6,
        |  CASE WHEN q.q_hat_x1e6 IS NOT NULL AND tst.n_test > 0 THEN
        |    CAST((hits * 1000000) // n_test AS BIGINT)
        |  END AS coverage_x1e6
        |FROM nc CROSS JOIN tst CROSS JOIN q""".stripMargin,

    // value-band strata: every distinct micro-score lands wholly in
    // the stratum of its starting rank; exact HUGEINT outcome sums,
    // the engine's pinned double chain for means and terms
    "q_strat_ate" ->
      """WITH b AS (
        |  SELECT CAST(floor(
        |      ((('0x' || substr(md5('ate:' || CAST(event_id AS VARCHAR)),
        |         1, 12))::BIGINT % 1000000) / 1000000.0) * 1000000.0)
        |      AS BIGINT) AS q,
        |    user_id % 2 = 1 AS w,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS ym
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(value) AND isfinite(value)),
        |v AS (SELECT q, count(*) AS vt FROM b GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n FROM b),
        |st AS (SELECT q,
        |         ((SUM(vt) OVER (ORDER BY q) - vt) * 5)
        |           // (SELECT n FROM nn) AS stratum
        |       FROM v),
        |a AS (SELECT stratum,
        |        SUM(CASE WHEN w THEN 1 ELSE 0 END)::BIGINT AS n_t,
        |        SUM(CASE WHEN NOT w THEN 1 ELSE 0 END)::BIGINT AS n_c,
        |        COALESCE(SUM(CASE WHEN w
        |          THEN CAST(ym AS HUGEINT) END), 0) AS stt,
        |        COALESCE(SUM(CASE WHEN NOT w
        |          THEN CAST(ym AS HUGEINT) END), 0) AS sc
        |      FROM b JOIN st USING (q) GROUP BY 1)
        |SELECT CAST(stratum AS BIGINT) AS stratum, n_t, n_c,
        |  CASE WHEN n_t > 0 THEN
        |    round(stt::DOUBLE / 1000000.0 / n_t::DOUBLE, 6)
        |  END AS mean_t,
        |  CASE WHEN n_c > 0 THEN
        |    round(sc::DOUBLE / 1000000.0 / n_c::DOUBLE, 6)
        |  END AS mean_c,
        |  CASE WHEN n_t > 0 AND n_c > 0 THEN
        |    CAST(floor((n_t + n_c)::DOUBLE / (SELECT n FROM nn)::DOUBLE
        |      * (stt::DOUBLE / 1000000.0 / n_t::DOUBLE
        |         - sc::DOUBLE / 1000000.0 / n_c::DOUBLE)
        |      * 1000000.0) AS BIGINT)
        |  END AS ate_term_x1e6
        |FROM a ORDER BY stratum""".stripMargin,

    // unfiltered day-range midpoint split; HUGEINT cell moments from
    // the same quantized micros; z replays the left-associated
    // variance chain
    "q_did" ->
      """WITH bd AS (
        |  SELECT (min(epoch_us(ts) // 86400000000)
        |    + max(epoch_us(ts) // 86400000000) + 1) // 2 AS bnd
        |  FROM events),
        |f AS (SELECT user_id % 2 = 1 AS b,
        |        (epoch_us(ts) // 86400000000)
        |          >= (SELECT bnd FROM bd) AS p,
        |        CAST(floor(value * 1000000.0) AS BIGINT) AS vm
        |      FROM events
        |      WHERE value IS NOT NULL AND NOT isnan(value)
        |        AND isfinite(value) AND user_id IS NOT NULL),
        |a AS (SELECT
        |    count(CASE WHEN NOT b AND NOT p THEN 1 END)::BIGINT
        |      AS n_a_pre,
        |    count(CASE WHEN NOT b AND p THEN 1 END)::BIGINT
        |      AS n_a_post,
        |    count(CASE WHEN b AND NOT p THEN 1 END)::BIGINT AS n_b_pre,
        |    count(CASE WHEN b AND p THEN 1 END)::BIGINT AS n_b_post,
        |    SUM(CASE WHEN NOT b AND NOT p THEN CAST(vm AS HUGEINT)
        |        END) AS s_a_pre,
        |    SUM(CASE WHEN NOT b AND p THEN CAST(vm AS HUGEINT)
        |        END) AS s_a_post,
        |    SUM(CASE WHEN b AND NOT p THEN CAST(vm AS HUGEINT)
        |        END) AS s_b_pre,
        |    SUM(CASE WHEN b AND p THEN CAST(vm AS HUGEINT)
        |        END) AS s_b_post,
        |    SUM(CASE WHEN NOT b AND NOT p
        |        THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_a_pre,
        |    SUM(CASE WHEN NOT b AND p
        |        THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_a_post,
        |    SUM(CASE WHEN b AND NOT p
        |        THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_b_pre,
        |    SUM(CASE WHEN b AND p
        |        THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_b_post
        |  FROM f),
        |m AS (SELECT *,
        |    CASE WHEN n_a_pre > 0 THEN CASE WHEN s_a_pre % n_a_pre <> 0
        |      AND s_a_pre < 0 THEN CAST(s_a_pre // n_a_pre - 1 AS BIGINT)
        |      ELSE CAST(s_a_pre // n_a_pre AS BIGINT) END END
        |      AS mean_a_pre_x1e6,
        |    CASE WHEN n_a_post > 0 THEN
        |      CASE WHEN s_a_post % n_a_post <> 0 AND s_a_post < 0
        |      THEN CAST(s_a_post // n_a_post - 1 AS BIGINT)
        |      ELSE CAST(s_a_post // n_a_post AS BIGINT) END END
        |      AS mean_a_post_x1e6,
        |    CASE WHEN n_b_pre > 0 THEN CASE WHEN s_b_pre % n_b_pre <> 0
        |      AND s_b_pre < 0 THEN CAST(s_b_pre // n_b_pre - 1 AS BIGINT)
        |      ELSE CAST(s_b_pre // n_b_pre AS BIGINT) END END
        |      AS mean_b_pre_x1e6,
        |    CASE WHEN n_b_post > 0 THEN
        |      CASE WHEN s_b_post % n_b_post <> 0 AND s_b_post < 0
        |      THEN CAST(s_b_post // n_b_post - 1 AS BIGINT)
        |      ELSE CAST(s_b_post // n_b_post AS BIGINT) END END
        |      AS mean_b_post_x1e6
        |  FROM a),
        |z AS (SELECT *,
        |    (mean_b_post_x1e6 - mean_b_pre_x1e6)
        |      - (mean_a_post_x1e6 - mean_a_pre_x1e6) AS did_x1e6,
        |    ((CAST(n_a_pre AS DOUBLE) * CAST(q_a_pre AS DOUBLE)
        |       - CAST(s_a_pre AS DOUBLE) * CAST(s_a_pre AS DOUBLE))
        |      / 1000000000000.0)
        |      / (CAST(n_a_pre AS DOUBLE) * CAST(n_a_pre AS DOUBLE)
        |         * (CAST(n_a_pre AS DOUBLE) - 1.0))
        |    + ((CAST(n_a_post AS DOUBLE) * CAST(q_a_post AS DOUBLE)
        |       - CAST(s_a_post AS DOUBLE) * CAST(s_a_post AS DOUBLE))
        |      / 1000000000000.0)
        |      / (CAST(n_a_post AS DOUBLE) * CAST(n_a_post AS DOUBLE)
        |         * (CAST(n_a_post AS DOUBLE) - 1.0))
        |    + ((CAST(n_b_pre AS DOUBLE) * CAST(q_b_pre AS DOUBLE)
        |       - CAST(s_b_pre AS DOUBLE) * CAST(s_b_pre AS DOUBLE))
        |      / 1000000000000.0)
        |      / (CAST(n_b_pre AS DOUBLE) * CAST(n_b_pre AS DOUBLE)
        |         * (CAST(n_b_pre AS DOUBLE) - 1.0))
        |    + ((CAST(n_b_post AS DOUBLE) * CAST(q_b_post AS DOUBLE)
        |       - CAST(s_b_post AS DOUBLE) * CAST(s_b_post AS DOUBLE))
        |      / 1000000000000.0)
        |      / (CAST(n_b_post AS DOUBLE) * CAST(n_b_post AS DOUBLE)
        |         * (CAST(n_b_post AS DOUBLE) - 1.0)) AS se2
        |  FROM m)
        |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
        |  mean_a_pre_x1e6, mean_a_post_x1e6, mean_b_pre_x1e6,
        |  mean_b_post_x1e6, did_x1e6,
        |  CASE WHEN n_a_pre > 1 AND n_a_post > 1 AND n_b_pre > 1
        |        AND n_b_post > 1 AND se2 > 0.0 THEN
        |    CAST(floor(CAST(did_x1e6 AS DOUBLE) / 1000000.0 / sqrt(se2)
        |      * 1000000.0) AS BIGINT) END AS z_x1e6
        |FROM z""".stripMargin,

    // exact S + tie-corrected variance numerator; z replays the same
    // IEEE divide/sqrt/divide chain on exact integer inputs
    "q_mk_trend" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n
        |      FROM (SELECT unnest(generate_series((SELECT lo FROM b),
        |        (SELECT hi FROM b))) AS period) spine
        |      LEFT JOIN c USING (period)),
        |s AS (SELECT COALESCE(CAST(sum(sign(b2.n - a.n)) AS BIGINT), 0)
        |        AS s_stat
        |      FROM d a JOIN d b2 ON a.period < b2.period),
        |np AS (SELECT count(*) AS np FROM d),
        |ties AS (SELECT COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0)
        |           AS tie
        |         FROM (SELECT count(*) AS t FROM d GROUP BY n)),
        |v AS (SELECT (SELECT np FROM np) * ((SELECT np FROM np) - 1)
        |        * (2 * (SELECT np FROM np) + 5)
        |        - (SELECT tie FROM ties) AS var18)
        |SELECT (SELECT np FROM np) AS n_periods, s_stat,
        |  CAST((SELECT var18 FROM v) AS BIGINT) AS var_s_num18,
        |  CASE WHEN (SELECT var18 FROM v) > 0 THEN
        |    CAST(floor(
        |      (CASE WHEN s_stat > 0 THEN s_stat - 1
        |            WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END)
        |      / sqrt((SELECT var18 FROM v) / 18.0) * 1000000)
        |      AS BIGINT) END AS z_x1e6
        |FROM s""".stripMargin,

    // the triple recurrence replayed with the 7 seasonal states
    // carried as a LIST through the recursive CTE: each step pops
    // sl[1], computes l/b/s with the explicit negative-remainder
    // floors (nested derived tables — the q_holt pattern), and
    // appends the new seasonal
    "q_holt_winters" ->
      """WITH RECURSIVE c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b0 AS (SELECT min(period) lo, max(period) hi FROM c),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n,
        |        row_number() OVER (ORDER BY spine.period) AS i
        |      FROM (SELECT unnest(generate_series((SELECT lo FROM b0),
        |        (SELECT hi FROM b0))) AS period) spine
        |      LEFT JOIN c USING (period)),
        |li AS (SELECT (sum(CAST(n AS HUGEINT)) * 1000000) // 7 AS l0
        |       FROM d WHERE i <= 7),
        |s0 AS (SELECT list(CAST(n AS HUGEINT) * 1000000
        |         - (SELECT l0 FROM li) ORDER BY i) AS sl
        |       FROM d WHERE i <= 7),
        |r AS (
        |  SELECT 7 AS i, CAST(NULL AS BIGINT) AS period,
        |    CAST(NULL AS BIGINT) AS n, (SELECT l0 FROM li) AS l,
        |    CAST(0 AS HUGEINT) AS b, (SELECT sl FROM s0) AS sl,
        |    CAST(NULL AS HUGEINT) AS snew
        |  UNION ALL
        |  SELECT i, period, n, lnew,
        |    CASE WHEN numb % 1000000 <> 0 AND numb < 0
        |      THEN numb // 1000000 - 1 ELSE numb // 1000000 END,
        |    list_append(slrest,
        |      CASE WHEN nums % 1000000 <> 0 AND nums < 0
        |        THEN nums // 1000000 - 1 ELSE nums // 1000000 END),
        |    CASE WHEN nums % 1000000 <> 0 AND nums < 0
        |      THEN nums // 1000000 - 1 ELSE nums // 1000000 END
        |  FROM (
        |    SELECT i, period, n, lnew, slrest,
        |      100000 * (lnew - lprev) + 900000 * bprev AS numb,
        |      200000 * (x - lnew) + 800000 * sold AS nums
        |    FROM (
        |      SELECT i, period, n, x, lprev, bprev, sold, slrest,
        |        CASE WHEN numl % 1000000 <> 0 AND numl < 0
        |          THEN numl // 1000000 - 1 ELSE numl // 1000000 END
        |          AS lnew
        |      FROM (
        |        SELECT d.i, d.period, d.n,
        |          CAST(d.n AS HUGEINT) * 1000000 AS x,
        |          r.l AS lprev, r.b AS bprev,
        |          r.sl[1] AS sold, r.sl[2:] AS slrest,
        |          300000 * (CAST(d.n AS HUGEINT) * 1000000 - r.sl[1])
        |            + 700000 * (r.l + r.b) AS numl
        |        FROM r JOIN d ON d.i = r.i + 1) s1) s2) s3)
        |SELECT period, n, CAST(l AS BIGINT) AS level_x1e6,
        |  CAST(b AS BIGINT) AS trend_x1e6,
        |  CAST(snew AS BIGINT) AS seasonal_x1e6,
        |  CAST(l + b + sl[1] AS BIGINT) AS forecast_x1e6
        |FROM r WHERE i > 7 ORDER BY period""".stripMargin,

    // the q_expsmooth recurrence, then one-step-ahead errors via LAG;
    // Σ|e| and Σe² in HUGEINT (Int128Sum/Int128SumProd engine-side),
    // non-negative floor divisions, one IEEE sqrt
    "q_forecast_eval" ->
      """WITH RECURSIVE c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |spine AS (SELECT unnest(generate_series((SELECT lo FROM b),
        |  (SELECT hi FROM b))) AS period),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n,
        |        row_number() OVER (ORDER BY spine.period) AS i
        |      FROM spine LEFT JOIN c USING (period)),
        |r AS (
        |  SELECT i, period, n, CAST(n AS HUGEINT) * 1000000 AS s
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.i, d.period, d.n,
        |    (300000 * (CAST(d.n AS HUGEINT) * 1000000)
        |      + 700000 * r.s) // 1000000
        |  FROM r JOIN d ON d.i = r.i + 1),
        |e AS (SELECT
        |        CAST(n AS HUGEINT) * 1000000
        |          - lag(s) OVER (ORDER BY period) AS e,
        |        CAST(n AS HUGEINT) * 1000000
        |          - lag(CAST(n AS HUGEINT) * 1000000)
        |            OVER (ORDER BY period) AS en
        |      FROM r),
        |f AS (SELECT count(*)::BIGINT AS k,
        |        SUM(abs(e)) AS sae, SUM(e * e) AS se2,
        |        SUM(abs(en)) AS saen
        |      FROM e WHERE e IS NOT NULL)
        |SELECT (SELECT count(*) FROM d)::BIGINT AS n_periods,
        |  CASE WHEN k > 0 THEN CAST(sae // k AS BIGINT) END AS mae_x1e6,
        |  CASE WHEN k > 0 THEN
        |    CAST(floor(sqrt((se2 // k)::DOUBLE)) AS BIGINT)
        |  END AS rmse_x1e6,
        |  CASE WHEN k > 0 THEN CAST(saen // k AS BIGINT)
        |  END AS mae_naive_x1e6,
        |  CASE WHEN k > 0 AND saen > 0 THEN
        |    CAST(((sae // k) * 1000000) // (saen // k) AS BIGINT)
        |  END AS mase_x1e6
        |FROM f""".stripMargin,

    // the q_seasonal_daily decomposition, residual rows only, MAD as
    // the rank-⌊(cnt+1)/2⌋ order statistic of |resid|, exact HUGEINT
    // threshold compare — no doubles anywhere
    "q_seasonal_anomaly" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(period) lo, max(period) hi FROM c),
        |spine AS (SELECT unnest(generate_series((SELECT lo FROM b),
        |  (SELECT hi FROM b))) AS period),
        |d AS (SELECT spine.period, COALESCE(c.n, 0) AS n
        |      FROM spine LEFT JOIN c USING (period)),
        |t AS (SELECT *,
        |        CASE WHEN count(*) OVER w = 7
        |          THEN (sum(n) OVER w * 1000000) // 7 END AS trend_x1e6,
        |        ((period % 7) + 7) % 7 AS pos
        |      FROM d WINDOW w AS (ORDER BY period
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT *, n * 1000000 - trend_x1e6 AS detr FROM t),
        |s AS (SELECT pos,
        |        CASE WHEN SUM(detr) % count(*) <> 0 AND SUM(detr) < 0
        |          THEN SUM(detr) // count(*) - 1
        |          ELSE SUM(detr) // count(*) END AS smean
        |      FROM dt WHERE detr IS NOT NULL GROUP BY 1),
        |ctr AS (SELECT
        |          CASE WHEN SUM(smean) % count(*) <> 0 AND SUM(smean) < 0
        |            THEN SUM(smean) // count(*) - 1
        |            ELSE SUM(smean) // count(*) END AS c0
        |        FROM s),
        |sa AS (SELECT pos,
        |         CAST(smean - (SELECT c0 FROM ctr) AS BIGINT)
        |           AS seasonal_x1e6
        |       FROM s),
        |res AS (SELECT dt.period, dt.n,
        |          CAST(detr - seasonal_x1e6 AS BIGINT) AS resid_x1e6
        |        FROM dt LEFT JOIN sa USING (pos)
        |        WHERE detr - seasonal_x1e6 IS NOT NULL),
        |m AS (SELECT count(*) AS cnt FROM res),
        |rk AS (SELECT abs(resid_x1e6) AS ar,
        |         row_number() OVER (ORDER BY abs(resid_x1e6)) AS rn
        |       FROM res),
        |mad AS (SELECT ar AS mad_x1e6 FROM rk
        |        WHERE rn = ((SELECT cnt FROM m) + 1) // 2)
        |SELECT res.period, res.n, res.resid_x1e6, mad.mad_x1e6,
        |  CAST(abs(res.resid_x1e6) AS HUGEINT) * 1000000
        |    > CAST(mad.mad_x1e6 AS HUGEINT) * 3000000 AS anomaly
        |FROM res CROSS JOIN mad ORDER BY period""".stripMargin,

    // 200 md5-seeded Poisson(1) resamples (inverse-CDF thresholds are
    // floor(CDF·1e6) literals), exact floored replicate means, CI =
    // the ⌈0.025·R⌉/⌈0.975·R⌉ order statistics — all integers
    "q_bootstrap_ci" ->
      """WITH f AS (
        |  SELECT CAST(event_id AS VARCHAR) AS k,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS vm
        |  FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND isfinite(value)),
        |pt AS (SELECT count(*)::BIGINT AS n,
        |         CASE WHEN SUM(CAST(vm AS HUGEINT)) % count(*) <> 0
        |              AND SUM(CAST(vm AS HUGEINT)) < 0
        |           THEN CAST(SUM(CAST(vm AS HUGEINT)) // count(*) - 1
        |                AS BIGINT)
        |           ELSE CAST(SUM(CAST(vm AS HUGEINT)) // count(*)
        |                AS BIGINT)
        |         END AS mean_x1e6
        |       FROM f),
        |h AS (SELECT vm,
        |        ('0x' || substr(md5('boot:k:' || k), 1, 10))::BIGINT
        |          AS h1,
        |        ('0x' || substr(md5('boot:k:' || k), 11, 10))::BIGINT
        |          AS h2
        |      FROM f),
        |co AS (SELECT r,
        |        ('0x' || substr(md5('boot:a:' || r), 1, 10))::BIGINT
        |          % 1048573 AS a,
        |        ('0x' || substr(md5('boot:b:' || r), 1, 10))::BIGINT
        |          % 1048573 AS b2,
        |        ('0x' || substr(md5('boot:c:' || r), 1, 10))::BIGINT
        |          % 1048573 AS c
        |      FROM (SELECT unnest(generate_series(1, 200)) AS r)),
        |x AS (SELECT co.r, h.vm,
        |        (co.a * h.h1 + co.b2 * h.h2 + co.c) % 1048573 AS u
        |      FROM h CROSS JOIN co),
        |wgt AS (SELECT r, vm,
        |         CASE WHEN u < 385748 THEN 0 WHEN u < 771496 THEN 1
        |              WHEN u < 964371 THEN 2 WHEN u < 1028662 THEN 3
        |              WHEN u < 1044735 THEN 4 WHEN u < 1047949 THEN 5
        |              WHEN u < 1048485 THEN 6 ELSE 7 END AS w
        |        FROM x),
        |rm AS (SELECT r, SUM(CAST(w AS HUGEINT) * vm) AS swv,
        |         SUM(w)::BIGINT AS sw
        |       FROM wgt GROUP BY r HAVING SUM(w) > 0),
        |means AS (SELECT CASE WHEN swv % sw <> 0 AND swv < 0
        |            THEN CAST(swv // sw - 1 AS BIGINT)
        |            ELSE CAST(swv // sw AS BIGINT) END AS m
        |          FROM rm),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m) AS rn,
        |         count(*) OVER () AS cnt FROM means),
        |ci AS (SELECT
        |         max(CASE WHEN rn = (cnt * 25 + 999) // 1000
        |           THEN m END) AS ci_lo_x1e6,
        |         max(CASE WHEN rn = (cnt * 975 + 999) // 1000
        |           THEN m END) AS ci_hi_x1e6,
        |         count(*)::BIGINT AS n_replicas
        |       FROM rk)
        |SELECT pt.n, pt.mean_x1e6, ci.n_replicas,
        |  ci.ci_lo_x1e6, ci.ci_hi_x1e6
        |FROM pt CROSS JOIN ci""".stripMargin,

    // the q_bootstrap_ci machinery with seed 'uplift:', conditional
    // per-variant sums, and replicate DIFFERENCES of floored means
    // (floor adjustments on every possibly-negative division)
    "q_uplift_ci" ->
      """WITH f AS (
        |  SELECT CAST(event_id AS VARCHAR) AS k,
        |    user_id % 2 = 1 AS b,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS vm
        |  FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND isfinite(value) AND user_id IS NOT NULL),
        |pt AS (SELECT
        |    count(CASE WHEN NOT b THEN 1 END)::BIGINT AS n_a,
        |    count(CASE WHEN b THEN 1 END)::BIGINT AS n_b,
        |    SUM(CASE WHEN NOT b THEN CAST(vm AS HUGEINT)
        |        ELSE 0 END) AS sa,
        |    SUM(CASE WHEN b THEN CAST(vm AS HUGEINT)
        |        ELSE 0 END) AS sb
        |  FROM f),
        |pm AS (SELECT n_a, n_b,
        |    CASE WHEN n_a > 0 THEN
        |      CASE WHEN sa % n_a <> 0 AND sa < 0
        |        THEN CAST(sa // n_a - 1 AS BIGINT)
        |        ELSE CAST(sa // n_a AS BIGINT) END END AS mean_a_x1e6,
        |    CASE WHEN n_b > 0 THEN
        |      CASE WHEN sb % n_b <> 0 AND sb < 0
        |        THEN CAST(sb // n_b - 1 AS BIGINT)
        |        ELSE CAST(sb // n_b AS BIGINT) END END AS mean_b_x1e6
        |  FROM pt),
        |h AS (SELECT vm, b,
        |        ('0x' || substr(md5('uplift:k:' || k), 1, 10))::BIGINT
        |          AS h1,
        |        ('0x' || substr(md5('uplift:k:' || k), 11, 10))::BIGINT
        |          AS h2
        |      FROM f),
        |co AS (SELECT r,
        |        ('0x' || substr(md5('uplift:a:' || r), 1, 10))::BIGINT
        |          % 1048573 AS a,
        |        ('0x' || substr(md5('uplift:b:' || r), 1, 10))::BIGINT
        |          % 1048573 AS b3,
        |        ('0x' || substr(md5('uplift:c:' || r), 1, 10))::BIGINT
        |          % 1048573 AS c
        |      FROM (SELECT unnest(generate_series(1, 200)) AS r)),
        |x AS (SELECT co.r, h.vm, h.b,
        |        (co.a * h.h1 + co.b3 * h.h2 + co.c) % 1048573 AS u
        |      FROM h CROSS JOIN co),
        |wgt AS (SELECT r, vm, b,
        |         CASE WHEN u < 385748 THEN 0 WHEN u < 771496 THEN 1
        |              WHEN u < 964371 THEN 2 WHEN u < 1028662 THEN 3
        |              WHEN u < 1044735 THEN 4 WHEN u < 1047949 THEN 5
        |              WHEN u < 1048485 THEN 6 ELSE 7 END AS w
        |        FROM x),
        |rm AS (SELECT r,
        |         SUM(CASE WHEN NOT b THEN CAST(w AS HUGEINT) * vm
        |             ELSE 0 END) AS swva,
        |         SUM(CASE WHEN NOT b THEN w ELSE 0 END)::BIGINT AS swa,
        |         SUM(CASE WHEN b THEN CAST(w AS HUGEINT) * vm
        |             ELSE 0 END) AS swvb,
        |         SUM(CASE WHEN b THEN w ELSE 0 END)::BIGINT AS swb
        |       FROM wgt GROUP BY r
        |       HAVING SUM(CASE WHEN NOT b THEN w ELSE 0 END) > 0
        |          AND SUM(CASE WHEN b THEN w ELSE 0 END) > 0),
        |means AS (SELECT
        |    (CASE WHEN swvb % swb <> 0 AND swvb < 0
        |       THEN CAST(swvb // swb - 1 AS BIGINT)
        |       ELSE CAST(swvb // swb AS BIGINT) END)
        |    - (CASE WHEN swva % swa <> 0 AND swva < 0
        |       THEN CAST(swva // swa - 1 AS BIGINT)
        |       ELSE CAST(swva // swa AS BIGINT) END) AS m
        |  FROM rm),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m) AS rn,
        |         count(*) OVER () AS cnt FROM means),
        |ci AS (SELECT
        |         max(CASE WHEN rn = (cnt * 25 + 999) // 1000
        |           THEN m END) AS ci_lo_x1e6,
        |         max(CASE WHEN rn = (cnt * 975 + 999) // 1000
        |           THEN m END) AS ci_hi_x1e6,
        |         count(*)::BIGINT AS n_replicas
        |       FROM rk)
        |SELECT pm.n_a, pm.n_b, pm.mean_a_x1e6, pm.mean_b_x1e6,
        |  pm.mean_b_x1e6 - pm.mean_a_x1e6 AS uplift_x1e6,
        |  ci.n_replicas, ci.ci_lo_x1e6, ci.ci_hi_x1e6
        |FROM pm CROSS JOIN ci""".stripMargin,

    // quantized-p double chain with the SAME driver-literal z
    // constants interpolated into both engines' expressions
    "q_power_mde" -> {
      val zsum = graft.analytics.Experiment.zAlpha(50000L) +
        graft.analytics.Experiment.zPower(800000L)
      val zsq = zsum * zsum
      s"""WITH u AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 END) AS conv
         |  FROM events GROUP BY 1),
         |a AS (SELECT count(*)::BIGINT AS n_units,
         |        count(CASE WHEN conv IS NOT NULL THEN 1 END)::BIGINT
         |          AS n_conv
         |      FROM u),
         |b AS (SELECT n_units, n_conv,
         |        CASE WHEN n_units > 0
         |          THEN (n_conv * 1000000) // n_units END AS p_x1e6,
         |        n_units // 2 AS n_per_arm
         |      FROM a),
         |c AS (SELECT *, p_x1e6 / 1000000.0 AS p,
         |        (100000 * p_x1e6) // 1000000 AS delta_x1e6
         |      FROM b),
         |d AS (SELECT *, delta_x1e6 / 1000000.0 AS dd FROM c)
         |SELECT n_units, n_conv, p_x1e6, n_per_arm,
         |  CASE WHEN n_per_arm > 0 THEN
         |    CAST(floor($zsum * sqrt(2.0 * p * (1.0 - p)
         |      / CAST(n_per_arm AS DOUBLE)) * 1000000.0) AS BIGINT)
         |  END AS mde_abs_x1e6,
         |  delta_x1e6,
         |  CASE WHEN delta_x1e6 > 0 THEN
         |    CAST(ceil(2.0 * p * (1.0 - p) * $zsq / (dd * dd))
         |      AS BIGINT)
         |  END AS n_required_per_arm
         |FROM d""".stripMargin
    },

    // rank-arithmetic ntile: score = q − (q·(rank−1)) // n over the
    // DESC rank with user-id tie-break — all-integer output
    "q_rfm" ->
      """WITH u AS (
        |  SELECT user_id, max(epoch_us(ts)) AS recency_ts,
        |    count(*)::BIGINT AS frequency,
        |    CAST(COALESCE(SUM(CAST(floor(CASE WHEN isfinite(value)
        |      THEN value END * 1000000.0) AS BIGINT)), 0) AS BIGINT)
        |      AS monetary_x1e6
        |  FROM events GROUP BY 1),
        |r AS (SELECT *,
        |    row_number() OVER (ORDER BY recency_ts DESC, user_id) AS rr,
        |    row_number() OVER (ORDER BY frequency DESC, user_id) AS rf,
        |    row_number() OVER (ORDER BY monetary_x1e6 DESC, user_id) AS rm,
        |    COUNT(*) OVER () AS n
        |  FROM u)
        |SELECT user_id, recency_ts, frequency, monetary_x1e6,
        |  5 - (5 * (rr - 1)) // n AS r,
        |  5 - (5 * (rf - 1)) // n AS f,
        |  5 - (5 * (rm - 1)) // n AS m,
        |  (5 - (5 * (rr - 1)) // n) * 100 + (5 - (5 * (rf - 1)) // n) * 10
        |    + (5 - (5 * (rm - 1)) // n) AS rfm
        |FROM r ORDER BY user_id""".stripMargin,

    // the product-limit estimate replayed as the SAME integer micro
    // recurrence (floor at every step) via a recursive CTE; n_risk from
    // the suffix count identity tot − cum + cnt
    // same lifetime/censoring CTEs as q_kaplan_meier; n_risk from the
    // exclusive grid prefix, hazard steps as floored micros (all
    // non-negative, // is the floor), cumhaz a plain integer window sum
    "q_nelson_aalen" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(epoch_us(ts) // 86400000000) AS fp,
        |    max(epoch_us(ts) // 86400000000) AS lp
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(lp) AS endp, count(*)::BIGINT AS tot FROM u),
        |g AS (SELECT lp - fp AS duration,
        |        CAST(SUM(CASE WHEN lp < endp THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_event,
        |        CAST(SUM(CASE WHEN lp >= endp THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_censored
        |      FROM u CROSS JOIN mx GROUP BY 1),
        |c AS (SELECT *,
        |        (SELECT tot FROM mx) - COALESCE(
        |          SUM(n_event + n_censored) OVER (ORDER BY duration
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |          0) AS n_risk
        |      FROM g),
        |h AS (SELECT duration, CAST(n_risk AS BIGINT) AS n_risk,
        |        n_event, n_censored,
        |        CAST((1000000 * n_event) // n_risk AS BIGINT)
        |          AS hazard_step_x1e6
        |      FROM c)
        |SELECT duration, n_risk, n_event, n_censored,
        |  hazard_step_x1e6,
        |  CAST(SUM(hazard_step_x1e6) OVER (ORDER BY duration
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cumhaz_x1e6
        |FROM h ORDER BY duration""".stripMargin,

    "q_kaplan_meier" ->
      """WITH RECURSIVE u AS (
        |  SELECT user_id,
        |    min(epoch_us(ts) // 86400000000) AS fp,
        |    max(epoch_us(ts) // 86400000000) AS lp
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(lp) AS endp, count(*)::BIGINT AS tot FROM u),
        |d AS (SELECT lp - fp AS duration,
        |        CAST(SUM(CASE WHEN lp < endp THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_event,
        |        CAST(SUM(CASE WHEN lp >= endp THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_censored
        |      FROM u CROSS JOIN mx GROUP BY 1),
        |r AS (SELECT duration, n_event, n_censored,
        |        CAST((SELECT tot FROM mx)
        |          - SUM(n_event + n_censored) OVER (ORDER BY duration
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          + n_event + n_censored AS BIGINT) AS n_risk,
        |        row_number() OVER (ORDER BY duration) AS i
        |      FROM d),
        |km AS (
        |  SELECT i, duration, n_risk, n_event, n_censored,
        |    (1000000 * (n_risk - n_event)) // n_risk AS s
        |  FROM r WHERE i = 1
        |  UNION ALL
        |  SELECT b.i, b.duration, b.n_risk, b.n_event, b.n_censored,
        |    (km.s * (b.n_risk - b.n_event)) // b.n_risk
        |  FROM km JOIN r b ON b.i = km.i + 1)
        |SELECT duration, n_risk, n_event, n_censored,
        |  CAST(s AS BIGINT) AS surv_x1e6
        |FROM km ORDER BY duration""".stripMargin,

    // same lifetime/censoring construction split by parity; at-risk
    // via a 1-PRECEDING cumulative window; per-step E/V floored once
    // in HUGEINT; z replays the same IEEE chain
    "q_logrank" ->
      """WITH l AS (
        |  SELECT max(user_id % 2 = 1) AS b,
        |    min(epoch_us(ts) // 86400000000) AS fp,
        |    max(epoch_us(ts) // 86400000000) AS lp
        |  FROM events GROUP BY user_id),
        |mx AS (SELECT max(lp) AS endp FROM l),
        |d0 AS (SELECT b, lp - fp AS duration,
        |        CASE WHEN lp < (SELECT endp FROM mx)
        |          THEN 1 ELSE 0 END AS e
        |      FROM l),
        |g AS (SELECT duration,
        |        sum(CASE WHEN NOT b THEN e ELSE 0 END) AS da,
        |        sum(CASE WHEN NOT b THEN 1 - e ELSE 0 END) AS ca,
        |        sum(CASE WHEN b THEN e ELSE 0 END) AS db,
        |        sum(CASE WHEN b THEN 1 - e ELSE 0 END) AS cb
        |      FROM d0 GROUP BY 1),
        |tot AS (SELECT COALESCE(sum(da + ca), 0) AS ta,
        |          COALESCE(sum(db + cb), 0) AS tb,
        |          COALESCE(sum(da), 0) AS ea,
        |          COALESCE(sum(db), 0) AS eb
        |        FROM g),
        |r AS (SELECT g.*,
        |        (SELECT ta FROM tot)
        |          - COALESCE(sum(da + ca) OVER w, 0) AS na,
        |        (SELECT tb FROM tot)
        |          - COALESCE(sum(db + cb) OVER w, 0) AS nb
        |      FROM g WINDOW w AS (ORDER BY duration
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |terms AS (SELECT
        |    CASE WHEN da + db > 0 AND na + nb > 0 THEN
        |      CAST(da AS HUGEINT) * 1000000
        |      - (CAST(da + db AS HUGEINT) * na * 1000000) // (na + nb)
        |    ELSE 0 END AS oet,
        |    CASE WHEN da + db > 0 AND na + nb > 1 THEN
        |      (CAST(da + db AS HUGEINT) * na * nb
        |        * (na + nb - da - db) * 1000000)
        |      // (CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb - 1))
        |    ELSE 0 END AS vt
        |  FROM r),
        |s AS (SELECT COALESCE(CAST(sum(oet) AS BIGINT), 0) AS oe,
        |        COALESCE(CAST(sum(vt) AS BIGINT), 0) AS vv
        |      FROM terms)
        |SELECT CAST((SELECT ta FROM tot) AS BIGINT) AS n_a,
        |  CAST((SELECT tb FROM tot) AS BIGINT) AS n_b,
        |  CAST((SELECT ea FROM tot) AS BIGINT) AS events_a,
        |  CAST((SELECT eb FROM tot) AS BIGINT) AS events_b,
        |  oe AS o_minus_e_a_x1e6, vv AS var_x1e6,
        |  CASE WHEN vv > 0 THEN
        |    CAST(floor((oe / 1000000.0) / sqrt(vv / 1000000.0)
        |      * 1000000.0) AS BIGINT) END AS z_x1e6
        |FROM s""".stripMargin,

    // boundary deltas ordered (t, delta) — ends before starts at a
    // tied instant; per-day max includes the pre-point level
    // (active - delta) so boundary-spanning sessions count
    "q_concurrency" ->
      """WITH pts AS (
        |  SELECT epoch_us(ts) AS t, 1 AS d FROM events
        |  UNION ALL
        |  SELECT epoch_us(ts) + 1800000000, -1 FROM events),
        |r AS (SELECT t, d,
        |        sum(d) OVER (ORDER BY t, d
        |          ROWS UNBOUNDED PRECEDING) AS active
        |      FROM pts)
        |SELECT t // 86400000000 AS period,
        |  sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS n_starts,
        |  CAST(max(greatest(active, active - d)) AS BIGINT)
        |    AS max_concurrent
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // Exact SQL reimplementation of the portable dense HLL (p=12): md5
    // hash → top-12-bit bucket, max leading-zero rank over the low 52
    // bits, exact-integer harmonic sum (HUGEINT), then the estimate
    // formula with the engine's exact float association. Rounded to a
    // whole count on both sides.
    "q_approx_distinct" ->
      """WITH th AS (
        |  SELECT l_returnflag,
        |         md5_number_lower(CAST(l_partkey AS VARCHAR)) AS h
        |  FROM lineitem
        |), nr AS (
        |  SELECT l_returnflag, count(*) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag
        |), regs AS (
        |  SELECT l_returnflag, (h >> 52) AS bucket,
        |    max(CASE WHEN (h & 4503599627370495::UBIGINT) = 0::UBIGINT
        |             THEN 53
        |             ELSE 53 - length(format('{:b}',
        |               CAST((h & 4503599627370495::UBIGINT) AS BIGINT)))
        |        END) AS rho
        |  FROM th GROUP BY l_returnflag, bucket
        |), agg AS (
        |  SELECT l_returnflag, count(*) AS present,
        |    sum(CAST(1::UBIGINT << CAST(53 - rho AS INTEGER) AS HUGEINT))
        |      AS s_present
        |  FROM regs GROUP BY l_returnflag
        |), e AS (
        |  SELECT l_returnflag, (4096 - present) AS zeros,
        |    ((0.7213 / (1.0 + 1.079 / 4096.0)) * (4096.0 * 4096.0))
        |      * 9007199254740992.0
        |      / CAST(s_present + CAST(4096 - present AS HUGEINT)
        |             * CAST(1::UBIGINT << 53 AS HUGEINT) AS DOUBLE) AS raw
        |  FROM agg
        |)
        |SELECT e.l_returnflag,
        |  CAST(round(CASE WHEN raw <= 2.5 * 4096.0 AND zeros > 0
        |                  THEN 4096.0 * ln(4096.0 / zeros)
        |                  ELSE raw END, 0) AS BIGINT) AS approx_parts,
        |  nr.n_rows
        |FROM e JOIN nr USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    // Exactness-forcing GK configuration: returned elements are the
    // percentile_disc order statistics (see the query comment).
    "q_approx_percentile" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.5) AS med_qty,
        |  quantile_disc(l_quantity, 0.9) AS p90_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Exact SQL reimplementation of the portable CMS (5 × 27183):
    // occurrence counts per (row, KM-double-hash bucket), per-term
    // estimate = min over rows, then the per-document frequent-token
    // scoring — integer arithmetic end-to-end except the final ratio
    // division, mirrored exactly.
    "q_cms_frequent_ratio" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |    '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), tt AS (
        |  SELECT doc_id, term FROM toks WHERE length(term) > 0
        |), n_total AS (
        |  SELECT count(*) AS n FROM tt
        |), hs AS (
        |  SELECT term, count(*) AS occ,
        |    md5_number_lower(term) % 27183::UBIGINT AS h1m,
        |    md5_number_upper(term) % 27183::UBIGINT AS h2m
        |  FROM tt GROUP BY term
        |), cnt AS (
        |  SELECT t.i AS i,
        |    (h.h1m + t.i::UBIGINT * h.h2m) % 27183::UBIGINT AS bucket,
        |    CAST(sum(h.occ) AS BIGINT) AS c
        |  FROM hs h CROSS JOIN range(5) t(i)
        |  GROUP BY 1, 2
        |), est AS (
        |  SELECT h.term, min(c.c) AS est
        |  FROM hs h CROSS JOIN range(5) t(i)
        |  JOIN cnt c ON c.i = t.i
        |    AND c.bucket = (h.h1m + t.i::UBIGINT * h.h2m) % 27183::UBIGINT
        |  GROUP BY h.term
        |), scored AS (
        |  SELECT tt.doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN e.est >=
        |                 greatest(1, (SELECT n FROM n_total) // 1000)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_frequent
        |  FROM tt JOIN est e USING (term)
        |  GROUP BY tt.doc_id
        |)
        |SELECT d.doc_id,
        |  coalesce(s.n_tokens, 0) AS n_tokens,
        |  coalesce(s.n_frequent, 0) AS n_frequent,
        |  CASE WHEN s.n_tokens IS NULL THEN 0.0
        |       ELSE CAST(s.n_frequent AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
        |  END AS frequent_ratio
        |FROM documents d LEFT JOIN scored s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Same portable-HLL reimplementation over normalized document terms,
    // at both rollup levels (per-lang + '*' grand total).
    "q_hll_rollup" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |    '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), terms AS (
        |  SELECT lang, md5_number_lower(term) AS h
        |  FROM toks WHERE length(term) > 0
        |), lv AS (
        |  SELECT lang, h FROM terms
        |  UNION ALL
        |  SELECT '*' AS lang, h FROM terms
        |), nr AS (
        |  SELECT lang, count(*) AS n_rows FROM lv GROUP BY lang
        |), regs AS (
        |  SELECT lang, (h >> 52) AS bucket,
        |    max(CASE WHEN (h & 4503599627370495::UBIGINT) = 0::UBIGINT
        |             THEN 53
        |             ELSE 53 - length(format('{:b}',
        |               CAST((h & 4503599627370495::UBIGINT) AS BIGINT)))
        |        END) AS rho
        |  FROM lv GROUP BY lang, bucket
        |), agg AS (
        |  SELECT lang, count(*) AS present,
        |    sum(CAST(1::UBIGINT << CAST(53 - rho AS INTEGER) AS HUGEINT))
        |      AS s_present
        |  FROM regs GROUP BY lang
        |), e AS (
        |  SELECT lang, (4096 - present) AS zeros,
        |    ((0.7213 / (1.0 + 1.079 / 4096.0)) * (4096.0 * 4096.0))
        |      * 9007199254740992.0
        |      / CAST(s_present + CAST(4096 - present AS HUGEINT)
        |             * CAST(1::UBIGINT << 53 AS HUGEINT) AS DOUBLE) AS raw
        |  FROM agg
        |)
        |SELECT e.lang,
        |  CAST(round(CASE WHEN raw <= 2.5 * 4096.0 AND zeros > 0
        |                  THEN 4096.0 * ln(4096.0 / zeros)
        |                  ELSE raw END, 0) AS BIGINT) AS distinct_est,
        |  nr.n_rows
        |FROM e JOIN nr USING (lang)
        |ORDER BY lang""".stripMargin,

    // the q_hll_rollup register machinery per lang, plus per-PAIR union
    // registers (max rho via an OR-join — pair count is lang²-bounded);
    // estimates round to whole counts BEFORE the integer inclusion–
    // exclusion, exactly like the engine
    "q_hll_overlap" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |    '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), terms AS (
        |  SELECT lang, md5_number_lower(term) AS h
        |  FROM toks WHERE length(term) > 0
        |), regs AS (
        |  SELECT lang, (h >> 52) AS bucket,
        |    max(CASE WHEN (h & 4503599627370495::UBIGINT) = 0::UBIGINT
        |             THEN 53
        |             ELSE 53 - length(format('{:b}',
        |               CAST((h & 4503599627370495::UBIGINT) AS BIGINT)))
        |        END) AS rho
        |  FROM terms GROUP BY lang, bucket
        |), agg AS (
        |  SELECT lang AS k, count(*) AS present,
        |    sum(CAST(1::UBIGINT << CAST(53 - rho AS INTEGER) AS HUGEINT))
        |      AS s_present
        |  FROM regs GROUP BY 1
        |), e AS (
        |  SELECT k, CAST(round(CASE
        |    WHEN ((0.7213 / (1.0 + 1.079 / 4096.0)) * (4096.0 * 4096.0))
        |           * 9007199254740992.0
        |           / CAST(s_present + CAST(4096 - present AS HUGEINT)
        |                  * CAST(1::UBIGINT << 53 AS HUGEINT) AS DOUBLE)
        |         <= 2.5 * 4096.0 AND (4096 - present) > 0
        |    THEN 4096.0 * ln(4096.0 / (4096 - present))
        |    ELSE ((0.7213 / (1.0 + 1.079 / 4096.0)) * (4096.0 * 4096.0))
        |           * 9007199254740992.0
        |           / CAST(s_present + CAST(4096 - present AS HUGEINT)
        |                  * CAST(1::UBIGINT << 53 AS HUGEINT) AS DOUBLE)
        |    END, 0) AS BIGINT) AS est
        |  FROM agg
        |), pairs AS (
        |  SELECT a.lang AS key_a, b.lang AS key_b
        |  FROM (SELECT DISTINCT lang FROM terms) a
        |  JOIN (SELECT DISTINCT lang FROM terms) b ON a.lang < b.lang
        |), uregs AS (
        |  SELECT p.key_a, p.key_b, r.bucket, max(r.rho) AS rho
        |  FROM pairs p JOIN regs r
        |    ON r.lang = p.key_a OR r.lang = p.key_b
        |  GROUP BY 1, 2, 3
        |), uagg AS (
        |  SELECT key_a, key_b, count(*) AS present,
        |    sum(CAST(1::UBIGINT << CAST(53 - rho AS INTEGER) AS HUGEINT))
        |      AS s_present
        |  FROM uregs GROUP BY 1, 2
        |), ue AS (
        |  SELECT key_a, key_b, CAST(round(CASE
        |    WHEN ((0.7213 / (1.0 + 1.079 / 4096.0)) * (4096.0 * 4096.0))
        |           * 9007199254740992.0
        |           / CAST(s_present + CAST(4096 - present AS HUGEINT)
        |                  * CAST(1::UBIGINT << 53 AS HUGEINT) AS DOUBLE)
        |         <= 2.5 * 4096.0 AND (4096 - present) > 0
        |    THEN 4096.0 * ln(4096.0 / (4096 - present))
        |    ELSE ((0.7213 / (1.0 + 1.079 / 4096.0)) * (4096.0 * 4096.0))
        |           * 9007199254740992.0
        |           / CAST(s_present + CAST(4096 - present AS HUGEINT)
        |                  * CAST(1::UBIGINT << 53 AS HUGEINT) AS DOUBLE)
        |    END, 0) AS BIGINT) AS est_union
        |  FROM uagg
        |)
        |SELECT p.key_a, p.key_b, ea.est AS est_a, eb.est AS est_b,
        |  ue.est_union,
        |  ea.est + eb.est - ue.est_union AS est_intersect,
        |  CASE WHEN ue.est_union > 0 THEN
        |    (greatest(ea.est + eb.est - ue.est_union, 0) * 1000000)
        |      // ue.est_union
        |  ELSE 0 END AS jaccard_est_x1e6
        |FROM pairs p
        |JOIN e ea ON ea.k = p.key_a
        |JOIN e eb ON eb.k = p.key_b
        |JOIN ue ON ue.key_a = p.key_a AND ue.key_b = p.key_b
        |ORDER BY p.key_a, p.key_b""".stripMargin,

    // Exact-capacity KLL (k ≥ n ⇒ no compaction ⇒ retained values are the
    // full sorted stream, INCLUSIVE quantile = percentile_disc). The
    // rollup levels mirror Spark's rollup(lang): per-lang + grand total.
    "q_kll_profile" ->
      """SELECT coalesce(lang, '*') AS lang,
        |  count(n_chars) AS n_rows,
        |  quantile_disc(CAST(n_chars AS DOUBLE), 0.1) AS p10,
        |  quantile_disc(CAST(n_chars AS DOUBLE), 0.5) AS p50,
        |  quantile_disc(CAST(n_chars AS DOUBLE), 0.9) AS p90,
        |  quantile_disc(CAST(n_chars AS DOUBLE), 0.99) AS p99
        |FROM documents
        |GROUP BY ROLLUP(lang)
        |ORDER BY lang""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'view') AS n_view,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'error') AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_date_spine" ->
      """WITH b AS (
        |  SELECT min(o_orderdate::DATE) lo, max(o_orderdate::DATE) hi
        |  FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series((SELECT lo FROM b),
        |    (SELECT hi FROM b), INTERVAL 1 DAY))::DATE AS d),
        |agg AS (
        |  SELECT o_orderdate::DATE AS d, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT strftime(spine.d, '%Y-%m-%d') AS day,
        |  COALESCE(agg.n_orders, 0) AS n_orders,
        |  COALESCE(agg.revenue, 0.0) AS revenue
        |FROM spine LEFT JOIN agg ON spine.d = agg.d
        |ORDER BY day""".stripMargin,

    "q_array_agg" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list_distinct(list(event_type))), '|')
        |    AS types,
        |  COUNT(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |    COUNT(*)::DOUBLE AS n_items
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM g
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM g
        |  UNION ALL
        |  SELECT l_returnflag, 'n_items', n_items FROM g)
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q_histogram" ->
      """SELECT bin, bin * 50 AS lo, bin * 50 + 50 AS hi, count(*) AS n
        |FROM (SELECT (n_chars // 50)::BIGINT AS bin FROM documents)
        |GROUP BY bin ORDER BY bin""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Median/MAD robust z — same two-stage quantile_cont + single double
    // division as Robust.robustZ; NULLIF guards the zero-MAD stratum
    "q_robust_z" ->
      """WITH m AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med
        |           FROM documents GROUP BY 1),
        |d AS (SELECT doc_id, lang, n_chars, med
        |      FROM documents JOIN m USING (lang)),
        |a AS (SELECT lang,
        |        quantile_cont(abs(n_chars::DOUBLE - med), 0.5) AS mad
        |      FROM d GROUP BY 1),
        |z AS (SELECT doc_id, lang, n_chars,
        |        (n_chars::DOUBLE - med) / (1.4826 * nullif(mad, 0.0)) AS rz
        |      FROM d JOIN a USING (lang))
        |SELECT doc_id, lang, n_chars, round(rz, 6) AS robust_z,
        |  abs(rz) > 3.5 AS is_outlier
        |FROM z ORDER BY doc_id""".stripMargin,

    // Interval overlap count per event: naive range self-join (DuckDB
    // plans range predicates as IEJoin; fine at oracle scale).
    "q_interval_join" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS t FROM events),
        |p AS (SELECT a.event_id, count(*) AS n
        |      FROM e a JOIN e b
        |        ON a.event_id != b.event_id
        |       AND abs(a.t - b.t) <= 120000000
        |      GROUP BY a.event_id)
        |SELECT e.event_id, coalesce(p.n, 0) AS n_overlaps
        |FROM e LEFT JOIN p USING (event_id)
        |ORDER BY e.event_id""".stripMargin,

    // SCD2: change rows via lag + IS DISTINCT FROM, intervals via lead.
    // rn = 1 keeps each key's first row unconditionally: with a NULL
    // first attribute, `NULL IS DISTINCT FROM NULL` is false and the
    // bare predicate would drop the opening interval that Spark's
    // lag(struct) <=> struct comparison keeps.
    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, event_id, event_type, ts_us,
        |        lag(event_type) OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
        |        row_number() OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |      FROM e),
        |ch AS (SELECT user_id, event_id, event_type, ts_us FROM c
        |       WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |scd AS (SELECT user_id, event_id AS src_event_id, event_type,
        |          ts_us AS valid_from,
        |          lead(ts_us) OVER (
        |            PARTITION BY user_id ORDER BY ts_us, event_id)
        |            AS valid_to
        |        FROM ch)
        |SELECT user_id, src_event_id, event_type, valid_from,
        |  coalesce(valid_to, -1) AS valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM scd ORDER BY user_id, valid_from, src_event_id""".stripMargin,

    // SCD2 temporal join: rebuild the interval table (rn = 1 as in
    // q_scd2's oracle), then the equi + range membership join.
    "q_scd2_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, event_id, event_type, ts_us,
        |        lag(event_type) OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
        |        row_number() OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |      FROM e),
        |ch AS (SELECT user_id, event_id, event_type, ts_us FROM c
        |       WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |scd AS (SELECT user_id, event_id AS src_event_id, event_type,
        |          ts_us AS valid_from,
        |          lead(ts_us) OVER (
        |            PARTITION BY user_id ORDER BY ts_us, event_id)
        |            AS valid_to
        |        FROM ch)
        |SELECT e.event_id, e.user_id, s.src_event_id,
        |  s.event_type AS dim_type, s.valid_from
        |FROM e JOIN scd s ON e.user_id = s.user_id
        |  AND e.ts_us >= s.valid_from
        |  AND (s.valid_to IS NULL OR e.ts_us < s.valid_to)
        |ORDER BY e.event_id""".stripMargin,

    // the LEFT form over a THINNED history (even event_ids only):
    // facts before their user's first interval, or whose user has no
    // history, keep a null-filled row
    "q_scd2_join_left" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             epoch_us(ts) AS ts_us FROM events),
        |h AS (SELECT * FROM e WHERE event_id % 2 = 0),
        |c AS (SELECT user_id, event_id, event_type, ts_us,
        |        lag(event_type) OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
        |        row_number() OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |      FROM h),
        |ch AS (SELECT user_id, event_id, event_type, ts_us FROM c
        |       WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |scd AS (SELECT user_id, event_id AS src_event_id, event_type,
        |          ts_us AS valid_from,
        |          lead(ts_us) OVER (
        |            PARTITION BY user_id ORDER BY ts_us, event_id)
        |            AS valid_to
        |        FROM ch)
        |SELECT e.event_id, e.user_id, s.src_event_id,
        |  s.event_type AS dim_type, s.valid_from
        |FROM e LEFT JOIN scd s ON e.user_id = s.user_id
        |  AND e.ts_us >= s.valid_from
        |  AND (s.valid_to IS NULL OR e.ts_us < s.valid_to)
        |ORDER BY e.event_id""".stripMargin,

    // LOCF via IGNORE NULLS last_value over the preceding frame.
    "q_locf" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  round(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS v_filled
        |FROM e ORDER BY event_id""".stripMargin,

    // Linear interpolation: v0 + (v1-v0)*(t-t0)/(t1-t0), same double-op
    // order as the Spark form; edge rows carry forward/backward.
    "q_interpolate" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |  FROM events),
        |w AS (SELECT event_id, user_id, ts_us, v,
        |  last_value(v IGNORE NULLS) OVER bk AS v0,
        |  last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
        |    OVER bk AS t0,
        |  first_value(v IGNORE NULLS) OVER fw AS v1,
        |  first_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
        |    OVER fw AS t1
        |  FROM e
        |  WINDOW bk AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  fw AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN v0 IS NOT NULL AND v1 IS NOT NULL AND t1 != t0 THEN
        |      v0 + (v1 - v0) * (CAST(ts_us AS DOUBLE) - CAST(t0 AS DOUBLE))
        |        / (CAST(t1 AS DOUBLE) - CAST(t0 AS DOUBLE))
        |    WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN v0
        |    WHEN v0 IS NOT NULL THEN v0
        |    ELSE v1 END, 6) AS v_interp
        |FROM w ORDER BY event_id""".stripMargin,

    // Salted join oracle = the plain (unsalted) join: salting must not
    // change the result set.
    "q_salted_join" ->
      """WITH d AS (SELECT event_type, count(*) AS type_count
        |           FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, d.type_count
        |FROM events e JOIN d USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    // Winsorize: the bounds RESTATE the engine's exact interpolation
    // `lo + (hi - lo) * frac` (native percentile_cont differs by an ulp
    // at sf0.1 — the q_exact_percentile lesson); unclamped rows carry
    // the original double.
    "q_winsorize" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS rk,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |ps AS (SELECT unnest([0.05::DOUBLE, 0.95::DOUBLE]) AS p),
        |need AS (SELECT l_returnflag, p,
        |    CAST(floor(p * (n - 1)::DOUBLE) AS BIGINT) + 1 AS lo,
        |    CAST(ceil(p * (n - 1)::DOUBLE) AS BIGINT) + 1 AS hi,
        |    p * (n - 1)::DOUBLE - floor(p * (n - 1)::DOUBLE) AS frac
        |  FROM (SELECT DISTINCT l_returnflag, n FROM r) CROSS JOIN ps),
        |pv AS (SELECT need.l_returnflag, need.p,
        |    max(CASE WHEN r.rk = need.lo THEN r.v END)
        |      + (coalesce(max(CASE WHEN r.rk = need.hi THEN r.v END),
        |          max(CASE WHEN r.rk = need.lo THEN r.v END))
        |        - max(CASE WHEN r.rk = need.lo THEN r.v END))
        |        * max(need.frac) AS value
        |  FROM need JOIN r ON r.l_returnflag = need.l_returnflag
        |    AND r.rk IN (need.lo, need.hi)
        |  GROUP BY need.l_returnflag, need.p),
        |b AS (SELECT l_returnflag,
        |    max(CASE WHEN p = 0.05 THEN value END) AS blo,
        |    max(CASE WHEN p = 0.95 THEN value END) AS bhi
        |  FROM pv GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, l.l_returnflag,
        |  CASE WHEN l_extendedprice < blo THEN blo
        |       WHEN l_extendedprice > bhi THEN bhi
        |       ELSE l_extendedprice END AS winsorized
        |FROM lineitem l JOIN b USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Skew report: row_number needs the INTEGER cast (DuckDB emits BIGINT,
    // Spark INT); the share division is the only double op, once per row.
    "q_skew_report" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS n FROM events
        |           GROUP BY user_id),
        |t AS (SELECT count(*)::BIGINT AS total FROM events),
        |h AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id ASC LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, user_id ASC)
        |    AS INTEGER) AS rank,
        |  user_id, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM h, t ORDER BY rank""".stripMargin,

    "q_stats_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |    COUNT(*)::DOUBLE AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(38,6)))::DOUBLE AS sx,
        |    SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6)))::DOUBLE AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(38,6)))::DOUBLE AS sy,
        |    SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6)))::DOUBLE AS syy,
        |    SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6)))::DOUBLE AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n::BIGINT AS n_rows,
        |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS std_qty,
        |  round((n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        |    AS corr_qty_price
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "q_set_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    // the same WITH RECURSIVE text modulo dialect division (Spark DIV =
    // DuckDB // — both truncate toward zero, the house convention)
    "q_recursive_cte" ->
      """WITH RECURSIVE up(custkey, anc, depth) AS (
        |  SELECT c_custkey, c_custkey // 10, 1
        |  FROM customer WHERE c_custkey >= 10
        |  UNION ALL
        |  SELECT custkey, anc // 10, depth + 1 FROM up
        |  WHERE anc >= 10)
        |SELECT u.anc AS anc,
        |  count(*)::BIGINT AS n_desc,
        |  CAST(max(u.depth) AS BIGINT) AS max_depth,
        |  CAST(sum(CAST(floor(c.c_acctbal * 1000000.0) AS BIGINT))
        |    AS BIGINT) AS bal_x1e6
        |FROM up u JOIN customer c ON c.c_custkey = u.custkey
        |WHERE u.anc >= 1
        |GROUP BY u.anc ORDER BY u.anc""".stripMargin,

    "q_rank_family" ->
      """SELECT c_mktsegment, c_custkey, bal_bucket, rnk, drnk, quartile,
        |  pct_rank, cume
        |FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |    RANK() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT) DESC) AS rnk,
        |    DENSE_RANK() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT) DESC) AS drnk,
        |    NTILE(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile,
        |    round(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC), 6) AS pct_rank,
        |    round(CUME_DIST() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC), 6) AS cume
        |  FROM customer)
        |WHERE rnk <= 20
        |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,

    "q_date_trunc" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY month ORDER BY month""".stripMargin,

    "q_union" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY GROUPING SETS (
        |  (o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin,

    "q_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    // exact percentile_cont spelled out as the SQL-standard formula over
    // row_number ranks — pinned to the same arithmetic the operator runs
    // (RN = p·(n−1); lo + (hi − lo)·frac), so the compare is bit-exact
    // rather than hostage to an engine's internal interpolator
    "q_exact_percentile" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS rk,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |ps AS (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE])
        |  AS p),
        |need AS (SELECT l_returnflag, p,
        |    p * (n - 1)::DOUBLE AS rn,
        |    CAST(floor(p * (n - 1)::DOUBLE) AS BIGINT) + 1 AS lo,
        |    CAST(ceil(p * (n - 1)::DOUBLE) AS BIGINT) + 1 AS hi,
        |    p * (n - 1)::DOUBLE - floor(p * (n - 1)::DOUBLE) AS frac
        |  FROM (SELECT DISTINCT l_returnflag, n FROM r) CROSS JOIN ps)
        |SELECT need.l_returnflag, need.p,
        |  max(CASE WHEN r.rk = need.lo THEN r.v END)
        |    + (coalesce(max(CASE WHEN r.rk = need.hi THEN r.v END),
        |        max(CASE WHEN r.rk = need.lo THEN r.v END))
        |      - max(CASE WHEN r.rk = need.lo THEN r.v END)) * max(need.frac)
        |    AS value
        |FROM need JOIN r ON r.l_returnflag = need.l_returnflag
        |  AND r.rk IN (need.lo, need.hi)
        |GROUP BY need.l_returnflag, need.p
        |ORDER BY need.l_returnflag, need.p""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(o.k, e.k) AS k,
        |  COALESCE(o.n_orders, 0) AS n_orders,
        |  COALESCE(e.n_events, 0) AS n_events
        |FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
        |FULL OUTER JOIN
        |  (SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1) e
        |  ON o.k = e.k
        |ORDER BY k""".stripMargin,

    "q_range_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, event_id AS id_a, epoch_us(ts) AS t_a FROM events) a
        |JOIN (SELECT user_id, event_id AS id_b, epoch_us(ts) AS t_b FROM events) b
        |  ON a.user_id = b.user_id AND a.id_a < b.id_b
        | AND abs(a.t_a - b.t_b) <= 60000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS t, 1 AS is_left, event_id,
        |    NULL::BIGINT AS o_orderkey, NULL::DOUBLE AS o_totalprice
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey, epoch_us(o_orderdate), 0, NULL, o_orderkey,
        |    o_totalprice
        |  FROM orders),
        |w AS (SELECT *,
        |    last_value(CASE WHEN is_left = 0 THEN o_orderkey END IGNORE NULLS)
        |      OVER win AS asof_o_orderkey,
        |    last_value(CASE WHEN is_left = 0 THEN o_totalprice END IGNORE NULLS)
        |      OVER win AS asof_o_totalprice
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id
        |    ORDER BY t ASC, is_left ASC, o_orderkey ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, t AS ts_us, asof_o_orderkey,
        |  asof_o_totalprice
        |FROM w WHERE is_left = 1 ORDER BY event_id""".stripMargin,

    // the q_asof_join shape + the matched row's own time carried along;
    // both payload fields null TOGETHER past the 8400-day tolerance
    "q_asof_tolerance" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS t, 1 AS is_left, event_id,
        |    NULL::BIGINT AS o_orderkey, NULL::DOUBLE AS o_totalprice
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey, epoch_us(o_orderdate), 0, NULL, o_orderkey,
        |    o_totalprice
        |  FROM orders),
        |w AS (SELECT *,
        |    last_value(CASE WHEN is_left = 0 THEN o_orderkey END IGNORE NULLS)
        |      OVER win AS m_orderkey,
        |    last_value(CASE WHEN is_left = 0 THEN o_totalprice END IGNORE NULLS)
        |      OVER win AS m_totalprice,
        |    last_value(CASE WHEN is_left = 0 THEN t END IGNORE NULLS)
        |      OVER win AS m_t
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id
        |    ORDER BY t ASC, is_left ASC, o_orderkey ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, t AS ts_us,
        |  CASE WHEN m_t IS NOT NULL AND t - m_t <= 725760000000000
        |    THEN m_orderkey END AS asof_o_orderkey,
        |  CASE WHEN m_t IS NOT NULL AND t - m_t <= 725760000000000
        |    THEN m_totalprice END AS asof_o_totalprice
        |FROM w WHERE is_left = 1 ORDER BY event_id""".stripMargin,

    // the mirror window: first right at-or-after, left sorts before
    // tied right rows (is_left DESC), smallest right id wins ties
    "q_asof_forward" ->
      """WITH u AS (
        |  SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t,
        |    1 AS is_left, o_orderkey,
        |    NULL::BIGINT AS m_eid, NULL::DOUBLE AS m_value
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), 0, NULL, event_id, value
        |  FROM events),
        |w AS (SELECT *,
        |    first_value(CASE WHEN is_left = 0 THEN m_eid END IGNORE NULLS)
        |      OVER win AS a_eid,
        |    first_value(CASE WHEN is_left = 0 THEN m_value END IGNORE NULLS)
        |      OVER win AS a_value
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id
        |    ORDER BY t ASC, is_left DESC, m_eid ASC NULLS LAST
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT o_orderkey, user_id, t AS o_us,
        |  a_eid AS asof_m_eid, a_value AS asof_m_value
        |FROM w WHERE is_left = 1 ORDER BY o_orderkey""".stripMargin,

    // both directional carries (each with the matched row's own time),
    // then the closest-in-absolute-time pick; equal distance takes the
    // backward match
    "q_asof_nearest" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |  FROM events),
        |u AS (
        |  SELECT user_id, ts_us AS t, 1 AS is_left, event_id,
        |    NULL::BIGINT AS m_eid, NULL::DOUBLE AS m_value
        |  FROM e WHERE event_id % 2 = 1
        |  UNION ALL
        |  SELECT user_id, ts_us, 0, NULL, event_id, value
        |  FROM e WHERE event_id % 2 = 0),
        |w AS (SELECT *,
        |    last_value(CASE WHEN is_left = 0 THEN m_eid END IGNORE NULLS)
        |      OVER wb AS b_eid,
        |    last_value(CASE WHEN is_left = 0 THEN m_value END IGNORE NULLS)
        |      OVER wb AS b_val,
        |    last_value(CASE WHEN is_left = 0 THEN t END IGNORE NULLS)
        |      OVER wb AS b_t,
        |    first_value(CASE WHEN is_left = 0 THEN m_eid END IGNORE NULLS)
        |      OVER wf AS f_eid,
        |    first_value(CASE WHEN is_left = 0 THEN m_value END IGNORE NULLS)
        |      OVER wf AS f_val,
        |    first_value(CASE WHEN is_left = 0 THEN t END IGNORE NULLS)
        |      OVER wf AS f_t
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id
        |      ORDER BY t ASC, is_left ASC, m_eid ASC NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id
        |      ORDER BY t ASC, is_left DESC, m_eid ASC NULLS LAST
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, t AS ts_us,
        |  CASE WHEN b_t IS NULL THEN f_eid WHEN f_t IS NULL THEN b_eid
        |       WHEN t - b_t <= f_t - t THEN b_eid ELSE f_eid END
        |    AS asof_m_eid,
        |  CASE WHEN b_t IS NULL THEN f_val WHEN f_t IS NULL THEN b_val
        |       WHEN t - b_t <= f_t - t THEN b_val ELSE f_val END
        |    AS asof_m_value
        |FROM w WHERE is_left = 1 ORDER BY event_id""".stripMargin
  )
}
