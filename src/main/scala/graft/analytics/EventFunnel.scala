package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence event analytics ([EXT] north-star surface; no
  * reference implementation — the reference's events land in bronze and
  * stop there): conversion funnels and cohort retention, the two queries
  * every event warehouse (ClickHouse `windowFunnel`/`retention`,
  * Amplitude, Mixpanel) treats as primitives. Both operate on the
  * schema-adaptive epoch-µs column from [[Tables.withEpochMicros]], never
  * on a raw timestamp.
  */
object EventFunnel {

  /** First-touch conversion funnel: per user, the deepest prefix of
    * `steps` completed IN ORDER within `windowUs` of the first step.
    * Semantics (deterministic, no tie ambiguity):
    *   t1 = min ts of a step-1 event;
    *   tᵢ = min ts of a step-i event with tᵢ > tᵢ₋₁ and tᵢ − t1 ≤ windowUs.
    * `step_reached` counts the defined tᵢ (0 for users with funnel-type
    * activity but no step-1 event). Returns one row per user seen in any
    * funnel step: (userCol, t1_us … tk_us nullable, step_reached).
    *
    * Greedy-earliest is the standard funnel definition: taking the
    * earliest valid event at each step dominates any other choice (a
    * later tᵢ only shrinks the window left for step i+1), so it finds a
    * completion iff one exists within the window of the FIRST t1 — the
    * first-touch attribution model.
    *
    * Scale: k−1 passes over a once-materialized (user, type, ts) slice
    * pre-filtered to the funnel's event types (filter pushed to the
    * scan; the slice is a fraction of the event log). Every pass is a
    * map-side-combined min aggregate keyed on user joined against the
    * per-user frontier (ONE row per qualifying user — always the small
    * side); nothing shuffles twice, no data-sized window, no
    * per-user array state. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"duplicate step in $steps")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val e = events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsUsCol).as("_ts"))
      .filter(col("_t").isin(steps: _*))
      .localCheckpoint(false)
    val s1 = e.filter(col("_t") === steps.head)
      .groupBy(col("_u")).agg(min(col("_ts")).as("t1_us"))
    val frontier = steps.zipWithIndex.drop(1).foldLeft(s1) {
      case (acc, (st, i)) =>
        val prev = s"t${i}_us"
        val cur = s"t${i + 1}_us"
        val nxt = e.filter(col("_t") === st)
          .join(acc.select(col("_u"), col("t1_us").as("_w0"), col(prev)),
            Seq("_u"))
          .filter(col("_ts") > col(prev) &&
            col("_ts") - col("_w0") <= windowUs)
          .groupBy(col("_u")).agg(min(col("_ts")).as(cur))
        acc.join(nxt, Seq("_u"), "left")
    }
    val stepCols = (1 to steps.size).map(i => col(s"t${i}_us"))
    e.select(col("_u")).distinct()
      .join(frontier, Seq("_u"), "left")
      .withColumn("step_reached",
        stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int"))
      .select(col("_u").as(userCol) +: stepCols :+ col("step_reached"): _*)
  }

  /** The funnel REPORT on top of [[funnel]]/[[funnelSliding]] output:
    * per step, how many users reached AT LEAST that depth, plus
    * conversion vs step 1 and vs the previous step (the numbers every
    * funnel dashboard shows). Rates are NULL when the respective
    * denominator is zero (the SQL NULLIF convention); step 1's
    * step-over-step rate is 1.0 by definition.
    *
    * Scale: the input is already one row per user; this collapses it to
    * a ≤ `nSteps`-row depth-count frame, so the inequality join and the
    * unpartitioned ordering window run on k rows, not data. */
  def funnelReport(funnelOut: DataFrame, nSteps: Int): DataFrame = {
    require(nSteps >= 2, s"a funnel needs >= 2 steps, got $nSteps")
    val session = funnelOut.sparkSession
    import session.implicits._
    val counts = funnelOut.groupBy(col("step_reached").as("_d"))
      .agg(count(lit(1)).as("_n"))
    val reached = (1 to nSteps).toDF("step")
      .join(counts, col("_d") >= col("step"), "left")
      .groupBy(col("step"))
      .agg(coalesce(sum(col("_n")), lit(0L)).as("n_reached"))
    val w = Window.orderBy(col("step").asc)
    reached
      .withColumn("_first", first(col("n_reached")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_prev",
        coalesce(lag(col("n_reached"), 1).over(w), col("n_reached")))
      .withColumn("conv_from_first",
        round(col("n_reached").cast("double") /
          when(col("_first") =!= 0L, col("_first")), 6))
      .withColumn("conv_from_prev",
        round(col("n_reached").cast("double") /
          when(col("_prev") =!= 0L, col("_prev")), 6))
      .select(col("step"), col("n_reached"), col("conv_from_first"),
        col("conv_from_prev"))
  }

  /** Sliding-anchor funnel (the ClickHouse `windowFunnel` semantics):
    * per user, the deepest k such that SOME ordered chain
    * e₁ < e₂ < … < e_k of the step types fits within `windowUs` of ITS
    * OWN first event — any step-1 event can anchor, not just the first
    * ([[funnel]]'s first-touch model is the stricter attribution view;
    * this is the recall view). Chain order is row order by
    * (ts, orderCol): same-timestamp events chain in `orderCol` order.
    *
    * One per-user window pass computes it exactly, via the maximal-anchor
    * recurrence: A₁(t) = max step-1 ts strictly before t; a step-j row
    * carries chain-start s_j = A_{j-1} (the LATEST viable anchor — later
    * anchors dominate: they only loosen the window check); A_j = running
    * max of s_j over earlier step-j rows. Depth ≥ j iff some step-j row
    * has t − s_j ≤ windowUs; intermediate rows need no window check
    * because t_j − a ≤ W implies t_i − a ≤ W for every i < j. Returns
    * (userCol, step_reached) for every user with funnel-type activity.
    *
    * Scale: ONE hash exchange on user + one within-partition sort feeds
    * every window column (Spark computes all the running maxes in a
    * single Window operator) and the final depth is a map-side-combined
    * per-user max — the q_session_gap shape, linear in events. */
  def funnelSliding(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, steps: Seq[String], windowUs: Long,
      orderCol: String = "event_id"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"duplicate step in $steps")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ts").asc, col("_eid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = events.select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsUsCol).as("_ts"), col(orderCol).as("_eid"))
      .filter(col("_t").isin(steps: _*))
    val withA1 = e.withColumn("_a1",
      max(when(col("_t") === steps.head, col("_ts"))).over(w))
    val chained = steps.indices.drop(1).foldLeft(withA1) { (df, j) =>
      // s_{j+1} on step-(j+1) rows = A_j (latest chain start among
      // shallower chains strictly before this row)
      val withS = df.withColumn(s"_s${j + 1}",
        when(col("_t") === steps(j), col(s"_a$j")))
      if (j == steps.size - 1) withS
      else withS.withColumn(s"_a${j + 1}", max(col(s"_s${j + 1}")).over(w))
    }
    val depth = greatest(
      (when(col("_t") === steps.head, 1).otherwise(0) +:
        steps.indices.drop(1).map(j =>
          when(col(s"_s${j + 1}").isNotNull &&
            col("_ts") - col(s"_s${j + 1}") <= windowUs, j + 1)
            .otherwise(0))): _*)
    chained.groupBy(col("_u"))
      .agg(max(depth).cast("int").as("step_reached"))
      .select(col("_u").as(userCol), col("step_reached"))
  }

  /** FUNNEL A/B COMPARISON — the per-step significance readout
    * ("variant B converts view→purchase better — is it real?"):
    * [[funnelSliding]] depths per user, split by `isB` (one value per
    * user — read via max over the user's rows, the
    * [[graft.analytics.Experiment.abTest]] convention), then per step
    * k the reach counts (users with depth ≥ k), the conversion rates
    * vs each variant's step-1 base, and the pooled two-proportion z on
    * that share. One row per step: (`step`, `reached_a`, `reached_b`,
    * `rate_a`, `rate_b`, `z_score`, `significant`); NULL rate/z where
    * a base is empty, exactly-0 z at zero pooled variance (step 1 —
    * both rates are 1 by construction). Users with a NULL variant
    * drop.
    *
    * Exactness: counts are exact; rates/z are the abTest fixed
    * double sequence, rounded at 6.
    *
    * Shape: the [[funnelSliding]] user window + one (variant, depth)
    * aggregate; everything after is step-grid-sized (the
    * [[funnelReport]] argument). */
  def funnelAb(events: DataFrame, userCol: String, isB: Column,
      typeCol: String, tsUsCol: String, steps: Seq[String],
      windowUs: Long, orderCol: String = "event_id"): DataFrame = {
    val session = events.sparkSession
    import session.implicits._
    val depths = funnelSliding(events, userCol, typeCol, tsUsCol,
      steps, windowUs, orderCol)
    val variants = events.filter(isB.isNotNull)
      .groupBy(col(userCol))
      .agg(max(isB.cast("boolean")).as("_b"))
    val counts = depths.join(variants, Seq(userCol))
      .groupBy(col("_b"), col("step_reached").as("_d"))
      .agg(count(lit(1)).as("_n"))
    val reach = (1 to steps.size).toDF("step")
      .join(counts, col("_d") >= col("step"), "left")
      .groupBy(col("step"))
      .agg(coalesce(sum(when(!col("_b"), col("_n"))), lit(0L))
          .as("reached_a"),
        coalesce(sum(when(col("_b"), col("_n"))), lit(0L))
          .as("reached_b"))
    val w = Window.orderBy(col("step").asc) // step-grid-sized
    def d(c: Column) = c.cast("double")
    val withBase = reach
      .withColumn("_na", first(col("reached_a")).over(w))
      .withColumn("_nb", first(col("reached_b")).over(w))
    val pool = d(col("reached_a") + col("reached_b")) /
      d(col("_na") + col("_nb"))
    val se = sqrt(pool * (lit(1.0) - pool)
      * (lit(1.0) / d(col("_na")) + lit(1.0) / d(col("_nb"))))
    withBase
      .withColumn("rate_a",
        when(col("_na") > 0, round(d(col("reached_a")) / d(col("_na")),
          6)))
      .withColumn("rate_b",
        when(col("_nb") > 0, round(d(col("reached_b")) / d(col("_nb")),
          6)))
      .withColumn("z_score",
        when(col("_na") > 0 && col("_nb") > 0, round(
          when(se > 0.0,
            (d(col("reached_b")) / d(col("_nb"))
              - d(col("reached_a")) / d(col("_na"))) / se)
            .otherwise(lit(0.0)), 6)))
      .withColumn("significant",
        when(col("z_score").isNotNull, abs(col("z_score")) >= 1.96))
      .select("step", "reached_a", "reached_b", "rate_a", "rate_b",
        "z_score", "significant")
      .orderBy(col("step"))
  }

  /** Path analysis (the user-journey / sankey query): each user's ordered
    * event-type sequence truncated to the first `maxEvents` events, with
    * the user count per distinct path — top paths reveal the dominant
    * flows the funnel queries then quantify. Paths are `'>'`-joined type
    * names ordered by (ts, orderCol). Returns (path, n_users) sorted
    * count desc, path asc.
    *
    * Scale: one per-user window (row_number prune to `maxEvents` — the
    * same user-keyed exchange+sort every sequence query here shares, and
    * WindowGroupLimit caps what the exchange carries), a per-user
    * collect bounded by `maxEvents` rows, then a map-side-combined count
    * on the path string. No unbounded per-user state. */
  def eventPaths(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, maxEvents: Int, orderCol: String = "event_id")
      : DataFrame = {
    require(maxEvents > 0, s"maxEvents must be positive, got $maxEvents")
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ts").asc, col("_eid").asc)
    val pathCol = array_join(
      transform(
        array_sort(collect_list(struct(col("_ts"), col("_eid"),
          col("_t").as("t")))),
        e => e.getField("t")),
      ">")
    events.select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsUsCol).as("_ts"), col(orderCol).as("_eid"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxEvents)
      .groupBy(col("_u")).agg(pathCol.as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
  }

  /** MULTI-TOUCH ATTRIBUTION — the marketing/channel-credit census over
    * an event log: every `convType` event is a conversion; the touches
    * credited to it are the same user's non-conversion events since the
    * user's PREVIOUS conversion (credit resets per conversion — the
    * standard model). One row per channel (touch event type) with
    * `n_first` / `n_last` (conversions whose first/last touch was this
    * channel) and `linear_x1e6` (each conversion splits 1e6 micro-units
    * equally across its touches, floor per (conversion, channel) —
    * exact integers, deterministic). Conversions with NO preceding
    * touches credit the synthetic `(direct)` channel in all three
    * columns. Touch order (and first/last ties) resolve by
    * (`tsUsCol`, `orderCol`) — orderCol must be a unique event id.
    *
    * Shape: ONE per-user window pass assigns every row to its next
    * conversion (a reverse running count — no per-user array state),
    * then (user, conversion)-keyed hash aggregates and a channel
    * rollup. Nothing holds a user's history in memory; skew is bounded
    * by events-per-(user, conversion-gap). */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, orderCol: String, convType: String): DataFrame = {
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ts").asc, col("_eid").asc)
    // conversions at-or-after each row: rows sharing a value form one
    // (touches…, conversion) group; rows after the user's last
    // conversion have 0 and drop
    val grouped = events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsUsCol).as("_ts"), col(orderCol).as("_eid"))
      .withColumn("_g", sum(when(col("_t") === convType, 1L)
          .otherwise(0L))
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("_g") >= 1)
    val touches = grouped.filter(col("_t") =!= convType)
    // per conversion: touch count + first/last channel by (ts, id)
    val perConv = touches.groupBy(col("_u"), col("_g"))
      .agg(count(lit(1)).as("_n"),
        min_by(col("_t"), struct(col("_ts"), col("_eid"))).as("_first"),
        max_by(col("_t"), struct(col("_ts"), col("_eid"))).as("_last"))
    val convs = grouped.filter(col("_t") === convType)
      .select(col("_u"), col("_g"))
      .join(perConv, Seq("_u", "_g"), "left")
    // firsts/lasts: direct conversions (no touches) credit "(direct)"
    def credit(c: Column) = coalesce(c, lit("(direct)"))
    val firsts = convs.groupBy(credit(col("_first")).as("channel"))
      .agg(count(lit(1)).as("n_first"))
    val lasts = convs.groupBy(credit(col("_last")).as("channel"))
      .agg(count(lit(1)).as("n_last"))
    // linear: channel's share of each conversion = cnt/n in floor
    // micro-units; direct conversions carry the full 1e6
    val linTouch = touches.groupBy(col("_u"), col("_g"),
        col("_t").as("channel"))
      .agg(count(lit(1)).as("_cnt"))
      .join(perConv.select(col("_u"), col("_g"), col("_n")),
        Seq("_u", "_g"))
      .select(col("channel"),
        graft.ops.Fixed.ldiv(col("_cnt") * lit(1000000L), col("_n"))
          .as("_m"))
    val linDirect = convs.filter(col("_n").isNull)
      .select(lit("(direct)").as("channel"), lit(1000000L).as("_m"))
    val linear = linTouch.unionByName(linDirect)
      .groupBy(col("channel"))
      .agg(sum(col("_m")).as("linear_x1e6"))
    firsts.join(lasts, Seq("channel"), "full_outer")
      .join(linear, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        coalesce(col("linear_x1e6"), lit(0L)).as("linear_x1e6"))
  }

  /** Event TRANSITION MATRIX — the Markov-chain / sankey backend of
    * sequence analytics: for every ordered (from → to) pair of
    * consecutive events within a user's timeline, the transition count
    * and probability P(to | from) = n(from,to) / Σ_to' n(from,to') in
    * exact ×10⁶ fixed point. The per-user ordering ties break on
    * `orderCol` (a unique event id) so consecutive-pair formation is
    * deterministic; transitions never cross users. One per-user window
    * pass (lead) + one (from, to) hash aggregate + a ≤|event types|-row
    * broadcast of the per-from totals. */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ts").asc, col("_eid").asc)
    val pairs = events
      .select(col(userCol).as("_u"), col(typeCol).as("from_type"),
        col(tsUsCol).as("_ts"), col(orderCol).as("_eid"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = broadcast(pairs.groupBy(col("from_type").as("_f"))
      .agg(sum(col("n")).as("_ft")))
    // <=> so a NULL from event type (groupBy keeps the NULL group)
    // isn't silently dropped by a null-unsafe equality here
    pairs.join(fromTotals, col("from_type") <=> col("_f"))
      .select(col("from_type"), col("to_type"), col("n"),
        graft.ops.Fixed.ldiv(col("n") * lit(1000000L), col("_ft"))
          .as("p_x1e6"))
  }

  /** Cohort LTV CURVE — the revenue companion of [[retention]]: users
    * cohorted by the period of their FIRST event; for each (cohort,
    * offset k) the period's revenue, the cohort's CUMULATIVE revenue
    * through k, and cumulative revenue per cohort member (the
    * lifetime-value curve payback analyses read off). All monetary
    * figures are exact integer micro-units (per-event `floor(v·1e6)`,
    * long sums, floor division for the per-user figure); NULL, NaN and
    * ±Infinity values still define cohorts but contribute no revenue.
    * Offsets
    * with zero activity emit no row (sparse form — the cumulative
    * column jumps across gaps).
    *
    * Shape: one (cohort derivation) user aggregate + one (cohort, k)
    * revenue aggregate + a per-cohort running-sum window over ≤
    * #periods rows per cohort (k-sized, never data-sized) + a
    * broadcast cohort-size join. */
  def ltvCurve(events: DataFrame, userCol: String, tsUsCol: String,
      valueCol: String, periodUs: Long): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    // floor division, not DIV: a pre-1970 (negative-µs) timestamp must
    // land in the period CONTAINING it, not one later. NOTE DuckDB's //
    // ALSO truncates (see Fixed.ldiv's oracle-parity note): an oracle
    // over negative timestamps needs the explicit floor CASE — the
    // declared oracles run on post-1970 data where // and floor agree
    val period = graft.ops.Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val cohorts = events.groupBy(col(userCol).as("_u"))
      .agg(min(period).as("cohort_period"))
    val sizes = cohorts.groupBy(col("cohort_period"))
      .agg(count(lit(1)).as("cohort_size"))
    // non-finite revenue maps to NULL (contributes nothing): floor(NaN)
    // silently becomes 0 in the long cast, which would book phantom
    // zero-revenue rows an external engine errors on instead
    val vd = col(valueCol).cast("double")
    val fin = when(!isnan(vd) && abs(vd) =!= lit(Double.PositiveInfinity), vd)
    val rev = events
      .select(col(userCol).as("_u"), period.as("_p"),
        floor(fin * lit(1e6)).as("_m"))
      .join(cohorts, Seq("_u"))
      .groupBy(col("cohort_period"),
        (col("_p") - col("cohort_period")).as("k"))
      .agg(coalesce(sum(col("_m")), lit(0L)).as("revenue_x1e6"))
    val w = Window.partitionBy(col("cohort_period")).orderBy(col("k").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("cum_revenue_x1e6", sum(col("revenue_x1e6")).over(w))
      .join(broadcast(sizes), Seq("cohort_period"))
      .withColumn("ltv_per_user_x1e6",
        graft.ops.Fixed.ldiv(col("cum_revenue_x1e6"), col("cohort_size")))
      .select(col("cohort_period"), col("k"), col("revenue_x1e6"),
        col("cum_revenue_x1e6"), col("cohort_size"),
        col("ltv_per_user_x1e6"))
  }

  /** Cohort retention matrix: users cohorted by the period of their FIRST
    * event; for each (cohort, offset k) the count and fraction of the
    * cohort active k periods later. Periods are exact integer µs buckets
    * (floor division via [[graft.ops.Fixed.ldiv]] — the period
    * CONTAINING the timestamp even pre-1970; an external engine
    * replays negative boundaries with the explicit floor CASE in
    * [[graft.ops.Fixed.ldiv]]'s oracle-parity note, since DuckDB's
    * `//` truncates; no double division).
    * Returns (cohort_period, k, n_active, cohort_size, retention);
    * k = 0 rows carry retention 1.0 by construction.
    *
    * Scale: two aggregates over the event log — per-user first-ts (the
    * cohort table, one row per user) and distinct (user, period) — joined
    * user-keyed, then a (cohort, k) count. Both exchanges are map-side
    * combined; the cohort-size join is a (cohort)-keyed broadcast
    * (one row per period). Nothing holds per-user history. */
  def retention(events: DataFrame, userCol: String, tsUsCol: String,
      periodUs: Long): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    // floor division for negative-µs timestamps — see ltvCurve above
    val period = graft.ops.Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val cohorts = events.groupBy(col(userCol).as("_u"))
      .agg(min(period).as("cohort_period"))
    val active = events
      .select(col(userCol).as("_u"), period.as("_p")).distinct()
    val sizes = cohorts.groupBy(col("cohort_period"))
      .agg(count(lit(1)).as("cohort_size"))
    active.join(cohorts, Seq("_u"))
      .groupBy(col("cohort_period"),
        (col("_p") - col("cohort_period")).as("k"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_period"))
      .withColumn("retention",
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6))
  }

  /** RFM SEGMENTATION — the classic marketing mart over an event log:
    * per user, Recency (last-activity timestamp), Frequency (event
    * count) and Monetary (exact micro-unit spend), each ranked across
    * ALL users and bucketed into `quantiles` scores (best = `quantiles`,
    * worst = 1), plus the composite `rfm` code (r·100 + f·10 + m at the
    * default 5). One row per user.
    *
    * Bucketing is DEFINED as score = q − ⌊q·(rank−1)/n⌋ over the
    * 1-based global rank (DESC on each metric, `user id` tie-break —
    * a reproducible total order), so every output is an exact integer
    * an external engine replays; this is rank-arithmetic ntile, chosen
    * over ntile() because the latter's remainder-spreading ties scores
    * to partition counts.
    *
    * Shape: one user aggregate, then THREE skew-safe global ranks
    * ([[graft.ops.Rank.globalRank]] — range exchange + broadcast
    * offsets each; a data-sized user table must never ride a
    * partition-less ntile window), one broadcast total. NaN/±Inf spend
    * contributes nothing to monetary (NULL-summed, coalesced to 0). */
  def rfm(events: DataFrame, userCol: String, tsUsCol: String,
      valueCol: String, quantiles: Int = 5): DataFrame = {
    require(quantiles >= 2 && quantiles <= 9,
      s"quantiles must be in [2, 9] (single-digit codes), got $quantiles")
    val v = col(s"`$valueCol`").cast("double")
    val fin = when(!isnan(v) && abs(v) =!= lit(Double.PositiveInfinity), v)
    val users = events.groupBy(col(userCol).as("user_id"))
      .agg(max(expr(tsUsCol)).as("recency_ts"),
        count(lit(1)).as("frequency"),
        coalesce(sum(floor(fin * lit(1e6))), lit(0L)).as("monetary_x1e6"))
    val tot = broadcast(users.agg(count(lit(1)).as("_n")))
    val ranked = graft.ops.Rank.globalRank(
      graft.ops.Rank.globalRank(
        graft.ops.Rank.globalRank(users,
          Seq(col("recency_ts").desc, col("user_id").asc), "_rr"),
        Seq(col("frequency").desc, col("user_id").asc), "_rf"),
      Seq(col("monetary_x1e6").desc, col("user_id").asc), "_rm")
    def score(rank: String) = lit(quantiles.toLong) - graft.ops.Fixed.ldiv(
      lit(quantiles.toLong) * (col(rank) - lit(1L)), col("_n"))
    ranked.crossJoin(tot)
      .select(col("user_id"), col("recency_ts"), col("frequency"),
        col("monetary_x1e6"),
        score("_rr").as("r"), score("_rf").as("f"), score("_rm").as("m"))
      .withColumn("rfm",
        col("r") * lit(100L) + col("f") * lit(10L) + col("m"))
  }

  /** DAU/MAU STICKINESS — the engagement-intensity ratio beside
    * [[retention]]'s cohort matrix (retention asks "did they come
    * back"; stickiness asks "how much of the month are they here" —
    * the product-analytics number boards quote): per month,
    * `mau` (distinct users), `n_days` (distinct ACTIVE days — days
    * with zero events carry no DAU row and are deliberately not
    * zero-filled; use the gap-fill ops upstream to densify first if
    * calendar days are wanted), `avg_dau_x1e6 = ⌊10⁶·Σ_day DAU/n_days⌋`
    * and `stickiness_x1e6 = ⌊10⁶·Σ_day DAU/(n_days·mau)⌋` (= avg
    * DAU/MAU). All exact integers. Months key as `epoch_day // 30`
    * (fixed 30-day windows — calendar-month boundaries are a
    * locale/timezone choice this operator deliberately avoids; the
    * day spine is `ts_us // periodUs`).
    *
    * Shape: one (window, day, user) distinct aggregate, one
    * (window, day) DAU aggregate, one (window, user) distinct for
    * MAU, and a window-keyed reduction — all hash aggregates,
    * map-side combined. Rows win-asc. */
  def stickiness(events: DataFrame, userCol: String, tsUsCol: String,
      periodUs: Long = 86400000000L, daysPerWindow: Int = 30)
      : DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(daysPerWindow >= 2,
      s"daysPerWindow must be >= 2, got $daysPerWindow")
    val day = graft.ops.Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val base = events.filter(col(userCol).isNotNull)
      .select(col(userCol).as("_u"), day.as("_d"))
      .withColumn("_w",
        graft.ops.Fixed.ldiv(col("_d"), lit(daysPerWindow.toLong)))
    val dau = base.select(col("_w"), col("_d"), col("_u")).distinct()
      .groupBy(col("_w"), col("_d")).agg(count(lit(1)).as("_dau"))
      .groupBy(col("_w"))
      .agg(count(lit(1)).as("n_days"), sum(col("_dau")).as("_sdau"))
    val mau = base.select(col("_w"), col("_u")).distinct()
      .groupBy(col("_w")).agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("_w"))
      .select(col("_w").as("win"), col("mau"), col("n_days"),
        graft.ops.Fixed.ldiv(col("_sdau") * lit(1000000L),
          col("n_days")).as("avg_dau_x1e6"),
        graft.ops.Fixed.ldiv(col("_sdau") * lit(1000000L),
          col("n_days") * col("mau")).as("stickiness_x1e6"))
  }

  /** NELSON–AALEN cumulative hazard over user lifetimes — the
    * hazard-space twin of [[kaplanMeier]] (KM multiplies survival
    * fractions; NA SUMS per-step hazards d/n — the estimator of choice
    * when hazards are the modeling target and the building block of
    * exp(−H) ≈ S): same lifetime/censoring construction, one row per
    * distinct duration with (`duration`, `n_risk`, `n_event`,
    * `n_censored`, `hazard_step_x1e6 = ⌊10⁶·n_event/n_risk⌋`,
    * `cumhaz_x1e6` = the running integer sum).
    *
    * Exactness: each step's hazard is an exact floored micro integer
    * ([[graft.ops.Fixed.ldiv]]) and the cumulative is an INTEGER sum —
    * unlike KM's floor-product recurrence this is order-free and needs
    * no driver chain at all: n_risk = N − (prior events + censored)
    * comes from an exclusive running sum over the duration grid, and
    * the whole estimator is declarative (two aggregates + grid-sized
    * windows — the duration grid is observation-window-bounded,
    * sf-independent, so the partition-less window is the step/bucket
    * grid pattern, not the global-window trap). */
  def nelsonAalen(events: DataFrame, userCol: String, tsUsCol: String,
      periodUs: Long): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val period = graft.ops.Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val lives = events.groupBy(col(userCol).as("_u"))
      .agg(min(period).as("_fp"), max(period).as("_lp"))
    val mx = broadcast(lives.agg(max(col("_lp")).as("_endp")))
    val durs = lives.crossJoin(mx)
      .select((col("_lp") - col("_fp")).as("duration"),
        when(col("_lp") < col("_endp"), 1L).otherwise(0L).as("_e"))
      .groupBy(col("duration"))
      .agg(sum(col("_e")).as("n_event"),
        sum(lit(1L) - col("_e")).as("n_censored"))
    val tot = broadcast(durs.agg(
      coalesce(sum(col("n_event") + col("n_censored")), lit(0L))
        .as("_total")))
    val wPrev = Window.orderBy(col("duration").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("duration").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    durs.crossJoin(tot)
      .withColumn("n_risk", col("_total") - coalesce(
        sum(col("n_event") + col("n_censored")).over(wPrev), lit(0L)))
      .withColumn("hazard_step_x1e6",
        graft.ops.Fixed.ldiv(lit(1000000L) * col("n_event"),
          col("n_risk")))
      .withColumn("cumhaz_x1e6",
        sum(col("hazard_step_x1e6")).over(wCum))
      .select(col("duration"), col("n_risk"), col("n_event"),
        col("n_censored"), col("hazard_step_x1e6"), col("cumhaz_x1e6"))
  }

  /** KAPLAN–MEIER survival curve over user lifetimes — the censoring-
    * aware churn companion to [[retention]]: retention answers "what
    * fraction of a cohort is active at k", KM answers "what fraction
    * SURVIVES past duration d" without biasing against users whose
    * lifetime the log truncates. Lifetime = periods between a user's
    * first and last activity; a user whose last activity falls in the
    * log's final observed period is RIGHT-CENSORED (still alive at the
    * boundary — their survival is unknown past it), everyone else is an
    * observed churn event. One row per distinct lifetime d, ordered:
    * (`duration`, `n_risk`, `n_event`, `n_censored`, `surv_x1e6`) with
    * the product-limit estimate S(d) = Π_{d' ≤ d} (n_risk − n_event)/
    * n_risk over EVENT steps (censored-only steps leave S unchanged —
    * the floor recurrence is exact there since n·S/n = S).
    *
    * Exactness: S is DEFINED as the integer micro recurrence
    * s ← ⌊s·(n_risk − n_event)/n_risk⌋ from s = 10⁶ — each step floors,
    * so both engines replay it bit-for-bit (an external engine uses a
    * recursive CTE); the true rational product is within
    * #event-steps·1e-6 below.
    *
    * Shape: lifetimes are one user-keyed aggregate, the KM table one
    * duration-keyed aggregate (both map-side combined; the log-end
    * scalar broadcasts); n_risk and the product chain then run on the
    * DRIVER over the duration grid — bounded by the observation window
    * in periods (sf-INDEPENDENT, e.g. days in a year), not by data
    * size, and guarded by a loud `maxSteps` cap. The recurrence is
    * order-dependent and non-associative under flooring, so it cannot
    * ride a parallel prefix; the grid bound is what makes the driver
    * chain legitimate. */
  def kaplanMeier(events: DataFrame, userCol: String, tsUsCol: String,
      periodUs: Long, maxSteps: Int = 10000): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val spark = events.sparkSession
    import spark.implicits._
    val period = graft.ops.Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    val lives = events.groupBy(col(userCol).as("_u"))
      .agg(min(period).as("_fp"), max(period).as("_lp"))
    val mx = broadcast(lives.agg(max(col("_lp")).as("_endp")))
    val durs = lives.crossJoin(mx)
      .select((col("_lp") - col("_fp")).as("duration"),
        when(col("_lp") < col("_endp"), 1L).otherwise(0L).as("_e"))
      .groupBy(col("duration"))
      .agg(sum(col("_e")).as("n_event"),
        sum(lit(1L) - col("_e")).as("n_censored"))
      .orderBy(col("duration"))
    val steps = durs.collect()
    require(steps.length <= maxSteps,
      s"Kaplan-Meier grid has ${steps.length} steps > maxSteps=$maxSteps" +
        " - coarsen periodUs or raise the cap (the driver chain is " +
        "grid-sized by design)")
    var atRisk = steps.iterator.map(r => r.getLong(1) + r.getLong(2)).sum
    var s = BigInt(1000000L)
    val out = steps.map { r =>
      val (d, e, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val n = atRisk
      s = s * BigInt(n - e) / BigInt(n)
      atRisk -= e + c
      (d, n, e, c, s.toLong)
    }
    out.toSeq
      .toDF("duration", "n_risk", "n_event", "n_censored", "surv_x1e6")
  }

  /** LOG-RANK TEST — the two-group survival comparison that completes
    * [[kaplanMeier]] ("do variant B's users churn faster?"): lifetimes
    * and right-censoring are derived exactly as in [[kaplanMeier]]
    * (first→last active period per user; users alive at the
    * observation horizon are censored), split into groups by `isB`
    * (one value per user — the [[graft.analytics.Experiment.abTest]]
    * grouping convention). At each distinct duration t with d_t total
    * events and n_t/n_At at risk,
    *   E_At = d_t·n_At/n_t,   V_t = d_t·(n_At/n_t)·(n_Bt/n_t)·
    *   (n_t−d_t)/(n_t−1) (0 at n_t = 1),
    * and z = Σ(d_At − E_At)/√(ΣV_t) — |z| ≥ 1.96 ⇒ the survival
    * curves differ at p < .05. ONE row: (`n_a`, `n_b`, `events_a`,
    * `events_b`, `o_minus_e_a_x1e6`, `var_x1e6`, `z_x1e6`); z NULL
    * when the variance is 0 (one group empty, or no events).
    *
    * Exactness: per-step E and V floor ONCE to micros (BigInt
    * products — no overflow at any n), the sums are exact integer
    * micros, and z is one IEEE divide/√/divide chain on those
    * integers (the Mann–Kendall discipline) — an external engine
    * replays every bit.
    *
    * Shape: the per-user lifetime aggregate is the data-sized work;
    * the duration grid is calendar-bounded and the accumulation is a
    * [[kaplanMeier]]-style driver chain with the same LOUD `maxSteps`
    * cap. */
  def logRank(events: DataFrame, userCol: String, isB: Column,
      tsUsCol: String, periodUs: Long, maxSteps: Int = 10000)
      : DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val spark = events.sparkSession
    import spark.implicits._
    val period = graft.ops.Fixed.ldiv(expr(tsUsCol), lit(periodUs))
    // one variant per user via max over the user's rows (the abTest /
    // funnelAb convention) — grouping BY the per-row isB would split a
    // mixed-variant user into two phantom lifetimes
    val lives = events.filter(isB.isNotNull)
      .groupBy(col(userCol).as("_u"))
      .agg(max(isB.cast("boolean")).as("_b"),
        min(period).as("_fp"), max(period).as("_lp"))
    val mx = broadcast(lives.agg(max(col("_lp")).as("_endp")))
    val durs = lives.crossJoin(mx)
      .select(col("_b"), (col("_lp") - col("_fp")).as("duration"),
        when(col("_lp") < col("_endp"), 1L).otherwise(0L).as("_e"))
      .groupBy(col("duration"))
      .agg(sum(when(!col("_b"), col("_e"))).as("da"),
        sum(when(!col("_b"), lit(1L) - col("_e"))).as("ca"),
        sum(when(col("_b"), col("_e"))).as("db"),
        sum(when(col("_b"), lit(1L) - col("_e"))).as("cb"))
      .orderBy(col("duration"))
    val steps = durs.collect()
    require(steps.length <= maxSteps,
      s"log-rank grid has ${steps.length} steps > maxSteps=$maxSteps" +
        " - coarsen periodUs or raise the cap (the driver chain is " +
        "grid-sized by design)")
    def g(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else r.getLong(i)
    var nA = steps.iterator.map(r => g(r, 1) + g(r, 2)).sum
    var nB = steps.iterator.map(r => g(r, 3) + g(r, 4)).sum
    val (totA, totB) = (nA, nB)
    var (evA, evB) = (0L, 0L)
    val M = BigInt(1000000L)
    var oe = BigInt(0) // Σ(d_At·10⁶ − ⌊E_At·10⁶⌋), exact micros
    var vv = BigInt(0) // Σ⌊V_t·10⁶⌋
    steps.foreach { r =>
      val (da, ca, db, cb) = (g(r, 1), g(r, 2), g(r, 3), g(r, 4))
      val (n, d) = (nA + nB, da + db)
      if (d > 0 && n > 0) {
        oe += BigInt(da) * M - BigInt(d) * BigInt(nA) * M / BigInt(n)
        if (n > 1)
          vv += BigInt(d) * BigInt(nA) * BigInt(nB) * BigInt(n - d) * M /
            (BigInt(n) * BigInt(n) * BigInt(n - 1))
      }
      evA += da; evB += db
      nA -= da + ca; nB -= db + cb
    }
    val oeL = oe.bigInteger.longValueExact()
    val vvL = vv.bigInteger.longValueExact()
    val z: java.lang.Long =
      if (vvL > 0L)
        java.lang.Long.valueOf(math.floor(
          (oeL / 1e6) / math.sqrt(vvL / 1e6) * 1e6).toLong)
      else null
    Seq((totA, totB, evA, evB, oeL, vvL, Option(z).map(_.longValue())))
      .toDF("n_a", "n_b", "events_a", "events_b", "o_minus_e_a_x1e6",
        "var_x1e6", "z_x1e6")
  }

  /** CONCURRENCY CURVE — peak simultaneous activity per period, the
    * capacity-planning readout ("how many sessions at once?"): each
    * event opens a half-open session [t, t+`durationUs`); the active
    * count is the running sum of +1/−1 boundary deltas ordered by
    * (time, delta) — ends apply BEFORE starts at the same instant, the
    * half-open convention — and each period reports its event count
    * and the maximum active value seen at any boundary inside it,
    * INCLUDING the carry-in level (the running value just before each
    * point, `active − δ`, covers the sessions spanning the period
    * boundary). One row per period with ≥1 boundary: (`period`,
    * `n_starts`, `max_concurrent`), ordered. Exact integers.
    *
    * Tie invariance: boundaries tied on (t, δ) carry identical deltas,
    * so the SET of running values across a tie block — and therefore
    * the per-period max — is order-independent; the cross-engine
    * contract needs no further tie-breaker.
    *
    * Shape: the global running sum rides the skew-safe
    * [[graft.ops.PrefixSum]] range-exchange machinery (never a
    * single-task window); the per-period max is one hash aggregate. */
  def concurrency(events: DataFrame, tsUsCol: String, durationUs: Long,
      periodUs: Long): DataFrame = {
    require(durationUs > 0, s"durationUs must be positive, got $durationUs")
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val t = expr(tsUsCol)
    val pts = events.select(t.as("_t"), lit(1L).as("_d"))
      .unionByName(events.select((t + lit(durationUs)).as("_t"),
        lit(-1L).as("_d")))
    val run = graft.ops.PrefixSum.runningSums(pts,
      Seq(col("_t").asc, col("_d").asc), Seq("_d" -> "_active"))
    run
      .groupBy(graft.ops.Fixed.ldiv(col("_t"), lit(periodUs))
        .as("period"))
      .agg(sum(when(col("_d") === 1L, 1L).otherwise(0L)).as("n_starts"),
        max(greatest(col("_active"), col("_active") - col("_d")))
          .as("max_concurrent"))
      .orderBy(col("period"))
  }

  /** MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2016's
    * data-driven model) — the principled successor to
    * [[attribution]]'s positional rules: build the first-order Markov
    * chain over user journeys (`__start` → touches → `__conv` /
    * `__null`, journeys cut at each conversion exactly like
    * [[attribution]]'s reverse running count, the trailing
    * non-converting suffix ending in `__null`), then credit each
    * channel by how much the chain's conversion probability DROPS when
    * the channel is removed (its inbound transitions redirect to
    * `__null`, its outbound drop).
    *
    * Exactness: absorption probabilities come from `iters` rounds of
    * the integer fixed-point recurrence
    * `p(s) ← ⌊Σ_t cnt(s→t)·p(t) / out(s)⌋` with `p(__conv)` pinned at
    * 10⁶ — transition counts are integers, so the whole trajectory,
    * the removal effects `max(0, 10⁶ − ⌊p_removed·10⁶ / p_base⌋)`, and
    * the normalized shares are engine-replayable (the oracle unrolls
    * the same recurrence per variant). All quantities non-negative, so
    * floor = truncation on both sides.
    *
    * Shape: one per-user window pass + one (from, to) aggregate to the
    * ≤|event types|² transition matrix; the per-variant iteration runs
    * on the driver over that category-space-bounded table (the kappa /
    * calendar-grid driver-chain posture — never data-sized). Returns
    * one row per channel: (`channel`, `removal_x1e6`, `share_x1e6`),
    * NULLs when the base chain never converts (or no channel has any
    * effect, for the share). */
  def markovAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsUsCol: String, orderCol: String,
      convType: String, iters: Int = 12,
      maxTransitions: Int = 1000000): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(maxTransitions >= 1,
      s"maxTransitions must be >= 1, got $maxTransitions")
    val Start = "__start"; val Conv = "__conv"; val Nul = "__null"
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ts").asc, col("_eid").asc)
    val grouped = events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsUsCol).as("_ts"), col(orderCol).as("_eid"))
      .withColumn("_g", sum(when(col("_t") === convType, 1L)
          .otherwise(0L))
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    val touches = grouped.filter(col("_t") =!= convType)
    val wg = Window.partitionBy(col("_u"), col("_g"))
      .orderBy(col("_ts").asc, col("_eid").asc)
    val pairT = touches
      .select(coalesce(lag(col("_t"), 1).over(wg), lit(Start)).as("_f"),
        col("_t").as("_to"))
    val lastTouch = touches.groupBy(col("_u"), col("_g"))
      .agg(max_by(col("_t"), struct(col("_ts"), col("_eid")))
        .as("_lt"))
    val term = grouped.select(col("_u"), col("_g")).distinct()
      .join(lastTouch, Seq("_u", "_g"), "left")
      .select(coalesce(col("_lt"), lit(Start)).as("_f"),
        when(col("_g") >= 1, lit(Conv)).otherwise(lit(Nul)).as("_to"))
    // loud cap (explicit form of the category²-bound this chain always
    // assumed): a data-sized typeCol would make the matrix data-sized —
    // pull at most cap+1 rows, never an unbounded driver materialize
    val trans = pairT.unionByName(term)
      .groupBy(col("_f"), col("_to")).agg(count(lit(1)).as("_c"))
      .limit(maxTransitions + 1)
      .as[(String, String, Long)].collect()
    require(trans.length <= maxTransitions,
      s"markovAttribution: > $maxTransitions distinct (from, to) " +
        "transitions - the driver matrix is channel-vocabulary-sized " +
        "by design; bucket the event-type column into a bounded channel " +
        "catalog or raise maxTransitions")
    val channels = trans.iterator
      .flatMap(r => Iterator(r._1, r._2))
      .filterNot(Set(Start, Conv, Nul)).toSeq.distinct.sorted
    // p(__start) in micros after `iters` rounds, with `removed`'s
    // inbound redirected to __null and its outbound dropped
    def absorb(removed: Option[String]): BigInt = {
      val eff = trans.iterator
        .filterNot(r => removed.contains(r._1))
        .map(r => (r._1,
          if (removed.contains(r._2)) Nul else r._2) -> BigInt(r._3))
        .toSeq.groupMapReduce(_._1)(_._2)(_ + _)
      val out = eff.groupMapReduce(_._1._1)(_._2)(_ + _)
      var p = Map[String, BigInt](Conv -> BigInt(1000000))
      var it = 0
      while (it < iters) {
        p = out.keysIterator.map { s =>
          val num = eff.iterator.collect {
            case ((`s`, t), c) => c * p.getOrElse(t, BigInt(0))
          }.sum
          s -> num / out(s)
        }.toMap.updated(Conv, BigInt(1000000))
        it += 1
      }
      p.getOrElse(Start, BigInt(0))
    }
    val base = absorb(None)
    val removals = channels.map { c =>
      val re: Option[Long] = if (base == 0) None else {
        val r = BigInt(1000000) - absorb(Some(c)) * 1000000 / base
        Some(r.max(BigInt(0)).toLong)
      }
      (c, re)
    }
    val sre = removals.flatMap(_._2).sum
    removals.map { case (c, re) =>
      (c, re, re.flatMap(r =>
        if (sre > 0) Some((BigInt(r) * 1000000 / sre).toLong) else None))
    }.toDF("channel", "removal_x1e6", "share_x1e6")
  }
}
