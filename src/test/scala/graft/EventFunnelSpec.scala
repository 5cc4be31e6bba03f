package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventFunnel

/** Hand-computed ground truth for the sequence-analytics operators
  * ([[EventFunnel]]) — the declared queries `q_funnel`/`q_retention` are
  * additionally DuckDB-oracle-checked at sf0.01.
  */
class EventFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val steps = Seq("A", "B", "C")

  private def funnelOf(rows: Seq[(Long, String, Long)]) =
    EventFunnel.funnel(rows.toDF("user_id", "event_type", "ts_us"),
        "user_id", "event_type", "ts_us", steps, windowUs = 100L)
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("funnel: ordered completion, order violations, window cutoff, " +
    "strict-after ties, no-step-1 users") {
    val out = funnelOf(Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L), // full funnel
      (2L, "A", 10L), (2L, "C", 5L), // C BEFORE A: order matters
      (3L, "B", 10L), (3L, "C", 20L), // no step-1 event at all
      (4L, "A", 10L), (4L, "B", 200L), // B outside the 100-unit window
      (5L, "A", 10L), (5L, "B", 10L), // tie is not strictly after
      (6L, "A", 10L), (6L, "B", 11L), (6L, "C", 111L) // C misses by 1
    ))
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
    assert(out(2L) == ((Some(10L), None, None, 1)))
    assert(out(3L) == ((None, None, None, 0)))
    assert(out(4L) == ((Some(10L), None, None, 1)))
    assert(out(5L) == ((Some(10L), None, None, 1)))
    assert(out(6L) == ((Some(10L), Some(11L), None, 2)))
    assert(out.size == 6)
  }

  test("funnel: earliest event wins each step; window anchors on the " +
    "FIRST step-1 event (first-touch), not the best one") {
    val out = funnelOf(Seq(
      // two As: t1 = 10; B at 150 is outside 10+100 even though the
      // A at 100 would have admitted it — first-touch semantics
      (8L, "A", 10L), (8L, "A", 100L), (8L, "B", 150L),
      // earliest qualifying B (20) anchors C's strict-after bound, so
      // C@25 completes even though a later B (90) also fits the window
      (9L, "A", 10L), (9L, "B", 20L), (9L, "B", 90L), (9L, "C", 25L)
    ))
    assert(out(8L) == ((Some(10L), None, None, 1)))
    assert(out(9L) == ((Some(10L), Some(20L), Some(25L), 3)))
  }

  test("funnel: events not in the step list are ignored; arg validation") {
    val out = EventFunnel.funnel(
      Seq((1L, "A", 10L), (1L, "X", 15L), (1L, "B", 20L))
        .toDF("user_id", "event_type", "ts_us"),
      "user_id", "event_type", "ts_us", Seq("A", "B"), windowUs = 100L)
      .as[(Long, Option[Long], Option[Long], Int)].collect()
    assert(out.toSeq == Seq((1L, Some(10L), Some(20L), 2)))
    assertThrows[IllegalArgumentException](EventFunnel.funnel(
      Seq((1L, "A", 1L)).toDF("user_id", "event_type", "ts_us"),
      "user_id", "event_type", "ts_us", Seq("A"), 100L))
    assertThrows[IllegalArgumentException](EventFunnel.funnel(
      Seq((1L, "A", 1L)).toDF("user_id", "event_type", "ts_us"),
      "user_id", "event_type", "ts_us", Seq("A", "A"), 100L))
    assertThrows[IllegalArgumentException](EventFunnel.funnel(
      Seq((1L, "A", 1L)).toDF("user_id", "event_type", "ts_us"),
      "user_id", "event_type", "ts_us", Seq("A", "B"), 0L))
  }

  private def slidingOf(rows: Seq[(Long, String, Long)]) =
    EventFunnel.funnelSliding(
        rows.zipWithIndex.map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
          .toDF("user_id", "event_type", "ts_us", "event_id"),
        "user_id", "event_type", "ts_us", steps, windowUs = 100L)
      .as[(Long, Int)].collect().toMap

  test("funnelSliding: ANY anchor can complete the chain (the first-touch " +
    "counterexample); maximal-anchor recurrence is exact") {
    val rows = Seq(
      // first-touch rejects B@150 (150-10 > 100); the second A@100
      // anchors it here -> depth 2
      (8L, "A", 10L), (8L, "A", 100L), (8L, "B", 150L),
      // chain must use the LATEST viable anchor per step: A@10 B@20
      // C@115 fails from anchor 10 (105 > 100) but A@50 B@60 C@115
      // completes -> depth 3
      (9L, "A", 10L), (9L, "B", 20L), (9L, "A", 50L), (9L, "B", 60L),
      (9L, "C", 115L),
      // order still matters: C before any B stays depth 2
      (10L, "A", 10L), (10L, "C", 20L), (10L, "B", 30L),
      // no step-1 event at all -> depth 0
      (11L, "B", 10L), (11L, "C", 20L)
    )
    val out = slidingOf(rows)
    assert(out(8L) == 2)
    assert(out(9L) == 3)
    assert(out(10L) == 2)
    assert(out(11L) == 0)
  }

  test("funnelSliding dominates the first-touch funnel on real events " +
    "and agrees when a single anchor exists") {
    val rows = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "A", 10L), (2L, "C", 5L),
      (4L, "A", 10L), (4L, "B", 200L),
      (6L, "A", 10L), (6L, "B", 11L), (6L, "C", 111L))
    val ft = funnelOf(rows).view.mapValues(_._4).toMap
    val sl = slidingOf(rows)
    // single-anchor users: identical depths
    assert(sl == ft)
  }

  test("funnelReport: at-least-depth counts, conversion rates, zero-" +
    "denominator NULLs, absent depths count zero") {
    // depths: two users at 3, one at 2, one at 0 -> reach 3/3/2... wait:
    // reached(s) counts step_reached >= s, so (0,2,3,3) gives 3,3,2
    val f = Seq((1L, 3), (2L, 3), (3L, 2), (4L, 0))
      .toDF("user_id", "step_reached")
    val out = EventFunnel.funnelReport(f, nSteps = 3)
      .as[(Int, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, 3L, Some(1.0), Some(1.0)),
      (2, 3L, Some(1.0), Some(1.0)),
      (3, 2L, Some(0.666667), Some(0.666667))))
    // nobody past step 1 -> steps 2..3 read zero with rate 0 from step 1
    // and NULL step-over-step past the first zero (0/0)
    val cold = Seq((1L, 1)).toDF("user_id", "step_reached")
    val c = EventFunnel.funnelReport(cold, nSteps = 3)
      .as[(Int, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(c == Seq(
      (1, 1L, Some(1.0), Some(1.0)),
      (2, 0L, Some(0.0), Some(0.0)),
      (3, 0L, Some(0.0), None))) // step-over-step 0/0 -> NULL
    assertThrows[IllegalArgumentException](
      EventFunnel.funnelReport(f, nSteps = 1))
  }

  test("eventPaths: ordered truncated journeys with per-path user " +
    "counts; order by (ts, orderCol) not input order") {
    val df = Seq(
      // user 1: out-of-order input rows, path must follow ts
      (1L, "C", 30L, 0L), (1L, "A", 10L, 1L), (1L, "B", 20L, 2L),
      // user 2: same path as 1
      (2L, "A", 5L, 3L), (2L, "B", 6L, 4L), (2L, "C", 7L, 5L),
      // user 3: truncation to first 3 of 4 events
      (3L, "A", 1L, 6L), (3L, "A", 2L, 7L), (3L, "B", 3L, 8L),
      (3L, "C", 4L, 9L),
      // user 4: same-ts tie broken by orderCol
      (4L, "B", 1L, 11L), (4L, "A", 1L, 10L)
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val out = EventFunnel.eventPaths(df, "user_id", "event_type", "ts_us",
        maxEvents = 3)
      .as[(String, Long)].collect().toMap
    assert(out == Map("A>B>C" -> 2L, "A>A>B" -> 1L, "A>B" -> 1L))
    assertThrows[IllegalArgumentException](EventFunnel.eventPaths(
      df, "user_id", "event_type", "ts_us", maxEvents = 0))
  }

  test("retention: cohort by first-event period, k offsets, exact " +
    "integer buckets, retention fraction of cohort size") {
    val df = Seq(
      (1L, 10L), (1L, 250L), // cohort 0, active periods {0, 2}
      (2L, 120L), (2L, 130L), // cohort 1, active {1} (distinct collapses)
      (3L, 50L), (3L, 150L) // cohort 0, active {0, 1}
    ).toDF("user_id", "ts_us")
    val out = EventFunnel.retention(df, "user_id", "ts_us", periodUs = 100L)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // cohort 0 has 2 users: both active at k=0, one at k=1, one at k=2
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(out((0L, 1L)) == ((1L, 2L, 0.5)))
    assert(out((0L, 2L)) == ((1L, 2L, 0.5)))
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)))
    assert(out.size == 4)
    assertThrows[IllegalArgumentException](
      EventFunnel.retention(df, "user_id", "ts_us", periodUs = 0L))
  }

  test("transitions: hand-computed pair counts and conditional probs; " +
      "no cross-user pairs; per-from rows sum to 1e6-ish") {
    import spark.implicits._
    // u1: A B A C ; u2: B A  — pairs: AB, BA, AC (u1), BA (u2)
    val ev = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L),
      (1L, "C", 40L, 4L),
      (2L, "B", 10L, 5L), (2L, "A", 20L, 6L)).toDF(
      "user_id", "event_type", "ts_us", "event_id")
    val t = EventFunnel.transitions(ev, "user_id", "event_type",
        "ts_us", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(t === Map(
      ("A", "B") -> (1L, 500000L), ("A", "C") -> (1L, 500000L),
      ("B", "A") -> (2L, 1000000L)))
    // the boundary pair (u1's C -> u2's B) must NOT exist
    assert(!t.contains(("C", "B")))
    // same-timestamp ordering falls back to the unique event id
    val tie = Seq((1L, "X", 5L, 1L), (1L, "Y", 5L, 2L)).toDF(
      "user_id", "event_type", "ts_us", "event_id")
    val tt = EventFunnel.transitions(tie, "user_id", "event_type",
      "ts_us", "event_id").collect()
    assert(tt.length === 1 && tt.head.getString(0) === "X"
      && tt.head.getString(1) === "Y")
  }

  test("abTest: hand-computed pooled z, per-user dedup, zero-variance " +
      "guard, significance flag") {
    import graft.analytics.Experiment
    import spark.implicits._
    // A: users 2,4,6,8 (conv: 2) — B: users 1,3,5,7,9 (conv: 1,3,5,7)
    // user 2 converts TWICE: must count once
    val ev = Seq(
      (2L, "purchase"), (2L, "purchase"), (4L, "view"), (6L, "view"),
      (8L, "view"),
      (1L, "purchase"), (3L, "purchase"), (5L, "purchase"),
      (7L, "purchase"), (9L, "view")).toDF("user_id", "event_type")
    val r = Experiment.abTest(ev, "user_id", col("user_id") % 2 === 1,
      col("event_type") === "purchase").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((4L, 5L, 1L, 4L)))
    // pooled p = 5/9; se = sqrt(p(1-p)(1/4+1/5)); z = (0.8-0.25)/se
    val p = 5.0 / 9.0
    val se = math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 5))
    val z = BigDecimal((4.0 / 5 - 1.0 / 4) / se)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) === z)
    assert(r.getBoolean(7) === (math.abs(z) >= 1.96))
    // all-convert on both sides: pooled variance 0 → z defined as 0
    val flat = Seq((1L, "purchase"), (2L, "purchase")).toDF(
      "user_id", "event_type")
    val r0 = Experiment.abTest(flat, "user_id", col("user_id") % 2 === 1,
      col("event_type") === "purchase").head
    assert(r0.getDouble(6) === 0.0 && !r0.getBoolean(7))
    // an all-one-variant log yields ONE explicit row (zero counts +
    // NULL rate/z for the missing side), never an empty frame
    val solo = Seq((2L, "purchase"), (4L, "view")).toDF(
      "user_id", "event_type")
    val rs = Experiment.abTest(solo, "user_id", col("user_id") % 2 === 1,
      col("event_type") === "purchase").collect()
    assert(rs.length === 1)
    assert(rs.head.getLong(0) === 2L && rs.head.getLong(1) === 0L)
    assert(!rs.head.isNullAt(4) && rs.head.isNullAt(5))
    assert(rs.head.isNullAt(6) && rs.head.isNullAt(7))
  }

  test("msprt: hand-computed mixture likelihood ratio on the abTest " +
      "fixture; zero-variance and one-arm degeneracies return NULL") {
    import graft.analytics.Experiment
    import spark.implicits._
    val ev = Seq(
      (2L, "purchase"), (2L, "purchase"), (4L, "view"), (6L, "view"),
      (8L, "view"),
      (1L, "purchase"), (3L, "purchase"), (5L, "purchase"),
      (7L, "purchase"), (9L, "view")).toDF("user_id", "event_type")
    val r = Experiment.msprt(ev, "user_id", col("user_id") % 2 === 1,
      col("event_type") === "purchase").head
    // pool 5/9, V = pool(1-pool)(1/4+1/5) = 1/9, delta 0.55, tau2 1e-4
    val v = (5.0 / 9.0) * (4.0 / 9.0) * (1.0 / 4 + 1.0 / 5)
    val dl = 4.0 / 5 - 1.0 / 4
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lam = r6(math.sqrt(v / (v + 1e-4)) *
      math.exp(dl * dl * 1e-4 / (2.0 * v * (v + 1e-4))))
    assert(r.getDouble(4) === r6(dl))
    assert(r.getDouble(5) === lam)
    assert(r.getDouble(6) === r6(math.min(1.0, 1.0 / lam)))
    // all-convert both sides: V = 0 -> lambda/p undefined
    val flat = Seq((1L, "purchase"), (2L, "purchase"))
      .toDF("user_id", "event_type")
    val r0 = Experiment.msprt(flat, "user_id", col("user_id") % 2 === 1,
      col("event_type") === "purchase").head
    assert(r0.isNullAt(5) && r0.isNullAt(6))
    // one-arm log: explicit row, NULL delta/lambda
    val solo = Seq((2L, "purchase")).toDF("user_id", "event_type")
    val rs = Experiment.msprt(solo, "user_id", col("user_id") % 2 === 1,
      col("event_type") === "purchase").head
    assert(rs.isNullAt(4) && rs.isNullAt(5))
  }

  test("rateTest: hand-computed Poisson z on active user-days, " +
      "same-day repeats count one exposure, one-arm log yields an " +
      "explicit NULL-z row") {
    import graft.analytics.Experiment
    import spark.implicits._
    // periodUs = 1. Arm A (uid 2): events at day 0,0,1 → n=3 over
    // t=2 user-days (the day-0 repeat adds an event, not exposure).
    // Arm B (uid 1): one event day 0 → n=1, t=1.
    // z = (1/1 − 3/2)/√(3/4 + 1/1) = −0.5/√1.75
    val ev = Seq((2L, 0L), (2L, 0L), (2L, 1L), (1L, 0L))
      .toDF("uid", "ts")
    val r = Experiment.rateTest(ev, "uid", "ts",
      col("uid") % 2 === 1, periodUs = 1L).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((3L, 2L, 1L, 1L)))
    assert((r.getLong(4), r.getLong(5)) === ((1500000L, 1000000L)))
    val z = BigDecimal(-0.5 / math.sqrt(1.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) === z && !r.getBoolean(7))
    // one-arm log: explicit row, NULL z/rate on the missing side
    val solo = Seq((2L, 0L)).toDF("uid", "ts")
    val rs = Experiment.rateTest(solo, "uid", "ts",
      col("uid") % 2 === 1, periodUs = 1L).head
    assert(rs.getLong(0) === 1L && rs.getLong(2) === 0L)
    assert(!rs.isNullAt(4) && rs.isNullAt(5) && rs.isNullAt(6))
  }

  test("srmCheck: hand-computed exact chi-square micros, both flag " +
      "directions, mixed-variant max convention, empty-log NULLs") {
    import graft.analytics.Experiment
    import spark.implicits._
    // 3 B users (1..3) vs 7 A users (4..10) under a 50/50 design:
    //   d = 3*2 - 10 = -4; chi2 = 16*2/(10*1*1) = 3.2 -> 3200000, no SRM
    val ev = (1L to 10L).map(u => (u, "view")).toDF("user_id", "t")
    val ok = Experiment.srmCheck(ev, "user_id", col("user_id") <= 3L)
      .head
    assert((ok.getLong(0), ok.getLong(1)) === ((7L, 3L)))
    assert(ok.getLong(2) === 5000000L)
    assert(ok.getLong(3) === 3200000L && !ok.getBoolean(4))
    // 1 B vs 9 A: d = -8; chi2 = 64*2/10 = 12.8 -> 12800000, SRM fires
    val bad = Experiment.srmCheck(ev, "user_id", col("user_id") === 1L)
      .head
    assert(bad.getLong(3) === 12800000L && bad.getBoolean(4))
    // non-even 1/4 design met exactly: 3 of 12 users are B -> chi2 = 0
    val ev12 = (1L to 12L).map(u => (u, "view")).toDF("user_id", "t")
    val quarter = Experiment.srmCheck(ev12, "user_id",
      col("user_id") <= 3L, ratioNumB = 1L, ratioDen = 4L).head
    assert(quarter.getLong(2) === 3000000L &&
      quarter.getLong(3) === 0L && !quarter.getBoolean(4))
    // a user whose rows disagree is ONE user, in B (max convention) —
    // here user 4's second row flips it to B: 4 B vs 6 A, d = -2,
    // chi2 = 4*2/10 = 0.8 -> 800000
    val mixed = ev.union(Seq((4L, "flip")).toDF("user_id", "t"))
    val rm = Experiment.srmCheck(mixed, "user_id",
      col("user_id") <= 3L || col("t") === "flip").head
    assert((rm.getLong(0), rm.getLong(1)) === ((6L, 4L)))
    assert(rm.getLong(3) === 800000L)
    // empty log: zero counts, NULL expectation/chi2/flag
    val re = Experiment.srmCheck(ev.limit(0), "user_id",
      col("user_id") <= 3L).head
    assert(re.getLong(0) === 0L && re.getLong(1) === 0L &&
      re.isNullAt(2) && re.isNullAt(3) && re.isNullAt(4))
    // degenerate designs fail loud
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(ev, "user_id", col("user_id") <= 3L,
        ratioNumB = 2L, ratioDen = 2L)
    }
  }

  test("welchTTest: hand-computed t and Welch df, zero-variance and " +
      "small-variant guards, NaN/Inf drop") {
    import graft.analytics.Experiment
    import spark.implicits._
    // A (even ids): y = 1, 2, 3 — mean 2, s² = 1
    // B (odd ids):  y = 4, 6, 8, 10 — mean 7, s² = 20/3
    val units = Seq((2L, 1.0), (4L, 2.0), (6L, 3.0),
      (1L, 4.0), (3L, 6.0), (5L, 8.0), (7L, 10.0)).toDF("uid", "y")
    val r = Experiment.welchTTest(units, col("uid") % 2 === 1, "y").head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 4L)))
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 7.0)
    assert(r.getDouble(4) === 1.0)
    val vb = 20.0 / 3.0
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) === r6(vb))
    val (ra, rb) = (1.0 / 3.0, vb / 4.0)
    val t = (7.0 - 2.0) / math.sqrt(ra + rb)
    val df = (ra + rb) * (ra + rb) / (ra * ra / 2.0 + rb * rb / 3.0)
    // engine works on exact 1e-6-floored sums; hand values here are
    // micro-exact so the rounded results agree to all 6 decimals
    assert(math.abs(r.getDouble(6) - t) < 2e-6, r.getDouble(6).toString)
    assert(math.abs(r.getDouble(7) - df) < 2e-5, r.getDouble(7).toString)
    assert(r.getBoolean(8) === (math.abs(t) >= 1.96))
    // both variances zero: the difference is exact, not statistical
    val const = Seq((2L, 5.0), (4L, 5.0), (1L, 9.0), (3L, 9.0))
      .toDF("uid", "y")
    val rc = Experiment.welchTTest(const, col("uid") % 2 === 1, "y").head
    assert(rc.isNullAt(6) && rc.isNullAt(7) && rc.isNullAt(8))
    // a single-unit variant has no sample variance
    val tiny = Seq((2L, 1.0), (4L, 2.0), (1L, 9.0)).toDF("uid", "y")
    val rt = Experiment.welchTTest(tiny, col("uid") % 2 === 1, "y").head
    assert(rt.isNullAt(5) && rt.isNullAt(6))
    // NaN/Inf units drop instead of poisoning the exact sums
    val dirty = Seq((2L, 1.0), (4L, 2.0), (6L, Double.NaN),
      (8L, Double.PositiveInfinity), (1L, 4.0), (3L, 6.0))
      .toDF("uid", "y")
    val rd = Experiment.welchTTest(dirty, col("uid") % 2 === 1, "y").head
    assert((rd.getLong(0), rd.getLong(1)) === ((2L, 2L)))
  }

  test("mannWhitneyU: hand-computed tie-corrected rank test, all-tied " +
      "and empty-variant guards, NaN/Inf drop") {
    import graft.analytics.Experiment
    import spark.implicits._
    // A (even ids): 1, 2, 2, 5   B (odd ids): 2, 3, 4
    // combined ranks: 1→1; the three 2s share avg rank 3; 3→5; 4→6; 5→7
    // W_b = 3+5+6 = 14, U_b = 14 − 3·4/2 = 8 ⇒ u_x2 = 16
    // ties: one group of 3 ⇒ T = 27−3 = 24, n = 7
    // σ² = (4·3/12)·((7+1) − 24/(7·6)) = 8 − 4/7
    // z = (8 − 6)/σ = 2/√(52/7) ≈ 0.733815
    val units = Seq((2L, 1.0), (4L, 2.0), (6L, 2.0), (8L, 5.0),
      (1L, 2.0), (3L, 3.0), (5L, 4.0)).toDF("uid", "y")
    val r = Experiment.mannWhitneyU(units, col("uid") % 2 === 1, "y").head
    assert((r.getLong(0), r.getLong(1)) === ((4L, 3L)))
    assert(r.getLong(2) === 16L)
    val z = 2.0 / math.sqrt(4.0 * 3.0 / 12.0 * (8.0 - 24.0 / 42.0))
    assert(math.abs(r.getDouble(3) - z) < 1e-6, r.getDouble(3).toString)
    assert(r.getBoolean(4) === false)
    // every value tied: no rank information, σ² = 0 ⇒ NULL z but U exact
    val const = Seq((2L, 5.0), (4L, 5.0), (1L, 5.0), (3L, 5.0))
      .toDF("uid", "y")
    val rc = Experiment.mannWhitneyU(const, col("uid") % 2 === 1, "y").head
    // all four share avg rank 2.5 ⇒ W_b = 5, U_b = 2 ⇒ u_x2 = 4 = n_a·n_b/2·2
    assert(rc.getLong(2) === 4L && rc.isNullAt(3) && rc.isNullAt(4))
    // an empty variant: NULL U and z, counts still reported
    val solo = Seq((2L, 1.0), (4L, 2.0)).toDF("uid", "y")
    val rs = Experiment.mannWhitneyU(solo, col("uid") % 2 === 1, "y").head
    assert((rs.getLong(0), rs.getLong(1)) === ((2L, 0L)))
    assert(rs.isNullAt(2) && rs.isNullAt(3))
    // NaN/Inf units drop instead of poisoning the value table
    val dirty = Seq((2L, 1.0), (4L, Double.NaN),
      (6L, Double.NegativeInfinity), (1L, 4.0), (3L, 6.0))
      .toDF("uid", "y")
    val rd = Experiment.mannWhitneyU(dirty, col("uid") % 2 === 1, "y").head
    assert((rd.getLong(0), rd.getLong(1)) === ((1L, 2L)))
    // no ties here: A{1} B{4,6} ⇒ W_b = 2+3 = 5, U_b = 5−3 = 2, u_x2 = 4
    assert(rd.getLong(2) === 4L)
  }

  test("rfm: hand-traced quintile codes, NaN spend scores but pays " +
      "nothing, rank-arithmetic halves at q=2") {
    import graft.analytics.EventFunnel
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, 1.0), (1L, 20L, 2.0),                 // rec 20 f 2 mon 3
      (2L, 5L, 10.0),                                 // rec 5  f 1 mon 10
      (3L, 30L, 0.5), (3L, 1L, 0.0), (3L, 2L, 0.0),   // rec 30 f 3 mon .5
      (4L, 15L, Double.NaN),                          // rec 15 f 1 mon 0
      (5L, 25L, 2.0))                                 // rec 25 f 1 mon 2
      .toDF("uid", "ts_us", "value")
    val r = EventFunnel.rfm(ev, "uid", "ts_us", "value")
      .orderBy("user_id").collect()
    // 5 users × 5 quantiles ⇒ score = 6 − rank on every axis
    assert(r.map(x => (x.getLong(0), x.getLong(4), x.getLong(5),
      x.getLong(6), x.getLong(7))).toSeq == Seq(
      (1L, 3L, 4L, 4L, 344L),
      (2L, 1L, 3L, 5L, 135L),
      (3L, 5L, 5L, 2L, 552L),
      (4L, 2L, 2L, 1L, 221L),
      (5L, 4L, 1L, 3L, 413L)))
    // NaN spend: monetary 0, but the user is still ranked
    assert(r(3).getLong(3) == 0L)
    // q = 2 over 4 users: ranks 1-2 score 2, ranks 3-4 score 1
    val four = ev.filter(col("uid") =!= 5L)
    val r2 = EventFunnel.rfm(four, "uid", "ts_us", "value", quantiles = 2)
      .orderBy("user_id").collect()
    // recency ranks: u3(30)→1 u1(20)→2 u4(15)→3 u2(5)→4
    assert(r2.map(x => (x.getLong(0), x.getLong(4))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)))
    intercept[IllegalArgumentException] {
      EventFunnel.rfm(ev, "uid", "ts_us", "value", quantiles = 10)
    }
  }

  test("stickiness: hand-traced DAU/MAU windows, same-day repeats " +
      "count once, active-days-only denominator") {
    import graft.analytics.EventFunnel
    import spark.implicits._
    // periodUs = 1, 2-day windows. w0: day0 {1,2}, day1 {1} ⇒
    // Σdau 3, mau 2, avg 1.5, stickiness 3/(2·2) = .75;
    // w1: day2 {1,2,3} ⇒ avg 3.0, stickiness 1.0 (day 3 is inactive
    // and deliberately absent from the denominator)
    val ev = Seq((1L, 0L), (1L, 0L), (2L, 0L), (1L, 1L),
      (1L, 2L), (2L, 2L), (3L, 2L)).toDF("uid", "ts")
    val r = EventFunnel.stickiness(ev, "uid", "ts", periodUs = 1L,
        daysPerWindow = 2)
      .orderBy("win")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 2L, 2L, 1500000L, 750000L),
      (1L, 3L, 1L, 3000000L, 1000000L)))
  }

  test("nelsonAalen: hand-traced hazard steps on the KM fixture, " +
      "censored-only step adds zero hazard") {
    import graft.analytics.EventFunnel
    import spark.implicits._
    // same lifetimes as the kaplanMeier fixture: durations
    // 0 (1 event), 2 (1 event), 5 (2 events), 6 (1 censored); N = 5.
    // hazards ⌊10⁶·e/n⌋: 1/5→200000, 1/4→250000, 2/3→666666, 0/1→0
    val ev = Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (2L, 2L),
      (3L, 0L), (3L, 5L), (4L, 1L), (4L, 6L), (5L, 2L), (5L, 8L))
      .toDF("uid", "ts")
    val na = EventFunnel.nelsonAalen(ev, "uid", "ts", periodUs = 1L)
      .orderBy("duration").collect()
    assert(na.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq == Seq(
      (0L, 5L, 1L, 0L, 200000L, 200000L),
      (2L, 4L, 1L, 0L, 250000L, 450000L),
      (5L, 3L, 2L, 0L, 666666L, 1116666L),
      (6L, 1L, 0L, 1L, 0L, 1116666L)))
  }

  test("kaplanMeier: hand-traced product-limit curve, right-censoring " +
      "at the log end, censored-only steps leave S unchanged") {
    import graft.analytics.EventFunnel
    import spark.implicits._
    // periodUs = 1 so ts IS the period. Lifetimes (first, last):
    // A (0,0) dur 0; B (0,2) dur 2; C (0,5) dur 5; D (1,6) dur 5;
    // E (2,8) dur 6. Log end = 8 ⇒ E right-censored, rest churn events.
    // n_risk: d0→5, d2→4, d5→3, d6→1
    // S: 1·4/5 = .8; ·3/4 = .6; ·1/3 = .2; d6 censored-only → .2
    val ev = Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (2L, 2L),
      (3L, 0L), (3L, 5L), (4L, 1L), (4L, 6L), (5L, 2L), (5L, 8L))
      .toDF("uid", "ts")
    val km = EventFunnel.kaplanMeier(ev, "uid", "ts", periodUs = 1L)
      .orderBy("duration").collect()
    assert(km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq == Seq(
      (0L, 5L, 1L, 0L, 800000L),
      (2L, 4L, 1L, 0L, 600000L),
      (5L, 3L, 2L, 0L, 200000L),
      (6L, 1L, 0L, 1L, 200000L)))
    // a one-user log: its only user sits in the final period ⇒ fully
    // censored, survival never drops
    val solo = Seq((9L, 3L), (9L, 7L)).toDF("uid", "ts")
    val ks = EventFunnel.kaplanMeier(solo, "uid", "ts", 1L).collect()
    assert(ks.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))) == Seq((4L, 1L, 0L, 1L, 1000000L)))
    // the grid cap fails loud, naming the remedy
    val e = intercept[IllegalArgumentException] {
      EventFunnel.kaplanMeier(ev, "uid", "ts", 1L, maxSteps = 2)
    }
    assert(e.getMessage.contains("coarsen periodUs"))
  }

  test("kruskalWallis: hand-computed H without and with ties, all-tied " +
      "and single-group guards, NaN drop") {
    import graft.analytics.Experiment
    import spark.implicits._
    // A {1,2}, B {3,4}: ranks 1..4, R_A = 3, R_B = 7,
    // H = 12/20·(9/2 + 49/2) − 15 = 2.4 (no ties)
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Experiment.kruskalWallis(df, "g", "v").head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 4L)))
    assert(r.getDouble(2) === 2.4)
    // ties: A {1,2,2}, B {3} — avg ranks 1, 2.5, 2.5, 4;
    // X = ⌊12²/3⌋ + ⌊8²/1⌋ = 112, H = 3·112/20 − 15 = 1.8,
    // tie corr = 1 − 6/60 = .9 ⇒ H_c = 2.0
    val tied = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val rt = Experiment.kruskalWallis(tied, "g", "v").head
    assert(rt.getDouble(2) === 2.0)
    // every value tied: the correction hits 0 — no rank information
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(Experiment.kruskalWallis(const, "g", "v").head.isNullAt(2))
    // single group: no between-group comparison
    val solo = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(Experiment.kruskalWallis(solo, "g", "v").head.isNullAt(2))
    // NaN/Inf drop
    val dirty = Seq(("a", 1.0), ("a", Double.NaN), ("b", 2.0),
      ("b", Double.NegativeInfinity), ("b", 3.0)).toDF("g", "v")
    assert(Experiment.kruskalWallis(dirty, "g", "v").head.getLong(1) == 3L)
  }

  test("anovaF: hand-computed F over three groups, zero-SSW and " +
      "single-group guards, NaN/Inf drop") {
    import graft.analytics.Experiment
    import spark.implicits._
    // A {1,2,3}, B {2,3,4}, C {6,8}: in centi units T' = 120000 +
    // 270000 + 980000, S²/n = 2900²/8 ⇒ SSB 318750, SSW 60000,
    // F = (318750/2)/(60000/5) = 13.28125
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 6.0), ("c", 8.0)).toDF("g", "v")
    val r = Experiment.anovaF(df, "g", "v").head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 8L)))
    assert(r.getLong(2) === 318750L && r.getLong(3) === 60000L)
    assert(r.getDouble(4) === 13.28125)
    // every group constant: SSW = 0 ⇒ no noise to test against
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 9.0), ("b", 9.0))
      .toDF("g", "v")
    val rc = Experiment.anovaF(const, "g", "v").head
    assert(rc.getLong(3) === 0L && rc.isNullAt(4))
    // a single group has no between-group df
    val solo = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val rs = Experiment.anovaF(solo, "g", "v").head
    assert(rs.getLong(0) === 1L && rs.isNullAt(2) && rs.isNullAt(4))
    // NaN/Inf drop before the decomposition
    val dirty = Seq(("a", 1.0), ("a", Double.NaN),
      ("b", Double.PositiveInfinity), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val rd = Experiment.anovaF(dirty, "g", "v").head
    assert(rd.getLong(1) === 3L)
  }

  test("covariateBalance: hand-computed SMDs, per-covariate complete " +
      "cases, zero-variance and thin-arm NULLs, balance line") {
    import graft.analytics.Experiment
    import spark.implicits._
    // x: A {1,2,3} vs B {4,6} ⇒ s² 1/2, sp² 1.5, smd 3/√1.5 = 2.449490
    // (imbalanced); y: identical arms ⇒ smd 0, balanced; y also
    // carries a NaN that drops ONLY y's row count
    val df = Seq(
      (0L, 1.0, 5.0), (0L, 2.0, Double.NaN), (0L, 3.0, 7.0),
      (1L, 4.0, 5.0), (1L, 6.0, 7.0)).toDF("v", "x", "y")
    val r = Experiment.covariateBalance(df, col("v") === 1L,
        Seq("x", "y"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Boolean])].collect().toSeq
    assert(r == Seq(
      ("x", 3L, 2L, Some(2.0), Some(5.0), Some(2.44949), Some(false)),
      ("y", 2L, 2L, Some(6.0), Some(6.0), Some(0.0), Some(true))))
    // constant covariate: no spread to standardize by
    val const = Seq((0L, 5.0), (0L, 5.0), (1L, 5.0), (1L, 5.0))
      .toDF("v", "x")
    assert(Experiment.covariateBalance(const, col("v") === 1L,
      Seq("x")).head.isNullAt(5))
    // a 1-row arm has no sample variance
    val thin = Seq((0L, 1.0), (0L, 2.0), (1L, 3.0)).toDF("v", "x")
    assert(Experiment.covariateBalance(thin, col("v") === 1L,
      Seq("x")).head.isNullAt(5))
  }

  test("simpsonCheck: hand-built reversal (every segment favors B, " +
      "the pool favors A), missing-arm and zero-diff NULLs") {
    import graft.analytics.Experiment
    import spark.implicits._
    def sc(rows: Seq[(String, Long, Long, Long)]) =
      Experiment.simpsonCheck(rows.toDF("g", "u", "b", "c"), "g", "u",
          col("b") === 1L, col("c") === 1L)
        .orderBy(col("g"))
        .as[(String, Long, Long, Long, Long, Option[Long],
          Option[Long], Option[Boolean])].collect().toSeq
    // s1: A 0/1 vs B 1/5 (B +200000); s2: A 4/5 vs B 1/1 (B +200000);
    // pooled: A 4/6 vs B 2/6 ⇒ −333334 (negative floor) — reversed
    val rows = Seq(("s1", 1L, 0L, 0L)) ++
      (2L to 6L).map(u => ("s1", u, 1L, if (u == 2L) 1L else 0L)) ++
      (7L to 11L).map(u => ("s2", u, 0L, if (u == 11L) 0L else 1L)) ++
      Seq(("s2", 12L, 1L, 1L))
    assert(sc(rows) == Seq(
      ("s1", 1L, 0L, 5L, 1L, Some(200000L), Some(-333334L), Some(true)),
      ("s2", 5L, 4L, 1L, 1L, Some(200000L), Some(-333334L), Some(true))))
    // a segment with no B arm asserts nothing; a zero-difference
    // segment has no strict sign
    val part = Seq(("s1", 1L, 0L, 1L), ("s1", 2L, 1L, 1L),
      ("s2", 3L, 0L, 1L))
    val r = sc(part)
    assert(r(0)._6 == Some(0L) && r(0)._8.isEmpty) // tied s1
    assert(r(1)._6.isEmpty && r(1)._8.isEmpty)     // armless s2
  }

  test("riskRatio: hand-computed 2x2 RR/OR with log-normal CIs, " +
      "zero-cell NULLs, max-over-user conversion") {
    import graft.analytics.Experiment
    import spark.implicits._
    def rr(rows: Seq[(Long, Long, Long)]) =
      Experiment.riskRatio(rows.toDF("u", "b", "conv"), "u",
          col("b") === 1L, col("conv") === 1L)
        .as[(Long, Long, Long, Long, Option[Double], Option[Double],
          Option[Double], Option[Double], Option[Double],
          Option[Double])].head()
    // A: 1/4 convert, B: 2/4 ⇒ RR = 2, OR = (2·3)/(1·2) = 3;
    // CIs from exp(ln ± 1.96·se) on the delta-method ses
    val rows = Seq((1L, 0L, 1L), (2L, 0L, 0L), (3L, 0L, 0L),
      (4L, 0L, 0L), (5L, 1L, 1L), (6L, 1L, 1L), (7L, 1L, 0L),
      (8L, 1L, 0L))
    assert(rr(rows) == ((4L, 1L, 4L, 2L, Some(2.0), Some(0.281717),
      Some(14.198654), Some(3.0), Some(0.150268), Some(59.893126))))
    // a zero cell (no A conversions) has no log-scale se
    val zero = rows.map { case (u, b, c) => (u, b, if (b == 0L) 0L else c) }
    val rz = rr(zero)
    assert(rz._2 == 0L && rz._5.isEmpty && rz._8.isEmpty)
    // conversion is max over a user's rows — a repeat visit with a
    // conversion flips the user once
    val multi = rows ++ Seq((2L, 0L, 1L))
    assert(rr(multi)._2 == 2L)
  }

  test("metaEffect: hand-computed inverse-variance pool, Cochran Q " +
      "and I2, thin-segment exclusion, single-segment NULL I2") {
    import graft.analytics.Experiment
    import spark.implicits._
    def meta(rows: Seq[(String, Long, Double)]) =
      Experiment.metaEffect(rows.toDF("seg", "v", "y"), Seq("seg"),
          col("v") === 1L, "y")
        .as[(Long, Option[Double], Option[Double], Option[Double],
          Option[Double], Option[Double], Option[Double],
          Option[Double])].head()
    // seg1: θ=3, se²=2, w=.5; seg2: θ=7, se²=8, w=.125 ⇒
    // θ̂ = (1.5+0.875)/(0.5+0.125) = 3.8, se = √1.6 = 1.264911,
    // Q = .5·.8² + .125·3.2² = 1.6 — the seg1 micro term floors one
    // ulp short (319999), so Q reads 1.599999; I² still rounds .375
    val rows = Seq(
      ("s1", 0L, 0.0), ("s1", 0L, 2.0), ("s1", 1L, 3.0), ("s1", 1L, 5.0),
      ("s2", 0L, 0.0), ("s2", 0L, 4.0), ("s2", 1L, 7.0), ("s2", 1L, 11.0))
    // DL: Σw = .625, Σw² = .265625 ⇒ τ² = .599999/.2 = 2.999995;
    // w* = {1/5, 1/11} (floored micros) ⇒ θ_RE 4.249999, se 1.85405
    assert(meta(rows) == ((2L, Some(3.8), Some(1.264911),
      Some(1.599999), Some(0.375), Some(2.999995), Some(4.249999),
      Some(1.85405))))
    // a segment with a 1-row arm has no se² — excluded, k unchanged
    val thin = rows ++ Seq(("s3", 0L, 1.0), ("s3", 1L, 2.0))
    assert(meta(thin) == ((2L, Some(3.8), Some(1.264911),
      Some(1.599999), Some(0.375), Some(2.999995), Some(4.249999),
      Some(1.85405))))
    // one segment: pooled = itself, Q = 0, I² undefined
    val solo = rows.filter(_._1 == "s1")
    val rs = meta(solo)
    assert(rs._1 == 1L && rs._2 == Some(3.0) && rs._4 == Some(0.0) &&
      rs._5.isEmpty)
    // k = 1 pins τ² = 0: the RE pool degenerates to FE
    assert(rs._6 == Some(0.0) && rs._7 == Some(3.0) &&
      rs._8 == Some(1.414214))
    // no eligible segment at all
    assert(meta(Seq(("s1", 0L, 1.0), ("s1", 1L, 2.0)))._1 == 0L)
  }

  test("stratifiedAte: hand-computed stratum terms, whole-value " +
      "banding, missing-arm NULLs, tied scores never split") {
    import graft.analytics.Experiment
    import spark.implicits._
    def ate(rows: Seq[(Double, Boolean, Double)]) =
      Experiment.stratifiedAte(rows.toDF("s", "w", "y"), col("w"),
          "s", "y", buckets = 2)
        .orderBy(col("stratum"))
        .as[(Long, Long, Long, Option[Double], Option[Double],
          Option[Long])].collect().toSeq
    // score .1 holds 4 rows (T 2,4 / C 1,3), score .9 holds 2 (T 10 /
    // C 6): strata by starting rank ⌊{0,4}·2/6⌋ = {0, 1};
    // terms (4/6)·(3−2)·10⁶ = 666666, (2/6)·(10−6)·10⁶ = 1333333
    val rows = Seq((0.1, true, 2.0), (0.1, true, 4.0),
      (0.1, false, 1.0), (0.1, false, 3.0),
      (0.9, true, 10.0), (0.9, false, 6.0))
    assert(ate(rows) == Seq(
      (0L, 2L, 2L, Some(3.0), Some(2.0), Some(666666L)),
      (1L, 1L, 1L, Some(10.0), Some(6.0), Some(1333333L))))
    // a stratum with no treated rows: positivity violation → NULLs
    val gap = Seq((0.1, true, 2.0), (0.1, false, 1.0),
      (0.9, false, 5.0))
    assert(ate(gap) == Seq(
      (0L, 1L, 1L, Some(2.0), Some(1.0), Some(666666L)),
      (1L, 0L, 1L, None, Some(5.0), None)))
    // one tied score: every row shares the value's stratum — never
    // split across bands
    val tied = Seq((0.5, true, 4.0), (0.5, false, 2.0),
      (0.5, true, 6.0), (0.5, false, 2.0))
    assert(ate(tied) == Seq(
      (0L, 2L, 2L, Some(5.0), Some(2.0), Some(3000000L))))
  }

  test("brownForsythe: hand-computed W with even/odd median pairs, " +
      "all-constant and single-group guards, NaN/Inf drop") {
    import graft.analytics.Experiment
    import spark.implicits._
    // A {1,2,3,10} (even n: middle pair 2,3 ⇒ dm = 500, the half-unit
    // median), B {2,4,6} (odd: dm = 800), C {5,5} (dm = 1000).
    // Doubled-centi deviations: A {300,100,100,1500}, B {400,0,400},
    // C {0,0}. S_g = 2000/800/0, Q_g = 2360000/320000/0; T' =
    // 1000000 + ⌊640000/3⌋ + 0 = 1213333; grand 2800²//9 = 871111 ⇒
    // SSB 342222, SSW 1466667; W = (342222/2)/(1466667/6) = 0.699999.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0),
      ("c", 5.0), ("c", 5.0)).toDF("g", "v")
    val r = Experiment.brownForsythe(df, "g", "v").head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 9L)))
    assert(r.getLong(2) === 342222L && r.getLong(3) === 1466667L)
    assert(r.getDouble(4) === 0.699999)
    // every group constant: all deviations 0 ⇒ SSW = 0 ⇒ NULL W
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 9.0), ("b", 9.0))
      .toDF("g", "v")
    val rc = Experiment.brownForsythe(const, "g", "v").head
    assert(rc.getLong(3) === 0L && rc.isNullAt(4))
    // a single group has no between-group df
    val solo = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val rs = Experiment.brownForsythe(solo, "g", "v").head
    assert(rs.getLong(0) === 1L && rs.isNullAt(2) && rs.isNullAt(4))
    // NaN/Inf drop before the median scan
    val dirty = Seq(("a", 1.0), ("a", Double.NaN),
      ("b", Double.PositiveInfinity), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    assert(Experiment.brownForsythe(dirty, "g", "v").head
      .getLong(1) === 3L)
  }

  test("bhCorrect: textbook step-up example, envelope clamp at 1, " +
      "dirty-p drop, alpha bounds") {
    import graft.analytics.Experiment
    import spark.implicits._
    // m = 5, p = .01 .02 .03 .04 .2: every m·p/i for the first four is
    // exactly 50000 micros, so the suffix-min envelope rejects all four
    // at α = .05 while the naive per-test line would also pass them —
    // the interesting BH case is .04·5/4 = .05 ≤ α though .04 > α/5
    val tests = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.03),
      ("t4", 0.04), ("t5", 0.2)).toDF("tid", "p")
    val r = Experiment.bhCorrect(tests, "tid", "p").collect()
    assert(r.map(_.getString(0)).toSeq ==
      Seq("t1", "t2", "t3", "t4", "t5"))
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.map(_.getLong(3)).toSeq ==
      Seq(50000L, 50000L, 50000L, 50000L, 200000L))
    assert(r.map(_.getBoolean(4)).toSeq ==
      Seq(true, true, true, true, false))
    // a large p at a small rank overshoots 1: clamp — and the envelope
    // must be MONOTONE (t_lo's adjusted p is capped by t_hi's term)
    val clamp = Seq(("t_lo", 0.4), ("t_hi", 0.9)).toDF("tid", "p")
    val rc = Experiment.bhCorrect(clamp, "tid", "p").collect()
    // t_lo: min(2·.4/1, 2·.9/2) = .8; t_hi: min(1, .9) = .9
    assert(rc.map(_.getLong(3)).toSeq == Seq(800000L, 900000L))
    assert(rc.map(_.getBoolean(4)).forall(_ == false))
    // NULL/NaN/out-of-range p drop; ranks stay dense over survivors
    val dirty = Seq(("a", 0.03), ("b", Double.NaN), ("c", 1.5),
      ("d", -0.1), ("e", 0.5)).toDF("tid", "p")
    val rdirty = Experiment.bhCorrect(dirty, "tid", "p").collect()
    assert(rdirty.map(_.getString(0)).toSeq == Seq("a", "e"))
    assert(rdirty.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      Experiment.bhCorrect(tests, "tid", "p", alphaX1e6 = 2000000L)
    }
  }

  test("bootstrapCi: exact point mean, degenerate CI on constant data, " +
      "bracketing on mixed data, determinism, dirty-row filter, bounds") {
    import graft.analytics.Experiment
    // constant metric: EVERY surviving replicate mean is exactly the
    // constant, so the percentile CI collapses onto the point estimate
    val const = (1 to 60).map(i => (s"u$i", 5.0)).toDF("uid", "y")
    val rc = Experiment.bootstrapCi(const, "uid", "y").collect().head
    assert((rc.getLong(0), rc.getLong(1)) == (60L, 5000000L))
    assert(rc.getLong(2) == 200L) // P(a replica draws 60 zero weights) ~ e^-60
    assert(rc.getLong(3) == 5000000L && rc.getLong(4) == 5000000L)
    // mixed data: CI is ordered, brackets the mean, and stays within
    // the data range (replicate means are convex combinations)
    val mixed = (1 to 40).map(i => (s"u$i", if (i % 2 == 0) 10.0 else 0.0))
      .toDF("uid", "y")
    val rm = Experiment.bootstrapCi(mixed, "uid", "y").collect().head
    assert(rm.getLong(1) == 5000000L)
    val (lo, hi) = (rm.getLong(3), rm.getLong(4))
    assert(lo <= 5000000L && 5000000L <= hi && lo < hi)
    assert(lo >= 0L && hi <= 10000000L)
    // hash-seeded ⇒ bit-identical on a re-run
    val rm2 = Experiment.bootstrapCi(mixed, "uid", "y").collect().head
    assert(rm.toSeq == rm2.toSeq)
    // null/NaN/Inf metric rows are filtered before everything
    val dirty = mixed.union(Seq(("d1", Double.NaN), ("d2",
      Double.PositiveInfinity)).toDF("uid", "y"))
      .union(Seq(("d3", Option.empty[Double])).toDF("uid", "y"))
    val rd = Experiment.bootstrapCi(dirty, "uid", "y").collect().head
    assert(rd.toSeq == rm.toSeq)
    intercept[IllegalArgumentException] {
      Experiment.bootstrapCi(mixed, "uid", "y", replicas = 39)
    }
  }

  test("funnelAb: hand-counted per-variant reach, rates vs each base, " +
      "pooled z replay, window cutoff, one-variant NULLs") {
    // A (even users): depths 3, 1, 2 ⇒ reach 3/2/1;
    // B (odd): u1 depth 3; u3's purchase misses the 5µs window ⇒ 2;
    // reach 2/2/1
    val ev = Seq(
      (2L, "signup", 0L, 1L), (2L, "view", 1L, 2L),
      (2L, "purchase", 2L, 3L),
      (4L, "signup", 0L, 4L),
      (6L, "signup", 0L, 5L), (6L, "view", 1L, 6L),
      (1L, "signup", 0L, 7L), (1L, "view", 1L, 8L),
      (1L, "purchase", 2L, 9L),
      (3L, "signup", 0L, 10L), (3L, "view", 1L, 11L),
      (3L, "purchase", 100L, 12L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val r = EventFunnel.funnelAb(ev, "user_id",
      col("user_id") % 2 === 1, "event_type", "ts_us",
      Seq("signup", "view", "purchase"), windowUs = 5L).collect()
    assert(r.map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
      .toSeq == Seq((1, 3L, 2L), (2, 2L, 2L), (3, 1L, 1L)))
    assert(r.map(_.getDouble(3)).toSeq ==
      Seq(1.0, 0.666667, 0.333333))
    assert(r.map(_.getDouble(4)).toSeq == Seq(1.0, 1.0, 0.5))
    // step-1 bases are equal by construction ⇒ z exactly 0
    assert(r.head.getDouble(5) == 0.0 && !r.head.getBoolean(6))
    // step-2 z replays the pooled two-proportion chain
    val pool = 4.0 / 5.0
    val se = math.sqrt(pool * (1.0 - pool) * (1.0 / 3.0 + 1.0 / 2.0))
    assert(r(1).getDouble(5) ==
      BigDecimal((2.0 / 2.0 - 2.0 / 3.0) / se)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // an absent variant: NULL rate/z on that side at every step
    val onlyA = ev.filter(col("user_id") % 2 === 0)
    val ra = EventFunnel.funnelAb(onlyA, "user_id",
      col("user_id") % 2 === 1, "event_type", "ts_us",
      Seq("signup", "view", "purchase"), windowUs = 5L).collect()
    assert(ra.forall(x => x.isNullAt(4) && x.isNullAt(5)))
  }

  test("diffInDiff: hand-computed cell means and DiD, IEEE z replay, " +
      "small-cell NULL z, empty-cell NULL means, dirty rows drop") {
    import graft.analytics.Experiment
    // A pre {1,3} post {2,4}; B pre {1,1} post {4,6}:
    // DiD = (5e6 − 1e6) − (3e6 − 2e6) = 3e6; cell mean-variances
    // 1.0, 1.0, 0, 1.0 ⇒ z = 3/√3
    val df = Seq(
      (false, false, 1.0), (false, false, 3.0),
      (false, true, 2.0), (false, true, 4.0),
      (true, false, 1.0), (true, false, 1.0),
      (true, true, 4.0), (true, true, 6.0)).toDF("b", "p", "y")
    val r = Experiment.diffInDiff(df, col("b"), col("p"), "y").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 2L, 2L, 2L))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      (2000000L, 3000000L, 1000000L, 5000000L))
    assert(r.getLong(8) == 3000000L)
    assert(r.getLong(9) ==
      math.floor(3000000L / 1e6 / math.sqrt(3.0) * 1e6).toLong)
    // a 1-row cell: DiD still exact, z undefined
    val small = df.filter(!(col("b") && col("p") && col("y") === 6.0))
    val rs = Experiment.diffInDiff(small, col("b"), col("p"), "y").head
    assert(rs.getLong(7) == 4000000L && rs.getLong(8) == 2000000L)
    assert(rs.isNullAt(9))
    // an empty cell: its mean and the DiD are NULL
    val noCell = df.filter(!(col("b") && !col("p")))
    val rn = Experiment.diffInDiff(noCell, col("b"), col("p"), "y").head
    assert(rn.getLong(2) == 0L && rn.isNullAt(6) && rn.isNullAt(8))
    // NULL period flag / NaN metric rows drop entirely
    val dirty = df.union(Seq((true, Option.empty[Boolean], 9.0),
      (false, Option(true), Double.NaN)).toDF("b", "p", "y"))
    assert(Experiment.diffInDiff(dirty, col("b"), col("p"), "y")
      .head.toSeq == r.toSeq)
  }

  test("cliffsDelta: hand-computed wins/losses with half-win ties, " +
      "Romano labels, perfect separation both signs, empty variant") {
    import graft.analytics.Experiment
    // A {1,2,3} vs B {2,3,4}: wins 6, losses 1, ties 2 ⇒
    // 2U = 14, δ = (14 − 9)/9 = 5/9 → 555555, large
    val df = Seq((0L, 1.0), (0L, 2.0), (0L, 3.0),
      (1L, 2.0), (1L, 3.0), (1L, 4.0)).toDF("v", "y")
    val r = Experiment.cliffsDelta(df, col("v") === 1L, "y").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4)) == (3L, 3L, 14L, 555555L, "large"))
    // all-tied: δ = 0, negligible
    val tied = Seq((0L, 5.0), (0L, 5.0), (1L, 5.0), (1L, 5.0))
      .toDF("v", "y")
    val rt = Experiment.cliffsDelta(tied, col("v") === 1L, "y").head
    assert(rt.getLong(3) == 0L && rt.getString(4) == "negligible")
    // perfect separation, both signs exact (the signed floor at ±1)
    val sep = Seq((0L, 1.0), (1L, 2.0), (1L, 3.0)).toDF("v", "y")
    assert(Experiment.cliffsDelta(sep, col("v") === 1L, "y")
      .head.getLong(3) == 1000000L)
    assert(Experiment.cliffsDelta(sep, col("v") === 0L, "y")
      .head.getLong(3) == -1000000L)
    // an empty variant has no comparison
    val one = sep.filter(col("v") === 1L)
    val ro = Experiment.cliffsDelta(one, col("v") === 1L, "y").head
    assert(ro.isNullAt(2) && ro.isNullAt(3) && ro.isNullAt(4))
  }

  test("cohenD: hand-computed pooled-SD d and Hedges g, zero-variance " +
      "and single-row-arm guards, NaN/Inf drop") {
    import graft.analytics.Experiment
    // A {1,2,3} vs B {4,6}: means 2/5, Σ(y−m)² = 2/2, s_p² =
    // (2+2)/3 = 4/3 ⇒ d = 3/√(4/3) = 2.598076, J = 1 − 3/11 ⇒
    // g = d·8/11 = 1.889510, large
    val df = Seq((0L, 1.0), (0L, 2.0), (0L, 3.0),
      (1L, 4.0), (1L, 6.0)).toDF("v", "y")
    val r = Experiment.cohenD(df, col("v") === 1L, "y").head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 2.598076 && r.getDouble(3) === 1.889510)
    assert(r.getString(4) === "large")
    // all-constant: pooled variance 0 — nothing to standardize by
    val const = Seq((0L, 5.0), (0L, 5.0), (1L, 5.0), (1L, 5.0))
      .toDF("v", "y")
    val rc = Experiment.cohenD(const, col("v") === 1L, "y").head
    assert(rc.isNullAt(2) && rc.isNullAt(4))
    // a single-row arm has no sample variance
    val solo = Seq((0L, 1.0), (0L, 2.0), (1L, 3.0)).toDF("v", "y")
    assert(Experiment.cohenD(solo, col("v") === 1L, "y").head.isNullAt(2))
    // NaN/Inf drop before the power sums
    val dirty = Seq((0L, 1.0), (0L, Double.NaN), (0L, 2.0),
      (1L, Double.PositiveInfinity), (1L, 4.0), (1L, 6.0))
      .toDF("v", "y")
    val rd = Experiment.cohenD(dirty, col("v") === 1L, "y").head
    assert((rd.getLong(0), rd.getLong(1)) === ((2L, 2L)))
  }

  test("logRank: hand-traced O-E and variance micros over the duration " +
      "grid, IEEE z replay, one-group NULL z") {
    // periodUs = 1; A = even users, B = odd. Lifetimes:
    //   u2(A) dur 0 event; u4(A) dur 2 event; u1(B) dur 1 event;
    //   u3(B) dur 3 censored (lp = horizon 3)
    // steps: t0 (n 2/2, dA=1): E=500000, V=250000
    //        t1 (1/2, dB=1):   E=333333, V=222222
    //        t2 (1/1, dA=1):   E=500000, V=250000
    // oe = 500000 - 333333 + 500000 = 666667; vv = 722222
    val ev = Seq((2L, 0L), (4L, 0L), (4L, 2L), (1L, 0L), (1L, 1L),
      (3L, 0L), (3L, 1L), (3L, 2L), (3L, 3L)).toDF("u", "ts")
    val r = EventFunnel.logRank(ev, "u", col("u") % 2 === 1, "ts", 1L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == (2L, 2L, 2L, 1L, 666667L, 722222L))
    assert(r.getLong(6) ==
      math.floor((666667L / 1e6) / math.sqrt(722222L / 1e6) * 1e6)
        .toLong)
    // a one-group log has zero variance: no test, NULL z
    val onlyA = ev.filter(col("u") % 2 === 0)
    val ra = EventFunnel.logRank(onlyA, "u", col("u") % 2 === 1,
      "ts", 1L).collect().head
    assert(ra.getLong(1) == 0L && ra.isNullAt(6))
    // a user whose rows disagree on isB is ONE lifetime (max over the
    // user's rows — the abTest convention), never two phantom users
    val mixed = ev.withColumn("flag",
      col("u") % 2 === 1 || (col("u") === 4L && col("ts") === 0L))
    val rm = EventFunnel.logRank(mixed, "u", col("flag"), "ts", 1L)
      .collect().head
    // u4's rows disagree → max ⇒ B; totals stay 4 users (1 A + 3 B)
    assert((rm.getLong(0), rm.getLong(1)) == (1L, 3L))
    intercept[IllegalArgumentException] {
      EventFunnel.logRank(ev, "u", col("u") % 2 === 1, "ts", 1L,
        maxSteps = 1)
    }
  }

  test("concurrency: hand-traced peak per period, carry-in level, " +
      "tied starts stack, end applies before a tied start") {
    // sessions of 10 at t = 0, 5, 8, 120; periods of 100
    val ev = Seq(0L, 5L, 8L, 120L).map(Tuple1(_)).toDF("ts")
    val r = EventFunnel.concurrency(ev, "ts", durationUs = 10L,
      periodUs = 100L).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((0L, 3L, 3L), (1L, 1L, 1L)))
    // two simultaneous starts overlap
    val tie = Seq(0L, 0L).map(Tuple1(_)).toDF("ts")
    val rt = EventFunnel.concurrency(tie, "ts", 10L, 100L).collect()
    assert(rt.head.getLong(2) == 2L)
    // half-open [t, t+d): a start at exactly the previous end does NOT
    // overlap it
    val halfOpen = Seq(0L, 10L).map(Tuple1(_)).toDF("ts")
    val rh = EventFunnel.concurrency(halfOpen, "ts", 10L, 100L).collect()
    assert(rh.head.getLong(2) == 1L)
    // a session spanning a period boundary counts in the next period's
    // max via the carry-in level even though it starts earlier
    val span = Seq(95L, 101L).map(Tuple1(_)).toDF("ts")
    val rs = EventFunnel.concurrency(span, "ts", 10L, 100L).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(rs == Seq((0L, 1L, 1L), (1L, 1L, 2L)))
    intercept[IllegalArgumentException] {
      EventFunnel.concurrency(ev, "ts", 0L, 100L)
    }
  }

  test("bootstrapUpliftCi: degenerate CI on per-variant constants, " +
      "empty variant NULLs, determinism, replica floor") {
    import graft.analytics.Experiment
    // A constant at 2.0, B constant at 5.0: every surviving replicate
    // difference is exactly 3e6, so the CI collapses onto the uplift
    val df = ((1 to 40).map(i => (s"a$i", 0L, 2.0)) ++
      (1 to 40).map(i => (s"b$i", 1L, 5.0))).toDF("id", "v", "y")
    val r = Experiment.bootstrapUpliftCi(df, "id", col("v") === 1L, "y")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (40L, 40L, 2000000L, 5000000L, 3000000L))
    assert(r.getLong(6) == 3000000L && r.getLong(7) == 3000000L)
    assert(r.getLong(5) == 200L)
    // bit-identical on a re-run (hash-seeded weights)
    val r2 = Experiment.bootstrapUpliftCi(df, "id", col("v") === 1L, "y")
      .collect().head
    assert(r.toSeq == r2.toSeq)
    // an empty B variant: NULL mean_b/uplift, every replica dropped
    val onlyA = df.filter(col("v") === 0L)
    val ra = Experiment.bootstrapUpliftCi(onlyA, "id",
      col("v") === 1L, "y").collect().head
    assert(ra.getLong(0) == 40L && ra.getLong(1) == 0L)
    assert(ra.isNullAt(3) && ra.isNullAt(4))
    assert(ra.getLong(5) == 0L && ra.isNullAt(6) && ra.isNullAt(7))
    intercept[IllegalArgumentException] {
      Experiment.bootstrapUpliftCi(df, "id", col("v") === 1L, "y",
        replicas = 39)
    }
  }

  test("powerMde: quantized-p double chain matches a scala replay, " +
      "exact p/delta, zero-rate NULLs, supported-level gates") {
    import graft.analytics.Experiment
    // 100 units, 20 converters: p = .2 exactly
    val units = (1 to 100).map(i => (s"u$i", i <= 20)).toDF("u", "c")
    val r = Experiment.powerMde(units, col("c")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (100L, 20L, 200000L, 50L))
    val zsum = Experiment.zAlpha(50000L) + Experiment.zPower(800000L)
    val p = 200000L / 1e6
    assert(r.getLong(4) ==
      math.floor(zsum * math.sqrt(2.0 * p * (1.0 - p) / 50.0) * 1e6)
        .toLong)
    assert(r.getLong(5) == 20000L) // ⌊100000·200000/1e6⌋
    val d = 20000L / 1e6
    assert(r.getLong(6) ==
      math.ceil(2.0 * p * (1.0 - p) * (zsum * zsum) / (d * d)).toLong)
    // zero conversion: p = 0 ⇒ mde 0, delta 0 ⇒ n_required NULL
    val none = (1 to 10).map(i => (s"u$i", false)).toDF("u", "c")
    val r0 = Experiment.powerMde(none, col("c")).collect().head
    assert(r0.getLong(2) == 0L && r0.getLong(4) == 0L &&
      r0.getLong(5) == 0L && r0.isNullAt(6))
    intercept[IllegalArgumentException] {
      Experiment.powerMde(units, col("c"), alphaX1e6 = 70000L)
    }
    intercept[IllegalArgumentException] {
      Experiment.powerMde(units, col("c"), powerX1e6 = 850000L)
    }
    intercept[IllegalArgumentException] {
      Experiment.powerMde(units, col("c"), relMdeX1e6 = 0L)
    }
  }

  test("ltvCurve: exact micro revenue, cumulative across sparse offsets, " +
      "per-member floor division, null-value events cohort but don't pay") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L * day + 5L, Some(1.5)),   // cohort 0, k 0
      (1L, 2L * day + 5L, Some(2.25)),  // cohort 0, k 2 (k=1 absent)
      (2L, 0L * day + 9L, Some(0.5)),   // cohort 0, k 0
      (3L, 1L * day + 1L, Option.empty[Double]) // cohort 1, no revenue
    ).toDF("user_id", "ts_us", "value")
    val r = EventFunnel.ltvCurve(ev, "user_id", "ts_us", "value", day)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    assert(r.keySet == Set((0L, 0L), (0L, 2L), (1L, 0L)))
    val k0 = r((0L, 0L))
    assert(k0.getLong(2) == 2000000L && k0.getLong(3) == 2000000L)
    assert(k0.getLong(4) == 2L && k0.getLong(5) == 1000000L)
    val k2 = r((0L, 2L))
    assert(k2.getLong(2) == 2250000L && k2.getLong(3) == 4250000L)
    assert(k2.getLong(5) == 2125000L)
    val c1 = r((1L, 0L))
    assert(c1.getLong(2) == 0L && c1.getLong(4) == 1L &&
      c1.getLong(5) == 0L)
  }

  test("attribution: first/last/linear credit with per-conversion reset, " +
      "(direct) for touchless conversions, trailing touches uncredited") {
    // user 1: ad,email → BUY | ad → BUY | (nothing) → BUY | ad (dropped)
    // user 2: touches only, no conversion → no credit at all
    val ev = Seq(
      (1L, "ad", 10L, 101L), (1L, "email", 20L, 102L),
      (1L, "purchase", 30L, 103L),
      (1L, "ad", 40L, 104L), (1L, "purchase", 50L, 105L),
      (1L, "purchase", 60L, 106L),
      (1L, "ad", 70L, 107L),
      (2L, "ad", 10L, 201L), (2L, "email", 20L, 202L)
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val r = EventFunnel.attribution(ev, "user_id", "event_type", "ts_us",
        "event_id", "purchase")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("ad", "email", "(direct)"))
    val ad = r("ad")
    assert(ad.getLong(1) == 2L && ad.getLong(2) == 1L &&
      ad.getLong(3) == 1500000L)
    val em = r("email")
    assert(em.getLong(1) == 0L && em.getLong(2) == 1L &&
      em.getLong(3) == 500000L)
    val d = r("(direct)")
    assert(d.getLong(1) == 1L && d.getLong(2) == 1L &&
      d.getLong(3) == 1000000L)
  }

  test("markovAttribution: hand-solved 3-state chain — removing the " +
      "must-pass channel zeroes conversion (removal 1.0); removing a " +
      "half-weight feeder halves it; shares normalize") {
    // u1: view->click->purchase; u2: view (never converts);
    // u3: click->purchase. Chain: START->{view:2, click:1},
    // view->{click:1, NULL:1}, click->{CONV:2}. Exact fixed point:
    // p(click)=1, p(view)=1/2, p(START)=2/3 -> micros 666666.
    // Remove view: START->{NULL:2, click:1} -> p=1/3 (333333);
    //   removal = 1e6 - 333333000000//666666 = 500000 (exactly).
    // Remove click: no path to CONV at all -> removal = 1e6.
    // Shares over 1.5e6: click 666666, view 333333.
    val ev = Seq(
      (1L, "view", 1L, 1L), (1L, "click", 2L, 2L),
      (1L, "purchase", 3L, 3L),
      (2L, "view", 1L, 4L),
      (3L, "click", 1L, 5L), (3L, "purchase", 2L, 6L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val out = EventFunnel.markovAttribution(ev, "user_id", "event_type",
        "ts_us", "event_id", "purchase")
      .orderBy($"channel")
      .as[(String, Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq(
      ("click", Some(1000000L), Some(666666L)),
      ("view", Some(500000L), Some(333333L))))
    // a log with no conversions at all: base = 0 -> NULL credits
    val none = EventFunnel.markovAttribution(
      ev.filter($"event_type" =!= "purchase"), "user_id", "event_type",
      "ts_us", "event_id", "purchase")
      .as[(String, Option[Long], Option[Long])].collect().toSeq
    assert(none.forall(r => r._2.isEmpty && r._3.isEmpty))
    intercept[IllegalArgumentException] {
      EventFunnel.markovAttribution(ev, "user_id", "event_type",
        "ts_us", "event_id", "purchase", iters = 0)
    }
    // loud cap: the driver transition matrix is channel-vocabulary-
    // sized by design — a data-sized type column must FAIL, not
    // silently materialize on the driver
    val capped = intercept[IllegalArgumentException] {
      EventFunnel.markovAttribution(ev, "user_id", "event_type",
        "ts_us", "event_id", "purchase", maxTransitions = 2)
    }
    assert(capped.getMessage.contains("maxTransitions"))
    // at exactly the matrix size the cap admits the run unchanged
    val atCap = EventFunnel.markovAttribution(ev, "user_id",
        "event_type", "ts_us", "event_id", "purchase",
        maxTransitions = 1000)
      .orderBy($"channel")
      .as[(String, Option[Long], Option[Long])].collect().toSeq
    assert(atCap == out)
  }
}
