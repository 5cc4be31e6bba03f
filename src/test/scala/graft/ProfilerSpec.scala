package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Profiler

/** Table profiler: metric correctness per type family, null handling,
  * and the scale contract (default mode scans once with NO Expand
  * blowup; exact-distinct mode is the one that pays it). */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame = Seq(
    (1L, Some(2.5), Some("ab"), Some("2024-01-02")),
    (2L, Some(7.25), Some("wxyz"), Some("2024-03-04")),
    (3L, None, Some("m"), None),
    (4L, Some(2.5), None, Some("2024-01-02"))
  ).toDF("id", "x", "s", "d")
    .withColumn("d", col("d").cast("date"))

  test("profile: hand-checked metrics across long/double/string/date") {
    val p = Profiler.profile(frame, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "x", "s", "d"))
    val id = p("id")
    assert(id.getString(1) === "bigint" && id.getLong(2) === 4L &&
      id.getLong(3) === 0L && id.getLong(4) === 4L)
    assert(id.getDecimal(5).doubleValue() === 1.0 &&
      id.getDecimal(6).doubleValue() === 4.0)
    val x = p("x")
    assert(x.getLong(3) === 1L && x.getLong(4) === 2L) // nulls, distinct
    assert(x.getDecimal(5).doubleValue() === 2.5 &&
      x.getDecimal(6).doubleValue() === 7.25)
    assert(x.isNullAt(7) && x.isNullAt(8) && x.isNullAt(9))
    val s = p("s")
    assert(s.getLong(3) === 1L && s.getLong(4) === 3L)
    assert(s.isNullAt(5) && s.isNullAt(6))
    assert(s.getString(7) === "ab" && s.getString(8) === "wxyz")
    // mean length of (2, 4, 1) = 7/3 in exact micro-units
    assert(s.getLong(9) === 7L * 1000000L / 3L)
    val d = p("d")
    assert(d.getString(1) === "date")
    assert(d.getString(7) === "2024-01-02" && d.getString(8) === "2024-03-04")
    assert(d.getLong(4) === 2L)
  }

  test("profile: all-null column yields null metrics, not failures") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val row = Profiler.profile(df, exactDistinct = true)
      .filter(col("col_name") === "s").head
    assert(row.getLong(3) === 2L && row.getLong(4) === 0L)
    assert(row.isNullAt(7) && row.isNullAt(8) && row.isNullAt(9))
  }

  test("profile default mode: approx distincts, ONE scan, no Expand") {
    val df = spark.range(5000).select(col("id"),
      (col("id") % 17).as("a"), (col("id") % 3).cast("string").as("b"))
    val plan = Profiler.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "default profile must not multiply the input per distinct column")
    // approx distinct lands within HLL tolerance of truth
    val got = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(math.abs(got("a") - 17L) <= 2 && math.abs(got("id") - 5000L) <= 500)
    // the exact form is the one that buys Expand
    val exactPlan = Profiler.profile(df, exactDistinct = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
  }

  test("categoricalDrift: hand-computed PSI terms with Laplace smoothing " +
      "over the union category set") {
    // a: x×6 y×2 ; b: x×2 z×2  — y and z each absent from one side
    val a = (Seq.fill(6)("x") ++ Seq.fill(2)("y")).toDF("c")
    val b = (Seq.fill(2)("x") ++ Seq.fill(2)("z")).toDF("c")
    val rows = graft.analytics.Profiler.categoricalDrift(a, b, "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // K=3, Na=8, Nb=4: rates = (n+1)*1e6 // (N+3)
    // x: a (7*1e6)//11 = 636363, b (3*1e6)//7 = 428571
    // y: a (3*1e6)//11 = 272727, b (1*1e6)//7 = 142857
    // z: a (1*1e6)//11 =  90909, b (3*1e6)//7 = 428571
    assert(rows("x")._3 === 636363L && rows("x")._4 === 428571L)
    assert(rows("y")._3 === 272727L && rows("y")._4 === 142857L)
    assert(rows("z")._3 === 90909L && rows("z")._4 === 428571L)
    // psi_term derives from the exact RATIONAL rates (n+1)/(N+K), not
    // the floored display columns
    def term(na: Long, nb: Long) = {
      val ra = (na + 1).toDouble / 11.0; val rb = (nb + 1).toDouble / 7.0
      BigDecimal((ra - rb) * math.log(ra / rb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows("x")._5 === term(6L, 2L))
    assert(rows("z")._5 === term(0L, 2L))
    // all terms positive (divergence) and PSI > 0.2 flags this drift
    val psi = rows.values.map(_._5).sum
    assert(psi > 0.2, s"expected drift alarm, psi=$psi")
    // identical snapshots → every term 0.0
    val zero = graft.analytics.Profiler.categoricalDrift(a, a, "c")
      .agg(sum(abs(col("psi_term")))).head.getDouble(0)
    assert(zero === 0.0)
  }

  test("inclusion: orphan counting with nulls ignored per FK semantics") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(9L), None).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val r = graft.analytics.Profiler
      .inclusion(child, "k", parent, "p", "child.k->parent").head
    assert(r.getString(0) === "child.k->parent")
    assert(r.getLong(1) === 6L && r.getLong(2) === 3L) // non-null rows/vals
    assert(r.getLong(3) === 1L) // the null, reported not orphaned
    assert(r.getLong(4) === 3L && r.getLong(5) === 1L) // 9 ×3 is orphaned
    // a holding FK reports zero orphans
    val ok = graft.analytics.Profiler
      .inclusion(child, "k", Seq(1L, 2L, 9L).toDF("p"), "p", "ok").head
    assert(ok.getLong(4) === 0L && ok.getLong(5) === 0L)
    // duplicate parent keys must not multiply anything
    val dup = graft.analytics.Profiler.inclusion(child, "k",
      Seq(1L, 1L, 2L, 9L, 9L).toDF("p"), "p", "dup").head
    assert(dup.getLong(1) === 6L && dup.getLong(4) === 0L)
  }

  test("snapshotDiff: added/removed/changed; unchanged and null-value " +
      "rows emit nothing; compareCols scope what counts as change") {
    val v1 = Seq(
      (1L, Some("a"), "keep"), (2L, Some("b"), "keep"),
      (3L, Some("c"), "keep"), (4L, Option.empty[String], "keep"),
      (5L, Some("e"), "meta1")).toDF("pk", "v", "meta")
    val v2 = Seq(
      (1L, Some("a"), "keep"),             // unchanged
      (2L, Some("B"), "keep"),             // changed
      (4L, Option.empty[String], "keep"),  // unchanged (null == null)
      (5L, Some("e"), "meta2"),            // meta drift only — NOT compared
      (6L, Some("f"), "keep")              // added
    ).toDF("pk", "v", "meta")
    val d = graft.analytics.Profiler
      .snapshotDiff(v1, v2, Seq("pk"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(2L -> "changed", 3L -> "removed", 6L -> "added"))
    // widening compareCols to meta surfaces row 5
    val d2 = graft.analytics.Profiler
      .snapshotDiff(v1, v2, Seq("pk"), Seq("v", "meta"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2(5L) === "changed" && d2.size === 4)
    // null vs non-null is a CHANGE even for adversarial values: the
    // empty string and a literal U+0002 both differ from NULL (the
    // null-flag-prefix encoding admits no value/NULL collision)
    val x1 = Seq((1L, Option.empty[String])).toDF("pk", "v")
    for (adversarial <- Seq("", "\u0002", "N")) {
      val x2 = Seq((1L, Option(adversarial))).toDF("pk", "v")
      assert(graft.analytics.Profiler
        .snapshotDiff(x1, x2, Seq("pk"), Seq("v")).count() === 1L,
        s"null vs ${adversarial.length}-char value must diff")
    }
  }

  test("categoricalDrift: psi_term stays finite when an integer rate " +
      "floors to zero (the >1e6-rows-per-side regime)") {
    // 1.2M 'x' rows per side + one one-sided 'zz' row: zz's smoothed
    // integer micro-unit rate is (0+1)*1e6 // (1_200_001+2) = 0, but the
    // rational rate is tiny-positive — psi must not be Inf/NaN
    val a = spark.range(1200000).select(lit("x").as("c"))
      .union(Seq("zz").toDF("c"))
    val b = spark.range(1200000).select(lit("x").as("c"))
    val rows = graft.analytics.Profiler.categoricalDrift(a, b, "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val zz = rows("zz")
    assert(zz._1 === 0L || zz._2 === 0L) // the floored display rate IS 0
    assert(!zz._3.isInfinite && !zz._3.isNaN, s"psi_term ${zz._3}")
    val psi = rows.values.map(_._3).sum
    assert(!psi.isInfinite && !psi.isNaN && psi >= 0.0)
  }

  test("snapshotDiff: separator injection across column boundaries is " +
      "a change, not a collision (length-prefixed framing)") {
    // values deliberately CONTAIN the \u0001 joiner and spoofed
    // "V<len>:" prefixes; only uniquely-decodable framing keeps the
    // signatures distinct
    val a = Seq((1L, "x\u0001V2:y", "z")).toDF("pk", "c1", "c2")
    val b = Seq((1L, "x", "y\u0001V1:z")).toDF("pk", "c1", "c2")
    val d = graft.analytics.Profiler
      .snapshotDiff(a, b, Seq("pk"), Seq("c1", "c2")).collect()
    assert(d.length === 1 && d.head.getString(1) === "changed")
  }

  test("inclusion: empty child reports all-zero metrics, never NULL") {
    val child = Seq.empty[(Long, Long)].toDF("k", "x")
    val r = graft.analytics.Profiler
      .inclusion(child, "k", Seq(1L).toDF("p"), "p", "empty").head
    assert((1 to 5).forall(!r.isNullAt(_)))
    assert((1 to 5).map(r.getLong(_)).forall(_ === 0L))
  }

  test("profile: map-typed columns — including maps NESTED in arrays — " +
      "are skipped for distincts, not fatal") {
    val df = Seq((1L, Map("a" -> 1), Seq(Map("x" -> 1))),
      (2L, Map("b" -> 2), Seq(Map("y" -> 2))))
      .toDF("id", "m", "am")
    val rows = Profiler.profile(df, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("m").isNullAt(4)) // n_distinct undefined for maps
    assert(rows("am").isNullAt(4)) // array<map> would crash un-guarded
    assert(rows("m").getLong(3) === 0L) // nulls still counted
    assert(rows("id").getLong(4) === 2L) // other columns unaffected
  }

  test("correlationMatrix: exact +1/-1 on linear columns, ~0 on " +
      "independents, pairwise-complete nulls, zero-variance NULL") {
    val df = spark.range(1000).select(
      col("id").cast("double").as("a"),
      (col("id") * 3 + 7).cast("double").as("b"),   // corr(a,b) = 1
      (lit(0) - col("id")).cast("double").as("c"),  // corr(a,c) = -1
      pmod(xxhash64(col("id")), lit(1000)).cast("double").as("r"),
      lit(5.0).as("k"),                             // zero variance
      when(col("id") % 2 === 0, col("id").cast("double")).as("h"))
    val m = graft.analytics.Profiler.correlationMatrix(df,
        Seq("a", "b", "c", "r", "k", "h"))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), if (x.isNullAt(3)) None else Some(x.getDouble(3))))
      .toMap
    assert(m(("a", "b"))._2 === Some(1.0))
    assert(m(("a", "c"))._2 === Some(-1.0))
    assert(math.abs(m(("a", "r"))._2.get) < 0.1) // hash ~independent
    // constant column: zero variance → NULL, for every pair touching k
    assert(m(("a", "k"))._2 === None && m(("k", "h"))._2 === None)
    // pairwise-complete: h is null on odd ids, so (a,h) sees 500 rows
    // while (a,b) keeps all 1000
    assert(m(("a", "h"))._1 === 500L && m(("a", "b"))._1 === 1000L)
    assert(m(("a", "h"))._2 === Some(1.0))
    assert(m.size === 15)
  }

  test("spearman: monotone-but-nonlinear hits exactly 1, hand-computed " +
      "tie case, reversal -1, constant column NULL, dirty rows drop") {
    import spark.implicits._
    // any MONOTONE relation scores 1 (where Pearson would not): y = x³
    val mono = (1 to 50).map(i => (i.toDouble, math.pow(i.toDouble, 3)))
      .toDF("x", "y")
    val rm = graft.analytics.Profiler.spearman(mono, "x", "y").head
    assert(rm.getLong(0) == 50L && rm.getDouble(1) == 1.0)
    // hand-computed tie case: x = 1,2,2,3 (avg ranks 1, 2.5, 2.5, 4),
    // y strictly increasing ⇒ ρ = 72/(√72·√80) ≈ 0.948683
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 40.0))
      .toDF("x", "y")
    val rt = graft.analytics.Profiler.spearman(tied, "x", "y").head
    assert(math.abs(rt.getDouble(1) - 0.948683) < 1e-6,
      rt.getDouble(1).toString)
    // perfect reversal
    val rev = (1 to 20).map(i => (i.toDouble, (100 - i).toDouble))
      .toDF("x", "y")
    assert(graft.analytics.Profiler.spearman(rev, "x", "y")
      .head.getDouble(1) == -1.0)
    // a constant column has zero rank variance ⇒ NULL
    val const = (1 to 9).map(i => (i.toDouble, 5.0)).toDF("x", "y")
    val rc = graft.analytics.Profiler.spearman(const, "x", "y").head
    assert(rc.isNullAt(1))
    // NaN/Inf/NULL rows drop PAIRWISE (n reflects the survivors)
    val dirty = Seq((1.0, 1.0), (2.0, Double.NaN),
      (Double.PositiveInfinity, 3.0), (4.0, 4.0), (5.0, 5.0))
      .toDF("x", "y")
    val rd = graft.analytics.Profiler.spearman(dirty, "x", "y").head
    assert(rd.getLong(0) == 3L && rd.getDouble(1) == 1.0)
  }

  test("kAnonymity: min class size, threshold exposure, null as a " +
      "linkable value") {
    // classes: (a,1)x5 (a,2)x2 (b,1)x1 (null,1)x3
    val df = (Seq.fill(5)((Some("a"), 1)) ++ Seq.fill(2)((Some("a"), 2))
      ++ Seq((Option.empty[String], 1), (Option.empty[String], 1),
        (Option.empty[String], 1)) :+ ((Some("b"): Option[String]), 1))
      .toDF("q1", "q2")
    val r = graft.analytics.Profiler
      .kAnonymity(df, Seq("q1", "q2"), threshold = 3L).head
    assert(r.getLong(0) === 1L) // the singleton (b,1) sets k
    assert(r.getLong(1) === 4L && r.getLong(2) === 11L)
    assert(r.getLong(3) === 3L) // rows below k=3: (a,2)x2 + (b,1)x1
    assert(r.getLong(4) === 2L)
    // fully k-anonymous data reports zero exposure
    val safe = (Seq.fill(4)("x") ++ Seq.fill(4)("y")).toDF("q1")
    val rs = graft.analytics.Profiler
      .kAnonymity(safe, Seq("q1"), threshold = 3L).head
    assert(rs.getLong(0) === 4L && rs.getLong(3) === 0L
      && rs.getLong(4) === 0L)
  }

  test("lDiversity: min per-class distinct sensitive count, threshold " +
      "exposure, NULL sensitive counts as a distinct value") {
    // class a: sensitive {1,2,3} (l=3, 4 rows); class b: {7,7,7} (l=1,
    // 3 rows — the homogeneity attack); class c: {5, null} (l=2 — a
    // count-distinct would report 1 and miss the partition)
    val df = Seq(
      ("a", Some(1)), ("a", Some(2)), ("a", Some(3)), ("a", Some(1)),
      ("b", Some(7)), ("b", Some(7)), ("b", Some(7)),
      ("c", Some(5)), ("c", Option.empty[Int]))
      .toDF("q", "s")
    val r = graft.analytics.Profiler
      .lDiversity(df, Seq("q"), "s", threshold = 3L).head
    assert(r.getLong(0) === 1L) // class b's homogeneity sets l
    assert(r.getLong(1) === 3L && r.getLong(2) === 9L)
    assert(r.getLong(3) === 5L) // rows below l=3: b (3) + c (2)
    assert(r.getLong(4) === 2L)
  }

  test("tCloseness: hand-computed total variation per class, threshold " +
      "census, identical distributions score 0, NULL sensitive counts") {
    // classes A {x,x,y} and B {y,y,y}; global (x:2, y:4), N=6.
    // P_A=(2/3,1/3) vs Q=(1/3,2/3) ⇒ TV 1/3; P_B=(0,1) ⇒ TV 1/3
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "y"), ("B", "y"), ("B", "y")).toDF("q", "s")
    val r = graft.analytics.Profiler
      .tCloseness(df, Seq("q"), "s", thresholdX1e6 = 200000L).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (333333L, 2L, 6L, 6L, 2L))
    // a higher threshold clears the census
    val r4 = graft.analytics.Profiler
      .tCloseness(df, Seq("q"), "s", thresholdX1e6 = 400000L).head
    assert(r4.getLong(0) == 333333L && r4.getLong(3) == 0L &&
      r4.getLong(4) == 0L)
    // every class mirroring the table is perfectly close
    val same = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("q", "s")
    assert(graft.analytics.Profiler
      .tCloseness(same, Seq("q"), "s").head.getLong(0) == 0L)
    // NULL sensitive is a value: all-null classes match an all-null
    // table exactly (a dropped-null join would lose the class mass)
    val nulls = Seq(("A", Option.empty[String]),
      ("B", Option.empty[String])).toDF("q", "s")
    val rn = graft.analytics.Profiler
      .tCloseness(nulls, Seq("q"), "s").head
    assert(rn.getLong(0) == 0L && rn.getLong(2) == 2L)
    intercept[IllegalArgumentException] {
      graft.analytics.Profiler.tCloseness(df, Seq.empty, "s")
    }
  }

  test("benford: a perfect Benford sample scores chi2 ~0, uniform digits " +
      "alarm; zero/null/negative/sub-1 handling") {
    // counts proportional to log10(1+1/d) out of 10000
    val benfordish = (1 to 9).flatMap { d =>
      val n = math.round(math.log10(1.0 + 1.0 / d) * 10000).toInt
      Seq.fill(n)(d * 111.0) // value with first digit d
    }
    val good = graft.analytics.Profiler
      .benford(benfordish.toDF("v"), "v")
      .agg(sum("chi2_term")).head.getDouble(0)
    assert(good < 1.0, s"benford-shaped data must score low, got $good")
    // uniform first digits: far over the chi2_8 p=.05 line (~15.5)
    val uniform = (1 to 9).flatMap(d => Seq.fill(1000)(d * 10.0))
    val bad = graft.analytics.Profiler
      .benford(uniform.toDF("v"), "v")
      .agg(sum("chi2_term")).head.getDouble(0)
    assert(bad > 15.5, s"uniform digits must alarm, got $bad")
    // exclusions and magnitude handling: null/zero dropped, -0.034 → 3,
    // 0.0072 → 7
    val edge = Seq(Some(0.0), None, Some(-0.034), Some(0.0072))
      .toDF("v")
    val rows = graft.analytics.Profiler.benford(edge, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows(3) === 1L && rows(7) === 1L)
    assert(rows.values.sum === 2L)
    // every digit 1-9 gets a row even with zero observations
    assert(rows.size === 9)
  }

  test("mutualInformation: zero for independent columns, ln(2) for a " +
      "deterministic bijection, NULL cells are real bins") {
    // independent: every (x, y) combination equally likely → MI 0
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q"); _ <- 1 to 5)
      yield (x, y)).toDF("x", "y")
    val miInd = graft.analytics.Profiler.mutualInformation(ind, "x", "y")
      .agg(sum("mi_term")).head.getDouble(0)
    assert(math.abs(miInd) < 1e-9, s"independent MI must be 0, got $miInd")

    // bijection over 2 uniform values: MI = H = ln 2
    val bij = Seq.fill(10)(("a", "p")) ++ Seq.fill(10)(("b", "q"))
    val miBij = graft.analytics.Profiler
      .mutualInformation(bij.toDF("x", "y"), "x", "y")
      .agg(sum("mi_term")).head.getDouble(0)
    assert(math.abs(miBij - math.log(2)) < 1e-5, s"got $miBij")

    // hand-computed asymmetric cell: n=(aa:3, ab:1, bb:4) N=8
    val h = Seq(("a", "A"), ("a", "A"), ("a", "A"), ("a", "B"),
      ("b", "B"), ("b", "B"), ("b", "B"), ("b", "B")).toDF("x", "y")
    val cells = graft.analytics.Profiler.mutualInformation(h, "x", "y")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(cells(("a", "A"))._1 === 3L && cells(("a", "A"))._2 === 4L
      && cells(("a", "A"))._3 === 3L)
    val expect = BigDecimal(3.0 / 8 * math.log((3.0 / 8)
      / ((4.0 / 8) * (3.0 / 8))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(cells(("a", "A"))._4 === expect)

    // NULL category is a bin, not dropped
    val withNull = Seq((Some("a"), Some("A")), (None, Some("A")))
      .toDF("x", "y")
    assert(graft.analytics.Profiler
      .mutualInformation(withNull, "x", "y").count() === 2L)
  }

  test("categoricalDrift: NULL category participates as a real bin") {
    val a = Seq(Some("x"), None, None).toDF("c")
    val b = Seq(Some("x"), Some("x"), None).toDF("c")
    val rows = graft.analytics.Profiler.categoricalDrift(a, b, "c").collect()
    assert(rows.length === 2)
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) === 2L && nullRow.getLong(2) === 1L)
  }

  test("profile: column names needing backtick quoting survive") {
    val df = Seq((1L, "v")).toDF("id", "weird name.dot")
    val p = Profiler.profile(df, exactDistinct = true).collect()
    assert(p.map(_.getString(0)).toSet === Set("id", "weird name.dot"))
  }

  test("lorenzCurve: hand-traced bands and shares, tie run split " +
      "exactly, negative drop, zero-total NULL shares") {
    import graft.analytics.Profiler
    def lz(vals: Seq[Double], b: Int) =
      Profiler.lorenzCurve(vals.toDF("x"), "x", buckets = b)
        .orderBy(col("decile"))
        .as[(Long, Long, Long, Long, Long, Long, Option[Long])]
        .collect().toSeq
    // {1,1,3,5} in halves: bottom half holds 2/10 of the mass
    assert(lz(Seq(1.0, 1.0, 3.0, 5.0), 2) == Seq(
      (0L, 2L, 2000000L, 2L, 2000000L, 500000L, Some(200000L)),
      (1L, 2L, 8000000L, 4L, 10000000L, 1000000L, Some(1000000L))))
    // one all-tied run of 3 splits 2/1 — sums split as value·count
    assert(lz(Seq(2.0, 2.0, 2.0), 2) == Seq(
      (0L, 2L, 4000000L, 2L, 4000000L, 666666L, Some(666666L)),
      (1L, 1L, 2000000L, 3L, 6000000L, 1000000L, Some(1000000L))))
    // negative values drop (Lorenz undefined); zero totals have
    // population shares but no value shares
    assert(lz(Seq(-1.0, 0.0, 0.0), 2) == Seq(
      (0L, 1L, 0L, 1L, 0L, 500000L, None),
      (1L, 1L, 0L, 2L, 0L, 1000000L, None)))
  }

  test("concentration: hand-computed HHI, uniform and single-source " +
      "poles, NULL drop, empty input") {
    import graft.analytics.Profiler
    def hhi(rows: Seq[Option[String]]) =
      Profiler.concentration(rows.toDF("src"), "src")
        .as[(Long, Long, Option[Long], Option[Long])].head()
    // {a×3, b×1}: Σn²/N² = 10/16 ⇒ 625000; effective 1/0.625 = 1.6
    assert(hhi(Seq("a", "a", "a", "b").map(Option(_))) ==
      ((2L, 4L, Some(625000L), Some(1600000L))))
    // uniform over 2 → HHI 1/2, effective exactly 2
    assert(hhi(Seq("a", "a", "b", "b").map(Option(_))) ==
      ((2L, 4L, Some(500000L), Some(2000000L))))
    // a single source is maximal concentration
    assert(hhi(Seq("a", "a").map(Option(_))) ==
      ((1L, 2L, Some(1000000L), Some(1000000L))))
    // NULL categories drop; all-NULL behaves as empty
    assert(hhi(Seq(Option("a"), None)) ==
      ((1L, 1L, Some(1000000L), Some(1000000L))))
    assert(hhi(Seq(None)) == ((0L, 0L, None, None)))
  }
}
