package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Evaluation

/** AUC (Mann–Whitney with average-rank ties) and the calibration table:
  * hand-checked values, tie exactness, degenerate groups, bin edges. */
class EvaluationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def auc(rows: Seq[(String, Boolean, Double)]): Map[String, Row] =
    Evaluation.aucByGroup(rows.toDF("g", "y", "s"), Seq("g"),
        col("y"), "s")
      .collect().map(r => r.getString(0) -> r).toMap
  private type Row = org.apache.spark.sql.Row

  test("aucByGroup: perfect, inverted, interleaved, all-tied, one-class") {
    val r = auc(Seq(
      ("perfect", false, 1.0), ("perfect", false, 2.0),
      ("perfect", true, 3.0), ("perfect", true, 4.0),
      ("inverted", true, 1.0), ("inverted", true, 2.0),
      ("inverted", false, 3.0), ("inverted", false, 4.0),
      ("inter", true, 1.0), ("inter", false, 2.0),
      ("inter", true, 3.0), ("inter", false, 4.0),
      ("tied", true, 5.0), ("tied", false, 5.0),
      ("tied", true, 5.0), ("tied", false, 5.0),
      ("onecls", true, 1.0), ("onecls", true, 2.0)))
    assert(r("perfect").getDouble(3) == 1.0)
    assert(r("inverted").getDouble(3) == 0.0)
    assert(r("inter").getDouble(3) == 0.25)
    assert(r("tied").getDouble(3) == 0.5) // average-rank tie treatment
    assert(r("onecls").isNullAt(3))
    assert(r("perfect").getLong(1) == 2L && r("perfect").getLong(2) == 2L)
  }

  test("aucByGroup: partial tie equals the pairwise win/tie count") {
    // pos {2} vs neg {1, 2, 3}: win + half-tie + loss = 1.5/3 = 0.5
    val r = auc(Seq(("g", true, 2.0), ("g", false, 1.0),
      ("g", false, 2.0), ("g", false, 3.0)))
    assert(r("g").getDouble(3) == 0.5)
  }

  test("aucByGroup is invariant to row order and partitioning") {
    val rows = (1 to 200).map(i =>
      ("g", i % 3 == 0, (i * 37 % 50).toDouble))
    val vals = (1 to 3).map { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      Evaluation.aucByGroup(shuffled.toDF("g", "y", "s")
          .repartition(seed * 2), Seq("g"), col("y"), "s")
        .head.getDouble(3)
    }.distinct
    assert(vals.size == 1)
  }

  private def discount(r: Int): Double =
    1.0 / (math.log(r + 1.0) / math.log(2.0))
  private def micros(gain: Long, r: Int): Long =
    math.floor(gain.toDouble * discount(r) * 1e6).toLong

  private def ap(rows: Seq[(String, Boolean, Double, Long)])
      : Map[String, Row] =
    Evaluation.averagePrecisionByGroup(rows.toDF("g", "y", "s", "id"),
        Seq("g"), col("y"), "s", "id")
      .collect().map(r => r.getString(0) -> r).toMap

  test("averagePrecisionByGroup: hand-computed AP, perfect/inverted/" +
      "interleaved, no-positive NULL") {
    val r = ap(Seq(
      // perfect: positives at ranks 1,2 -> (1/1 + 2/2)/2 = 1
      ("perfect", true, 4.0, 1L), ("perfect", true, 3.0, 2L),
      ("perfect", false, 2.0, 3L), ("perfect", false, 1.0, 4L),
      // inverted: positives at ranks 3,4 -> (1/3 + 2/4)/2 = 5/12
      ("inverted", false, 4.0, 1L), ("inverted", false, 3.0, 2L),
      ("inverted", true, 2.0, 3L), ("inverted", true, 1.0, 4L),
      // interleaved p,n,p,n: (1/1 + 2/3)/2 = 5/6
      ("inter", true, 4.0, 1L), ("inter", false, 3.0, 2L),
      ("inter", true, 2.0, 3L), ("inter", false, 1.0, 4L),
      ("nopos", false, 1.0, 1L), ("nopos", false, 2.0, 2L)))
    assert(r("perfect").getDouble(3) == 1.0)
    // micro-floored terms: floor(1e6/3)=333333, floor(1e6·2/4)=500000
    assert(r("inverted").getDouble(3) == math.rint(
      (333333 + 500000) / 2.0) / 1e6 || r("inverted").getDouble(3)
        == 0.416667)
    assert(r("inter").getDouble(3) == 0.833333)
    assert(r("nopos").isNullAt(3))
    assert(r("perfect").getLong(1) == 2L && r("perfect").getLong(2) == 2L)
  }

  test("averagePrecisionByGroup: score ties break on id — deterministic " +
      "under shuffled input") {
    val rows = Seq(
      ("g", true, 2.0, 10L), ("g", false, 2.0, 11L),
      ("g", true, 2.0, 12L), ("g", false, 1.0, 13L))
    // total order by (s desc, id asc): ids 10,11,12,13 -> positives at
    // ranks 1 and 3: AP = (1 + floor-2/3)/2
    val expected = (1000000L + 666666L) / 2.0 / 1e6
    for (seed <- 1 to 3) {
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      val r = ap(shuffled)
      assert(r("g").getDouble(3) == math.rint(expected * 1e6) / 1e6 ||
        r("g").getDouble(3) == 0.833333)
    }
  }

  test("ndcgByQuery: ideal ranking = 1, reversed matches the closed " +
      "form, all-zero rel NULL, k cutoff") {
    val df = Seq(
      // ideal: score order == rel order
      ("ideal", 1L, 3, 0.9), ("ideal", 2L, 2, 0.8),
      ("ideal", 3L, 1, 0.7), ("ideal", 4L, 0, 0.6),
      // reversed: score order inverts rel order
      ("rev", 1L, 3, 0.1), ("rev", 2L, 2, 0.2),
      ("rev", 3L, 1, 0.3), ("rev", 4L, 0, 0.4),
      ("zero", 1L, 0, 0.9), ("zero", 2L, 0, 0.1)
    ).toDF("q", "id", "rel", "s")
    val r = Evaluation.ndcgByQuery(df, Seq("q"), "id", "rel", "s", k = 10)
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r("ideal").getDouble(4) == 1.0)
    val idcg = micros(7, 1) + micros(3, 2) + micros(1, 3) + micros(0, 4)
    val dcgRev = micros(0, 1) + micros(1, 2) + micros(3, 3) + micros(7, 4)
    assert(r("rev").getLong(2) == dcgRev && r("rev").getLong(3) == idcg)
    assert(r("rev").getDouble(4) ==
      math.rint(dcgRev.toDouble / idcg.toDouble * 1e6) / 1e6 ||
      math.abs(r("rev").getDouble(4) - dcgRev.toDouble / idcg) < 1e-6)
    assert(r("zero").isNullAt(4) && r("zero").getLong(2) == 0L)

    // k=2 cuts the tail from BOTH dcg and idcg
    val r2 = Evaluation.ndcgByQuery(df.filter($"q" === "rev"),
      Seq("q"), "id", "rel", "s", k = 2).head
    assert(r2.getLong(3) == micros(7, 1) + micros(3, 2))
    assert(r2.getLong(2) == micros(0, 1) + micros(1, 2))
  }

  test("ndcgByQuery: score ties break on id — deterministic under " +
      "shuffling") {
    val rows = (1 to 40).map(i => ("q", i.toLong, i % 4, (i % 5) * 0.2))
    val vals = (1 to 3).map { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      Evaluation.ndcgByQuery(shuffled.toDF("q", "id", "rel", "s")
          .repartition(seed * 3), Seq("q"), "id", "rel", "s", k = 5)
        .head.getDouble(4)
    }.distinct
    assert(vals.size == 1)
  }

  test("cuped: perfect covariate collapses both variants to the pooled " +
      "mean (var_reduction 1), constant covariate falls back to raw, " +
      "closed form matches") {
    import graft.analytics.Experiment
    // perfect: x == y ⇒ θ = 1, adj means both = pooled mean
    val perfect = Seq((false, 1.0, 1.0), (false, 2.0, 2.0),
      (true, 3.0, 3.0), (true, 5.0, 5.0)).toDF("b", "y", "x")
    val p = Experiment.cuped(perfect, col("b"), "y", "x").head
    assert(p.getDouble(8) == 4.0 - 1.5)            // raw diff preserved
    assert(p.getDouble(6) == 1.0)                  // theta
    assert(p.getDouble(7) == 1.0)                  // var_reduction = rho^2
    assert(p.getDouble(4) == 2.75 && p.getDouble(5) == 2.75) // pooled mean
    assert(p.getDouble(9) == 0.0)                  // adj_diff

    // constant covariate: zero variance ⇒ NULL theta, adjusted = raw
    val const = Seq((false, 1.0, 7.0), (true, 3.0, 7.0)).toDF("b", "y", "x")
    val c = Experiment.cuped(const, col("b"), "y", "x").head
    assert(c.isNullAt(6) && c.isNullAt(7))
    assert(c.getDouble(4) == 1.0 && c.getDouble(5) == 3.0)
    assert(c.getDouble(9) == 2.0)

    // general case vs the closed form recomputed with the same math
    val g = Experiment.cuped(Seq((false, 1.0, 1.0), (false, 2.0, 2.0),
      (true, 3.0, 2.0), (true, 5.0, 4.0)).toDF("b", "y", "x"),
      col("b"), "y", "x").head
    val (n, sx, sy, sxx, sxy) = (4.0, 9.0, 11.0, 25.0, 31.0)
    val varx = n * sxx - sx * sx
    val theta = (n * sxy - sx * sy) / varx
    val xbar = sx / n
    val adjA = 1.5 - theta * (1.5 - xbar)
    val adjB = 4.0 - theta * (3.0 - xbar)
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(math.abs(g.getDouble(4) - r6(adjA)) < 2e-6)
    assert(math.abs(g.getDouble(5) - r6(adjB)) < 2e-6)
    assert(math.abs(g.getDouble(9) - r6(adjB - adjA)) < 2e-6)
  }

  test("calibrationTable: bin edges, score 1.0 in top bin, exact means, " +
      "out-of-range and null drop") {
    val df = Seq(
      (true, Some(0.05)), (false, Some(0.05)),   // bin 0
      (true, Some(0.55)),                         // bin 5
      (true, Some(0.95)), (true, Some(1.0)),      // bin 9 (1.0 clamps)
      (false, Some(1.5)), (true, Some(-0.1)),     // out of range: drop
      (true, None)                                // null: drop
    ).toDF("y", "s")
    val bins = Evaluation.calibrationTable(df, col("y"), "s", bins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(bins.keySet == Set(0, 5, 9))
    val b0 = bins(0)
    assert(b0.getLong(1) == 2L && b0.getLong(2) == 1L)
    assert(b0.getLong(3) == 50000L && b0.getDouble(4) == 0.5)
    val b9 = bins(9)
    assert(b9.getLong(1) == 2L && b9.getLong(2) == 2L)
    // mean of micro(0.95)=949999 (floor of 0.95*1e6 under the double
    // repr) or 950000 and micro(1.0)=1000000 — assert via recompute
    val m95 = math.floor(0.95 * 1e6).toLong
    assert(b9.getLong(3) == (m95 + 1000000L) / 2L)
    assert(b9.getDouble(4) == 1.0)
  }

  test("mrrByGroup: hand-computed reciprocal ranks, miss counts as 0, " +
      "k cutoff, score-tie broken by id, dirty rows drop") {
    // group g: u1 first relevant at rank 2 (rr 500000), u2 no relevant
    // (rr 0), u3 relevant at rank 1 (rr 1e6) ⇒ mrr = ⌊1.5e6/3⌋,
    // hit_rate = ⌊2e6/3⌋
    val df = Seq(
      ("g", "u1", false, 0.9, "a"), ("g", "u1", true, 0.8, "b"),
      ("g", "u1", true, 0.7, "c"),
      ("g", "u2", false, 0.5, "d"), ("g", "u2", false, 0.4, "e"),
      ("g", "u3", true, 0.9, "f"),
      // group h: tie at 0.9 — id asc ranks p before q, so the
      // relevant q sits at rank 2
      ("h", "u4", false, 0.9, "p"), ("h", "u4", true, 0.9, "q"))
      .toDF("g", "u", "y", "s", "id")
    val r = Evaluation.mrrByGroup(df, Seq("g"), Seq("u"), col("y"),
        "s", "id").collect()
      .map(x => x.getString(0) -> x).toMap
    assert((r("g").getLong(1), r("g").getLong(2), r("g").getLong(3),
      r("g").getLong(4)) == (3L, 2L, 500000L, 666666L))
    assert((r("h").getLong(1), r("h").getLong(2), r("h").getLong(3),
      r("h").getLong(4)) == (1L, 1L, 500000L, 1000000L))
    // k = 1: u1's rank-2 hit falls outside the cutoff ⇒ rr 0
    val k1 = Evaluation.mrrByGroup(df, Seq("g"), Seq("u"), col("y"),
        "s", "id", k = 1).collect()
      .map(x => x.getString(0) -> x).toMap
    assert((k1("g").getLong(2), k1("g").getLong(3)) == (1L, 333333L))
    // NULL score/label rows drop before ranking: a NULL-scored
    // relevant row cannot occupy a rank
    val dirty = df.union(Seq(("g", "u2", true, Option.empty[Double],
      "z")).toDF("g", "u", "y", "s", "id"))
    val rd = Evaluation.mrrByGroup(dirty, Seq("g"), Seq("u"), col("y"),
        "s", "id").collect().map(x => x.getString(0) -> x).toMap
    assert(rd("g").toSeq == r("g").toSeq)
    intercept[IllegalArgumentException] {
      Evaluation.mrrByGroup(df, Seq("g"), Seq("u"), col("y"), "s",
        "id", k = 0)
    }
  }

  test("bestF1Threshold: hand-swept cutoffs — the 4/5 operating point " +
      "wins, a no-positive group returns its smallest cutoff at f1 0, " +
      "NULL rows drop") {
    // group 0 sweep (desc): t=.9 f1=2/3; t=.8 1/2; t=.7 tp2 fp1 fn0
    // -> 4/5 BEST; t=.6 2/3; t=.5 4/7. Micro thresholds are the exact
    // double floors (0.7*1e6 rounds to exactly 700000.0 in IEEE).
    val df = Seq(
      (0L, true, Some(0.9)), (0L, false, Some(0.8)),
      (0L, true, Some(0.7)), (0L, false, Some(0.6)),
      (0L, false, Some(0.5)), (0L, true, Option.empty[Double]),
      (1L, false, Some(0.3)), (1L, false, Some(0.1)))
      .toDF("g", "y", "s")
    val out = Evaluation.bestF1Threshold(df, Seq("g"), col("y"), "s")
      .orderBy($"g")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 700000L, 2L, 1L, 0L, 800000L),
      (1L, 100000L, 0L, 2L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Evaluation.bestF1Threshold(df, Seq.empty, col("y"), "s")
    }
  }

  test("precisionRecallAtK: hand-computed macro means, fixed-slot " +
      "penalty, id tie-break, no-relevant recall NULL") {
    def pr(rows: Seq[(String, Long, Long, Boolean, Double)], k: Int) =
      Evaluation.precisionRecallAtK(
          rows.toDF("g", "q", "id", "y", "s"), Seq("g"), Seq("q"),
          col("y"), "s", "id", k)
        .orderBy(col("g"))
        .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    // q1: top-2 of (.9 rel, .5 not, .3 rel) ⇒ hits 1, nrel 2 → both
    // terms 500000; q2: one irrelevant doc ⇒ prec 0, excluded from
    // recall; q3: 2 rel hits ⇒ 10⁶/10⁶. Macro: prec (5+0+10)/3·10⁵,
    // recall (5+10)/2·10⁵
    val rows = Seq(
      ("g", 1L, 1L, true, 0.9), ("g", 1L, 2L, false, 0.5),
      ("g", 1L, 3L, true, 0.3),
      ("g", 2L, 4L, false, 0.7),
      ("g", 3L, 5L, true, 0.8), ("g", 3L, 6L, true, 0.6))
    assert(pr(rows, 2) == Seq(("g", 3L, 2L, Some(500000L).get, Some(750000L))))
    // fixed-slot: a 1-candidate query at k=2 still divides by k
    val short = Seq(("g", 1L, 1L, true, 0.9))
    assert(pr(short, 2) == Seq(("g", 1L, 1L, 500000L, Some(1000000L))))
    // score tie at k=1 resolves by id ASC: the irrelevant id 1 wins
    // the slot
    val tie = Seq(("g", 1L, 1L, false, 0.9), ("g", 1L, 2L, true, 0.9))
    assert(pr(tie, 1) == Seq(("g", 1L, 1L, 0L, Some(0L))))
    // no query has a relevant doc: recall has nothing to average
    val none = Seq(("g", 1L, 1L, false, 0.9), ("g", 2L, 2L, false, 0.8))
    assert(pr(none, 1) == Seq(("g", 2L, 0L, 0L, None)))
  }

  test("liftTable: hand-traced bands with tie runs split across a " +
      "boundary, positives-first convention, sparse bands, " +
      "no-positive NULLs, two-group offsets") {
    def lt(rows: Seq[(String, Double, Boolean)], b: Int) =
      Evaluation.liftTable(rows.toDF("g", "s", "y"), Seq("g"),
          col("y"), "s", buckets = b)
        .orderBy(col("g"), col("decile"))
        .as[(String, Long, Long, Long, Long, Long,
          Option[Long], Option[Long])].collect().toSeq
    // 5 rows, halves: desc order (positives first at 0.8) is
    // .9T .8T .8F .7F .6F; band(r) = ⌊2r/5⌋ ⇒ bands {0,0,0},{1,1};
    // band 0 captures both positives: gain 10⁶, lift ⌊2·5·10⁶/(3·2)⌋
    val a = Seq(("a", 0.9, true), ("a", 0.8, false), ("a", 0.8, true),
      ("a", 0.7, false), ("a", 0.6, false))
    assert(lt(a, 2) == Seq(
      ("a", 0L, 3L, 2L, 3L, 2L, Some(1000000L), Some(1666666L)),
      ("a", 1L, 2L, 0L, 5L, 2L, Some(1000000L), Some(1000000L))))
    // one all-positive tie run of 3 splits 2/1 across the boundary —
    // the overlap arithmetic, not row order, decides the counts
    val split = Seq(("a", 0.5, true), ("a", 0.5, true), ("a", 0.5, true))
    assert(lt(split, 2) == Seq(
      ("a", 0L, 2L, 2L, 2L, 2L, Some(666666L), Some(1000000L)),
      ("a", 1L, 1L, 1L, 3L, 3L, Some(1000000L), Some(1000000L))))
    // n < buckets: only the occupied rank bands appear (r·10/3)
    val sparse = Seq(("a", 0.3, false), ("a", 0.2, true), ("a", 0.1, false))
    assert(lt(sparse, 10).map(r => (r._2, r._3, r._4)) ==
      Seq((0L, 1L, 0L), (3L, 1L, 1L), (6L, 1L, 0L)))
    // no positives: counts stay, gain/lift NULL; and a second group
    // exercises the per-group prefix offsets independently
    val two = Seq(("a", 0.9, false), ("a", 0.1, false),
      ("b", 0.9, true), ("b", 0.1, false))
    assert(lt(two, 2) == Seq(
      ("a", 0L, 1L, 0L, 1L, 0L, None, None),
      ("a", 1L, 1L, 0L, 2L, 0L, None, None),
      ("b", 0L, 1L, 1L, 1L, 1L, Some(1000000L), Some(2000000L)),
      ("b", 1L, 1L, 0L, 2L, 1L, Some(1000000L), Some(1000000L))))
  }

  test("bradleyTerry: exact two-item fixed point, zero-win sink, " +
      "transitive ordering, NULL drop, empty input") {
    import graft.analytics.Preference
    def bt(rows: Seq[(String, String)]) =
      Preference.bradleyTerry(rows.toDF("w", "l"), "w", "l")
        .as[(String, Long, Long, Long)].collect().toSeq
    // A beats B 3:1 — for two items BT strength IS the win fraction,
    // and the micro MM recursion hits (750000, 250000) exactly in one
    // round and stays there
    val ab = Seq.fill(3)(("A", "B")) :+ (("B", "A"))
    assert(bt(ab) == Seq(("A", 3L, 1L, 750000L), ("B", 1L, 3L, 250000L)))
    // an item that never wins sinks to exactly 0
    assert(bt(Seq(("A", "B"), ("A", "B"))) ==
      Seq(("A", 2L, 0L, 1000000L), ("B", 0L, 2L, 0L)))
    // a transitive tournament orders A > B > C
    val chain = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"))
    val r = bt(chain)
    assert(r.map(_._1) == Seq("A", "B", "C"))
    assert(r(0)._4 > r(1)._4 && r(1)._4 > r(2)._4)
    // NULL sides carry no comparison; empty input → empty table
    val dirty = Seq((Option("A"), Option("B")),
      (Option.empty[String], Option("B")), (Option("A"), None))
    assert(Preference.bradleyTerry(dirty.toDF("w", "l"), "w", "l")
      .count() == 2L)
    assert(bt(Seq.empty) == Seq.empty)
  }

  test("driver-matrix loud caps: bradleyTerry maxPairs, cohensKappa " +
      "maxCells, fleissKappa/krippendorffAlpha maxCategories fail " +
      "loudly past the cap and are invariant at it") {
    import graft.analytics.Preference
    // 3 distinct (winner, loser) pairs
    val prefs = Seq(("A", "B"), ("B", "C"), ("A", "C")).toDF("w", "l")
    val e1 = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(prefs, "w", "l", maxPairs = 2)
    }
    assert(e1.getMessage.contains("maxPairs"))
    // at the cap: identical to the uncapped run
    assert(Preference.bradleyTerry(prefs, "w", "l", maxPairs = 3)
        .collect().toSeq ==
      Preference.bradleyTerry(prefs, "w", "l").collect().toSeq)
    val two = Seq(("x", "x"), ("x", "y"), ("y", "y")).toDF("ra", "rb")
    val e2 = intercept[IllegalArgumentException] {
      Evaluation.cohensKappa(two, "ra", "rb", maxCells = 2)
    }
    assert(e2.getMessage.contains("maxCells"))
    val panel = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "a"))
      .toDF("u", "v")
    val e3 = intercept[IllegalArgumentException] {
      Evaluation.fleissKappa(panel, "u", "v", 2, maxCategories = 1)
    }
    assert(e3.getMessage.contains("maxCategories"))
    val e4 = intercept[IllegalArgumentException] {
      Evaluation.krippendorffAlpha(panel, "u", "v", maxCategories = 1)
    }
    assert(e4.getMessage.contains("maxCategories"))
  }

  test("conformalInterval: hand-computed ceil-rank threshold, test " +
      "coverage, infeasible-rank NULL, tie collapse, alpha bounds") {
    def ci(rows: Seq[(Boolean, Double, Double)], alpha: Long) =
      Evaluation.conformalInterval(rows.toDF("c", "p", "y"), col("c"),
          "p", "y", alphaX1e6 = alpha)
        .as[(Long, Long, Option[Long], Option[Long])].head()
    // 9 calibration residuals 1..9 at α=.1: k = ⌈10·.9⌉ = 9 ⇒ q̂ = 9;
    // test residuals {5 hit, 10 miss} ⇒ coverage 500000
    val cal = (1 to 9).map(i => (true, 0.0, i.toDouble))
    val test = Seq((false, 0.0, 5.0), (false, 0.0, 10.0))
    assert(ci(cal ++ test, 100000L) ==
      ((9L, 2L, Some(9000000L), Some(500000L))))
    // 3 calibration rows can't guarantee 90%: k = 4 > n ⇒ NULLs
    val few = (1 to 3).map(i => (true, 0.0, i.toDouble)) ++ test
    assert(ci(few, 100000L) == ((3L, 2L, None, None)))
    // tied residuals: the cumulative count crosses k inside the tie
    val tied = Seq.fill(3)((true, 2.0, 3.0)) :+ ((false, 2.0, 2.5))
    assert(ci(tied, 500000L) == ((3L, 1L, Some(1000000L),
      Some(1000000L))))
    intercept[IllegalArgumentException] {
      Evaluation.conformalInterval(test.toDF("c", "p", "y"), col("c"),
        "p", "y", alphaX1e6 = 0L)
    }
  }

  test("qiniCurve: hand-traced pooled bands, treatment-first tie " +
      "order, negative-uplift floor, empty-arm NULLs, grouped offsets") {
    def qc(rows: Seq[(String, Double, Boolean, Boolean)],
        groups: Seq[String]) =
      Evaluation.qiniCurve(rows.toDF("g", "s", "w", "y"), groups,
          col("w"), col("y"), "s", buckets = 2)
        .orderBy((groups.map(col) :+ col("decile")): _*)
        .as[(String, Long, Long, Long, Long, Long,
          Option[Long], Option[Long])].collect().toSeq
    def qg(rows: Seq[(Double, Boolean, Boolean)]) =
      Evaluation.qiniCurve(
          rows.map(r => ("x", r._1, r._2, r._3)).toDF("g", "s", "w", "y"),
          Seq.empty, col("w"), col("y"), "s", buckets = 2)
        .orderBy(col("decile"))
        .as[(Long, Long, Long, Long, Long,
          Option[Long], Option[Long])].collect().toSeq
    // alternating arms down the ranking: top band captures the
    // treated conversion, full curve nets to zero
    val alt = Seq((0.9, true, true), (0.8, false, false),
      (0.7, true, false), (0.6, false, true))
    assert(qg(alt) == Seq(
      (0L, 1L, 1L, 1L, 0L, Some(1000000L), Some(1000000L)),
      (1L, 1L, 0L, 1L, 1L, Some(0L), Some(0L))))
    // one tied score: treatment-first puts all T rows in band 0 —
    // band 0 has no control yet (NULLs); band 1's negative uplift
    // −2/3 must FLOOR to −666667, not truncate
    val neg = Seq((0.9, true, true), (0.9, true, false),
      (0.9, true, false), (0.9, false, true))
    assert(qg(neg) == Seq(
      (0L, 2L, 1L, 0L, 0L, None, None),
      (1L, 1L, 0L, 1L, 1L, Some(-666667L), Some(-2000000L))))
    // two groups band independently (per-group prefix offsets)
    val two = Seq(("a", 0.9, true, true), ("a", 0.1, false, false),
      ("b", 0.9, false, false), ("b", 0.1, true, true))
    assert(qc(two, Seq("g")) == Seq(
      ("a", 0L, 1L, 1L, 0L, 0L, None, None),
      ("a", 1L, 0L, 0L, 1L, 0L, Some(1000000L), Some(1000000L)),
      ("b", 0L, 0L, 0L, 1L, 0L, None, Some(0L)),
      ("b", 1L, 1L, 1L, 0L, 0L, Some(1000000L), Some(1000000L))))
  }

  test("krippendorffAlpha: hand-solved agreement/disagreement panels, " +
      "missing-data unit mix, unpairable units drop, degenerate NULL") {
    def alpha(rows: Seq[(Long, String)]): (Long, Long, Option[Long]) =
      Evaluation.krippendorffAlpha(rows.toDF("u", "v"), "u", "v")
        .as[(Long, Long, Option[Long])].head()
    // two agreeing pairs -> alpha 1
    assert(alpha(Seq(1L -> "a", 1L -> "a", 2L -> "b", 2L -> "b")) ==
      ((2L, 4L, Some(1000000L))))
    // balanced perfect disagreement -> alpha = -1/2 (negative floor)
    assert(alpha(Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b")) ==
      ((2L, 4L, Some(-500000L))))
    // one agree + one disagree: Do matches De exactly -> alpha 0
    assert(alpha(Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "b")) ==
      ((2L, 4L, Some(0L))))
    // mixed m (3-rater unit + pair), a singleton unit drops:
    // S3=0, S2=2, L=2, DoN=4; n=5, sum nc^2=17 -> den=2*8=16,
    // num=4*4=16 -> alpha 0
    assert(alpha(Seq(1L -> "a", 1L -> "a", 1L -> "a",
      2L -> "a", 2L -> "b", 3L -> "a")) == ((2L, 5L, Some(0L))))
    // all ratings one category: De = 0 -> undefined
    assert(alpha(Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "a")) ==
      ((2L, 4L, None)))
    // nothing pairable
    assert(alpha(Seq(1L -> "a", 2L -> "b")) == ((0L, 0L, None)))
  }

  test("raterAgreement: hand-traced majority with label-asc tie, " +
      "single-rating self-agreement, NULL drop") {
    // u1 x/x/y → gold x (C misses); u2 x vs y ties → label asc ⇒ x
    // (B misses); u3 has only A's z (self-agrees).
    // A 3/3, B 1/2, C 0/1
    val rows = Seq((1L, "A", "x"), (1L, "B", "x"), (1L, "C", "y"),
      (2L, "A", "x"), (2L, "B", "y"),
      (3L, "A", "z"))
    val r = Evaluation.raterAgreement(rows.toDF("u", "r", "v"),
        "u", "r", "v")
      .orderBy(col("rater"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("A", 3L, 3L, 1000000L), ("B", 2L, 1L, 500000L),
      ("C", 1L, 0L, 0L)))
    // NULL unit/rater/value rows carry no evidence
    val dirty = rows.map { case (u, rt, v) =>
      (Option(u), Option(rt), Option(v)) } :+
      ((Option(1L), Option("A"), Option.empty[String]))
    assert(Evaluation.raterAgreement(dirty.toDF("u", "r", "v"),
      "u", "r", "v").orderBy(col("rater"))
      .as[(String, Long, Long, Long)].collect().toSeq == r)
  }

  test("fleissKappa: hand-solved 2-rater panel gives 1/3; balanced " +
      "perfect disagreement gives -1; off-panel units drop; one " +
      "category everywhere is undefined") {
    def fk(rows: Seq[(Long, String)], n: Int) =
      Evaluation.fleissKappa(rows.toDF("u", "v"), "u", "v", n)
        .as[(Long, Long, Option[Long])].head()
    // units XX / XY / YY: A = 10, Nn = 6, P̄ = 2/3; pooled c = (3,3),
    // P̄e = 1/2 ⇒ κ = (2/3 − 1/2)/(1/2) = 1/3
    val panel = Seq(1L -> "X", 1L -> "X", 2L -> "X", 2L -> "Y",
      3L -> "Y", 3L -> "Y")
    assert(fk(panel, 2) == ((3L, 6L, Some(333333L))))
    // two balanced all-disagree units: Scott's pi hits exactly -1
    val dis = Seq(1L -> "X", 1L -> "Y", 2L -> "Y", 2L -> "X")
    assert(fk(dis, 2) == ((2L, 4L, Some(-1000000L))))
    // a 1-rating and a 3-rating unit are off the fixed panel — both
    // drop, leaving the hand-solved readout untouched
    val dirty = panel ++ Seq(4L -> "X", 5L -> "X", 5L -> "X", 5L -> "Y")
    assert(fk(dirty, 2) == ((3L, 6L, Some(333333L))))
    // one category everywhere: P̄e = 1, kappa undefined -> NULL
    assert(fk(Seq(1L -> "X", 1L -> "X", 2L -> "X", 2L -> "X"), 2) ==
      ((2L, 4L, None)))
    // Fleiss at n=2 is Scott's pi, NOT Cohen's kappa: on the skewed
    // panel {XX, XY} Cohen gives 0 (marginal products), Scott/Fleiss
    // goes negative (pooled marginals): A = 6, P̄ = 1/2; c = (3,1),
    // P̄e = 10/16 ⇒ κ = (1/2 − 5/8)/(3/8) = −1/3
    val skew = Seq(1L -> "X", 1L -> "X", 2L -> "X", 2L -> "Y")
    assert(fk(skew, 2) == ((2L, 4L, Some(-333334L))))
  }

  test("cohensKappa: textbook 2x2 matrix gives 0.4 exactly; perfect " +
      "disagreement gives -1; constant raters are undefined; NULL " +
      "ratings drop") {
    // confusion matrix [[20,5],[10,15]]: po=0.7, pe=0.5, kappa=0.4
    val rows =
      Seq.fill(20)(("A", "A")) ++ Seq.fill(5)(("A", "B")) ++
      Seq.fill(10)(("B", "A")) ++ Seq.fill(15)(("B", "B"))
    val r = Evaluation.cohensKappa(rows.toDF("ra", "rb"), "ra", "rb")
      .as[(Long, Long, Option[Long])].head()
    assert(r == ((50L, 35L, Some(400000L))))
    // complete disagreement on a balanced 2x2: kappa = -1 exactly
    val dis = Seq.fill(10)(("A", "B")) ++ Seq.fill(10)(("B", "A"))
    assert(Evaluation.cohensKappa(dis.toDF("ra", "rb"), "ra", "rb")
      .as[(Long, Long, Option[Long])].head() ==
      ((20L, 0L, Some(-1000000L))))
    // both raters constant: pe = 1, kappa undefined -> NULL
    assert(Evaluation.cohensKappa(
      Seq.fill(5)(("X", "X")).toDF("ra", "rb"), "ra", "rb")
      .as[(Long, Long, Option[Long])].head() == ((5L, 5L, None)))
    // a NULL rating on either side carries no agreement evidence
    val dirty = (rows.map { case (a, b) => (Option(a), Option(b)) } :+
      ((Option.empty[String], Option("A"))) :+
      ((Option("B"), Option.empty[String]))).toDF("ra", "rb")
    assert(Evaluation.cohensKappa(dirty, "ra", "rb")
      .as[(Long, Long, Option[Long])].head() ==
      ((50L, 35L, Some(400000L))))
  }

  test("brierDecomposition: hand-computed 2-bin decomposition — raw " +
      "brier, reliability, zero resolution, uncertainty floor") {
    import spark.implicits._
    // bins=2. bin0: (0.1,F),(0.3,T) -> sbm 200000, rbm 500000,
    // sq 1e10+4.9e11; bin1: (0.9,T),(0.6,F) -> sbm 750000, rbm 500000,
    // sq 1e10+3.6e11. N=4, P=2, ybm=500000.
    // brier = 8.7e11/4; rel = (2*9e10 + 2*6.25e10)/4; res = 0 (both
    // bin rates equal the pooled rate); unc = 500000*500000
    val df = Seq((0.1, false), (0.3, true), (0.9, true), (0.6, false))
      .toDF("s", "y")
    val r = Evaluation.brierDecomposition(df, col("y"), "s", bins = 2)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((4L, 2L, 217500000000L, 76250000000L, 0L,
      250000000000L)))
  }

  test("logLoss: hand-computed clamped cross-entropy — exact micro " +
      "floors, negative-sum floor mean") {
    import spark.implicits._
    // (0.5,T): floor(1e6*ln(.5)) = -693148
    // (1.0,F): clamp 999999 -> ln(1e-6) -> -13815511
    // (0.0,T): clamp 1      -> ln(1e-6) -> -13815511
    // (0.75,T): floor(1e6*ln(.75)) = -287683
    // mean = floor(-28611853/4) = -7152964 -> logloss 7152964
    val df = Seq((0.5, true), (1.0, false), (0.0, true), (0.75, true))
      .toDF("s", "y")
    val r = Evaluation.logLoss(df, col("y"), "s")
      .as[(Long, Long, Long)].head()
    assert(r == ((4L, 3L, 7152964L)))
  }

  test("expectedCalibrationError: hand-computed weighted absolute " +
      "gaps and worst bin") {
    import spark.implicits._
    // the brierDecomposition fixture: bin0 gap |500000-200000|,
    // bin1 gap |500000-750000| -> ECE (2*3e5+2*2.5e5)/4, MCE 3e5
    val df = Seq((0.1, false), (0.3, true), (0.9, true), (0.6, false))
      .toDF("s", "y")
    val r = Evaluation.expectedCalibrationError(df, col("y"), "s",
      bins = 2).as[(Long, Long, Long)].head()
    assert(r == ((4L, 275000L, 300000L)))
  }

  test("isotonicCalibration: hand-traced PAV — inversion pools " +
      "backwards across two bins, plateau stays exact, fit " +
      "non-decreasing") {
    import spark.implicits._
    // bins=4 rates: b0 1/2, b1 0/2 (inverts -> pool to 1/4),
    // b2 1/1, b3 1/2 (inverts -> pool to 2/3; 1/4 < 2/3 stops)
    val df = Seq((0.1, true), (0.2, false), (0.3, false), (0.4, false),
      (0.6, true), (0.8, true), (0.9, false)).toDF("s", "y")
    val r = Evaluation.isotonicCalibration(df, col("y"), "s", bins = 4)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0, 2L, 1L, 500000L, 250000L),
      (1, 2L, 0L, 0L, 250000L),
      (2, 1L, 1L, 1000000L, 666666L),
      (3, 2L, 1L, 500000L, 666666L)))
    // already-monotone input is the identity fit
    val mono = Seq((0.1, false), (0.3, false), (0.6, true), (0.9, true))
      .toDF("s", "y")
    val m = Evaluation.isotonicCalibration(mono, col("y"), "s", bins = 4)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(m.forall(row => row._4 == row._5),
      s"monotone input should be its own fit: $m")
  }
}
