package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Profiler, Regression}

/** Grouped OLS, Cramér's V, and Gini: hand-checked closed forms, NULL /
  * degenerate-input handling, and the fixed-point determinism contract. */
class RegressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("olsByGroup: exact fit, noisy fit, zero-variance x, null drop") {
    val df = Seq(
      ("exact", Some(1.0), Some(2.0)), ("exact", Some(2.0), Some(4.0)),
      ("exact", Some(3.0), Some(6.0)),
      ("noisy", Some(1.0), Some(1.0)), ("noisy", Some(2.0), Some(3.0)),
      ("noisy", Some(3.0), Some(2.0)),
      ("flatx", Some(5.0), Some(1.0)), ("flatx", Some(5.0), Some(2.0)),
      ("nully", Some(1.0), None), ("nully", None, Some(1.0)),
      ("nully", Some(2.0), Some(2.0))
    ).toDF("g", "x", "y")
    val r = Regression.olsByGroup(df, Seq("g"), "x", "y")
      .collect().map(row => row.getString(0) -> row).toMap
    val exact = r("exact")
    assert(exact.getLong(1) == 3L)
    assert(exact.getDouble(2) == 2.0 && exact.getDouble(3) == 0.0 &&
      exact.getDouble(4) == 1.0)
    val noisy = r("noisy")
    // sx=6 sy=6 sxx=14 syy=14 sxy=13: slope=.5 intercept=1 r2=.25
    assert(noisy.getDouble(2) == 0.5 && noisy.getDouble(3) == 1.0 &&
      noisy.getDouble(4) == 0.25)
    val flat = r("flatx")
    assert(flat.isNullAt(2) && flat.isNullAt(3) && flat.isNullAt(4))
    assert(r("nully").getLong(1) == 1L) // complete cases only
  }

  test("logisticTrain: hand-replayed first iteration converges exactly " +
      "in two rounds on a separable pair; planted weights recover " +
      "(signs + perfect training accuracy); null rows drop; " +
      "determinism; bound guards fail loud") {
    // two rows, x1 = ±1, y = (x1 > 0). Iteration 1 by hand: w = 0 ⇒
    // p = 500000 both rows ⇒ G1 = −10¹² ⇒ w1 = 2·10⁶ (lr = 4.0);
    // iteration 2: z/4 = ±500000 ⇒ p = y ⇒ zero gradient. Fixed point.
    val pair = Seq((1.0, true), (-1.0, false)).toDF("x1", "y")
    val r = Regression.logisticTrain(pair, col("y"),
        Seq("x1" -> col("x1")), iters = 5, lrX1e6 = 4000000L)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(r == Seq((0, "__bias", 0L, 2L), (1, "x1", 2000000L, 2L)))
    // planted weights: y = (2·x1 − x2 > 0) over a deterministic grid;
    // the trained surrogate must recover the signs and classify the
    // training grid perfectly (hard sigmoid ⇒ predict y iff z ≥ 0)
    val grid = for {
      a <- -3 to 3; b <- -3 to 3
      if 2 * a - b != 0 // keep a margin: drop the decision boundary
    } yield (a.toDouble, b.toDouble, 2 * a - b > 0)
    val gdf = grid.toDF("x1", "x2", "y")
    val w = Regression.logisticTrain(gdf, col("y"),
        Seq("x1" -> col("x1"), "x2" -> col("x2")),
        iters = 30, lrX1e6 = 1000000L)
      .as[(Int, String, Long, Long)].collect()
      .map(t => t._2 -> t._3).toMap
    assert(w("x1") > 0 && w("x2") < 0,
      s"planted signs not recovered: $w")
    val acc = grid.count { case (a, b, y) =>
      (w("__bias") * 1000000L + w("x1") * (a * 1e6).toLong +
        w("x2") * (b * 1e6).toLong >= 0) == y }
    assert(acc == grid.size, s"training accuracy $acc/${grid.size}")
    // null label/feature rows drop (complete-case)
    val dirty = Seq((Option(1.0), Option(true)),
      (Option.empty[Double], Option(true)), (Option(1.0), None),
      (Option(-1.0), Option(false))).toDF("x1", "y")
    assert(Regression.logisticTrain(dirty, col("y"),
      Seq("x1" -> col("x1"))).head().getLong(3) == 2L)
    // determinism: bit-identical across runs
    assert(Regression.logisticTrain(gdf, col("y"),
        Seq("x1" -> col("x1"), "x2" -> col("x2"))).collect().toSeq ==
      Regression.logisticTrain(gdf, col("y"),
        Seq("x1" -> col("x1"), "x2" -> col("x2"))).collect().toSeq)
    // guards: oversized feature fails the upfront bound check; an
    // exploding learning rate fails the post-update weight check
    val big = Seq((1000.0, true), (-1000.0, false)).toDF("x1", "y")
    val e1 = intercept[IllegalArgumentException] {
      Regression.logisticTrain(big, col("y"), Seq("x1" -> col("x1")))
    }
    assert(e1.getMessage.contains("2^29"))
    val e2 = intercept[IllegalArgumentException] {
      Regression.logisticTrain(pair, col("y"), Seq("x1" -> col("x1")),
        iters = 30, lrX1e6 = 400000000000L)
    }
    assert(e2.getMessage.contains("lower lr"))
  }

  test("logisticTrain L2 (decoupled weight decay): hand-replayed decay " +
      "on the separable pair; l2=0 identical to the unregularized " +
      "path; decay shrinks planted weights; guard on l2 >= 1e6") {
    // separable pair (see the hand-replay test): unregularized
    // iteration 1 gives w1 = 2_000_000 and every later gradient is 0,
    // so with decay λ the exact replay is pure geometric shrinkage on
    // the iteration-start weight: w1 ← w1 − (λ·w1)/10⁶ (truncating,
    // bias stays 0). λ = 10000 (1%): 2_000_000 → iter2 1_980_000 →
    // iter3 1_960_200 (gradients stay 0: p still clamps to y while
    // z/4 ≥ 500000 ⇔ w1 ≥ 2·10⁶... not quite — replay BigInt-exact
    // instead of assuming zero gradients)
    val pair = Seq((1.0, true), (-1.0, false)).toDF("x1", "y")
    def replay(iters: Int, lr: Long, l2: Long): (Long, Long) = {
      var b = BigInt(0); var w1 = BigInt(0)
      for (_ <- 1 to iters) {
        def p(x: Long): BigInt = {
          val zraw = b * 1000000L + w1 * x
          (BigInt(500000) + (zraw / 1000000L) / 4L)
            .max(0).min(1000000)
        }
        // rows: (x=1e6 micros, y6=1e6), (x=-1e6, y6=0)
        val r1 = p(1000000L) - 1000000L
        val r2 = p(-1000000L) - 0L
        val g0 = (r1 + r2) * 1000000L
        val g1 = r1 * 1000000L + r2 * -1000000L
        val n = BigInt(2); val tw = BigInt(1000000000000L)
        val w1Start = w1
        b -= (BigInt(lr) * (g0 / n)) / tw
        w1 -= (BigInt(lr) * (g1 / n)) / tw
        if (l2 > 0) w1 -= (BigInt(l2) * w1Start) / BigInt(1000000L)
      }
      (b.toLong, w1.toLong)
    }
    for (l2 <- Seq(0L, 10000L, 250000L)) {
      val got = Regression.logisticTrain(pair, col("y"),
          Seq("x1" -> col("x1")), iters = 5, lrX1e6 = 4000000L,
          l2X1e6 = l2)
        .orderBy(col("idx")).as[(Int, String, Long, Long)]
        .collect().map(_._3).toSeq
      val (eb, ew) = replay(5, 4000000L, l2)
      assert(got == Seq(eb, ew),
        s"l2=$l2: engine $got != BigInt replay ${Seq(eb, ew)}")
    }
    // decay shrinks the planted-grid weights in magnitude, signs intact
    val grid = for {
      a <- -3 to 3; b <- -3 to 3; if 2 * a - b != 0
    } yield (a.toDouble, b.toDouble, 2 * a - b > 0)
    val gdf = grid.toDF("x1", "x2", "y")
    val feats = Seq("x1" -> col("x1"), "x2" -> col("x2"))
    def weights(l2: Long) = Regression.logisticTrain(gdf, col("y"),
        feats, iters = 30, lrX1e6 = 1000000L, l2X1e6 = l2)
      .orderBy(col("idx")).as[(Int, String, Long, Long)]
      .collect().map(t => t._2 -> t._3).toMap
    val (w0, wL2) = (weights(0L), weights(50000L))
    assert(wL2("x1") > 0 && wL2("x2") < 0, s"decay flipped signs: $wL2")
    assert(math.abs(wL2("x1")) < math.abs(w0("x1")) &&
      math.abs(wL2("x2")) < math.abs(w0("x2")),
      s"decay failed to shrink: $w0 vs $wL2")
    val e = intercept[IllegalArgumentException] {
      Regression.logisticTrain(pair, col("y"), Seq("x1" -> col("x1")),
        l2X1e6 = 1000000L)
    }
    assert(e.getMessage.contains("l2_x1e6"))
  }

  test("hardSigmoidScoreX1e6: deploy forward pass matches the training " +
      "forward pass exactly (trained weights classify the training " +
      "grid identically to the z-sign rule); clamps; arity guard") {
    val grid = for {
      a <- -3 to 3; b <- -3 to 3; if 2 * a - b != 0
    } yield (a.toDouble, b.toDouble, 2 * a - b > 0)
    val gdf = grid.toDF("x1", "x2", "y")
    val feats = Seq("x1" -> col("x1"), "x2" -> col("x2"))
    val w = Regression.logisticTrain(gdf, col("y"), feats,
        iters = 30, lrX1e6 = 1000000L)
      .orderBy(col("idx")).as[(Int, String, Long, Long)]
      .collect().map(_._3).toSeq
    val scored = gdf.select(col("y"),
        Regression.hardSigmoidScoreX1e6(w, feats.map(_._2)).as("s"))
      .as[(Boolean, Long)].collect()
    assert(scored.forall { case (y, s) => (s >= 500000L) == y },
      "deploy scoring disagreed with the training decision rule")
    assert(scored.forall { case (_, s) => s >= 0L && s <= 1000000L })
    intercept[IllegalArgumentException] {
      Regression.hardSigmoidScoreX1e6(Seq(0L), feats.map(_._2))
    }
  }

  test("logisticTrain closes the quality-classifier loop: labels from " +
      "the default logisticQuality threshold re-train to sign-matching " +
      "weights with perfect surrogate accuracy on the same signals") {
    import graft.text.{CorpusStats, TextOps}
    // 10 clean stopword-rich texts vs 10 punctuation-soup texts — the
    // exact signal axes DefaultQualityWeights encodes
    val texts = (1 to 10).map(i =>
        s"the quick brown fox and the lazy dog were on a hill $i") ++
      (1 to 10).map(i => s"%%$$##@@!!&&**((~~``||$i%%$$##@@!!")
    val df = texts.toDF("text")
      .withColumn("y",
        CorpusStats.logisticQuality(col("text")) > 0.5)
    val w = Regression.logisticTrain(df, col("y"), Seq(
        "stopword" -> TextOps.stopwordRatio(col("text")),
        "punct" -> TextOps.punctRatio(col("text"))),
        iters = 40, lrX1e6 = 2000000L)
      .as[(Int, String, Long, Long)].collect()
      .map(t => t._2 -> t._3).toMap
    // sign recovery against the hand-set weights (+6 stopwords,
    // −4 punctuation)
    assert(w("stopword") > 0 && w("punct") < 0, s"signs: $w")
  }

  test("cramersV: perfect association = 1, independence = 0, " +
      "degenerate table NULL") {
    val perfect = (Seq.fill(10)(("a", 1)) ++ Seq.fill(10)(("b", 2)))
      .toDF("x", "y")
    val p = Profiler.cramersV(perfect, "x", "y").head
    assert(p.getLong(0) == 20L && p.getLong(1) == 2L && p.getLong(2) == 2L)
    assert(p.getDouble(4) == 1.0, s"perfect association: $p")
    assert(p.getDouble(3) == 20.0) // chi2 = n for a perfect 2x2

    val indep = (for { x <- Seq("a", "b"); y <- Seq(1, 2); _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val i = Profiler.cramersV(indep, "x", "y").head
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0)

    val degen = Seq(("a", 1), ("a", 2)).toDF("x", "y")
    val d = Profiler.cramersV(degen, "x", "y").head
    assert(d.isNullAt(3) && d.isNullAt(4))
  }

  test("gini: equal values 0, one-holder (n-1)/n, nulls and negatives " +
      "drop, all-zero NULL") {
    val df = Seq(
      ("equal", Some(5.0)), ("equal", Some(5.0)), ("equal", Some(5.0)),
      ("equal", Some(5.0)),
      ("onehot", Some(0.0)), ("onehot", Some(0.0)), ("onehot", Some(0.0)),
      ("onehot", Some(10.0)),
      ("mixed", Some(1.0)), ("mixed", None), ("mixed", Some(-3.0)),
      ("mixed", Some(2.0)),
      ("zeros", Some(0.0)), ("zeros", Some(0.0))
    ).toDF("g", "v")
    val r = Profiler.gini(df, "g", "v")
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r("equal").getDouble(3) == 0.0)
    assert(r("onehot").getDouble(3) == 0.75) // (n-1)/n at n=4
    assert(r("mixed").getLong(1) == 2L) // null + negative dropped
    // [100, 200] cents: G = 2*(1*100+2*200)/(2*300) - 3/2 = 1/6
    assert(r("mixed").getDouble(3) == math.rint(1.0 / 6.0 * 1e6) / 1e6 ||
      math.abs(r("mixed").getDouble(3) - 1.0 / 6.0) < 1e-6)
    assert(r("zeros").isNullAt(3))
  }

  test("numericDrift: identical sides zero every psi_term, a shift " +
      "yields positive PSI, max lands in the top bin, constant range " +
      "collapses to one bin") {
    val a = (0 to 100).map(i => i.toDouble / 10.0).toDF("v")
    val same = Profiler.numericDrift(a, a, "v", bins = 10).collect()
    assert(same.nonEmpty)
    assert(same.forall(r => r.getDouble(7) == 0.0), "identical sides")
    // the pooled max (10.0) sits INSIDE bin 9, not a phantom bin 10
    assert(same.map(_.getInt(0)).max == 9)
    assert(same.map(_.getInt(0)).toSet.size == same.length)

    val b = (0 to 100).map(i => 5.0 + i.toDouble / 20.0).toDF("v")
    val drift = Profiler.numericDrift(a, b, "v", bins = 10)
      .agg(sum(col("psi_term"))).head.getDouble(0)
    assert(drift > 0.1, s"shifted distribution PSI too small: $drift")

    val const = Seq(3.0, 3.0).toDF("v")
    val c = Profiler.numericDrift(const, const, "v").collect()
    assert(c.length == 1 && c.head.getInt(0) == 0)

    val dirty = Seq(Some(1.0), None, Some(Double.NaN), Some(2.0)).toDF("v")
    val d = Profiler.numericDrift(dirty, dirty, "v", bins = 2).collect()
    assert(d.map(r => r.getLong(3)).sum == 2L) // only the 2 finite rows
  }

  test("ksTest: identical 0, disjoint 1, half-shift 1/2 exact; empty " +
      "side NULL; null/NaN drop") {
    def ks(a: Seq[Double], b: Seq[Double]): org.apache.spark.sql.Row =
      Profiler.ksTest(a.toDF("v"), b.toDF("v"), "v").head
    val same = ks(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0))
    assert(same.getLong(2) == 0L && !same.getBoolean(3))
    assert(ks(Seq(1.0, 2.0), Seq(3.0, 4.0)).getLong(2) == 1000000L)
    // max gap at v=2: F_a=1/2, F_b=0 → D = 1/2 exactly
    assert(ks(Seq(1.0, 2.0, 3.0, 4.0), Seq(3.0, 4.0, 5.0, 6.0))
      .getLong(2) == 500000L)
    val dirty = Profiler.ksTest(
      Seq(Some(1.0), None, Some(Double.NaN)).toDF("v"),
      Seq(Some(1.0)).toDF("v"), "v").head
    assert(dirty.getLong(0) == 1L && dirty.getLong(2) == 0L)
    val empty = Profiler.ksTest(
      Seq.empty[Double].toDF("v"), Seq(1.0).toDF("v"), "v").head
    assert(empty.getLong(0) == 0L && empty.isNullAt(2))
  }

  test("gini: tie order between equal values cannot change the result") {
    val a = Seq(("g", 2.0), ("g", 1.0), ("g", 2.0), ("g", 3.0))
    val results = (1 to 3).map { i =>
      val shuffled = new scala.util.Random(i).shuffle(a)
      Profiler.gini(shuffled.toDF("g", "v").repartition(i), "g", "v")
        .head.getDouble(3)
    }.distinct
    assert(results.size == 1 && results.head > 0.0,
      s"tie/partition order changed gini: $results")
  }
}
