package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound specs for the approximate (sketch) aggregates — the
  * queries are `no_oracle` by design (sketch internals are
  * engine-specific), so their accuracy contracts are asserted here
  * against exact computations on sf0.001. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct: within a few rsd of the exact count per group") {
    val li = analytics.Tables(spark, dir, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact) =>
      val rel = math.abs(approx - exact).toDouble / exact
      // rsd 0.02 is one standard deviation; 4x is a conservative bound
      assert(rel <= 0.08, s"flag $flag: approx $approx vs exact $exact")
    }
  }

  test("cms: estimate is one-sided (>= exact) and within eps*N for every term") {
    import graft.analytics.Sketches
    val docs = analytics.Tables(spark, dir, "documents")
    val terms = docs.select(explode(
        split(text.TextOps.normalize(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val eps = 1e-4
    val (cms, n) = Sketches.cmsSketch(terms, col("term"), eps = eps)
    val exact = text.CorpusStats.vocabulary(docs, "doc_id", "text")
      .select(col("term"), col("tf")).as[(String, Long)].collect()
    assert(exact.length > 10 && n == exact.map(_._2).sum)
    val est = terms.select(col("term")).distinct()
      .select(col("term"), Sketches.cmsEstimate(col("term"), cms).as("est"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (term, tf) =>
      val e = est(term)
      assert(e >= tf, s"$term: estimate $e below true count $tf")
      // eps*N is the 1-delta bound per probe; fixed data + fixed seed make
      // this deterministic, and at sf0.001 every probe sits well inside it
      assert(e <= tf + (eps * n).toLong + 1, s"$term: $e vs $tf (N=$n)")
    }
  }

  test("cms: linearity — sketches over two halves merge to the whole") {
    import graft.analytics.Sketches
    val docs = analytics.Tables(spark, dir, "documents")
    def termsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(
          split(text.TextOps.normalize(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
    val (whole, _) = Sketches.cmsSketch(termsOf(docs), col("term"))
    val (even, _) = Sketches.cmsSketch(
      termsOf(docs.filter(col("doc_id") % 2 === 0)), col("term"))
    val (odd, _) = Sketches.cmsSketch(
      termsOf(docs.filter(col("doc_id") % 2 === 1)), col("term"))
    even.mergeInPlace(odd)
    // counter adds are exact integers: the merged estimate must EQUAL the
    // whole-corpus estimate for every probe, not just approximate it —
    // this is the property that makes the one-pass distributed build valid
    val probes = termsOf(docs).select(col("term")).distinct()
    def estimates(cms: org.apache.spark.util.sketch.CountMinSketch) =
      probes.select(col("term"), Sketches.cmsEstimate(col("term"), cms)
        .as("e")).as[(String, Long)].collect().toMap
    val (fromWhole, fromMerged) = (estimates(whole), estimates(even))
    assert(fromWhole.nonEmpty && fromWhole == fromMerged)
  }

  test("portable cms: one-sided within eps*N; counters of halves sum to " +
      "the whole; scoring == built-in-hash scoring contract") {
    import graft.analytics.Sketches
    val docs = analytics.Tables(spark, dir, "documents")
    def termsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(
          split(text.TextOps.normalize(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
    val terms = termsOf(docs)
    val (counters, n) = Sketches.portableCmsSketch(terms, col("term"))
    val exact = text.CorpusStats.vocabulary(docs, "doc_id", "text")
      .select(col("term"), col("tf")).as[(String, Long)].collect()
    assert(n == exact.map(_._2).sum)
    val est = terms.select(col("term")).distinct()
      .select(col("term"),
        graft.analytics.PortableCms.cmsEstimate(
          graft.functions.HashExpressions.md5lo(col("term")),
          graft.functions.HashExpressions.md5hi(col("term")),
          counters, 5, 27183).as("est"))
      .as[(String, Long)].collect().toMap
    val epsN = (math.E / 27183 * n).toLong + 1
    exact.foreach { case (term, tf) =>
      assert(est(term) >= tf, s"$term: ${est(term)} below true $tf")
      assert(est(term) <= tf + epsN, s"$term: ${est(term)} vs $tf (N=$n)")
    }
    // linearity: counter arrays are exact sums, so half-sketches add to
    // the whole elementwise — the property behind the distributed build
    val (even, _) = Sketches.portableCmsSketch(
      termsOf(docs.filter(col("doc_id") % 2 === 0)), col("term"))
    val (odd, _) = Sketches.portableCmsSketch(
      termsOf(docs.filter(col("doc_id") % 2 === 1)), col("term"))
    val summed = even.zip(odd).map { case (a, b) => a + b }
    assert(summed.sameElements(counters))
    // interpreted == codegen for the estimate expression
    val interp = graft.analytics.PortableCms.estimate(counters, 5, 27183,
      graft.functions.HashKernels.md5Lower64(
        org.apache.spark.unsafe.types.UTF8String.fromString("the")),
      graft.functions.HashKernels.md5Upper64(
        org.apache.spark.unsafe.types.UTF8String.fromString("the")))
    est.get("the").foreach(e => assert(e == interp))
  }

  test("cms frequentTokenRatio: never loses a truly frequent token; " +
    "empty docs kept with ratio 0") {
    import graft.analytics.Sketches
    val docs = analytics.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .union(Seq((-1L, "")).toDF("doc_id", "text"))
    val terms = docs.select(explode(
        split(text.TextOps.normalize(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val (cms, n) = Sketches.cmsSketch(terms, col("term"))
    val minCount = math.max(1L, n / 1000)
    val got = Sketches.frequentTokenRatio(docs, "doc_id", "text",
        cms, minCount)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // exact frequent-token share via the vocabulary join (the expensive
    // alternative the sketch replaces)
    val vocab = text.CorpusStats.vocabulary(docs, "doc_id", "text")
      .select(col("term"), col("tf")).as[(String, Long)].collect().toMap
    val exact = docs.select(col("doc_id"), explode(
        split(text.TextOps.normalize(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .as[(Long, String)].collect()
      .groupBy(_._1)
      .map { case (id, ts) =>
        id -> ts.count { case (_, t) => vocab(t) >= minCount } }
    exact.foreach { case (id, nFreqExact) =>
      // one-sided estimates ⇒ the sketch count can only EXCEED the exact
      // frequent count (a rare term overestimated past the gate), never
      // undercount — a frequency gate built on CMS has false positives only
      assert(got(id)._3 >= nFreqExact,
        s"doc $id: cms $nFreqExact > ${got(id)._3}")
    }
    val empty = got(-1L)
    assert(empty._2 == 0L && empty._3 == 0L && empty._4 == 0.0)
  }

  test("hll sketch table: estimates within error bound; union-of-partials == direct sketch") {
    import graft.analytics.Sketches
    val docs = analytics.Tables(spark, dir, "documents")
    val terms = docs.select(col("lang"), col("source"), explode(
        split(text.TextOps.normalize(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val sketches = Sketches.hllSketchTable(terms, col("term"),
      Seq("lang", "source"))
    // corpus-wide estimate from the sketch table vs a DIRECT global sketch
    // of the raw terms: HLL register merges are max-ops, so union-of-
    // per-stratum-partials must equal the single-pass sketch exactly
    val fromPartials = Sketches.hllUnionEstimate(sketches)
      .select(col("distinct_est")).as[Long].head()
    val direct = terms
      .agg(hll_sketch_estimate(hll_sketch_agg(col("term"), 12)))
      .as[Long].head()
    assert(fromPartials == direct,
      s"union of partials $fromPartials != direct sketch $direct")
    val exact = terms.select(col("term")).distinct().count()
    val rel = math.abs(fromPartials - exact).toDouble / exact
    assert(rel <= 0.05, s"estimate $fromPartials vs exact $exact")
    // rollup: finest rows match groupBy form; grand-total row matches the
    // corpus-wide union (NULL strata on the total row)
    val rollup = Sketches.hllRollupEstimate(sketches, Seq("lang"))
    val total = rollup.filter(col("lang").isNull)
      .select(col("distinct_est")).as[Long].head()
    assert(total == fromPartials)
    val perLangRollup = rollup.filter(col("lang").isNotNull)
      .select(col("lang"), col("distinct_est"))
      .as[(String, Long)].collect().toMap
    val perLangGroup = Sketches.hllUnionEstimate(sketches, Seq("lang"))
      .select(col("lang"), col("distinct_est"))
      .as[(String, Long)].collect().toMap
    assert(perLangRollup == perLangGroup && perLangRollup.size > 1)
  }

  test("portable hll: estimate within error bound; union-of-partials == " +
      "direct; register blobs parquet round-trip; expr == direct eval") {
    import graft.analytics.{PortableHll, Sketches}
    val docs = analytics.Tables(spark, dir, "documents")
    val terms = docs.select(col("lang"), col("source"), explode(
        split(text.TextOps.normalize(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val sketches = Sketches.portableHllSketchTable(terms, col("term"),
      Seq("lang", "source"))
    // union-of-per-stratum-partials == one direct global sketch: register
    // merges are elementwise max, so partial grouping cannot change them
    val fromPartials = Sketches
      .portableHllRollupEstimate(sketches, Seq.empty)
      .select(col("distinct_est")).as[Double].head()
    val direct = terms
      .agg(udaf(new PortableHll.HllAggregator(12))
        .apply(graft.functions.HashExpressions.md5lo(col("term")))
        .as("regs"))
      .select(PortableHll.hllEstimate(col("regs"), 12)).as[Double].head()
    assert(fromPartials == direct,
      s"union of partials $fromPartials != direct $direct")
    val exact = terms.select(col("term")).distinct().count()
    val rel = math.abs(fromPartials - exact) / exact
    assert(rel <= 0.05, s"estimate $fromPartials vs exact $exact")
    // codegen'd expression == the plain Scala estimate over the same blob
    val blob = terms
      .agg(udaf(new PortableHll.HllAggregator(12))
        .apply(graft.functions.HashExpressions.md5lo(col("term"))))
      .as[Array[Byte]].head()
    assert(PortableHll.estimate(blob, 12) == direct)
    // parquet round-trip preserves blobs bit-for-bit → same estimates
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_phll").toString
    sketches.write.mode("overwrite").parquet(tmp)
    val rt = Sketches
      .portableHllRollupEstimate(spark.read.parquet(tmp), Seq.empty)
      .select(col("distinct_est")).as[Double].head()
    assert(rt == fromPartials)
  }

  test("portable hll overlap: identical sets meet fully, disjoint sets " +
      "nearly not at all, a half-subset lands in between") {
    import graft.analytics.Sketches
    import spark.implicits._
    // three strata over synthetic term sets: B == A, C disjoint from A,
    // D = the first half of A
    val a = (0 until 400).map(i => ("a", s"t$i"))
    val rows = a ++ a.map { case (_, t) => ("b", t) } ++
      (0 until 400).map(i => ("c", s"u$i")) ++
      (0 until 200).map(i => ("d", s"t$i"))
    val terms = rows.toDF("k", "term")
    val sketches = Sketches.portableHllSketchTable(terms, col("term"),
      Seq("k"))
    val out = Sketches.portableHllOverlap(sketches, "k")
      .orderBy("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // identical sets: union == each side ⇒ intersect == est, jaccard 1
    val (ea, eb, eu, ei, j) = out(("a", "b"))
    assert(ea == eb && eu == ea && ei == ea && j == 1000000L)
    // disjoint: intersect estimate near zero (|err| well under either side)
    val (_, _, _, eiC, jC) = out(("a", "c"))
    assert(math.abs(eiC) <= ea / 5, s"disjoint intersect $eiC vs $ea")
    assert(jC <= 100000L)
    // half subset: intersect ≈ |D|, jaccard ≈ 1/2 (loose sketch bounds)
    val (_, _, _, eiD, jD) = out(("a", "d"))
    assert(math.abs(eiD - 200L) <= 40L, s"subset intersect $eiD")
    assert(math.abs(jD - 500000L) <= 100000L, s"subset jaccard $jD")
  }

  test("hll sketch table: parquet round-trip + append-only batch merge") {
    import graft.analytics.Sketches
    val docs = analytics.Tables(spark, dir, "documents")
    def termsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"), explode(
          split(text.TextOps.normalize(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
    // two ingest batches sketched independently (the incremental path:
    // batch 2 never rescans batch 1), persisted, read back, unioned
    val b1 = Sketches.hllSketchTable(
      termsOf(docs.filter(col("doc_id") % 2 === 0)), col("term"), Seq("lang"))
    val b2 = Sketches.hllSketchTable(
      termsOf(docs.filter(col("doc_id") % 2 === 1)), col("term"), Seq("lang"))
    val path = java.nio.file.Files.createTempDirectory("hll").toString
    b1.write.mode("overwrite").parquet(path)
    b2.write.mode("append").parquet(path)
    val merged = Sketches.hllUnionEstimate(spark.read.parquet(path))
      .select(col("distinct_est")).as[Long].head()
    val direct = termsOf(docs)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("term"), 12)))
      .as[Long].head()
    assert(merged == direct,
      s"round-tripped batch union $merged != direct $direct")
    // re-unioning an overlapping batch cannot double-count (max-merge)
    b1.write.mode("append").parquet(path)
    val reUnioned = Sketches.hllUnionEstimate(spark.read.parquet(path))
      .select(col("distinct_est")).as[Long].head()
    assert(reUnioned == direct, s"overlap re-union drifted: $reUnioned")
  }

  test("kll sketch table: quantiles within rank-error band of exact; " +
      "rollup levels consistent") {
    import graft.analytics.Sketches
    val docs = analytics.Tables(spark, dir, "documents")
    val sketches = Sketches.kllSketchTable(docs, col("n_chars"),
      Seq("lang", "source"))
    val out = Sketches.kllRollupQuantiles(sketches, Seq("lang"),
        Seq(0.1, 0.5, 0.9))
      .select(col("lang"), col("quantiles"), col("n_rows"))
      .as[(Option[String], Seq[Double], Long)].collect()
    assert(out.count(_._1.isEmpty) == 1 && out.length > 2)
    // every estimated quantile must rank within the k=200 normalized
    // rank-error bound (~2.2%; allow 2x) of its target in the EXACT data
    for ((langOpt, qs, n) <- out) {
      val exact = (langOpt match {
        case Some(l) => docs.filter(col("lang") === l)
        case None => docs
      }).select(col("n_chars").cast("double")).as[Double].collect().sorted
      assert(n == exact.length)
      for ((target, v) <- Seq(0.1, 0.5, 0.9).zip(qs)) {
        val atOrBelow = exact.count(_ <= v).toDouble / exact.length
        val below = exact.count(_ < v).toDouble / exact.length
        assert(below <= target + 0.045 && atOrBelow >= target - 0.045,
          s"lang $langOpt p$target: $v ranks [$below, $atOrBelow]")
      }
    }
  }

  test("kll sketch table: parquet round-trip + append-only batch merge " +
      "stays within the error band") {
    import graft.analytics.Sketches
    val docs = analytics.Tables(spark, dir, "documents")
    val b1 = Sketches.kllSketchTable(
      docs.filter(col("doc_id") % 2 === 0), col("n_chars"), Seq("lang"))
    val b2 = Sketches.kllSketchTable(
      docs.filter(col("doc_id") % 2 === 1), col("n_chars"), Seq("lang"))
    val path = java.nio.file.Files.createTempDirectory("kll").toString
    b1.write.mode("overwrite").parquet(path)
    b2.write.mode("append").parquet(path)
    val (qs, n) = Sketches.kllRollupQuantiles(
        spark.read.parquet(path), Nil, Seq(0.5))
      .select(col("quantiles"), col("n_rows"))
      .as[(Seq[Double], Long)].head()
    val exact = docs.select(col("n_chars").cast("double"))
      .as[Double].collect().sorted
    assert(n == exact.length)
    val atOrBelow = exact.count(_ <= qs.head).toDouble / exact.length
    val below = exact.count(_ < qs.head).toDouble / exact.length
    assert(below <= 0.5 + 0.045 && atOrBelow >= 0.5 - 0.045,
      s"merged p50 ${qs.head} ranks [$below, $atOrBelow]")
  }

  test("kll exact-capacity configuration (k >= n): quantiles are the " +
      "exact percentile_disc order statistics") {
    import graft.analytics.Sketches
    // 173 distinct values in scrambled order, some duplicated — k far
    // above n means the sketch never compacts, so INCLUSIVE quantiles
    // must equal the exact rule: value at index ceil(p*n) (1-based)
    val vals = ((1 to 173).map(_ * 3.0) ++ Seq(9.0, 9.0, 300.0))
      .sortBy(v => (v * 7919).toLong % 101)
    val df = vals.toDF("v")
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val sk = Sketches.kllSketchTable(df, col("v"), Seq.empty, k = 65535)
    val got = Sketches.kllRollupQuantiles(sk, Seq.empty, probs, k = 65535)
      .select(col("quantiles")).as[Seq[Double]].head()
    val sorted = vals.sorted
    val want = probs.map(p =>
      sorted(math.ceil(p * sorted.size).toInt.max(1) - 1))
    assert(got == want, s"$got != $want")
  }

  test("frequent-items sketch: exact config equals true counts with " +
      "collapsed bounds; deterministic rank ties") {
    import graft.analytics.FrequentItems
    // zipf-ish: item i appears (40 - i) times, plus ties at the tail
    val df = (1 to 40).flatMap(i => Seq.fill(41 - i)(s"it${"%02d".format(i)}"))
      .map(("g", _)).toDF("g", "item")
    val table = FrequentItems.sketchTable(df, "item", Seq("g"),
      maxMapSize = 1024)
    val top = FrequentItems.topK(table, "g", k = 5)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(top.toSeq === Seq(
      (1, "it01", 40L, 40L, 40L), (2, "it02", 39L, 39L, 39L),
      (3, "it03", 38L, 38L, 38L), (4, "it04", 37L, 37L, 37L),
      (5, "it05", 36L, 36L, 36L)))
  }

  test("frequent-items sketch: bounded-memory mode never misses a true " +
      "heavy hitter (NO_FALSE_NEGATIVES) and bounds bracket truth") {
    import graft.analytics.FrequentItems
    // 4 hot items (1000 each) in a sea of 2000 singletons; tiny map
    val hot = (1 to 4).flatMap(i => Seq.fill(1000)(s"hot$i"))
    val noise = (1 to 2000).map(i => s"n$i")
    val df = (hot ++ noise).map(("g", _)).toDF("g", "item")
      .repartition(8)
    val table = FrequentItems.sketchTable(df, "item", Seq("g"),
      maxMapSize = 64)
    val top = FrequentItems.topK(table, "g", k = 10)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val names = top.map(_._1).toSet
    assert((1 to 4).forall(i => names.contains(s"hot$i")),
      s"lost a heavy hitter in $names")
    top.filter(_._1.startsWith("hot")).foreach { case (n, est, lb, ub) =>
      assert(lb <= 1000L && 1000L <= ub, s"$n bounds [$lb,$ub] miss truth")
      assert(est >= 1000L, s"$n underestimated past its guarantee: $est")
    }
  }

  test("frequent-items sketch table: parquet round-trip + rollup union " +
      "== direct sketch in exact mode") {
    import graft.analytics.FrequentItems
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c"))
      .zipWithIndex.map { case (it, i) => (s"s${i % 3}", it) }
      .toDF("g", "item")
    val dir = java.nio.file.Files.createTempDirectory("freqsk")
      .resolve("t").toString
    FrequentItems.sketchTable(df, "item", Seq("g"), maxMapSize = 256)
      .write.parquet(dir)
    val loaded = spark.read.parquet(dir)
    // roll the 3 strata up to a grand total via the union aggregator
    val union = loaded.groupBy()
      .agg(udaf(new graft.analytics.FreqUnionAggregator(256))
        .apply(col("freq_sketch")).as("freq_sketch"))
      .withColumn("g", lit("all"))
    val rolled = FrequentItems.topK(union, "g", k = 3)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(rolled === Map("a" -> 30L, "b" -> 20L, "c" -> 10L))
  }

  test("approx_percentile: returned value sits within the rank-error band") {
    val li = analytics.Tables(spark, dir, "lineitem")
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, array(0.5, 0.9), 1000)")
        .as("q"))
      .select(col("l_returnflag"), element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p90"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    val flags = approx.keySet
    for (flag <- flags; (target, v) <- Seq(
        (0.5, approx(flag)._2), (0.9, approx(flag)._3))) {
      val grp = li.filter(col("l_returnflag") === flag)
        .select(col("l_quantity").cast("double")).as[Double].collect()
      val below = grp.count(_ < v).toDouble / grp.length
      val atOrBelow = grp.count(_ <= v).toDouble / grp.length
      // accuracy 1000 bounds rank error by ~1/1000; allow 1% slack
      assert(below <= target + 0.01 && atOrBelow >= target - 0.01,
        s"flag $flag p$target: value $v ranks [$below, $atOrBelow]")
    }
  }
}
