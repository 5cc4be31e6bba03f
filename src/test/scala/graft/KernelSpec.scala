package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashExpressions, VectorExpressions}

/** The custom codegen'd expressions must produce IDENTICAL results from
  * their interpreted (`nullSafeEval`) and generated (`doGenCode`) paths —
  * Spark silently falls back to interpretation when a codegen stage fails
  * to compile, so a divergence would be an invisible correctness bug.
  * Each test evaluates the interpreted path directly and compares against
  * a DataFrame run (codegen path). */
class KernelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def floatArr(xs: Seq[Float]): ArrayData =
    new GenericArrayData(xs.toArray)
  private def longArr(xs: Seq[Long]): ArrayData =
    new GenericArrayData(xs.toArray)

  test("FloatDot/FloatNorm: interpreted == codegen == reference math") {
    val a = Seq(1.5f, -2.0f, 3.25f)
    val b = Seq(0.5f, 4.0f, -1.0f)
    val expectDot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val interp = VectorExpressions.FloatDot(
      Literal(floatArr(a), ArrayType(FloatType)),
      Literal(floatArr(b), ArrayType(FloatType))).eval(InternalRow.empty)
    assert(interp == expectDot)
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(VectorExpressions.floatDot($"a", $"b")).as[Double].head()
    assert(viaDf == expectDot)
    val normInterp = VectorExpressions.FloatNorm(
      Literal(floatArr(a), ArrayType(FloatType))).eval(InternalRow.empty)
    val normDf = Seq(Tuple1(a)).toDF("a")
      .select(VectorExpressions.floatNorm($"a")).as[Double].head()
    assert(normInterp == normDf)
    assert(normDf == math.sqrt(a.map(x => x.toDouble * x.toDouble).sum))
  }

  test("FloatDot: null propagates, length mismatch raises") {
    val out = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(VectorExpressions.floatDot($"a", $"b")).collect()
    assert(out.head.isNullAt(0))
    val ex = intercept[Exception] {
      Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
        .select(VectorExpressions.floatDot($"a", $"b")).collect()
    }
    assert(ex.getMessage != null)
    // a NULL ELEMENT raises loudly (getFloat would silently read 0.0) —
    // in both the codegen'd path and the interpreted expression
    val nullElem = Seq((Seq(Some(1.0f), None), Seq(Some(2.0f), Some(3.0f))))
      .toDF("a", "b")
    val exElem = intercept[Exception] {
      nullElem.select(VectorExpressions.floatDot($"a", $"b")).collect()
    }
    assert(exElem.getMessage.contains("null element") ||
      Option(exElem.getCause).exists(_.getMessage.contains("null element")))
    val fArr = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = true)
    val interpElem = intercept[Exception] {
      VectorExpressions.FloatDot(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq[Any](1.0f, null), fArr),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq[Any](2.0f, 3.0f), fArr))
        .eval(null)
    }
    assert(interpElem.getMessage.contains("null element"))
  }

  test("Md5Lower64: interpreted == codegen; pinned DuckDB " +
      "md5_number_lower values") {
    // constants verified against DuckDB 1.0: md5_number_lower(s), i.e.
    // MD5 digest bytes 8..15 little-endian as a signed 64-bit value
    val pinned = Seq(
      "abc" -> 8250560606382298838L,
      "" -> 9098107892288553193L,
      "the" -> 6287873238205204795L,
      "cat" -> -2811281341615134882L)
    for ((s, want) <- pinned) {
      val interp = HashExpressions.Md5Lower64(Literal(s))
        .eval(InternalRow.empty)
      assert(interp == want, s"interpreted md5_lower64('$s')")
      val gen = Seq(Tuple1(s)).toDF("s")
        .select(HashExpressions.md5lo($"s")).as[Long].head()
      assert(gen == want, s"codegen md5_lower64('$s')")
    }
    // null propagates
    assert(Seq(Tuple1(null: String)).toDF("s")
      .select(HashExpressions.md5lo($"s")).head().isNullAt(0))
  }

  test("SimHash64 / MinHashSig: interpreted == codegen") {
    val hs = Seq(0x1234L, -99L, 0x7fffffffL, 42L, 0L)
    val simInterp = HashExpressions.SimHash64(
      Literal(longArr(hs), ArrayType(LongType))).eval(InternalRow.empty)
    val simDf = Seq(Tuple1(hs)).toDF("h")
      .select(HashExpressions.simhash64($"h")).as[Long].head()
    assert(simInterp == simDf)

    val mhInterp = HashExpressions.MinHashSig(
      Literal(longArr(hs), ArrayType(LongType)), 16)
      .eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray.toSeq
    val mhDf = Seq(Tuple1(hs)).toDF("h")
      .select(HashExpressions.minhashSig($"h", 16)).as[Seq[Long]].head()
    assert(mhInterp == mhDf)
    assert(mhDf.length == 16)
    // min-stability: adding an element can only decrease each signature slot
    val mh2 = Seq(Tuple1(hs :+ 777L)).toDF("h")
      .select(HashExpressions.minhashSig($"h", 16)).as[Seq[Long]].head()
    assert(mh2.zip(mhDf).forall { case (x, y) => x <= y })
  }

  test("Sq8Encode/Int8Dot/FloatAbsMax: interpreted == codegen; zero " +
    "vector encodes to zeros; reconstruction bounded by scale/2") {
    import graft.functions.VectorExpressions.{Sq8Encode, int8Dot, sq8Encode, floatAbsMax}
    val vecs = Seq(
      Seq(0.5f, -1.0f, 0.25f, 0.0f),
      Seq(0.0f, 0.0f),
      Seq(3.7f, -3.7f, 1.85f))
    for (v <- vecs) {
      val interp = Sq8Encode(Literal(floatArr(v),
          ArrayType(FloatType, containsNull = false)))
        .eval(InternalRow.empty).asInstanceOf[ArrayData]
        .toByteArray().toSeq
      val viaDf = Seq(Tuple1(v)).toDF("v")
        .select(sq8Encode($"v")).as[Seq[Byte]].head()
      assert(interp == viaDf, s"parity broke for $v")
      val amax = if (v.isEmpty) 0.0 else v.map(x => math.abs(x.toDouble)).max
      val amaxDf = Seq(Tuple1(v)).toDF("v")
        .select(floatAbsMax($"v")).as[Double].head()
      assert(amaxDf == amax)
      if (amax > 0) {
        val scale = amax / 127.0
        v.zip(interp).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-12,
            s"reconstruction error for $x -> $c at scale $scale") }
        assert(interp.map(c => math.abs(c.toInt)).max == 127)
      } else assert(interp.forall(_ == 0))
    }
    // int8 dot is exact integer arithmetic:
    // round(127*[1,-2,3]/3) = [42,-85,127]
    val d = Seq((Seq(1.0f, -2.0f, 3.0f), Seq(1.0f, -2.0f, 3.0f)))
      .toDF("a", "b")
      .select(int8Dot(sq8Encode($"a"), sq8Encode($"b"))).as[Long].head()
    assert(d == 42L * 42 + 85L * 85 + 127L * 127)
    // null elements fail loudly (FloatDot discipline)
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq[java.lang.Float](1.0f, null))).toDF("v")
        .select(sq8Encode($"v")).collect()
    }
    assert(ex.getMessage.contains("null element") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("null element"))
  }

  test("PQ kernels: interpreted == codegen; ADC dot == dot against the " +
    "reconstruction; ties -> lowest centroid; wrong-dim fails loudly") {
    import graft.functions.{PqExpressions, PqKernel}
    import graft.functions.PqExpressions.{adcDot, pqEncode, pqLut, pqReconNorm}
    val m = 2; val k = 3; val dsub = 2
    // layout (j*k + c)*dsub: subspace 0 books {(0,0),(1,1),(2,2)},
    // subspace 1 books {(0,1),(1,0),(5,5)}
    val cents = Array(0f, 0f, 1f, 1f, 2f, 2f, 0f, 1f, 1f, 0f, 5f, 5f)
    val normSq = Array(0.0, 2.0, 8.0, 1.0, 1.0, 50.0)
    val v = Seq(0.9f, 1.1f, 1.2f, 0.1f)
    val codesInterp = PqKernel.encode(floatArr(v), m, k, dsub, cents)
      .toByteArray().toSeq
    val codesDf = Seq(Tuple1(v)).toDF("v")
      .select(pqEncode($"v", m, k, dsub, cents)).as[Seq[Byte]].head()
    assert(codesInterp == codesDf)
    assert(codesDf == Seq(1.toByte, 1.toByte)) // nearest: (1,1) and (1,0)
    val lutInterp = PqKernel.lut(floatArr(v), m, k, dsub, cents)
      .toDoubleArray().toSeq
    val lutDf = Seq(Tuple1(v)).toDF("v")
      .select(pqLut($"v", m, k, dsub, cents)).as[Seq[Double]].head()
    assert(lutInterp == lutDf && lutDf.length == m * k)
    // ADC dot == ⟨v, reconstruction⟩ (subspace sums reassociate, so
    // compare within float tolerance)
    val adc = Seq((v, codesDf)).toDF("v", "c")
      .select(adcDot(pqLut($"v", m, k, dsub, cents), $"c", k))
      .as[Double].head()
    val recon = Seq(1.0, 1.0, 1.0, 0.0) // cent(0,1) ++ cent(1,1)
    val direct = v.map(_.toDouble).zip(recon).map { case (a, b) => a * b }.sum
    assert(math.abs(adc - direct) < 1e-9)
    // reconstruction norm from the squared-norm table
    val rn = Seq(Tuple1(codesDf)).toDF("c")
      .select(pqReconNorm($"c", k, normSq)).as[Double].head()
    assert(math.abs(rn - math.sqrt(2.0 + 1.0)) < 1e-12)
    // exact tie (0.5,0.5) between books 0 and 1 -> lowest index wins
    val tie = PqKernel.encode(floatArr(Seq(0.5f, 0.5f, 0f, 1f)),
      m, k, dsub, cents).toByteArray()
    assert(tie(0) == 0.toByte && tie(1) == 0.toByte)
    // wrong dimensionality is an error, not silence
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq(1.0f))).toDF("v")
        .select(pqEncode($"v", m, k, dsub, cents)).collect()
    }
    assert(ex.getMessage.contains("pq_encode") ||
      ex.getCause != null && ex.getCause.getMessage.contains("pq_encode"))
  }

  test("DeflateRatio: interpreted == codegen; repetition compresses " +
    "below random text; empty/null safe") {
    import graft.functions.{CompressExpression, CompressKernel}
    val spam = "buy gold now " * 100
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "rests for a while near the river bank watching boats drift by"
    for (t <- Seq("", "a", spam, prose)) {
      val interp = CompressExpression.DeflateRatio(
        Literal(UTF8String.fromString(t), StringType))
        .eval(InternalRow.empty).asInstanceOf[Double]
      val viaDf = Seq(Tuple1(t)).toDF("t")
        .select(CompressExpression.deflateRatio($"t")).as[Double].head()
      assert(interp == viaDf, s"parity broke for ${t.take(20)}")
      assert(interp == CompressKernel.ratio(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
    assert(CompressKernel.ratio(Array.emptyByteArray) == 0.0)
    val rSpam = CompressKernel.ratio(spam.getBytes("UTF-8"))
    val rProse = CompressKernel.ratio(prose.getBytes("UTF-8"))
    assert(rSpam < rProse && rSpam < 0.2 && rProse > 0.4,
      s"expected spam($rSpam) << prose($rProse)")
    // null propagates (UnaryExpression default null-intolerance)
    val withNull = Seq(Some(prose), None).toDF("t")
      .select(CompressExpression.deflateRatio($"t").as("r"))
    assert(withNull.filter($"r".isNull).count() == 1)
  }

  test("NGramHashes: sorted distinct, order-sensitive, short-input collapse") {
    def strArr(xs: Seq[String]): ArrayData =
      new GenericArrayData(xs.map(UTF8String.fromString).toArray)
    def run(toks: Seq[String], n: Int): Seq[Long] =
      HashExpressions.NGramHashes(
        Literal(strArr(toks), ArrayType(StringType)), n)
        .eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray.toSeq
    val g = run(Seq("a", "b", "c", "d"), 2)
    assert(g == g.sorted && g.distinct == g)
    assert(g.length == 3) // ab, bc, cd
    assert(run(Seq("a", "b", "c", "d"), 2) == g) // deterministic
    assert(run(Seq("b", "a", "c", "d"), 2) != g) // order matters
    assert(run(Seq("a"), 3).length == 1) // short input -> whole-text gram
    // codegen path agrees
    val viaDf = Seq(Tuple1(Seq("a", "b", "c", "d"))).toDF("t")
      .select(HashExpressions.ngramHashes($"t", 2)).as[Seq[Long]].head()
    assert(viaDf == g)
  }

  test("JaccardSorted: merge-walk equals set arithmetic") {
    val a = Seq(1L, 3L, 5L, 9L)
    val b = Seq(3L, 4L, 5L, 10L, 12L)
    val expect = 2.0 / 7.0 // |{3,5}| / |{1,3,4,5,9,10,12}|
    val interp = HashExpressions.JaccardSorted(
      Literal(longArr(a), ArrayType(LongType)),
      Literal(longArr(b), ArrayType(LongType))).eval(InternalRow.empty)
    assert(interp == expect)
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(HashExpressions.jaccardSorted($"a", $"b")).as[Double].head()
    assert(viaDf == expect)
    // both empty = defined as 1.0
    assert(HashExpressions.JaccardSorted(
      Literal(longArr(Nil), ArrayType(LongType)),
      Literal(longArr(Nil), ArrayType(LongType)))
      .eval(InternalRow.empty) == 1.0)
  }

  test("WordNGrams: identical to the HOF formulation it replaced") {
    val toksCol = split(lit("w1 w2 w3 w4 w5"), " ")
    val hof = array_distinct(
      when(size(toksCol) < 3, array(array_join(toksCol, " ")))
        .otherwise(transform(sequence(lit(1), size(toksCol) - 2),
          i => array_join(slice(toksCol, i, lit(3)), " "))))
    val out = spark.range(1)
      .select(HashExpressions.wordNGrams(toksCol, 3).as("k"), hof.as("h"))
      .as[(Seq[String], Seq[String])].head()
    assert(out._1 == out._2)
    assert(out._1 == Seq("w1 w2 w3", "w2 w3 w4", "w3 w4 w5"))
  }

  test("all kernels propagate null inputs as null results") {
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fa",
        ArrayType(FloatType), nullable = true),
      org.apache.spark.sql.types.StructField("la",
        ArrayType(LongType), nullable = true),
      org.apache.spark.sql.types.StructField("sa",
        ArrayType(StringType), nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(null, null, null)), schema)
    val out = df.select(
      VectorExpressions.floatNorm($"fa"),
      VectorExpressions.lshBuckets($"fa", 4, 2),
      HashExpressions.simhash64($"la"),
      HashExpressions.minhashSig($"la", 4),
      HashExpressions.jaccardSorted($"la", $"la"),
      HashExpressions.intersectCountSorted($"la", $"la"),
      HashExpressions.ngramHashes($"sa", 2),
      HashExpressions.wordNGrams($"sa", 2),
      HashExpressions.inSetCount($"sa", Seq("x"))).collect().head
    (0 until out.length).foreach(i => assert(out.isNullAt(i), s"col $i"))
  }

  test("GraftExtensions: kernels callable from SQL text") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(cast(1.0 as float), cast(0.0 as float)),
        |               array(cast(1.0 as float), cast(0.0 as float))) AS c,
        |  graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  graft_intersect_count_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
        |  graft_simhash(array(5L)) AS sh,
        |  size(graft_word_ngrams(array('a','b','c'), 2)) AS ng,
        |  size(graft_lsh_buckets_multiprobe(
        |    array(cast(1.0 as float), cast(-2.0 as float)), 4, 2, 3)) AS mp,
        |  graft_winnow_fingerprint('abcdef', 5, 4, true) AS wf,
        |  graft_deflate_ratio('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS dr,
        |  graft_int8_dot(graft_sq8_encode(array(cast(1.0 as float),
        |    cast(-2.0 as float), cast(3.0 as float))),
        |    graft_sq8_encode(array(cast(1.0 as float), cast(-2.0 as float),
        |    cast(3.0 as float)))) AS qd,
        |  graft_float_abs_max(array(cast(1.0 as float),
        |    cast(-2.0 as float))) AS am
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.5)
    assert(r.getInt(2) == 2)
    assert(r.getLong(3) == 5L)
    assert(r.getInt(4) == 2)
    assert(r.getInt(5) == 6) // 2 tables x 3 probes
    // 6 chars, k=5 -> grams "abcde","bcdef"; w=4 window covers both -> 1 min
    assert(r.getSeq[String](6).length == 1 &&
      r.getSeq[String](6).head.matches("[0-9a-f]{32}"))
    // 32x'a' deflates well below its own length
    assert(r.getDouble(7) > 0.0 && r.getDouble(7) < 1.0)
    assert(r.getLong(8) == 42L * 42 + 85L * 85 + 127L * 127)
    assert(r.getDouble(9) == 2.0)
    // arity misuse raises a clear error
    val ex = intercept[Exception](
      spark.sql("SELECT graft_float_dot(array(cast(1.0 as float)))").collect())
    assert(ex.getMessage.contains("expects 2 arguments") ||
      ex.getMessage.contains("graft_float_dot"))
  }

  test("every declared query compiles under forced codegen (no fallback)") {
    // Regression guard for silently-degrading doGenCode output: Spark
    // swallows Janino compile errors and falls back to the interpreted
    // path (e.g. a generic-method call like Arrays.copyOfRange whose
    // erased Object[] return doesn't assign to UTF8String[]), so parity
    // tests keep passing while the hot path quietly loses codegen. A
    // separate session (shared SparkContext, own SQLConf) forces
    // CODEGEN_ONLY with fallback disabled; any uncompilable kernel
    // fails this test with its query name.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val sfDir = "/root/testdata/sf0.001"
    val kernelQueries = Seq("q_ngram_jaccard", "q_minhash_neardup",
      "q_simhash_neardup", "q_text_stats", "q_lang_id", "q_repetition",
      "q_cosine_topk", "q_lsh_topk", "q_exact_dedup", "q_curation",
      "q_winnow_fp", "q_compress_ratio", "q_jaro_names")
    kernelQueries.foreach { name =>
      withClue(s"query $name under CODEGEN_ONLY: ") {
        assert(graft.SparkEntry.queries(name)(s2, sfDir).count() >= 0)
      }
    }
  }

  test("JaroWinkler: pinned external reference values, symmetry, " +
      "edge conventions, boost threshold and prefix cap") {
    import graft.functions.JaroKernel
    def jw(a: String, b: String): Double = JaroKernel.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    def r(x: Double, s: Int = 10) = BigDecimal(x)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP)
    // literals pinned from DuckDB's native jaro_winkler_similarity —
    // an EXTERNAL implementation of the same published algorithm (the
    // q_jaro_names oracle replays this check over 79k real pairs)
    assert(r(jw("martha", "marhta")) == r(0.9611111111111111))
    assert(r(jw("dixon", "dicksonx")) == r(0.8133333333333332))
    assert(r(jw("jellyfish", "smellyfish")) == r(0.8962962962962964))
    assert(r(jw("DWAYNE", "DUANE")) == r(0.8400000000000001))
    assert(jw("abc", "abc") == 1.0)
    // DuckDB conventions: empty-vs-anything AND empty-vs-empty are 0
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0)
    // window max(1,1)/2-1 = 0: single differing chars cannot match
    assert(jw("a", "b") == 0.0)
    // boost applies only above jaro 0.7 ...
    assert(r(jw("ab", "axyzw")) == r(0.5666666666666667))
    // ... and the common prefix caps at 4 even when 5 chars agree
    assert(r(jw("aaaaab", "aaaaac")) == r(0.9333333333333333))
    // symmetric by construction
    assert(jw("dixon", "dicksonx") == jw("dicksonx", "dixon"))
    // supplementary code points count as ONE character, not two chars
    val emoji = "😀"
    assert(jw(emoji, emoji) == 1.0)
  }

  test("WinnowFingerprint: interpreted == codegen == staged HOF form, both modes") {
    import graft.functions.{WinnowFingerprint, WinnowKernel}
    import graft.text.TextOps
    // edge cases: empty, shorter than one gram, shorter than one window,
    // repeats, and non-ASCII (exercises the char!=byte fallback path)
    val texts = Seq("", "ab", "hello", "hello world hello world",
      "The quick brown fox; jumps over THE lazy dog!",
      "aaaaaaaaaaaaaaaaaaaaaa", "z9 x8 y7 w6 v5 u4 t3")
    val nonAscii = Seq("héllo wörld naïve çafé über prose",
      "日本語のテキスト with mixed ascii")
    // md5 mode vs the HOF array form with md5 (the old oracle-matched path)
    texts.foreach { t =>
      val df = Seq((1L, t)).toDF("doc_id", "text")
      val fused = df.select(explode(WinnowKernel.winnowFingerprint(
        TextOps.normalize($"text"), 5, 4, portable = true)).as("fp"))
        .as[String].collect().toSeq
      val hof = df.select(explode(
        TextOps.winnowFingerprintWith($"text", 5, 4, md5)).as("fp"))
        .as[String].collect().toSeq
      assert(fused == hof, s"md5 mode mismatch on '$t'")
      // interpreted path (direct eval, no codegen) agrees
      val norm = df.select(TextOps.normalize($"text")).as[String].head()
      val interp = WinnowFingerprint(
        Literal(UTF8String.fromString(norm), StringType), 5, 4, true)
        .eval(InternalRow.empty).asInstanceOf[ArrayData]
        .toArray[UTF8String](StringType).map(_.toString).toSeq
      assert(interp == fused, s"md5 interpreted mismatch on '$t'")
    }
    // non-ASCII goes through the kernel on the RAW text (normalize would
    // strip it): fused must equal the HOF form on the same input
    nonAscii.foreach { t =>
      val df = Seq((1L, t)).toDF("doc_id", "text")
      val grams = transform(sequence(lit(1),
        greatest(length($"text") - 4, lit(1))),
        i => md5(substring($"text", i, lit(5))))
      val windows = transform(
        sequence(lit(0), greatest(size(grams) - 4, lit(0))),
        i => array_min(slice(grams, i + 1, lit(4))))
      val hof = df.select(explode(array_sort(array_distinct(windows))))
        .as[String].collect().toSeq
      val fused = df.select(explode(WinnowKernel.winnowFingerprint(
        $"text", 5, 4, portable = true))).as[String].collect().toSeq
      assert(fused == hof, s"md5 non-ascii mismatch on '$t'")
      val gramsXx = transform(sequence(lit(1),
        greatest(length($"text") - 4, lit(1))),
        j => xxhash64(substring($"text", j, lit(5))))
      val windowsXx = transform(
        sequence(lit(0), greatest(size(gramsXx) - 4, lit(0))),
        i => array_min(slice(gramsXx, i + 1, lit(4))))
      val hofXx = df.select(explode(array_sort(array_distinct(windowsXx))))
        .as[Long].collect().toSeq
      val fusedXx = df.select(explode(WinnowKernel.winnowFingerprint(
        $"text", 5, 4, portable = false))).as[Long].collect().toSeq
      assert(fusedXx == hofXx, s"xx non-ascii mismatch on '$t'")
    }
    // xx mode interpreted == codegen on plain text
    texts.foreach { t =>
      val df = Seq((1L, t)).toDF("doc_id", "text")
      val norm = df.select(TextOps.normalize($"text")).as[String].head()
      val viaDf = df.select(explode(WinnowKernel.winnowFingerprint(
        TextOps.normalize($"text"), 5, 4, portable = false)))
        .as[Long].collect().toSeq
      val interp = WinnowFingerprint(
        Literal(UTF8String.fromString(norm), StringType), 5, 4, false)
        .eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray.toSeq
      assert(interp == viaDf, s"xx interpreted mismatch on '$t'")
    }
  }

  test("LshBuckets: deterministic, table-independent, bounded bucket ids") {
    val v = Seq.tabulate(64)(i => (math.sin(i) * 10).toFloat)
    val b1 = Seq(Tuple1(v)).toDF("v")
      .select(VectorExpressions.lshBuckets($"v", 4, 8)).as[Seq[Long]].head()
    val b2 = Seq(Tuple1(v)).toDF("v")
      .select(VectorExpressions.lshBuckets($"v", 4, 8)).as[Seq[Long]].head()
    assert(b1 == b2 && b1.length == 8)
    assert(b1.forall(b => b >= 0 && b < 16)) // 4 planes -> 16 buckets
    // interpreted path agrees
    val interp = VectorExpressions.LshBuckets(
      Literal(floatArr(v), ArrayType(FloatType)), 4, 8)
      .eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray.toSeq
    assert(interp == b1)
  }

  test("LshBucketsMultiProbe: probe 0 == LshBuckets; the smallest " +
      "perturbation sets are single lowest-margin flips at this budget; " +
      "probes = 2^planes covers every bucket; interpreted == codegen") {
    val v = Seq.tabulate(64)(i => (math.cos(i) * 7).toFloat)
    val planes = 4; val tables = 8; val probes = 3
    val base = Seq(Tuple1(v)).toDF("v")
      .select(VectorExpressions.lshBuckets($"v", planes, tables))
      .as[Seq[Long]].head()
    val multi = Seq(Tuple1(v)).toDF("v")
      .select(VectorExpressions.lshBucketsMultiProbe($"v", planes, tables,
        probes)).as[Seq[Long]].head()
    assert(multi.length == tables * probes)
    (0 until tables).foreach { t =>
      val group = multi.slice(t * probes, (t + 1) * probes)
      assert(group.head == base(t), s"table $t probe 0 must be the base")
      group.tail.foreach { b =>
        val diff = b ^ base(t)
        assert(java.lang.Long.bitCount(diff) == 1 &&
          diff < (1L << planes), s"table $t: $b is not a 1-bit flip")
      }
      assert(group.distinct.size == probes, s"table $t probes must differ")
    }
    // interpreted path agrees with the codegen'd DataFrame result
    val interp = VectorExpressions.LshBucketsMultiProbe(
      Literal(floatArr(v), ArrayType(FloatType)), planes, tables, probes)
      .eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray.toSeq
    assert(interp == multi)
    // probes = 2^planes: the perturbation lattice covers EVERY bucket of
    // every table (the exhaustive brute-force-equivalent configuration)
    val full = Seq(Tuple1(v)).toDF("v")
      .select(VectorExpressions.lshBucketsMultiProbe($"v", planes, tables,
        1 << planes)).as[Seq[Long]].head()
    (0 until tables).foreach { t =>
      val group = full.slice(t * (1 << planes), (t + 1) * (1 << planes))
      assert(group.head == base(t), s"table $t probe 0 must be the base")
      assert(group.toSet == (0 until (1 << planes)).map(base(t) ^ _).toSet,
        s"table $t does not cover all buckets")
    }
    // over-budget probes fail at construction
    assertThrows[IllegalArgumentException](
      VectorExpressions.lshBucketsMultiProbe(lit(v.toArray), planes, tables,
        (1 << planes) + 1))
  }

  test("CmsEstimateLong: interpreted == codegen; unseen key estimates 0 " +
    "or collision-bounded") {
    import graft.functions.CmsEstimateLong
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .create(1e-4, 0.99, 42)
    val keys = Seq(7L, 7L, 7L, -13L, Long.MaxValue)
    keys.foreach(cms.addLong(_))
    for (k <- keys.distinct :+ 999L) {
      val interp = CmsEstimateLong(Literal(k), cms)
        .eval(InternalRow.empty).asInstanceOf[Long]
      val viaDf = Seq(Tuple1(k)).toDF("k")
        .select(CmsEstimateLong($"k", cms)).as[Long].head()
      assert(interp == viaDf, s"parity broke for key $k")
      assert(interp == cms.estimateCount(k))
    }
    // null propagates (UnaryExpression default), never NPEs into the sketch
    val nullOut = Seq(Tuple1(Option.empty[Long])).toDF("k")
      .select(CmsEstimateLong($"k", cms)).as[Option[Long]].head()
    assert(nullOut.isEmpty)
  }

  test("KllQuantilesOf: interpreted == codegen; exact quantiles below " +
    "the sketch's exact-mode capacity; empty sketch -> empty array") {
    import graft.functions.KllQuantilesOf
    import org.apache.datasketches.kll.KllDoublesSketch
    val sk = KllDoublesSketch.newHeapInstance(200)
    (1 to 100).foreach(v => sk.update(v.toDouble))
    val bytes = sk.toByteArray
    val probs = Seq(0.01, 0.5, 1.0)
    val interp = new KllQuantilesOf(Literal(bytes), probs)
      .eval(InternalRow.empty).asInstanceOf[ArrayData].toDoubleArray.toSeq
    val viaDf = Seq(Tuple1(bytes)).toDF("s")
      .select(KllQuantilesOf($"s", probs)).as[Seq[Double]].head()
    assert(interp == viaDf, "parity broke")
    // 100 values < the k=200 sketch's compaction threshold: no sampling
    // has happened yet, so INCLUSIVE quantiles are exact order statistics
    assert(interp == Seq(1.0, 50.0, 100.0))
    val empty = KllDoublesSketch.newHeapInstance(200).toByteArray
    val emptyOut = Seq(Tuple1(empty)).toDF("s")
      .select(KllQuantilesOf($"s", probs)).as[Seq[Double]].head()
    assert(emptyOut.isEmpty)
    val nullOut = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("s")
      .select(KllQuantilesOf($"s", probs)).as[Option[Seq[Double]]].head()
    assert(nullOut.isEmpty)
  }

  test("UnicodeNormalize: interpreted == codegen; NFC composes, NFKC " +
    "folds compatibility forms; invalid form fails at construction; " +
    "null propagates; already-normalized input returns unchanged") {
    import graft.functions.UnicodeExpression
    val decomposed = "Café Å"        // e+ACUTE, A+RING
    val composed = "Café Å"            // NFC targets
    val compat = "ﬁle １２"         // fi-ligature, fullwidth 12
    for ((in, form, want) <- Seq(
        (decomposed, "NFC", composed),
        (composed, "NFD", decomposed),
        (compat, "NFKC", "file 12"),
        (compat, "NFC", compat))) {            // NFC leaves compat forms
      val interp = UnicodeExpression.UnicodeNormalize(
        Literal(UTF8String.fromString(in), StringType), form)
        .eval(InternalRow.empty).toString
      val viaDf = Seq(Tuple1(in)).toDF("t")
        .select(UnicodeExpression.normalizeUnicode($"t", form)).as[String].head()
      assert(interp == viaDf, s"parity broke for $form")
      assert(viaDf == want, s"$form($in) = $viaDf, want $want")
      assert(java.text.Normalizer.isNormalized(viaDf,
        java.text.Normalizer.Form.valueOf(form)))
    }
    // idempotence on already-normalized input (the fast path)
    val twice = Seq(Tuple1(composed)).toDF("t")
      .select(UnicodeExpression.normalizeUnicode(
        UnicodeExpression.normalizeUnicode($"t", "NFC"), "NFC")).as[String].head()
    assert(twice == composed)
    // bad form fails at expression construction, not per row
    assertThrows[IllegalArgumentException](
      UnicodeExpression.normalizeUnicode(lit("x"), "NFX"))
    // null propagates (UnaryExpression default null-intolerance)
    val withNull = Seq(Some("a"), None).toDF("t")
      .select(UnicodeExpression.normalizeUnicode($"t", "NFC").as("n"))
    assert(withNull.filter($"n".isNull).count() == 1)
    // SQL registration path
    graft.functions.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      s"SELECT graft_unicode_normalize('Café', 'NFC')").as[String].head()
    assert(viaSql == "Café")
  }
}
