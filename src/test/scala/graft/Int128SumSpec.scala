package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Int128Sum.int128Sum

/** Exact 128-bit sum aggregate: SUM semantics (null skip, null on
  * empty), carry correctness across the 64-bit limb boundary, negative
  * values, partial-merge paths, and agreement with BigInteger ground
  * truth on random longs. */
class Int128SumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sumOf(vs: Seq[java.lang.Long], partitions: Int = 4)
      : Option[BigInt] = {
    val df = vs.map(Option(_).map(Long2long)).toDF("v")
      .repartition(partitions)
    val r = df.agg(int128Sum(col("v")).as("s")).head
    if (r.isNullAt(0)) None
    else Some(BigInt(r.getDecimal(0).toBigInteger))
  }

  test("plain longs sum exactly, across partitions (merge path)") {
    val vs = Seq(1L, 2L, 3L, -7L, 1000000L).map(java.lang.Long.valueOf)
    assert(sumOf(vs) === Some(BigInt(999999L)))
  }

  test("nulls are skipped; all-null and empty input yield NULL") {
    assert(sumOf(Seq(java.lang.Long.valueOf(5L), null, null))
      === Some(BigInt(5)))
    assert(sumOf(Seq(null, null)) === None)
    assert(sumOf(Seq.empty) === None)
  }

  test("sums beyond long range stay exact (the reason this exists)") {
    // 3 × (Long.MaxValue − 1) overflows a long twice over
    val vs = Seq.fill(3)(java.lang.Long.valueOf(Long.MaxValue - 1))
    assert(sumOf(vs) ===
      Some(BigInt(Long.MaxValue) * 3 - 3))
  }

  test("negative totals carry correctly through the low limb") {
    val vs = Seq(Long.MinValue, Long.MinValue, 3L, Long.MaxValue)
      .map(java.lang.Long.valueOf)
    val expected = BigInt(Long.MinValue) * 2 + 3 + BigInt(Long.MaxValue)
    assert(sumOf(vs) === Some(expected))
  }

  test("matches BigInteger ground truth on random longs (incl. extremes)") {
    val rnd = new scala.util.Random(42)
    val vs = (Seq(Long.MaxValue, Long.MinValue, 0L, -1L, 1L) ++
      Seq.fill(2000)(rnd.nextLong())).map(java.lang.Long.valueOf)
    val expected = vs.map(v => BigInt(v.longValue())).sum
    assert(sumOf(vs, partitions = 7) === Some(expected))
    assert(sumOf(vs, partitions = 1) === Some(expected))
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = graft.functions.Int128Sum(
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    val b = Array(-5L, Long.MinValue, 17L)
    assert(agg.deserialize(agg.serialize(b)).toSeq === b.toSeq)
  }

  test("group-by path: per-group exact sums") {
    val df = spark.range(1000)
      .select((col("id") % 3).as("g"),
        (col("id") * 1000000L).as("v"))
    val got = df.groupBy("g").agg(int128Sum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> BigInt(r.getDecimal(1)
        .toBigInteger)).toMap
    val expected = (0L until 1000L).groupBy(_ % 3)
      .view.mapValues(_.map(i => BigInt(i) * 1000000).sum).toMap
    assert(got === expected)
  }

  test("non-long input fails analysis loudly") {
    val e = intercept[Exception] {
      Seq(1.5, 2.5).toDF("v").agg(int128Sum(col("v"))).collect()
    }
    assert(e.getMessage.contains("Int128Sum") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  // ---- Int128SumProd: exact Σ a·b ----
  import graft.functions.Int128SumProd.int128SumProd

  private def prodSumOf(vs: Seq[(java.lang.Long, java.lang.Long)],
      partitions: Int = 4): Option[BigInt] = {
    val df = vs.map { case (a, b) =>
      (Option(a).map(Long2long), Option(b).map(Long2long)) }
      .toDF("a", "b").repartition(partitions)
    val r = df.agg(int128SumProd(col("a"), col("b")).as("s")).head
    if (r.isNullAt(0)) None
    else Some(BigInt(r.getDecimal(0).toBigInteger))
  }

  test("prod: per-row products beyond long range stay exact") {
    // (3e9)² = 9e18 per row sits at the long edge; ×3 rows overflows —
    // the welch/cuped/ols second-moment shape this aggregate serves
    val m = java.lang.Long.valueOf(3000000000L)
    assert(prodSumOf(Seq.fill(3)((m, m))) ===
      Some(BigInt(3000000000L).pow(2) * 3))
    // extremes: MinValue² needs the full 128 bits
    val mn = java.lang.Long.valueOf(Long.MinValue)
    assert(prodSumOf(Seq((mn, mn))) === Some(BigInt(Long.MinValue).pow(2)))
  }

  test("prod: either side NULL skips the row; empty/all-null yields NULL") {
    val five = java.lang.Long.valueOf(5L)
    assert(prodSumOf(Seq((five, five), (null, five), (five, null)))
      === Some(BigInt(25)))
    assert(prodSumOf(Seq((null, five))) === None)
    assert(prodSumOf(Seq.empty) === None)
  }

  test("prod: matches BigInteger ground truth on random longs " +
      "(signed products, merge path)") {
    val rnd = new scala.util.Random(7)
    val vs = (Seq((Long.MaxValue, Long.MaxValue),
        (Long.MinValue, Long.MaxValue), (-1L, Long.MinValue)) ++
      Seq.fill(2000)((rnd.nextLong(), rnd.nextLong())))
      .map { case (a, b) =>
        (java.lang.Long.valueOf(a), java.lang.Long.valueOf(b)) }
    val expected = vs.map { case (a, b) =>
      BigInt(a.longValue()) * BigInt(b.longValue()) }.sum
    assert(prodSumOf(vs, partitions = 7) === Some(expected))
    assert(prodSumOf(vs, partitions = 1) === Some(expected))
  }

  test("prod: n·Σy² ≥ (Σy)² holds on near-constant micros (the " +
      "consistency property independent re-quantization can violate)") {
    val micros = Seq.fill(1000)(1234567L) ++ Seq(1234568L)
    val df = micros.toDF("ym")
    val r = df.agg(count(lit(1)).as("n"), int128Sum(col("ym")).as("s"),
      int128SumProd(col("ym"), col("ym")).as("q")).head
    val n = BigInt(r.getLong(0))
    val s = BigInt(r.getDecimal(1).toBigInteger)
    val q = BigInt(r.getDecimal(2).toBigInteger)
    assert(n * q >= s * s, s"n·Σy²=${n * q} < (Σy)²=${s * s}")
  }

  test("prod: non-long input fails analysis loudly") {
    val e = intercept[Exception] {
      Seq((1.5, 2L)).toDF("a", "b")
        .agg(int128SumProd(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("Int128SumProd") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  test("BootstrapSums: hand-checked affine weights, null row skipped, " +
      "merge across partitions, empty input NULL") {
    import graft.functions.BootstrapSums.bootstrapSums
    // P = 10, thresholds [3, 6, 9] ⇒ w = #{t ≤ u}; R = 2 with
    // a = [1, 2], b = [0, 1], c = [0, 5]
    val A = Seq(1L, 2L); val B = Seq(0L, 1L); val C = Seq(0L, 5L)
    // rows (h1, h2, vm): (4, 7, 10): u1 = 4 ⇒ w 1; u2 = (8+7+5)%10 = 0 ⇒ 0
    //                    (9, 2, 20): u1 = 9 ⇒ 3; u2 = (18+2+5)%10 = 5 ⇒ 1
    //                    (null-masked row must not contribute)
    val df = Seq((4L, 7L, Option(10L)), (9L, 2L, Option(20L)),
      (5L, 5L, Option.empty[Long])).toDF("h1", "h2", "vm")
    val r = df.agg(bootstrapSums(col("h1"), col("h2"), col("vm"),
      A, B, C, 10L, Seq(3L, 6L, 9L)).as("s")).select("s.*").head
    assert(r.getSeq[Long](0) == Seq(10L + 60L, 0L + 20L)) // swv per replica
    assert(r.getSeq[Long](1) == Seq(1L + 3L, 0L + 1L))    // sw per replica
    // merge path: many partitions, same totals
    val big = (1 to 500).map(i => (i.toLong % 10, (i * 3L) % 10, i.toLong))
      .toDF("h1", "h2", "vm")
    val one = big.coalesce(1).agg(bootstrapSums(col("h1"), col("h2"),
      col("vm"), A, B, C, 10L, Seq(3L, 6L, 9L)).as("s")).head
    val many = big.repartition(13).agg(bootstrapSums(col("h1"), col("h2"),
      col("vm"), A, B, C, 10L, Seq(3L, 6L, 9L)).as("s")).head
    assert(one.getStruct(0).getSeq[Long](0) ==
      many.getStruct(0).getSeq[Long](0))
    assert(one.getStruct(0).getSeq[Long](1) ==
      many.getStruct(0).getSeq[Long](1))
    // empty input: SUM semantics ⇒ NULL struct
    val empty = df.filter(col("h1") < 0L)
      .agg(bootstrapSums(col("h1"), col("h2"), col("vm"),
        A, B, C, 10L, Seq(3L, 6L, 9L)).as("s")).head
    assert(empty.isNullAt(0))
    // misconfigured coefficients fail loudly
    intercept[IllegalArgumentException] {
      bootstrapSums(col("h1"), col("h2"), col("vm"),
        Seq(1L), B, C, 10L, Seq(3L))
    }
    intercept[IllegalArgumentException] {
      bootstrapSums(col("h1"), col("h2"), col("vm"),
        A, B, C, 10L, Seq(6L, 3L))
    }
    // overflow contract is ENFORCED, not assumed: coefficients must sit
    // in [0, modulus), the modulus under 2^22, and hash slices under
    // 2^40 — each violation fails loudly instead of silently zeroing
    // weights via a wrapped affine form
    intercept[IllegalArgumentException] { // coeff >= modulus
      bootstrapSums(col("h1"), col("h2"), col("vm"),
        Seq(10L, 2L), B, C, 10L, Seq(3L))
    }
    intercept[IllegalArgumentException] { // negative coeff
      bootstrapSums(col("h1"), col("h2"), col("vm"),
        A, Seq(-1L, 1L), C, 10L, Seq(3L))
    }
    intercept[IllegalArgumentException] { // modulus past 2^22
      bootstrapSums(col("h1"), col("h2"), col("vm"),
        A, B, C, (1L << 22) + 1L, Seq(3L))
    }
    val oob = intercept[org.apache.spark.SparkException] {
      Seq((1L << 40, 0L, 1L)).toDF("h1", "h2", "vm")
        .agg(bootstrapSums(col("h1"), col("h2"), col("vm"),
          A, B, C, 10L, Seq(3L)))
        .collect()
    }
    assert(oob.getMessage.contains("2^40") ||
      Option(oob.getCause).exists(_.getMessage.contains("2^40")))
  }
}
