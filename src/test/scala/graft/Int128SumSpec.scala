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
}
