package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Encoding

/** K-fold target encoding: hand-computed out-of-fold means, the
  * leakage property (changing one fold's targets must not move that
  * fold's own encoding), null handling, and cold-category shrinkage. */
class EncodingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed out-of-fold means with zero smoothing") {
    // 2 folds via explicit keys — find keys landing in folds 0 and 1
    // deterministically by probing the same md5 the operator uses
    val probe = spark.range(40).select(col("id"),
      pmod(conv(substring(md5(concat(lit("tenc:"), col("id").cast("string"))),
        1, 12), 16, 10).cast("long"), lit(2L)).as("f"))
      .as[(Long, Long)].collect().toMap
    val k0 = (0L until 40L).filter(probe(_) == 0L).take(2)
    val k1 = (0L until 40L).filter(probe(_) == 1L).take(2)
    // category "a": fold0 targets (1.0, 3.0), fold1 targets (5.0, 7.0)
    val df = Seq(
      (k0(0), "a", 1.0), (k0(1), "a", 3.0),
      (k1(0), "a", 5.0), (k1(1), "a", 7.0)
    ).toDF("k", "cat", "y")
    val enc = Encoding.targetEncodeTable(df, "cat", "k", "y",
        folds = 2, smoothing = 0L)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(4)))
      .toMap
    // fold 0 encodes with fold 1's rows: mean(5,7)=6.0; and vice versa
    assert(enc(0L) === (2L, 6000000L))
    assert(enc(1L) === (2L, 2000000L))
  }

  test("leakage: perturbing a fold's own targets leaves its encoding fixed") {
    val df = spark.range(500).select(col("id").as("k"),
      concat(lit("c"), col("id") % 7).as("cat"),
      (col("id") % 13).cast("double").as("y"))
    val base = Encoding.targetEncodeTable(df, "cat", "k", "y", folds = 5)
    // recompute fold assignment exactly as the operator does, then
    // corrupt ONLY fold 3's targets
    val fold = pmod(conv(substring(md5(concat(lit("tenc:"),
      col("k").cast("string"))), 1, 12), 16, 10).cast("long"), lit(5L))
    val corrupted = df.withColumn("y",
      when(fold === 3L, col("y") * 1000.0 + 99.0).otherwise(col("y")))
    val after = Encoding.targetEncodeTable(corrupted, "cat", "k", "y",
      folds = 5)
    val b3 = base.filter(col("fold") === 3).select("category", "enc_x1e6")
      .as[(String, Long)].collect().toMap
    val a3 = after.filter(col("fold") === 3).select("category", "enc_x1e6")
      .as[(String, Long)].collect().toMap
    assert(b3.nonEmpty)
    // fold 3's encodings come only from other folds' (unchanged) rows —
    // except through the global prior, which zero smoothing removes
    val b0 = Encoding.targetEncodeTable(df, "cat", "k", "y", folds = 5,
      smoothing = 0L)
    val a0 = Encoding.targetEncodeTable(corrupted, "cat", "k", "y",
      folds = 5, smoothing = 0L)
    assert(b0.filter(col("fold") === 3).select("category", "enc_x1e6")
      .as[(String, Long)].collect().toMap ===
      a0.filter(col("fold") === 3).select("category", "enc_x1e6")
        .as[(String, Long)].collect().toMap)
    // with smoothing, the priors differ, so encodings may shift — but
    // other folds' encodings DO change (the corruption is visible)
    assert(base.filter(col("fold") =!= 3)
      .select("category", "fold", "enc_x1e6").as[(String, Long, Long)]
      .collect().toSet !==
      after.filter(col("fold") =!= 3)
        .select("category", "fold", "enc_x1e6").as[(String, Long, Long)]
        .collect().toSet)
    assert(b3.keySet === a3.keySet) // same categories either way
  }

  test("null target rows are excluded; null category is a real category; " +
      "a single-fold category encodes to the prior") {
    val df = Seq(
      (1L, Some("a"), Some(2.0)), (2L, Some("a"), None),
      (3L, None, Some(4.0)), (4L, Some("a"), Some(6.0)),
      (5L, Some("a"), Some(8.0)), (6L, None, Some(10.0)),
      (7L, Some("a"), Some(1.0)), (8L, Some("a"), Some(3.0))
    ).toDF("k", "cat", "y")
    val enc = Encoding.targetEncodeTable(df, "cat", "k", "y",
      folds = 2, smoothing = 0L)
    // null category present with nonzero counts
    assert(enc.filter(col("category").isNull).count() >= 1)
    // total counted rows = 7 (the null-target row is gone)
    assert(enc.filter(col("fold") === 0).agg(sum("oof_n")).head.getLong(0) +
      enc.filter(col("fold") === 1).agg(sum("oof_n")).head.getLong(0) === 7L)

    // a category confined to one fold: out-of-fold mean undefined →
    // exactly the prior (smoothing 0 exercises the fallback branch)
    val probe = spark.range(100).select(col("id"),
      pmod(conv(substring(md5(concat(lit("tenc:"), col("id").cast("string"))),
        1, 12), 16, 10).cast("long"), lit(2L)).as("f"))
      .as[(Long, Long)].collect().toMap
    val soloKey = (0L until 100L).find(probe(_) == 0L).get
    val df2 = Seq((soloKey, "solo", 100.0)).toDF("k", "cat", "y")
      .union(Seq((probe.keys.find(probe(_) == 1L).get, "other", 2.0))
        .toDF("k", "cat", "y"))
    val e2 = Encoding.targetEncodeTable(df2, "cat", "k", "y",
      folds = 2, smoothing = 0L)
    val solo0 = e2.filter(col("category") === "solo" && col("fold") === 0)
      .head
    assert(solo0.getLong(2) === 0L) // no out-of-fold evidence
    assert(solo0.getLong(4) === solo0.getLong(3)) // enc == prior
  }

  test("woeTable: hand-computed ln(3) bins, one-sided NULLs, NULL " +
      "label drop, NULL bin kept as a bin") {
    // A: 3 neg / 1 pos, B: 1 neg / 3 pos over N⁻ = N⁺ = 4:
    // woe_A = ln((3/4)/(1/4)) = ln 3 = 1.098612, woe_B = −ln 3;
    // both IV terms (±1/2)·(±ln 3) = 0.549306 → 549306 micros
    val rows = Seq(("A", false), ("A", false), ("A", false), ("A", true),
      ("B", false), ("B", true), ("B", true), ("B", true))
    val r = Encoding.woeTable(rows.toDF("bin", "y"), "bin", col("y"))
      .orderBy(col("bin"))
      .as[(String, Long, Long, Long, Option[Double], Option[Long])]
      .collect().toSeq
    assert(r == Seq(
      ("A", 4L, 1L, 3L, Some(1.098612), Some(549306L)),
      ("B", 4L, 3L, 1L, Some(-1.098612), Some(549306L))))
    // a pos-only bin has infinite odds — NULL woe/iv, counts kept
    val oneSided = rows ++ Seq(("C", true), ("C", true))
    val rc = Encoding.woeTable(oneSided.toDF("bin", "y"), "bin",
        col("y")).filter(col("bin") === "C").head
    assert(rc.getLong(1) == 2L && rc.isNullAt(4) && rc.isNullAt(5))
    // NULL labels drop; a NULL bin is a bin of its own
    val dirty = (rows.map { case (b, y) => (Option(b), Option(y)) } :+
      ((Option("A"), Option.empty[Boolean])) :+
      ((Option.empty[String], Option(true)))).toDF("bin", "y")
    val rd = Encoding.woeTable(dirty, "bin", col("y"))
    assert(rd.count() == 3L)
    assert(rd.filter(col("bin") === "A").head.getLong(1) == 4L)
    assert(rd.filter(col("bin").isNull).head.getLong(2) == 1L)
  }
}
