package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ConfigLoader, EntityConfig}
import graft.ops._

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("P1 upcast: int and short become long, others untouched") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1, 2.toShort, 3L, "x", 1.5))),
      StructType(Seq(
        StructField("i", IntegerType), StructField("s", ShortType),
        StructField("l", LongType), StructField("str", StringType),
        StructField("d", DoubleType))))
    val up = Upcast(df)
    assert(up.schema("i").dataType == LongType)
    assert(up.schema("s").dataType == LongType)
    assert(up.schema("l").dataType == LongType)
    assert(up.schema("str").dataType == StringType)
    assert(up.schema("d").dataType == DoubleType)
    val row = up.collect()(0)
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L)
  }

  test("P1 upcast preserves extreme int values") {
    val df = Seq(Int.MaxValue, Int.MinValue, 0).toDF("i")
    assert(Upcast(df).as[Long].collect().toSet ==
      Set(Int.MaxValue.toLong, Int.MinValue.toLong, 0L))
  }

  test("W1 dedup: latest _ingested_at wins, deterministic tie-break") {
    val df = Seq(
      (1L, "old", "2024-01-01 00:00:00", "a.parquet"),
      (1L, "new", "2024-01-02 00:00:00", "b.parquet"),
      (2L, "tie1", "2024-01-01 00:00:00", "a.parquet"),
      (2L, "tie2", "2024-01-01 00:00:00", "b.parquet")
    ).toDF("id", "v", "ts", "_source_file")
      .withColumn("_ingested_at", $"ts".cast("timestamp"))
    val out = Dedup.latestByIngestion(df, Seq("id"))
      .select($"id", $"v").as[(Long, String)].collect().toMap
    assert(out(1L) == "new")
    assert(out(2L) == "tie2") // desc on _source_file: b.parquet wins
  }

  test("W1 dedup idempotence + PK uniqueness") {
    val df = Seq((1L, "a", "2024-01-02 00:00:00"),
      (1L, "b", "2024-01-01 00:00:00"),
      (3L, "c", "2024-01-01 00:00:00"))
      .toDF("id", "v", "ts")
      .withColumn("_ingested_at", $"ts".cast("timestamp"))
    val once = Dedup.latestByIngestion(df, Seq("id"))
    val twice = Dedup.latestByIngestion(once, Seq("id"))
    assert(once.count() == 2 && twice.count() == 2)
    assert(once.groupBy("id").count().filter($"count" > 1).count() == 0)
  }

  test("P5 soft-delete filter drops 'D' AND null op (3-valued logic)") {
    val df = Seq(("1", "I"), ("2", "D"), ("3", "U"), ("4", null))
      .toDF("id", "op")
    assert(SoftDeleteFilter(df).select("id").as[String].collect().toSet ==
      Set("1", "3"))
  }

  test("P5 guard: frame without op column passes through unchanged") {
    val df = Seq(("1", "x")).toDF("id", "v")
    assert(SoftDeleteFilter(df).count() == 1)
  }

  test("P7 expectations: drop-if-ANY-violated; NULL counts as violation") {
    val df = Seq(
      (1L, Some(5.0), "ok"),     // passes both
      (2L, Some(-1.0), "ok"),    // fails qty_pos
      (3L, None, "ok"),          // null qty -> violation
      (4L, Some(5.0), null)      // null name -> violation
    ).toDF("id", "qty", "name")
    val out = Expectations(df, Map(
      "qty_pos" -> "qty > 0",
      "name_nonnull" -> "name IS NOT NULL"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("P7 expectation metrics: Observation reports per-rule violation counts") {
    val df = Seq(
      (1L, Some(5.0), "ok"), (2L, Some(-1.0), "ok"),
      (3L, None, "ok"), (4L, Some(5.0), null)).toDF("id", "qty", "name")
    val obs = org.apache.spark.sql.Observation("exp_metrics")
    val out = Expectations.observed(df, Map(
      "qty_pos" -> "qty > 0",
      "name_nonnull" -> "name IS NOT NULL"), obs)
    assert(out.count() == 1) // action materializes the metrics
    assert(obs.get("violations_qty_pos") == 2L)   // id=2 (neg), id=3 (null)
    assert(obs.get("violations_name_nonnull") == 1L) // id=4
  }

  test("P7 empty expectations = no-op") {
    val df = Seq((1, "a")).toDF("id", "v")
    assert(Expectations(df, Map.empty).count() == 1)
  }

  test("P7 tiers: gated filters by gate only, counts monitors on the " +
    "same observe; names shared across maps rejected") {
    val df = Seq(
      (1L, Some(5.0), "ok"), (2L, Some(-1.0), "ok"),
      (3L, None, "ok"), (4L, Some(5.0), null)).toDF("id", "qty", "name")
    val obs = org.apache.spark.sql.Observation("exp_tiers")
    val out = Expectations.gated(df,
      gate = Map("qty_pos" -> "qty > 0"),
      monitor = Map("name_nonnull" -> "name IS NOT NULL"), obs)
    // monitor tier (warn/fail) never filters: id=4 violates it but stays
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(obs.get("violations_qty_pos") == 2L)
    assert(obs.get("violations_name_nonnull") == 1L)
    assertThrows[IllegalArgumentException](Expectations.gated(df,
      Map("x" -> "qty > 0"), Map("x" -> "name IS NOT NULL"),
      org.apache.spark.sql.Observation("exp_dup")))
  }

  test("P7 violatedOnly: the quarantine side — violators with sorted " +
    "violated-name arrays; clean rows absent; outCol collision loud") {
    val df = Seq(
      (1L, Some(5.0), "ok"), (2L, Some(-1.0), null),
      (3L, None, "ok")).toDF("id", "qty", "name")
    val out = Expectations.violatedOnly(df, Map(
        "qty_pos" -> "qty > 0", "name_nonnull" -> "name IS NOT NULL"))
      .select($"id", $"_violated").as[(Long, Seq[String])]
      .collect().toMap
    assert(out == Map(
      2L -> Seq("name_nonnull", "qty_pos"), // both, name-sorted
      3L -> Seq("qty_pos")))
    assertThrows[IllegalArgumentException](
      Expectations.violatedOnly(df, Map.empty))
    assertThrows[IllegalArgumentException](Expectations.violatedOnly(
      df.withColumn("_violated", lit(1)), Map("q" -> "qty > 0")))
  }

  test("P8 rename maps old -> new") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = Rename(df, Map("a" -> "id", "b" -> "val"))
    assert(out.columns.toSeq == Seq("id", "val"))
  }

  test("ClusterLayout range-partitions + sorts; no-op on missing cols") {
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    val laid = ClusterLayout(df, Seq("k"))
    assert(laid.count() == 3)
    assert(ClusterLayout(df, Seq("nope")).columns.toSeq == df.columns.toSeq)
  }

  test("Salt: skew-safe aggregates equal their unsalted counterparts") {
    // skewed: key 'hot' holds 90% of rows with repeating values
    val rows = (1 to 900).map(i => ("hot", s"v${i % 37}")) ++
      (1 to 100).map(i => (s"k${i % 7}", s"v$i"))
    val df = rows.toDF("k", "v")
    val salted = graft.ops.Salt.distinctCountPerKey(df, "k", "v", factor = 8)
      .orderBy("k").as[(String, Long)].collect().toSeq
    val plain = df.groupBy("k").agg(countDistinct($"v").as("n_distinct"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(salted == plain)
    val saltedCounts = graft.ops.Salt.countPerKey(df, "k", factor = 8)
      .orderBy("k").as[(String, Long)].collect().toSeq
    val plainCounts = df.groupBy("k").count()
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(saltedCounts == plainCounts)
  }

  test("Robust.winsorize: clamps into the per-stratum percentile band; " +
      "NULL values stay NULL; all-NULL strata pass through unclamped") {
    // stratum a: values 0..10 -> p25 = 2.5, p75 = 7.5 (interpolated)
    val rows = (0 to 10).map(i => ("a", Some(i.toDouble))) ++
      Seq(("b", None: Option[Double]), ("b", None))
    val df = rows.toDF("g", "x")
    val out = graft.ops.Robust.winsorize(df, "x", Seq("g"),
        pLo = 0.25, pHi = 0.75)
      .select($"g", $"x", $"winsorized")
      .as[(String, Option[Double], Option[Double])].collect()
    val a = out.filter(_._1 == "a").flatMap(_._3).sorted
    assert(a.head == 2.5 && a.last == 7.5)
    assert(a.count(v => v == 2.5) == 3) // 0, 1, 2 clamped up
    assert(a.count(v => v == 7.5) == 3) // 8, 9, 10 clamped down
    assert(out.filter(_._1 == "a")
      .forall(r => r._3.exists(v => v >= 2.5 && v <= 7.5)))
    // in-band values unchanged
    assert(out.exists(r => r._2.contains(5.0) && r._3.contains(5.0)))
    // NULL value stays NULL; the all-NULL stratum has no bounds
    assert(out.filter(_._1 == "b").forall(_._3.isEmpty))
    assertThrows[IllegalArgumentException](
      graft.ops.Robust.winsorize(df, "x", Seq("g"), 0.9, 0.1))
    // a pre-existing output column is never silently replaced: loud
    // error, and outCol routes around it
    val clash = df.withColumn("winsorized", lit(-1.0))
    assertThrows[IllegalArgumentException](
      graft.ops.Robust.winsorize(clash, "x", Seq("g")))
    val routed = graft.ops.Robust.winsorize(clash, "x", Seq("g"),
      pLo = 0.25, pHi = 0.75, outCol = "w2")
    assert(routed.columns.count(_ == "winsorized") == 1 &&
      routed.columns.contains("w2"))
    assert(routed.select("winsorized").distinct().count() == 1) // untouched
    assertThrows[IllegalArgumentException](
      graft.ops.Robust.robustZ(
        df.withColumn("robust_z", lit(0.0)), "x", Seq("g")))
  }

  test("Salt.heavyKeys: counts/shares/ranks match hand truth; head " +
      "bounded by TakeOrderedAndProject") {
    val rows = (1 to 90).map(_ => "hot") ++ (1 to 8).map(_ => "warm") ++
      Seq("c1", "c2")
    val df = rows.toDF("k")
    val got = graft.ops.Salt.heavyKeys(df, Seq("k"), k = 3)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq((1, "hot", 90L, 0.90), (2, "warm", 8L, 0.08),
      (3, "c1", 1L, 0.01)))
    // the head never materializes a global sort of the key counts
    val plan = graft.ops.Salt.heavyKeys(df, Seq("k"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assertThrows[IllegalArgumentException](
      graft.ops.Salt.heavyKeys(df, Seq.empty, 3))
    // key columns that collide with the output vocabulary fail loud...
    assertThrows[IllegalArgumentException](
      graft.ops.Salt.heavyKeys(rows.toDF("n"), Seq("n"), 3))
    // ...while a key literally named _total (the internal total's old
    // name) works — the internal name fresh()-routes around it
    val tot = graft.ops.Salt.heavyKeys(rows.toDF("_total"), Seq("_total"), 1)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(tot == Seq((1, "hot", 90L, 0.90)))
  }

  test("Salt.saltedJoin: identical to the plain join with broadcast off") {
    val facts = ((1 to 800).map(i => (i.toLong, "hot")) ++
      (801 to 1000).map(i => (i.toLong, s"k${i % 5}"))).toDF("id", "k")
    val dim = (Seq("hot") ++ (0 until 5).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 10L) }.toDF("k", "w")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = graft.ops.Salt
        .saltedJoin(facts, dim, Seq("k"), $"id", factor = 8)
        .select("id", "k", "w").orderBy("id")
        .as[(Long, String, Long)].collect().toSeq
      val plain = facts.join(dim, Seq("k")).select("id", "k", "w")
        .orderBy("id").as[(Long, String, Long)].collect().toSeq
      assert(salted == plain)
      // the join key set really is (k, _salt): the salted plan spreads the
      // hot key across > 1 shuffle partition
      val parts = graft.ops.Salt.withSalt(facts, $"id", 8)
        .filter($"k" === "hot").select($"_salt").distinct().count()
      assert(parts > 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IntervalJoin.overlapJoin: equals the naive theta join; emits " +
    "each pair exactly once; edge cases at bucket boundaries") {
    // intervals engineered around bucket boundaries (W = 10): touching
    // endpoints, containment, multi-bucket spans, exact-boundary starts
    val left = Seq(
      (1L, 0L, 10L), (2L, 5L, 25L), (3L, 30L, 40L), (4L, 100L, 101L))
      .toDF("id_a", "s_a", "e_a")
    val right = Seq(
      (10L, 10L, 12L),  // touches interval 1 at t=10 and overlaps 2
      (11L, 24L, 31L),  // overlaps 2 and 3
      (12L, 50L, 60L),  // overlaps nothing
      (13L, 0L, 200L))  // spans everything
      .toDF("id_b", "s_b", "e_b")
    val got = graft.ops.IntervalJoin
      .overlapJoin(left, right, "s_a", "e_a", "s_b", "e_b", 10L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val naive = left.crossJoin(right)
      .filter($"s_a" <= $"e_b" && $"s_b" <= $"e_a")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted,
      s"got ${got.sorted} expected ${naive.sorted}")
    assert(got.size == got.distinct.size, "a pair was emitted twice")
  }

  test("Scd2: collapses runs, chains intervals, one open row per key") {
    val rows = Seq(
      // key 1: A A B A -> intervals A[10,30) B[30,40) A[40,null)
      (1L, 10L, 101L, "A"), (1L, 20L, 102L, "A"),
      (1L, 30L, 103L, "B"), (1L, 40L, 104L, "A"),
      // key 2: single row -> one open interval
      (2L, 15L, 201L, "X"),
      // key 3: null -> value -> null are all changes (null-safe compare)
      (3L, 1L, 301L, null), (3L, 2L, 302L, "Y"), (3L, 3L, 303L, null))
      .toDF("pk", "ts", "event_id", "status")
    val out = graft.ops.Scd2
      .scd2(rows, "pk", "ts", "event_id", Seq("status"))
      .orderBy("pk", "valid_from")
      .select("pk", "src_event_id", "status", "valid_from", "valid_to",
        "is_current")
      .collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((101L, "A"), (103L, "B"), (104L, "A")))
    // intervals chain: valid_to of row i == valid_from of row i+1
    assert(k1.map(_.getLong(3)).toSeq == Seq(10L, 30L, 40L))
    assert(k1.dropRight(1).map(_.getLong(4)).toSeq == Seq(30L, 40L))
    assert(k1.last.isNullAt(4) && k1.last.getBoolean(5))
    assert(out.filter(_.getBoolean(5)).map(_.getLong(0)).toSeq.sorted ==
      Seq(1L, 2L, 3L))
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.length == 3, "null <-> value flips must open intervals")
  }

  test("Scd2.temporalJoin: each fact lands in its valid interval; " +
      "facts before a key's first interval drop; current row open-ended") {
    val changes = Seq(
      (1L, 10L, 101L, "A"), (1L, 30L, 103L, "B"), (1L, 40L, 104L, "A"),
      (2L, 15L, 201L, "X"))
      .toDF("pk", "ts", "event_id", "status")
    val dim = graft.ops.Scd2.scd2(changes, "pk", "ts", "event_id",
      Seq("status"))
    val facts = Seq((1000L, 1L, 5L), (1001L, 1L, 10L), (1002L, 1L, 35L),
        (1003L, 1L, 99L), (1004L, 2L, 15L), (1005L, 3L, 15L))
      .toDF("fact_id", "pk", "t")
    val rows = graft.ops.Scd2.temporalJoin(facts, dim, "pk", "t")
      .select("fact_id", "status").as[(Long, String)].collect().toSeq
    // at-most-one interval per fact: count BEFORE collapsing to a map
    // (a boundary regression emitting two rows must fail reliably)
    assert(rows.length == 4, s"expected 4 joined rows, got $rows")
    // 5 < first interval and pk 3 unknown -> dropped; 10->A, 35->B
    // (interval [30,40)), 99 -> open current A, 15 -> X
    assert(rows.toMap == Map(1001L -> "A", 1002L -> "B", 1003L -> "A",
      1004L -> "X"))
  }

  test("TimeSeries.locf: carries last observation forward per key; " +
      "leading nulls stay null; non-null rows untouched") {
    val rows = Seq(
      (1L, 10L, Option(1.0)), (1L, 20L, None), (1L, 30L, None),
      (1L, 40L, Option(4.0)), (1L, 50L, None),
      (2L, 5L, None), (2L, 6L, Option(9.0)))
      .toDF("k", "t", "v")
    val out = graft.ops.TimeSeries
      .locf(rows, "k", Seq(col("t").asc), Seq("v"))
      .orderBy("k", "t").select("v").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(1.0), Some(1.0), Some(1.0), Some(4.0),
      Some(4.0), None, Some(9.0)))
  }

  test("TimeSeries.interpolate: linear between neighbors; edges carry; " +
      "all-null key stays null") {
    val rows = Seq(
      // key 1: 1.0 @10, null @20, null @25, 4.0 @30
      (1L, 10L, Option(1.0)), (1L, 20L, None), (1L, 25L, None),
      (1L, 30L, Option(4.0)),
      // key 2: leading null backfills, trailing null carries forward
      (2L, 1L, None), (2L, 2L, Option(5.0)), (2L, 3L, None),
      // key 3: no observations at all
      (3L, 7L, None))
      .toDF("k", "t", "v")
    val out = graft.ops.TimeSeries
      .interpolate(rows, "k", "t", Seq(col("t").asc), "v")
      .orderBy("k", "t").select("v").as[Option[Double]].collect().toSeq
    // @20: 1 + 3*(20-10)/(30-10) = 2.5 ; @25: 1 + 3*15/20 = 3.25
    assert(out == Seq(Some(1.0), Some(2.5), Some(3.25), Some(4.0),
      Some(5.0), Some(5.0), Some(5.0), None))
  }

  test("TimeSeries.exponentialSmooth: hand-traced recurrence, gap day " +
      "pulls the level down, alpha bounds, loud grid cap") {
    // counts 4, 8, 8 at α = .5: s = 4e6, 6e6, 7e6 (exact halves)
    val ev = (Seq.fill(4)(0L) ++ Seq.fill(8)(1L) ++ Seq.fill(8)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val out = graft.ops.TimeSeries.exponentialSmooth(ev, "ts_us",
      periodUs = 1L, alphaX1e6 = 500000L).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((0L, 4L, 4000000L), (1L, 8L, 6000000L),
        (2L, 8L, 7000000L)))
    // a gap period (count 0) decays the level: 4, _, 4 at α=.5 gives
    // s = 4e6, 2e6, 3e6
    val gap = (Seq.fill(4)(0L) ++ Seq.fill(4)(2L)).map(Tuple1(_))
      .toDF("ts_us")
    val g = graft.ops.TimeSeries.exponentialSmooth(gap, "ts_us", 1L,
      500000L).collect()
    assert(g.map(_.getLong(2)).toSeq ==
      Seq(4000000L, 2000000L, 3000000L))
    // α = 1 reproduces the raw series; α = 0 is rejected
    val raw = graft.ops.TimeSeries.exponentialSmooth(gap, "ts_us", 1L,
      1000000L).collect()
    assert(raw.map(_.getLong(2)).toSeq ==
      Seq(4000000L, 0L, 4000000L))
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.exponentialSmooth(gap, "ts_us", 1L, 0L)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.exponentialSmooth(ev, "ts_us", 1L, 500000L,
        maxSteps = 2)
    }
  }

  test("TimeSeries.cusum: hand-traced one-sided sums around a level " +
      "shift, gap day counts zero, loud grid cap") {
    // periods 0..5 with counts 3,3,3,3,10,10: μ0 = ⌊32e6/6⌋ = 5333333;
    // k = 1e6, h = 5e6. The low plateau walks S⁻ up to an alarm at
    // period 3 (5333332 is 1 micro short of 2/3... > 5e6 ⇒ signal),
    // the shift to 10 resets S⁻ and walks S⁺ to an alarm at period 5
    val ev = (Seq.fill(3)(0L) ++ Seq.fill(3)(1L) ++ Seq.fill(3)(2L) ++
      Seq.fill(3)(3L) ++ Seq.fill(10)(4L) ++ Seq.fill(10)(5L))
      .map(Tuple1(_)).toDF("ts_us")
    val out = graft.ops.TimeSeries.cusum(ev, "ts_us", periodUs = 1L,
      kX1e6 = 1000000L, hX1e6 = 5000000L).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
      r.getBoolean(4))).toSeq == Seq(
      (0L, 0L, 1333333L, false),
      (1L, 0L, 2666666L, false),
      (2L, 0L, 3999999L, false),
      (3L, 0L, 5333332L, true),
      (4L, 3666667L, 0L, false),
      (5L, 7333334L, 0L, true)))
    // a missing period counts ZERO (the alarm a sparse-row scan misses)
    val gap = (Seq.fill(2)(0L) ++ Seq.fill(2)(2L)).map(Tuple1(_))
      .toDF("ts_us")
    val g = graft.ops.TimeSeries.cusum(gap, "ts_us", 1L,
      kX1e6 = 0L, hX1e6 = 1000000L).collect()
    // μ0 = ⌊4e6/3⌋ = 1333333; the gap day pushes S⁻ to 1333333 > h
    assert(g(1).getLong(1) == 0L && g(1).getBoolean(4))
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.cusum(ev, "ts_us", 1L, 1L, 1L, maxSteps = 2)
    }
  }

  test("TimeSeries.seasonalDecompose: hand-traced trend/seasonal/residual " +
      "with a gap day, edge trend NULL, floor-exact centering") {
    // periodUs = 1: periods 0,1,3 observed (2, 4, 6 events), 2 is a gap
    // ⇒ dense n = [2, 4, 0, 6]; window 3, season 2
    val ev = (Seq.fill(2)(0L) ++ Seq.fill(4)(1L) ++ Seq.fill(6)(3L))
      .map(Tuple1(_)).toDF("ts_us")
    val out = graft.ops.TimeSeries
      .seasonalDecompose(ev, "ts_us", periodUs = 1L, seasonLen = 2,
        trendWindow = 3)
      .collect()
    def g(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    // trend: p1 = 6e6//3 = 2000000, p2 = 10e6//3 = 3333333, edges NULL
    // detr: p1 = +2000000, p2 = −3333333
    // smean: pos0 = −3333333, pos1 = 2000000; center = −1333333//2 =
    // −666667 (FLOOR, not truncation) ⇒ seasonal −2666666 / +2666667
    // residual: both interior days −666667; edge days NULL
    assert(out.map(r => (r.getLong(0), r.getLong(1), g(r, 2), g(r, 3),
      g(r, 4))).toSeq == Seq(
      (0L, 2L, None, Some(-2666666L), None),
      (1L, 4L, Some(2000000L), Some(2666667L), Some(-666667L)),
      (2L, 0L, Some(3333333L), Some(-2666666L), Some(-666667L)),
      (3L, 6L, None, Some(2666667L), None)))
    // the decomposition identity holds where defined:
    // n·1e6 = trend + seasonal + residual
    out.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getLong(1) * 1000000L ==
        r.getLong(2) + r.getLong(3) + r.getLong(4))
    }
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.seasonalDecompose(ev, "ts_us", 1L,
        trendWindow = 4)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.seasonalDecompose(ev, "ts_us", 1L,
        seasonLen = 1)
    }
  }

  test("TimeSeries.holt: hand-traced level/trend recurrence, classical " +
      "init, negative trend, parameter bounds") {
    // counts 4, 8, 8 at α = β = .5: l₁=4e6, b₁ = x₂−x₁ = 4e6;
    // i=2: l = (.5·8e6 + .5·(4e6+4e6)) = 8e6, b = (.5·4e6 + .5·4e6) = 4e6;
    // i=3: l = (.5·8e6 + .5·12e6) = 10e6, b = (.5·2e6 + .5·4e6) = 3e6
    val ev = (Seq.fill(4)(0L) ++ Seq.fill(8)(1L) ++ Seq.fill(8)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val out = graft.ops.TimeSeries.holt(ev, "ts_us", periodUs = 1L,
      alphaX1e6 = 500000L, betaX1e6 = 500000L).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
      (0L, 4L, 4000000L, 4000000L, 8000000L),
      (1L, 8L, 8000000L, 4000000L, 12000000L),
      (2L, 8L, 10000000L, 3000000L, 13000000L)))
    // decreasing series keeps an exact NEGATIVE trend: counts 7, 4, 2
    // at α=.3, β=.2: b₁=−3e6; i=2: l=4e6, b=−3e6; i=3: l+b=1e6 ⇒
    // l = (.3·2e6 + .7·1e6) = 1.3e6, b = (.2·(1.3e6−4e6) + .8·(−3e6))
    //   = −2.94e6; forecast = −1.64e6 (goes negative — floor, not trunc)
    val dn = (Seq.fill(7)(0L) ++ Seq.fill(4)(1L) ++ Seq.fill(2)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val d = graft.ops.TimeSeries.holt(dn, "ts_us", 1L, 300000L, 200000L)
      .collect()
    assert(d.map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq == Seq((7000000L, -3000000L, 4000000L),
        (4000000L, -3000000L, 1000000L),
        (1300000L, -2940000L, -1640000L)))
    // a 1-period spine gets b₁ = 0
    val one = Seq.fill(3)(0L).map(Tuple1(_)).toDF("ts_us")
    val o = graft.ops.TimeSeries.holt(one, "ts_us", 1L, 500000L, 500000L)
      .collect()
    assert(o.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((3000000L, 0L)))
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.holt(ev, "ts_us", 1L, 0L, 500000L)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.holt(ev, "ts_us", 1L, 500000L, 1000001L)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.holt(ev, "ts_us", 1L, 500000L, 500000L,
        maxSteps = 2)
    }
  }

  test("TimeSeries.holtWinters: hand-traced level/trend/seasonal " +
      "recurrence with the ring init, one-step forecast, loud guards") {
    // counts [4,8,6,10], L=2, α=β=γ=.5: init l=6e6, s=[−2e6, 2e6];
    // p2: l=7e6, b=.5e6, s=−1.5e6, fc=7e6+.5e6+2e6;
    // p3: l=7.75e6, b=.625e6, s=2.125e6, fc=7.75e6+.625e6−1.5e6
    val ev = (Seq.fill(4)(0L) ++ Seq.fill(8)(1L) ++ Seq.fill(6)(2L) ++
      Seq.fill(10)(3L)).map(Tuple1(_)).toDF("ts_us")
    val out = graft.ops.TimeSeries.holtWinters(ev, "ts_us", 1L,
      500000L, 500000L, 500000L, seasonLen = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq == Seq(
      (2L, 6L, 7000000L, 500000L, -1500000L, 9500000L),
      (3L, 10L, 7750000L, 625000L, 2125000L, 6875000L)))
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.holtWinters(ev, "ts_us", 1L, 500000L,
        500000L, 500000L, seasonLen = 1)
    }
    intercept[IllegalArgumentException] { // needs more than one season
      graft.ops.TimeSeries.holtWinters(ev, "ts_us", 1L, 500000L,
        500000L, 500000L, seasonLen = 4)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.holtWinters(ev, "ts_us", 1L, 500000L,
        500000L, 0L, seasonLen = 2)
    }
  }

  test("TimeSeries.forecastEval: hand-traced MAE/RMSE/MASE, α=1 " +
      "equals naive, constant series NULL MASE, short spine NULLs") {
    // counts 4, 8, 8 at α=.5 ⇒ s = 4e6, 6e6, 7e6 (exponentialSmooth
    // spec); model errors |8e6−4e6|, |8e6−6e6| ⇒ mae = 3e6,
    // rmse = ⌊√((16e12+4e12)//2)⌋ = ⌊√1e13⌋ = 3162277;
    // naive errors 4e6, 0 ⇒ mae_naive = 2e6, mase = 1.5e6
    val ev = (Seq.fill(4)(0L) ++ Seq.fill(8)(1L) ++ Seq.fill(8)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val r = graft.ops.TimeSeries.forecastEval(ev, "ts_us", 1L,
      alphaX1e6 = 500000L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (3L, 3000000L, 3162277L, 2000000L, 1500000L))
    // α = 1: the smoother IS the naive forecaster ⇒ mase = 1e6 exactly
    val r1 = graft.ops.TimeSeries.forecastEval(ev, "ts_us", 1L,
      1000000L).collect().head
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(4)) ==
      (2000000L, 2828427L, 1000000L))
    // constant series: zero naive error ⇒ MASE NULL (nothing to beat)
    val const = (Seq.fill(5)(0L) ++ Seq.fill(5)(1L) ++ Seq.fill(5)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val rc = graft.ops.TimeSeries.forecastEval(const, "ts_us", 1L,
      500000L).collect().head
    assert((rc.getLong(1), rc.getLong(2)) == (0L, 0L) && rc.isNullAt(4))
    // a 1-period spine has no one-step-ahead pairs at all
    val one = Seq.fill(3)(0L).map(Tuple1(_)).toDF("ts_us")
    val ro = graft.ops.TimeSeries.forecastEval(one, "ts_us", 1L,
      500000L).collect().head
    assert(ro.getLong(0) == 1L && ro.isNullAt(1) && ro.isNullAt(2) &&
      ro.isNullAt(3) && ro.isNullAt(4))
    // EMPTY input reports 0 periods, never 1 (the errors+1 conflation)
    val none = one.filter(col("ts_us") < 0L)
    val re = graft.ops.TimeSeries.forecastEval(none, "ts_us", 1L,
      500000L).collect().head
    assert(re.getLong(0) == 0L && re.isNullAt(1))
  }

  test("TimeSeries.seasonalAnomaly: lower-median MAD over the " +
      "decomposition residuals, exact threshold compare, spike flagged") {
    // the seasonalDecompose spec's series: dense n = [2,4,0,6],
    // residuals both −666667 ⇒ MAD = 666667 (rank ⌊(2+1)/2⌋ = 1).
    // k=3: |r|·1e6 = 666667·1e6 ≤ 666667·3e6 ⇒ nothing flagged;
    // k=0.999999: 666667·1e6 > 666667·999999 ⇒ both flagged
    val ev = (Seq.fill(2)(0L) ++ Seq.fill(4)(1L) ++ Seq.fill(6)(3L))
      .map(Tuple1(_)).toDF("ts_us")
    val r3 = graft.ops.TimeSeries.seasonalAnomaly(ev, "ts_us", 1L,
      kX1e6 = 3000000L, seasonLen = 2, trendWindow = 3).collect()
    assert(r3.map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
      r.getBoolean(4))).toSeq == Seq(
      (1L, -666667L, 666667L, false), (2L, -666667L, 666667L, false)))
    val rT = graft.ops.TimeSeries.seasonalAnomaly(ev, "ts_us", 1L,
      kX1e6 = 999999L, seasonLen = 2, trendWindow = 3).collect()
    assert(rT.map(_.getBoolean(4)).toSeq == Seq(true, true))
    // a spike stands out of a flat background: the flagged set is
    // exactly the periods whose |resid| exceeds k×(recomputed lower
    // median), and the MAD column matches that recomputation
    val spike = ((0 to 20).flatMap(p => Seq.fill(2)(p.toLong)) ++
      Seq.fill(200)(10L)).map(Tuple1(_)).toDF("ts_us")
    val dec = graft.ops.TimeSeries.seasonalDecompose(spike, "ts_us", 1L,
      seasonLen = 2, trendWindow = 3).collect()
      .filter(!_.isNullAt(4)).map(r => r.getLong(0) -> r.getLong(4))
    val mags = dec.map(x => math.abs(x._2)).sorted
    val mad = mags((mags.length + 1) / 2 - 1)
    val expect = dec.filter { case (_, res) =>
      BigInt(math.abs(res)) * 1000000L > BigInt(mad) * 3000000L
    }.map(_._1).toSet
    val rs = graft.ops.TimeSeries.seasonalAnomaly(spike, "ts_us", 1L,
      kX1e6 = 3000000L, seasonLen = 2, trendWindow = 3).collect()
    assert(rs.forall(_.getLong(3) == mad))
    assert(rs.filter(_.getBoolean(4)).map(_.getLong(0)).toSet == expect)
    assert(expect.nonEmpty) // the spike period actually trips the gate
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.seasonalAnomaly(ev, "ts_us", 1L, 0L)
    }
  }

  test("TimeSeries.acf: hand-computed lags, alternating series flips " +
      "sign, constant series NULL, lag bounds") {
    // counts 4, 8, 8: μ = ⌊20e6/3⌋, d = [−2666666, 1333334, 1333334],
    // den = 10666666666668; lag1 = ⌊−1777776888888e6/den⌋ = −166667,
    // lag2 = ⌊−3555556444444e6/den⌋ = −333334 (negative FLOOR path)
    val ev = (Seq.fill(4)(0L) ++ Seq.fill(8)(1L) ++ Seq.fill(8)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val out = graft.ops.TimeSeries.acf(ev, "ts_us", 1L, maxLag = 4)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 2L, -166667L), (2L, 1L, -333334L)))
    // alternating 2,8,2,8,2,8: lag1 anti-correlates (5 pairs, each
    // −9e12 over den 54e12 → −833334), lag2 correlates (+666666) —
    // the seasonLen-2 detector reading
    val alt = (0 to 5).flatMap(p =>
      Seq.fill(if (p % 2 == 0) 2 else 8)(p.toLong))
      .map(Tuple1(_)).toDF("ts_us")
    val a = graft.ops.TimeSeries.acf(alt, "ts_us", 1L, maxLag = 2)
      .collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 5L, -833334L), (2L, 4L, 666666L)))
    // constant series: zero variance ⇒ NULL acf at every lag
    val const = (0 to 3).flatMap(p => Seq.fill(3)(p.toLong))
      .map(Tuple1(_)).toDF("ts_us")
    val c = graft.ops.TimeSeries.acf(const, "ts_us", 1L, maxLag = 2)
      .collect()
    assert(c.length == 2 && c.forall(_.isNullAt(2)))
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.acf(ev, "ts_us", 1L, maxLag = 0)
    }
  }

  test("TimeSeries.theilSen: hand-traced pair-slope medians, negative " +
      "floored slope, single-period NULLs, loud grid cap") {
    // counts 4, 8, 8: slopes {4e6, 2e6, 0} → lower median 2e6;
    // intercepts x·1e6 − slope·p = {4e6, 6e6, 4e6} → median 4e6
    val ev = (Seq.fill(4)(0L) ++ Seq.fill(8)(1L) ++ Seq.fill(8)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val r = graft.ops.TimeSeries.theilSen(ev, "ts_us", 1L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (3L, 3L, 2000000L, 4000000L))
    // counts 7, 4, 2: slopes {−3e6, ⌊−5e6/2⌋ = −2500000, −2e6} —
    // the negative inexact pair FLOORS (−2500000, not −2499999) and
    // is the median; intercepts {7e6, 6.5e6, 7e6} → 7e6
    val dn = (Seq.fill(7)(0L) ++ Seq.fill(4)(1L) ++ Seq.fill(2)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val d = graft.ops.TimeSeries.theilSen(dn, "ts_us", 1L).collect().head
    assert((d.getLong(2), d.getLong(3)) == (-2500000L, 7000000L))
    // a single-period spine has no pairs: NULL slope and intercept
    val one = Seq.fill(3)(0L).map(Tuple1(_)).toDF("ts_us")
    val o = graft.ops.TimeSeries.theilSen(one, "ts_us", 1L).collect().head
    assert(o.getLong(0) == 1L && o.getLong(1) == 0L &&
      o.isNullAt(2) && o.isNullAt(3))
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.theilSen(ev, "ts_us", 1L, maxSteps = 2)
    }
  }

  test("TimeSeries.mannKendall: hand-computed S with tie correction, " +
      "continuity-corrected z both signs, all-tied NULL z") {
    // counts 4, 8, 8: S = 2; ties {8:2} ⇒ var18 = 3·2·11 − 2·1·9 = 48;
    // z = 1/√(48/18) → ⌊0.6123724…e6⌋ = 612372
    val ev = (Seq.fill(4)(0L) ++ Seq.fill(8)(1L) ++ Seq.fill(8)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val r = graft.ops.TimeSeries.mannKendall(ev, "ts_us", 1L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (3L, 2L, 48L, 612372L))
    // strictly decreasing 7, 4, 2: S = −3, no ties ⇒ var18 = 66;
    // z = −2/√(66/18) → ⌊−1.0444659…e6⌋ = −1044466 (negative floor)
    val dn = (Seq.fill(7)(0L) ++ Seq.fill(4)(1L) ++ Seq.fill(2)(2L))
      .map(Tuple1(_)).toDF("ts_us")
    val d = graft.ops.TimeSeries.mannKendall(dn, "ts_us", 1L)
      .collect().head
    assert((d.getLong(1), d.getLong(2), d.getLong(3)) ==
      (-3L, 66L, -1044466L))
    // all-tied series: S = 0 AND Var(S) = 0 ⇒ no test (NULL z)
    val const = (0 to 2).flatMap(p => Seq.fill(5)(p.toLong))
      .map(Tuple1(_)).toDF("ts_us")
    val c = graft.ops.TimeSeries.mannKendall(const, "ts_us", 1L)
      .collect().head
    assert(c.getLong(1) == 0L && c.getLong(2) == 0L && c.isNullAt(3))
  }

  test("TimeSeries.kendallTau: hand-counted concordance, tie handling " +
      "in both margins, all-tied NULL, null metric adds zero") {
    // (x, y) per period: (2, 2e6), (3, 6e6), (1, .5e6) — all three
    // pairs concordant ⇒ τ = +1
    def ev(rows: Seq[(Long, Seq[Option[Double]])]) =
      rows.flatMap { case (p, vs) => vs.map(v => (p, v)) }
        .toDF("ts_us", "value")
    val up = ev(Seq((0L, Seq(Some(1.0), Some(1.0))),
      (1L, Seq(Some(2.0), Some(2.0), Some(2.0))),
      (2L, Seq(Some(0.5)))))
    val r = graft.ops.TimeSeries.kendallTau(up, "ts_us", "value", 1L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (3L, 3L, 3L, 0L, 1000000L))
    // flip the last day's revenue: C=1, D=2 ⇒ τ = −1/3 (negative FLOOR)
    val mix = ev(Seq((0L, Seq(Some(1.0), Some(1.0))),
      (1L, Seq(Some(2.0), Some(2.0), Some(2.0))),
      (2L, Seq(Some(10.0)))))
    val rm = graft.ops.TimeSeries.kendallTau(mix, "ts_us", "value", 1L)
      .collect().head
    assert((rm.getLong(2), rm.getLong(3), rm.getLong(4)) ==
      (1L, 2L, -333334L))
    // an x tie zeroes its pair and shrinks the denominator:
    // x = [2,2,1], y distinct ⇒ C=1, D=1, τ = 0
    val tie = ev(Seq((0L, Seq(Some(1.0), Some(1.0))),
      (1L, Seq(Some(2.0), Some(2.0))), (2L, Seq(Some(3.0)))))
    val rt = graft.ops.TimeSeries.kendallTau(tie, "ts_us", "value", 1L)
      .collect().head
    assert((rt.getLong(2), rt.getLong(3), rt.getLong(4)) ==
      (1L, 1L, 0L))
    // every day one event: the count margin is all-tied ⇒ no τ
    val flat = ev(Seq((0L, Seq(Some(1.0))), (1L, Seq(Some(2.0))),
      (2L, Seq(Some(3.0)))))
    assert(graft.ops.TimeSeries.kendallTau(flat, "ts_us", "value", 1L)
      .collect().head.isNullAt(4))
    // a NULL metric still counts activity but adds no revenue
    val withNull = ev(Seq((0L, Seq(Some(1.0), None)),
      (1L, Seq(Some(2.0), Some(2.0), Some(2.0))),
      (2L, Seq(Some(0.5)))))
    val rn = graft.ops.TimeSeries.kendallTau(withNull, "ts_us", "value",
      1L).collect().head
    assert(rn.getLong(4) == 1000000L) // x=[2,3,1], y=[1e6,6e6,.5e6]
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.kendallTau(up, "ts_us", "value", 1L,
        maxSteps = 2)
    }
  }

  test("Robust.robustZ: hand-computed MAD z; zero-MAD stratum -> NULL; " +
      "approx path tracks exact") {
    import graft.ops.Robust
    // stratum a: values 1..5 -> med 3, |x-3| = {2,1,0,1,2} -> MAD 1
    // stratum b: constant -> MAD 0 -> NULL scores (never ±inf)
    val df = ((1 to 5).map(v => ("a", v)) ++ Seq.fill(4)(("b", 7)))
      .toDF("s", "v")
    val out = Robust.robustZ(df, "v", Seq("s"))
      .select($"s", $"v", $"robust_z")
      .as[(String, Int, Option[Double])].collect()
    val a = out.filter(_._1 == "a").map(r => r._2 -> r._3.get).toMap
    assert(math.abs(a(5) - 2.0 / 1.4826) < 1e-12)
    assert(math.abs(a(3)) < 1e-12)
    assert(out.filter(_._1 == "b").forall(_._3.isEmpty))
    // approx path (mergeable sketches, the 100 TB form): same scores on
    // data far below the sketch's exact-mode capacity
    val approx = Robust.robustZ(df, "v", Seq("s"), exact = false)
      .select($"s", $"v", $"robust_z")
      .as[(String, Int, Option[Double])].collect().toSet
    assert(approx == out.toSet)
    // pre-existing _med/_mad user columns survive untouched
    val clobber = Robust.robustZ(df.withColumn("_med", lit(-1)), "v", Seq("s"))
    assert(clobber.columns.count(_ == "_med") == 1)
    assert(clobber.select($"_med").distinct().as[Int].collect().toSeq == Seq(-1))
  }

  test("config parser: full 6-field entity + defaults") {
    val json = """{
      "app_downloads": {
        "raw_file_format": "parquet",
        "clustering_cols": ["id", "op"],
        "skipping_indexes": ["id", "op", "business_id"],
        "unique_primary_key": ["id"],
        "renamed_columns": [],
        "expect_all_or_drop": {
          "has_timestamp": "created_at IS NOT NULL",
          "has_id": "id IS NOT NULL"
        }
      },
      "minimal": {}
    }"""
    val cfg = ConfigLoader.parse(json)
    assert(cfg("app_downloads") == EntityConfig(
      rawFileFormat = "parquet",
      clusteringCols = Seq("id", "op"),
      skippingIndexes = Seq("id", "op", "business_id"),
      uniquePrimaryKey = Seq("id"),
      renamedColumns = Map.empty,
      expectAllOrDrop = Map(
        "has_timestamp" -> "created_at IS NOT NULL",
        "has_id" -> "id IS NOT NULL")))
    // reference defaults: format parquet, pk ["id"] (02_silver_processing.py:98)
    assert(cfg("minimal") == EntityConfig())
  }

  test("config parser: malformed input fails loudly") {
    intercept[Exception](ConfigLoader.parse("not json at all"))
    intercept[IllegalArgumentException](ConfigLoader.parse("[1, 2, 3]"))
    // entity with wrong-typed fields degrades to defaults, not a crash
    val cfg = ConfigLoader.parse(
      """{"e": {"raw_file_format": 42, "unique_primary_key": "id"}}""")
    assert(cfg("e").rawFileFormat == "parquet")
    assert(cfg("e").uniquePrimaryKey == Seq("id"))
  }

  test("config parser: silver_mode defaults to full, accepts incremental, " +
      "rejects anything else loudly") {
    assert(ConfigLoader.parse("""{"e": {}}""")("e").silverMode == "full")
    assert(ConfigLoader.parse(
      """{"e": {"silver_mode": "incremental"}}""")("e")
      .silverMode == "incremental")
    val ex = intercept[IllegalArgumentException](ConfigLoader.parse(
      """{"e": {"silver_mode": "delta"}}"""))
    assert(ex.getMessage.contains("silver_mode"))
  }

  test("config parser: silver_merge defaults to copy_on_write, accepts " +
      "merge_on_read, rejects others; silver_compact_after bounds-checked") {
    val d = ConfigLoader.parse("""{"e": {}}""")("e")
    assert(d.silverMerge == "copy_on_write" && d.silverCompactAfter == 8)
    assert(ConfigLoader.parse(
      """{"e": {"silver_merge": "merge_on_read",
        |       "silver_compact_after": 3}}""".stripMargin)("e")
      .silverMerge == "merge_on_read")
    val e1 = intercept[IllegalArgumentException](ConfigLoader.parse(
      """{"e": {"silver_merge": "mor"}}"""))
    assert(e1.getMessage.contains("silver_merge"))
    val e2 = intercept[IllegalArgumentException](ConfigLoader.parse(
      """{"e": {"silver_compact_after": 0}}"""))
    assert(e2.getMessage.contains("silver_compact_after"))
  }

  test("config parser: renamed_columns accepts object and list forms") {
    assert(ConfigLoader.parse(
      """{"e": {"renamed_columns": {"old": "new"}}}""")("e")
      .renamedColumns == Map("old" -> "new"))
    assert(ConfigLoader.parse(
      """{"e": {"renamed_columns": ["a:b", "c:d"]}}""")("e")
      .renamedColumns == Map("a" -> "b", "c" -> "d"))
  }

  test("target profiles: dev/prod overlay selects, defaults, and yields to explicit conf") {
    import graft.config.TargetProfiles
    val json =
      """{ "dev":  { "default": true,
        |            "variables": { "source_location": "/data/dev/raw",
        |                           "catalog_name": "dev_catalog" } },
        |  "prod": { "variables": { "source_location": "/data/prod/raw",
        |                           "catalog_name": "prod_catalog",
        |                           "soft_deletes": "Y" } } }""".stripMargin
    val profiles = TargetProfiles.parse(json)

    // scalar variable values stringify; nested values fail loud
    val scalars = TargetProfiles.parse(
      """{"t": {"variables": {"soft_deletes": true, "max_files_per_trigger": 100}}}""")
    assert(scalars("t").variables ==
      Map("soft_deletes" -> "true", "max_files_per_trigger" -> "100"))
    intercept[IllegalArgumentException](TargetProfiles.parse(
      """{"t": {"variables": {"nested": {"a": 1}}}}"""))

    // selection: named, defaulted, unknown
    assert(TargetProfiles.select(profiles, Some("prod")).name == "prod")
    assert(TargetProfiles.select(profiles, None).name == "dev")
    intercept[IllegalArgumentException](
      TargetProfiles.select(profiles, Some("staging")))
    // no default marked → must name one
    intercept[IllegalArgumentException](TargetProfiles.select(
      TargetProfiles.parse("""{"a": {"variables": {}}}"""), None))
    // stringified default flag (YAML-to-JSON conversions) still selects
    assert(TargetProfiles.select(TargetProfiles.parse(
      """{"p": {"default": "true", "variables": {}}}"""), None).name == "p")

    // overlay → PipelineParams, per target
    def paramsFor(name: Option[String],
        pre: Map[String, String] = Map.empty): graft.config.PipelineParams = {
      val keys = Seq("source_location", "catalog_name", "soft_deletes")
      val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
      try {
        keys.foreach(spark.conf.unset)
        pre.foreach { case (k, v) => spark.conf.set(k, v) }
        TargetProfiles.applyTo(spark, TargetProfiles.select(profiles, name))
        graft.config.PipelineParams.fromConf(spark)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    val dev = paramsFor(None)
    assert(dev.sourceLocation == "/data/dev/raw")
    assert(dev.catalogName == "dev_catalog" && !dev.softDeletesEnabled)
    val prod = paramsFor(Some("prod"))
    assert(prod.sourceLocation == "/data/prod/raw")
    assert(prod.catalogName == "prod_catalog" && prod.softDeletesEnabled)
    // explicit conf (the CLI spelling) beats the profile variable
    val overridden = paramsFor(Some("prod"),
      pre = Map("catalog_name" -> "hotfix_catalog"))
    assert(overridden.catalogName == "hotfix_catalog")
    assert(overridden.sourceLocation == "/data/prod/raw")
  }
}
