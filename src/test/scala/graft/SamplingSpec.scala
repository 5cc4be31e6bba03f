package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

/** Specs for the token-budget and epoch-mixing sampling operators (the
  * stratified/weighted forms are covered in LlmOpsSpec; the declared
  * queries `q_token_budget` / `q_upsample` are DuckDB-oracle-checked). */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tokenBudget: kept weight never exceeds the budget, and is maximal " +
      "in the deterministic order") {
    val df = (1L to 20L).map(i => (i, "a", 5L))
      .toDF("id", "src", "w") // stratum a: 20 rows x 5 tokens = 100
    val kept = Sampling.tokenBudget(df, "src", "id", "w", Map("a" -> 37L))
      .as[(Long, String, Long)].collect()
    // 5-token rows against budget 37: exactly 7 rows (35 <= 37, 40 > 37)
    assert(kept.length == 7)
    assert(kept.map(_._3).sum <= 37L)
    // deterministic: same call, same rows
    val again = Sampling.tokenBudget(df, "src", "id", "w", Map("a" -> 37L))
      .as[(Long, String, Long)].collect()
    assert(kept.map(_._1).sorted.toSeq == again.map(_._1).sorted.toSeq)
  }

  test("tokenBudget: per-stratum budgets, unlimited default, zero budget, " +
      "oversized first row") {
    val df = Seq(
      (1L, "a", 5L), (2L, "a", 5L), (3L, "a", 5L),
      (4L, "b", 100L), (5L, "b", 1L),
      (6L, "c", 999L)
    ).toDF("id", "src", "w")
    val kept = Sampling.tokenBudget(df, "src", "id", "w",
        Map("a" -> 10L, "b" -> 0L))
      .as[(Long, String, Long)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySrc.getOrElse("a", 0L) == 10L) // exactly 2 of the 3 fives
    assert(!bySrc.contains("b")) // zero budget keeps nothing
    assert(bySrc("c") == 999L) // default budget unlimited
    // a row larger than the whole remaining budget is dropped, later
    // smaller rows in the order may still fit — NOT tested here (order is
    // md5-random); the <= contract alone is asserted
    val tight = Sampling.tokenBudget(
      Seq((1L, "x", 100L)).toDF("id", "src", "w"),
      "src", "id", "w", Map("x" -> 50L))
    assert(tight.count() == 0)
  }

  test("tokenBudget: null stratum gets its own budget via the default") {
    val df = Seq((1L, null: String, 3L), (2L, null: String, 3L),
      (3L, "a", 3L)).toDF("id", "src", "w")
    val kept = Sampling.tokenBudget(df, "src", "id", "w",
        Map("a" -> 100L), defaultBudget = 3L)
      .as[(Long, String, Long)].collect()
    assert(kept.count(_._2 == null) == 1) // 3 of 6 null-stratum tokens fit
    assert(kept.count(_._2 == "a") == 1)
  }

  test("upsample: integer weight = exact copies, fractional extra quota, " +
      "zero weight drops the stratum") {
    val df = ((1L to 4L).map(i => (i, "a")) ++ (5L to 8L).map(i => (i, "b"))
      ++ (9L to 10L).map(i => (i, "c"))).toDF("id", "src")
    val out = Sampling.upsample(df, "src", "id",
        Map("a" -> 2.5, "b" -> 0.0), defaultWeight = 1.0)
      .as[(Long, String, Long)].collect()
    val a = out.filter(_._2 == "a")
    // x2.5 on 4 rows: everyone epochs {0,1}, floor(.5*4)=2 rows get epoch 2
    assert(a.length == 10)
    assert((1L to 4L).forall(i =>
      a.filter(_._1 == i).map(_._3).toSet.contains(0L) &&
        a.filter(_._1 == i).map(_._3).toSet.contains(1L)))
    assert(a.count(_._3 == 2L) == 2)
    assert(a.forall(r => r._3 >= 0L && r._3 <= 2L))
    assert(!out.exists(_._2 == "b")) // x0.0 drops everything
    val c = out.filter(_._2 == "c")
    assert(c.length == 2 && c.forall(_._3 == 0L)) // x1.0 = one epoch each
  }

  test("identity contracts: unlimited budget / weight 1.0 pass everything " +
      "through exactly once") {
    val df = (1L to 9L).map(i => (i, if (i % 2 == 0) "a" else "b", i))
      .toDF("id", "src", "w")
    val budgeted = Sampling.tokenBudget(df, "src", "id", "w", Map.empty)
    assert(budgeted.count() == 9)
    assert(budgeted.columns.toSet == Set("id", "src", "w")) // no temp cols
    val up = Sampling.upsample(df.drop("w"), "src", "id", Map.empty)
      .as[(Long, String, Long)].collect()
    assert(up.length == 9 && up.forall(_._3 == 0L))
  }

  test("temperatureResample: per-stratum kept counts equal the hand-computed " +
      "integer targets; rows are a deterministic subset") {
    // strata sizes 100 / 25 / 4: w = floor(sqrt(n)*1e6) = 10_000_000 /
    // 5_000_000 / 2_000_000, Σw = 17_000_000; budget 50 ⇒ targets
    // (50·w) div Σw = 29 / 14 / 5 capped at n ⇒ 29 / 14 / 4
    val df = ((1L to 100L).map((_, "big")) ++ (101L to 125L).map((_, "mid"))
      ++ (126L to 129L).map((_, "tiny"))).toDF("id", "src")
    val kept = Sampling.temperatureResample(df, "src", "id", budget = 50L)
    val counts = kept.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(counts === Map("big" -> 29L, "mid" -> 14L, "tiny" -> 4L))
    assert(kept.columns.toSet === Set("id", "src")) // no temp cols
    // natural share of `big` is 100/129 ≈ 78%; √-damping lowers it
    assert(counts("big").toDouble / 47.0 < 0.70)
    // membership is a pure function of the keys: repartitioned input
    // produces the same rows
    val again = Sampling.temperatureResample(
      df.repartition(7), "src", "id", budget = 50L)
    assert(kept.select("id").as[Long].collect().sorted
      === again.select("id").as[Long].collect().sorted)
  }

  test("temperatureResample: alpha=1 reproduces proportional targets; a " +
      "budget above the corpus keeps everything") {
    val df = ((1L to 80L).map((_, "a")) ++ (81L to 100L).map((_, "b")))
      .toDF("id", "src")
    // alpha=1: w = n·1e6, targets = (40·w) div Σw = 32 / 8
    val prop = Sampling.temperatureResample(df, "src", "id",
        budget = 40L, alpha = 1.0)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(prop === Map("a" -> 32L, "b" -> 8L))
    val all = Sampling.temperatureResample(df, "src", "id", budget = 1000L)
    assert(all.count() === 100L) // every target hits the stratum-size cap
  }

  test("upsample: weights < 1 downsample deterministically with quota " +
      "floor(w*n)") {
    val df = (1L to 10L).map(i => (i, "a")).toDF("id", "src")
    val out = Sampling.upsample(df, "src", "id", Map("a" -> 0.4))
      .as[(Long, String, Long)].collect()
    assert(out.length == 4) // floor(0.4 * 10)
    assert(out.forall(_._3 == 0L))
    val again = Sampling.upsample(df, "src", "id", Map("a" -> 0.4))
      .as[(Long, String, Long)].collect()
    assert(out.map(_._1).sorted.toSeq == again.map(_._1).sorted.toSeq)
  }

  test("topFractionPerGroup: keeps the best frac per group by score with " +
      "deterministic ties; frac=0 keeps exactly the top row") {
    // group a: scores 5,4,3,2,1 over ids 1..5; group b: all-tied scores
    val df = ((1L to 5L).map(i => (i, "a", (6 - i).toDouble)) ++
      (11L to 14L).map(i => (i, "b", 1.0))).toDF("id", "g", "score")
    val top = Sampling.topFractionPerGroup(df, "g", $"score", "id", 0.5)
      .select("id").as[Long].collect().toSet
    // a: percent_rank over 5 rows = 0, .25, .5, .75, 1 -> keep ids 1,2,3
    // b: tie-broken by id -> ranks unique -> keep 11,12 (pr 0, 1/3)
    assert(top == Set(1L, 2L, 3L, 11L, 12L))
    val top0 = Sampling.topFractionPerGroup(df, "g", $"score", "id", 0.0)
      .select("id").as[Long].collect().toSet
    assert(top0 == Set(1L, 11L), "frac=0 keeps the single best row (pr=0)")
  }

  test("interleaveBySource: hand-computed 4:2 interleave; every prefix " +
      "holds sources in proportion (±1 per source)") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (11L, "b"), (12L, "b")).toDF("id", "src")
    val out = Sampling.interleaveBySource(df, "src", Seq($"id".asc))
      .select($"pos", $"id").as[(Long, Long)].collect().sortBy(_._1)
    // fracs a: .125 .375 .625 .875; b: .25 .75
    assert(out.map(_._2).toSeq == Seq(1L, 11L, 2L, 3L, 12L, 4L))
    // proportionality on real data: every prefix of the order carries
    // each source within ±1 of its proportional share
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val ordered = Sampling
      .interleaveBySource(docs, "source", Seq($"doc_id".asc))
      .select($"pos", $"source").as[(Long, String)].collect()
      .sortBy(_._1).map(_._2)
    val total = ordered.length
    val share = ordered.groupBy(identity).view
      .mapValues(_.length.toDouble / total).toMap
    Seq(total / 10, total / 3, total / 2, total).foreach { pfx =>
      val counts = ordered.take(pfx).groupBy(identity).view
        .mapValues(_.length).toMap
      share.foreach { case (src, p) =>
        val expect = p * pfx
        assert(math.abs(counts.getOrElse(src, 0) - expect) <= 1.0 + 1e-9,
          s"prefix $pfx: $src has ${counts.getOrElse(src, 0)}, " +
            s"expected ~$expect") }
    }
  }

  test("globalShuffle: a permutation (no rows gained/lost), stable under " +
      "re-run, different under a different seed") {
    val df = (1L to 200L).toDF("id")
    val s1 = Sampling.globalShuffle(df, "id", "seedA")
      .select("id").as[Long].collect().toSeq
    assert(s1.sorted == (1L to 200L))
    assert(s1 != (1L to 200L), "seeded order should not be identity")
    val again = Sampling.globalShuffle(df, "id", "seedA")
      .select("id").as[Long].collect().toSeq
    assert(s1 == again)
    val s2 = Sampling.globalShuffle(df, "id", "seedB")
      .select("id").as[Long].collect().toSeq
    assert(s1 != s2)
  }

  test("writeShards: shard=k directories partition-prune and hold " +
      "exactly shardAssign's rows") {
    val df = (1L to 300L).toDF("id")
    val path = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    Sampling.writeShards(df, "id", 4, path)
    val expected = Sampling.shardAssign(df, "id", 4)
      .filter(col("shard") === 2).select("id").as[Long].collect().toSet
    val back = spark.read.parquet(path).filter(col("shard") === 2)
    assert(back.select("id").as[Long].collect().toSet == expected)
    // the shard filter must prune at file-listing time
    val plan = back.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan"))
    assert(scanLine.nonEmpty &&
      scanLine.get.contains("PartitionFilters: [") &&
      scanLine.get.contains("shard"),
      s"shard read must partition-prune:\n${scanLine.getOrElse(plan)}")
    // every row landed in exactly one shard directory
    assert(spark.read.parquet(path).count() == 300L)
  }

  test("shardAssign: shards in range, stable as rows are added, roughly " +
      "balanced") {
    val df = (1L to 1000L).toDF("id")
    val shards = Sampling.shardAssign(df, "id", 8)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    assert(shards.values.forall(s => s >= 0 && s < 8))
    // incremental build: the first half's assignments are unchanged
    val firstHalf = Sampling.shardAssign((1L to 500L).toDF("id"), "id", 8)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    assert(firstHalf.forall { case (id, s) => shards(id) == s })
    val counts = shards.values.groupBy(identity).map(_._2.size)
    assert(counts.size == 8 && counts.min > 1000 / 8 / 2,
      s"shard balance off: $counts")
  }

  test("weightedSample: two-stage shard prune equals the single-window " +
      "A-ES selection; exact per-stratum counts; deterministic") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = (1L to 500L).map(i => (i, if (i % 3 == 0) "a" else "b",
      (i % 17 + 1).toDouble)).toDF("id", "g", "w")
    val got = Sampling.weightedSample(df, "g", "id", "w", k = 25)
      .select("id").as[Long].collect().sorted.toSeq
    // reference: plain per-stratum window over the SAME key definition
    val h = md5(concat_ws(":", lit("wsample"), col("id").cast("string")))
    val key = log((conv(substring(h, 1, 12), 16, 10).cast("long")
      .cast("double") + lit(0.5)) / lit(281474976710656.0)) /
      col("w").cast("double")
    val ref = df.withColumn("_k", key)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("_k").desc, col("id"))))
      .filter(col("_rn") <= 25).select("id").as[Long].collect().sorted.toSeq
    assert(got == ref)
    val byG = Sampling.weightedSample(df, "g", "id", "w", k = 25)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("a") == 25L && byG("b") == 25L)
    val again = Sampling.weightedSample(df, "g", "id", "w", k = 25)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == again)
  }

  test("weightedSample: inclusion rate grows with weight; zero/null/" +
      "negative weights never selected; small strata keep all rows") {
    import org.apache.spark.sql.functions._
    // two weight classes, 10:1 — heavy rows must be selected far more
    // often (A-ES inclusion probability is weight-proportional)
    val df = (1L to 400L)
      .map(i => (i, "s", if (i <= 200) 10.0 else 1.0))
      .toDF("id", "g", "w")
    val picked = Sampling.weightedSample(df, "g", "id", "w", k = 80)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ <= 200)
    assert(heavy > 55, s"heavy-weight rows under-selected: $heavy/80")
    val mixed = Seq((1L, "s", Some(0.0)), (2L, "s", Some(-3.0)),
      (3L, "s", None: Option[Double]), (4L, "s", Some(2.0)))
      .toDF("id", "g", "w")
    val kept = Sampling.weightedSample(mixed, "g", "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(4L))
  }
}
