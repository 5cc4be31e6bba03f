package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Rank

/** globalRank: equality with the single-window row_number, plan shape
  * (range exchange; no data-sized single-partition window), and
  * stability across partition counts. */
class RankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("globalRank == row_number over the naive global window; invariant " +
      "to input partitioning and numPartitions") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Rank.globalRank(df, Seq(col("n_chars"), col("doc_id")), "rk")
      .select($"doc_id", $"rk").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("rk",
        row_number().over(Window.orderBy(col("n_chars"), col("doc_id")))
          .cast("long"))
      .select($"doc_id", $"rk").as[(Long, Long)].collect().toMap
    assert(got == naive)
    val rep = Rank.globalRank(df.repartition(13),
        Seq(col("n_chars"), col("doc_id")), "rk", numPartitions = Some(5))
      .select($"doc_id", $"rk").as[(Long, Long)].collect().toMap
    assert(rep == naive)
  }

  test("plan: one range exchange ranks the data; the only SinglePartition " +
      "exchange is the partition-count offsets aggregate; materialized " +
      "form checkpoints the ranked frame exactly once") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    // materialize=false exposes the full plan for shape assertions
    val p = Rank.globalRank(df, Seq(col("doc_id")), "rk",
        materialize = false)
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      s"rank lost its range exchange:\n$p")
    val singles = "Exchange SinglePartition".r.findAllIn(p).length
    assert(singles <= 1, s"data-sized single-partition stage:\n$p")
    // the ONLY hash exchange is the stats aggregate's (partial-combined
    // to ~1 row per partition before shuffling). A second data-sized
    // hashpartitioning(_grk_pid) would mean a pid-window crept back in
    // and EnsureRequirements re-shuffled the whole corpus.
    val hashes = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashes <= 1, s"extra data-sized hash exchange:\n$p")
    // default form: both consumers read the ONE checkpointed rank (two
    // ExistingRDD scans of the same RDD, no second parquet scan)
    val pm = Rank.globalRank(df, Seq(col("doc_id")), "rk")
      .queryExecution.executedPlan.toString
    assert(!pm.contains("Scan parquet"),
      s"materialized rank recomputed its source:\n$pm")
  }

  test("groupedRank == row_number over the per-group window, counts == " +
      "group sizes; invariant to input partitioning; NULL group ranked " +
      "as its own group") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Rank.groupedRank(df, Seq("lang"),
        Seq(col("n_chars"), col("doc_id")), "rk", countCol = Some("n"))
      .select($"doc_id", $"rk", $"n").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    val naive = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .select($"doc_id", $"rk", $"n").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == naive)
    val rep = Rank.groupedRank(df.repartition(13), Seq("lang"),
        Seq(col("n_chars"), col("doc_id")), "rk",
        numPartitions = Some(5))
      .select($"doc_id", $"rk").as[(Long, Long)].collect().toMap
    assert(rep == naive.view.mapValues(_._1).toMap)
    // NULL group key: its rows rank among themselves, none dropped
    val withNull = Seq((1L, "a", 10), (2L, null, 5), (3L, null, 7),
      (4L, "a", 3)).toDF("id", "g", "v")
    val nr = Rank.groupedRank(withNull, Seq("g"), Seq(col("v"), col("id")),
        "rk", countCol = Some("n"))
      .select($"id", $"rk", $"n").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(nr == Map(1L -> (2L, 2L), 4L -> (1L, 2L),
      2L -> (1L, 2L), 3L -> (2L, 2L)))
  }

  test("topFractionPerGroup (groupedRank form) == the SQL percent_rank " +
      "window form on real data") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = graft.ops.Sampling
      .topFractionPerGroup(df, "lang", col("n_chars"), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val naive = df.withColumn("_pr", percent_rank().over(w))
      .filter(col("_pr") <= 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("q_rank_family's aggregate-shaped rank/dense_rank/ntile/pct_rank/cume_dist equals " +
      "the plain window form (incl. n < k and n % k != 0 groups)") {
    // the declared query already oracle-matches DuckDB at both scales;
    // this pins the window equivalence on ntile edge shapes: group a has
    // 6 = 4+2 rows (first two quartiles get 2), group b has 3 < 4 rows
    // (each row its own tile)
    val df = (Seq((1L, "a", 3500.0), (2L, "a", 3200.0), (3L, "a", 2100.0),
      (4L, "a", 1900.0), (5L, "a", 800.0), (6L, "a", 750.0),
      (7L, "b", 5000.0), (8L, "b", 100.0), (9L, "b", 50.0)))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val dir = "/root/testdata/sf0.001"
    val spark2 = spark
    df.createOrReplaceTempView("rank_family_probe")
    val naive = spark2.sql(
      """SELECT c_mktsegment, c_custkey,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |  RANK() OVER (PARTITION BY c_mktsegment
        |    ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT) DESC) AS rnk,
        |  DENSE_RANK() OVER (PARTITION BY c_mktsegment
        |    ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT) DESC) AS drnk,
        |  NTILE(4) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile,
        |  round(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey ASC), 6) AS pct_rank,
        |  round(CUME_DIST() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey ASC), 6) AS cume
        |FROM rank_family_probe""".stripMargin)
      .as[(String, Long, Long, Int, Int, Int, Double, Double)]
      .collect().sorted.toSeq
    // run the declared query's exact shape against the probe by routing
    // through a temp parquet dir shaped like the testdata layout
    val tmp = java.nio.file.Files.createTempDirectory("rankfam").toString
    df.write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = SparkEntry.queries("q_rank_family")(spark2, tmp)
      .as[(String, Long, Long, Int, Int, Int, Double, Double)]
      .collect().sorted.toSeq
    assert(got == naive.filter(_._4 <= 20))
  }

  test("exactPercentiles == Spark's built-in percentile; NULLs excluded; " +
      "1-row and all-NULL groups") {
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val got = graft.ops.Percentiles
      .exactPercentiles(li, Seq("l_returnflag"), "l_quantity",
        Seq(0.25, 0.5, 0.75))
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ref = li.groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("v"))
      .as[(String, Seq[Double])].collect()
      .flatMap { case (g, vs) =>
        Seq((g, 0.25) -> vs(0), (g, 0.5) -> vs(1), (g, 0.75) -> vs(2)) }
      .toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) < 1e-9, s"$k: $v vs ${ref(k)}") }
    // NULLs excluded; an all-NULL group vanishes; 1-row group = the
    // value; a NULL GROUP KEY is its own group (SQL GROUP BY semantics —
    // a plain equi-join would silently drop it)
    val tiny = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", None),
      ("b", Some(7.0)), ("c", None), (null, Some(5.0)), (null, Some(15.0)))
      .toDF("g", "v")
    val out = graft.ops.Percentiles
      .exactPercentiles(tiny, Seq("g"), "v", Seq(0.5))
      .as[(Option[String], Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out == Map(Some("a") -> 15.0, Some("b") -> 7.0,
      None -> 10.0))
  }

  test("rank column name collision avoided via fresh temp names; " +
      "1-row and empty frames") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "_grk_pid")
    val out = Rank.globalRank(df, Seq(col("id")), "rk")
    assert(out.columns.toSet == Set("id", "_grk_pid", "rk"))
    assert(out.select("rk").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val one = Rank.globalRank(Seq((42L, "z")).toDF("id", "v"),
      Seq(col("id")), "rk")
    assert(one.select("rk").as[Long].head() == 1L)
    val empty = Rank.globalRank(
      spark.emptyDataset[(Long, String)].toDF("id", "v"),
      Seq(col("id")), "rk")
    assert(empty.count() == 0)
  }
}
