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
      "exchange is the partition-count offsets aggregate") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Rank.globalRank(df, Seq(col("doc_id")), "rk")
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      s"rank lost its range exchange:\n$p")
    val singles = "Exchange SinglePartition".r.findAllIn(p).length
    assert(singles <= 1, s"data-sized single-partition stage:\n$p")
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
