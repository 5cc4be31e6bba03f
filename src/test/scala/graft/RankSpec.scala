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
