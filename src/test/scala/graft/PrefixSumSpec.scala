package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PrefixSum

/** runningSums: equality with the naive single-window running sum
  * (including negative values and NULLs), invariance to input
  * partitioning / numPartitions, and the input-validation contract. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // coalesce: the contract is "NULLs contribute 0", not SQL sum's
    // null-until-first-value leading behavior
    df.withColumn("ra", sum(coalesce(col("a"), lit(0L))).over(w))
      .withColumn("rb", sum(coalesce(col("b"), lit(0L))).over(w))
      .select($"k", $"ra", $"rb").as[(Long, Long, Long)].collect()
      .map { case (k, ra, rb) => k -> (ra, rb) }.toMap
  }

  test("runningSums == the naive global running-sum window, with " +
      "negative values and NULLs, across partitionings") {
    // negative values catch a max-of-local-cumulative partition total;
    // NULLs must contribute 0; keys deliberately unsorted on input
    val rows = (0L until 500L).map { i =>
      val k = (i * 131) % 997 // a permutation — unsorted, unique keys
      val a = if (k % 7 == 0) null else java.lang.Long.valueOf(k % 13 - 6)
      val b = java.lang.Long.valueOf(1L)
      (k, a, b)
    }
    val df = rows.toDF("k", "a", "b")
    val expect = naive(df)
    val got = PrefixSum.runningSums(df, Seq(col("k").asc),
        Seq("a" -> "ra", "b" -> "rb"))
      .select($"k", $"ra", $"rb").as[(Long, Long, Long)].collect()
      .map { case (k, ra, rb) => k -> (ra, rb) }.toMap
    assert(got == expect)
    val got2 = PrefixSum.runningSums(df.repartition(17), Seq(col("k").asc),
        Seq("a" -> "ra", "b" -> "rb"), numPartitions = Some(5))
      .select($"k", $"ra", $"rb").as[(Long, Long, Long)].collect()
      .map { case (k, ra, rb) => k -> (ra, rb) }.toMap
    assert(got2 == expect)
  }

  test("runningSums passes input columns through and rejects bad args") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("k", "a")
    val out = PrefixSum.runningSums(df, Seq(col("k")), Seq("a" -> "ra"))
    assert(out.columns.toSeq == Seq("k", "a", "ra"))
    intercept[IllegalArgumentException] {
      PrefixSum.runningSums(df, Seq(col("k")), Seq("a" -> "k"))
    }
    intercept[IllegalArgumentException] {
      PrefixSum.runningSums(df, Seq(col("k")), Nil)
    }
    intercept[IllegalArgumentException] { // non-long value column
      PrefixSum.runningSums(df.withColumn("d", lit(1.5)),
        Seq(col("k")), Seq("d" -> "rd"))
    }
  }

  test("ksTest's plan carries no partition-less data-sized window") {
    // the KS CDF must ride the two-pass scheme: the only Window in the
    // plan is the offsets prefix over the ≤#partitions totals table,
    // whose input is an Aggregate on the synthetic partition-id column
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ks = graft.analytics.Profiler.ksTest(
      ev.filter($"event_id" % 2 === 0), ev.filter($"event_id" % 2 === 1),
      "value")
    val plan = ks.queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.isEmpty) // global by construction…
      // …but over the per-partition totals aggregate only: the window's
      // child tree must contain an Aggregate grouping by the pid column
      val aggs = w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggs.exists(_.groupingExpressions.exists(
        _.references.exists(_.name.startsWith("_ps_pid")))),
        s"global window not over the pid-totals aggregate:\n$w")
    }
  }
}
