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

  test("bhCorrect's plan: both global windows ride the pid-totals " +
      "aggregates, never the data-sized test frame") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val tests = ev.groupBy($"event_type".as("tid"))
      .agg((sum($"value") / 500.0).as("p"))
    val bh = graft.analytics.Experiment.bhCorrect(tests, "tid", "p")
    val plan = bh.queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // the envelope pass's localCheckpoint truncates the rank pass out
    // of the visible lineage, so only the outermost offsets window
    // appears here — the rank pass's own shape is pinned by the ksTest
    // plan test over the identical runningSums machinery
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.isEmpty)
      val aggs = w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggs.exists(_.groupingExpressions.exists(
        _.references.exists(_.name.startsWith("_ps_pid")))),
        s"global window not over the pid-totals aggregate:\n$w")
    }
  }

  test("rank-based round-9 operators (spearman, kruskalWallis, " +
      "mannWhitneyU, rfm): every partition-less window rides a " +
      "pid-totals aggregate, never the data-sized frame") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plans = Seq(
      "spearman" -> graft.analytics.Profiler
        .spearman(li, "l_quantity", "l_extendedprice"),
      "kruskal" -> graft.analytics.Experiment
        .kruskalWallis(ev, "event_type", "value"),
      "mannwhitney" -> graft.analytics.Experiment
        .mannWhitneyU(ev.withColumn("_b", $"event_id" % 2 === 0),
          col("_b"), "value"))
    plans.foreach { case (name, df) =>
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      windows.foreach { w =>
        assert(w.partitionSpec.isEmpty)
        val aggs = w.child.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }
        assert(aggs.exists(_.groupingExpressions.exists(
          _.references.exists(_.name.startsWith("_ps_pid")))),
          s"$name: global window not over the pid-totals aggregate:\n$w")
      }
    }
    // rfm's three globalRank passes range-partition; any window it
    // plans must likewise sit above Rank's offsets machinery (grk pid)
    val rfm = graft.analytics.EventFunnel.rfm(
      graft.analytics.Tables.withEpochMicros(ev),
      "user_id", "ts_us", "value")
    val rfmWindows = rfm.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    rfmWindows.foreach { w =>
      val aggs = w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggs.exists(_.groupingExpressions.exists(
        _.references.exists(_.name.contains("_grk_")))),
        s"rfm: global window not over Rank's offsets machinery:\n$w")
    }
  }

  test("runningMins == the naive global running-min window, NULLs " +
      "skipped (leading NULLs stay NULL), across partitionings") {
    // min-specific traps: a NULL must NOT reset or poison the envelope,
    // and a prefix with no value yet must be NULL (not MaxValue)
    val rows = (0L until 500L).map { i =>
      val k = (i * 131) % 997
      val a = if (k % 7 == 0) null
        else java.lang.Long.valueOf((k * 379) % 101 - 50)
      (k, a)
    }
    val df = rows.toDF("k", "a")
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("ra", min(col("a")).over(w))
      .select($"k", $"ra").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    def run(in: org.apache.spark.sql.DataFrame, np: Option[Int]) =
      PrefixSum.runningMins(in, Seq(col("k").asc), Seq("a" -> "ra"), np)
        .select($"k", $"ra").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some(r.getLong(1)))).toMap
    assert(run(df, None) == expect)
    assert(run(df.repartition(17), Some(5)) == expect)
    // the permutation makes k=0 first (a NULL row): leading-NULL case
    assert(expect(0L).isEmpty)
    intercept[IllegalArgumentException] {
      PrefixSum.runningMins(df, Seq(col("k")), Seq("a" -> "k"))
    }
  }
}
