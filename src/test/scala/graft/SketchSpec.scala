package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound specs for the approximate (sketch) aggregates — the
  * queries are `no_oracle` by design (sketch internals are
  * engine-specific), so their accuracy contracts are asserted here
  * against exact computations on sf0.001. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct: within a few rsd of the exact count per group") {
    val li = analytics.Tables(spark, dir, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact) =>
      val rel = math.abs(approx - exact).toDouble / exact
      // rsd 0.02 is one standard deviation; 4x is a conservative bound
      assert(rel <= 0.08, s"flag $flag: approx $approx vs exact $exact")
    }
  }

  test("approx_percentile: returned value sits within the rank-error band") {
    val li = analytics.Tables(spark, dir, "lineitem")
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, array(0.5, 0.9), 1000)")
        .as("q"))
      .select(col("l_returnflag"), element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p90"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    val flags = approx.keySet
    for (flag <- flags; (target, v) <- Seq(
        (0.5, approx(flag)._2), (0.9, approx(flag)._3))) {
      val grp = li.filter(col("l_returnflag") === flag)
        .select(col("l_quantity").cast("double")).as[Double].collect()
      val below = grp.count(_ < v).toDouble / grp.length
      val atOrBelow = grp.count(_ <= v).toDouble / grp.length
      // accuracy 1000 bounds rank error by ~1/1000; allow 1% slack
      assert(below <= target + 0.01 && atOrBelow >= target - 0.01,
        s"flag $flag p$target: value $v ranks [$below, $atOrBelow]")
    }
  }
}
