package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketed tables — the pre-shuffle strategy for
  * repeated big-fact joins at 100 TB: paying the shuffle ONCE at write
  * time (bucketBy on the join key) makes every subsequent join on that
  * key exchange-free. This spec proves the plan property locally:
  * joining two tables bucketed on the same key produces a SortMergeJoin
  * with NO Exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("join of co-bucketed tables has no shuffle exchange") {
    // disable auto-broadcast so the tiny test tables exercise the
    // sort-merge path a 100 TB fact-fact join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    val dir = "/root/testdata/sf0.001"
    val li = analytics.Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = analytics.Tables(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a non-broadcast join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-bucketed join must not shuffle:\n$plan")

    // correctness: same result as the plain (shuffling) join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)

    // and an aggregation on the bucket key also skips the exchange
    val agg = spark.table("b_lineitem").groupBy("l_orderkey")
      .agg(sum("l_quantity"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"groupBy on bucket key must not shuffle:\n$aggPlan")
  }
}
