package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark 4.x recursive CTE support (SQL:1999 `WITH RECURSIVE`) — the
  * §2.7 set-operation generalization. Spark 4.1 accepts ONLY `UNION ALL`
  * in the recursive member (`UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE`), so
  * the expressible class is generators and acyclic (DAG) traversals —
  * each step a distributed job under driver-coordinated iteration.
  * Cyclic closures need the dedup a fixpoint UNION would provide; that
  * job belongs to [[graft.dedup.ConnectedComponents]]' alternating star
  * joins, which also bound the iteration count at O(log n) instead of
  * graph diameter. */
class RecursiveCteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("WITH RECURSIVE: generator fixpoint") {
    val out = spark.sql(
      """WITH RECURSIVE r(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5)
        |SELECT * FROM r ORDER BY n""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    assert(out == (1 to 5))
  }

  test("WITH RECURSIVE: DAG hierarchy closure (ancestor -> descendant " +
      "with depth); recursive member requires UNION ALL in Spark 4.1") {
    import spark.implicits._
    // tree: 1 -> {2, 3}, 2 -> 4, separate 5 -> 6
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (5L, 6L)).toDF("parent", "child")
      .createOrReplaceTempView("hier_rc")
    val out = spark.sql(
      """WITH RECURSIVE closure(anc, descendant, depth) AS (
        |  SELECT parent, child, 1 FROM hier_rc
        |  UNION ALL
        |  SELECT c.anc, h.child, c.depth + 1
        |  FROM closure c JOIN hier_rc h ON h.parent = c.descendant)
        |SELECT anc, descendant, depth FROM closure
        |ORDER BY anc, descendant""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 2),
      (2L, 4L, 1), (5L, 6L, 1)))
    // cyclic/unioned closure is NOT expressible yet (UNION ALL only) —
    // that job belongs to ConnectedComponents' alternating star joins
  }
}
