package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Profiler

/** Table profiler: metric correctness per type family, null handling,
  * and the scale contract (default mode scans once with NO Expand
  * blowup; exact-distinct mode is the one that pays it). */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame = Seq(
    (1L, Some(2.5), Some("ab"), Some("2024-01-02")),
    (2L, Some(7.25), Some("wxyz"), Some("2024-03-04")),
    (3L, None, Some("m"), None),
    (4L, Some(2.5), None, Some("2024-01-02"))
  ).toDF("id", "x", "s", "d")
    .withColumn("d", col("d").cast("date"))

  test("profile: hand-checked metrics across long/double/string/date") {
    val p = Profiler.profile(frame, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "x", "s", "d"))
    val id = p("id")
    assert(id.getString(1) === "bigint" && id.getLong(2) === 4L &&
      id.getLong(3) === 0L && id.getLong(4) === 4L)
    assert(id.getDecimal(5).doubleValue() === 1.0 &&
      id.getDecimal(6).doubleValue() === 4.0)
    val x = p("x")
    assert(x.getLong(3) === 1L && x.getLong(4) === 2L) // nulls, distinct
    assert(x.getDecimal(5).doubleValue() === 2.5 &&
      x.getDecimal(6).doubleValue() === 7.25)
    assert(x.isNullAt(7) && x.isNullAt(8) && x.isNullAt(9))
    val s = p("s")
    assert(s.getLong(3) === 1L && s.getLong(4) === 3L)
    assert(s.isNullAt(5) && s.isNullAt(6))
    assert(s.getString(7) === "ab" && s.getString(8) === "wxyz")
    // mean length of (2, 4, 1) = 7/3 in exact micro-units
    assert(s.getLong(9) === 7L * 1000000L / 3L)
    val d = p("d")
    assert(d.getString(1) === "date")
    assert(d.getString(7) === "2024-01-02" && d.getString(8) === "2024-03-04")
    assert(d.getLong(4) === 2L)
  }

  test("profile: all-null column yields null metrics, not failures") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val row = Profiler.profile(df, exactDistinct = true)
      .filter(col("col_name") === "s").head
    assert(row.getLong(3) === 2L && row.getLong(4) === 0L)
    assert(row.isNullAt(7) && row.isNullAt(8) && row.isNullAt(9))
  }

  test("profile default mode: approx distincts, ONE scan, no Expand") {
    val df = spark.range(5000).select(col("id"),
      (col("id") % 17).as("a"), (col("id") % 3).cast("string").as("b"))
    val plan = Profiler.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "default profile must not multiply the input per distinct column")
    // approx distinct lands within HLL tolerance of truth
    val got = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(math.abs(got("a") - 17L) <= 2 && math.abs(got("id") - 5000L) <= 500)
    // the exact form is the one that buys Expand
    val exactPlan = Profiler.profile(df, exactDistinct = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
  }

  test("profile: column names needing backtick quoting survive") {
    val df = Seq((1L, "v")).toDF("id", "weird name.dot")
    val p = Profiler.profile(df, exactDistinct = true).collect()
    assert(p.map(_.getString(0)).toSet === Set("id", "weird name.dot"))
  }
}
