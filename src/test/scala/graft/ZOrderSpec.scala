package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ClusterLayout, ZOrder}

/** Z-order layout: correctness (pure reshuffle, no row changes) and the
  * property that justifies it — a filter on the SECOND clustering column
  * skips most partitions under z-order but touches nearly all of them
  * under the lexicographic layout. Partition-level min/max stand in for
  * parquet row-group stats (same skipping mechanism).
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Partitions whose [min,max] of `c` overlap [lo,hi] — the files a
    * stats-based reader must touch for that predicate. */
  private def overlapping(df: DataFrame, c: String, lo: Long, hi: Long): Long =
    df.groupBy(spark_partition_id())
      .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      .filter(col("mn") <= hi && col("mx") >= lo)
      .count()

  test("z-order skips on the second clustering column; lexicographic does not") {
    val n = 40000
    val parts = 16
    // two INDEPENDENT uniform dims (hash-derived — two linear functions
    // of id would be perfectly correlated and make even the
    // lexicographic layout accidentally selective on y)
    val df = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(n)).as("x"),
      pmod(xxhash64(col("id") + 7777777L), lit(n)).as("y"))
    val z = ZOrder.layout(df, Seq("x", "y"), numPartitions = Some(parts))
    val lex = df.repartitionByRange(parts, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))

    // same rows either way — layout is a pure reshuffle
    assert(z.count() == n)
    assert(z.select(sum(col("x")), sum(col("y"))).head ==
      lex.select(sum(col("x")), sum(col("y"))).head)

    val range = n / 16L // a 1/16-selective band on y
    val zTouch = overlapping(z, "y", 0, range)
    val lexTouch = overlapping(lex, "y", 0, range)
    val total = z.select(spark_partition_id()).distinct().count()
    // lexicographic stats on y are useless (x leads the sort): ~all
    // partitions overlap; z-order confines the band to a fraction
    assert(lexTouch >= total * 3 / 4,
      s"expected lexicographic layout to touch most of $total, got $lexTouch")
    assert(zTouch * 2 <= lexTouch,
      s"z-order should touch at most half of lexicographic: $zTouch vs $lexTouch")

    // and x keeps (most of) its own skipping power under z-order
    val zTouchX = overlapping(z, "x", 0, range)
    assert(zTouchX * 2 <= total,
      s"z-order x-band should skip at least half of $total, got $zTouchX")
  }

  test("z-order handles date and timestamp_ntz clustering columns (ANSI casts)") {
    val df = spark.range(200).select(
      expr("date_add(date '2024-01-01', cast(id % 90 as int))").as("d"),
      expr("cast(timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id) as timestamp_ntz)").as("tntz"),
      (col("id") % 7).as("k"))
    // DATE->DOUBLE and TIMESTAMP_NTZ->DOUBLE casts are illegal under ANSI;
    // the rank-space projection must route around them
    val z = ZOrder.layout(df, Seq("d", "tntz", "k"))
    assert(z.count() == 200)
    assert(z.columns.toSeq == Seq("d", "tntz", "k"))
  }

  test("temp z columns never clobber same-named user columns") {
    val df = spark.range(50).select(
      col("id").as("x"), (col("id") * 3).as("y"),
      (col("id") + 1000).as("_zval"), (col("id") + 2000).as("_zq0"))
    val z = ZOrder.layout(df, Seq("x", "y"))
    assert(z.columns.toSet == Set("x", "y", "_zval", "_zq0"))
    // the user's _zval column survives untouched
    assert(z.select(sum(col("_zval"))).head.getLong(0)
      == df.select(sum(col("_zval"))).head.getLong(0))
  }

  test("ClusterLayout dispatches: multi-col numeric -> z-order, strings -> lexicographic") {
    val df = Seq((1L, 2L, "a"), (3L, 4L, "b")).toDF("x", "y", "s")
    // multi-col numeric: z-value path (plan contains the interleave calc;
    // cheap proxy: result schema unchanged and rows preserved)
    val z = ClusterLayout(df, Seq("x", "y"))
    assert(z.columns.toSeq == Seq("x", "y", "s") && z.count() == 2)
    // string clustering col: falls back to lexicographic (still works)
    val l = ClusterLayout(df, Seq("s", "x"))
    assert(l.count() == 2)
    // single col: lexicographic
    assert(ClusterLayout(df, Seq("x")).count() == 2)
  }

  test("exactZValues: matches a brute-force Morton computation and is " +
      "partitioning-invariant") {
    val n = 1000
    val bits = 4
    val df = spark.range(n).select(col("id"),
      pmod(xxhash64(col("id")), lit(997)).as("x"),
      pmod(xxhash64(col("id") + 31L), lit(997)).as("y"))
    val got = ZOrder.exactZValues(df, Seq("x", "y"), "id", bits = bits)
      .select(col("id"), col("zval")).as[(Long, Long)].collect().toMap

    // brute force on the driver: exact equal-frequency buckets from full
    // sorts, bit b of column i at position b*2+i
    val rows = df.select("id", "x", "y").as[(Long, Long, Long)].collect()
    def ranks(key: ((Long, Long, Long)) => Long) =
      rows.sortBy(r => (key(r), r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> i.toLong }.toMap
    val (rx, ry) = (ranks(_._2), ranks(_._3))
    def bucket(rank: Long) = rank * (1L << bits) / n
    val expect = rows.map { r =>
      val (bx, by) = (bucket(rx(r._1)), bucket(ry(r._1)))
      val z = (0 until bits).map(b =>
        (((bx >> b) & 1L) << (2 * b)) | (((by >> b) & 1L) << (2 * b + 1)))
        .sum
      r._1 -> z
    }.toMap
    assert(got === expect)

    val again = ZOrder.exactZValues(df.repartition(7), Seq("x", "y"), "id",
        bits = bits)
      .select(col("id"), col("zval")).as[(Long, Long)].collect().toMap
    assert(again === got)
  }

  test("exactZValues: no unpartitioned data-sized window, and the layout " +
      "built on it skips like the sketched form") {
    val df = spark.range(20000).select(col("id"),
      pmod(xxhash64(col("id")), lit(20000)).as("x"),
      pmod(xxhash64(col("id") + 7L), lit(20000)).as("y"))
    val z = ZOrder.exactZValues(df, Seq("x", "y"), "id")
    // the skew-safe rank machinery must not fall back to a global window
    // over the data: any Window in the plan may only run over the
    // 256-row shard-offsets frame (its child aggregates by shard)
    val plan = z.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val laid = z.repartitionByRange(16, col("zval"))
      .sortWithinPartitions(col("zval"))
    val touched = laid.groupBy(spark_partition_id())
      .agg(min(col("y")).as("mn"), max(col("y")).as("mx"))
      .filter(col("mn") <= 1250 && col("mx") >= 0).count()
    assert(touched * 2 <= 16,
      s"exact z-layout should skip at least half the partitions on y, got $touched")
  }

  test("interleave fails loud when bits*cols would overflow the sign bit") {
    // 11 cols at 6 bits = 66 positions: Java shifts wrap mod 64 and would
    // silently alias high bucket bits onto low positions
    val cols = (0 until 11).map(i => s"c$i")
    val df = spark.range(10).select(
      (col("id") +: cols.map(c => (col("id") * 31 + c.length).as(c))): _*)
    val ex = intercept[IllegalArgumentException](
      ZOrder.layout(df, cols))
    assert(ex.getMessage.contains("63"))
  }
}
