package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZOrder
import graft.pipeline.FileStats

/** Zone-map file skipping: stats correctness, sound pruning (pruned read
  * == full filtered read), actual file-count reduction on a clustered
  * layout, incremental refresh, and stats-dir invisibility. */
class FileStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("fstats").toString
    val path = s"$dir/lineitem"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // cluster by shipdate so per-file ranges are disjoint → prunable
    ZOrder.layout(li, Seq("l_shipdate"), numPartitions = Some(8))
      .write.parquet(path)
    path
  }

  test("collect: per-file min/max/count agree with per-file ground truth; " +
      "stats dir is invisible to normal reads") {
    val path = mkTable()
    FileStats.collect(spark, path, Seq("l_shipdate", "l_quantity"))
    val stats = FileStats.stats(spark, path)
    assert(stats.count() == 8)
    // ground truth per file via _metadata
    val truth = spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(count(lit(1)).as("t_rows"),
        min("l_shipdate").as("t_min"), max("l_shipdate").as("t_max"))
    val joined = stats.join(truth, "file_path")
    assert(joined.count() == 8)
    assert(joined.filter(col("n_rows") =!= col("t_rows") ||
      col("l_shipdate_min") =!= col("t_min") ||
      col("l_shipdate_max") =!= col("t_max")).count() == 0)
    // the _graft_stats dir must not leak into the table read
    val tableCols = spark.read.parquet(path).columns.toSet
    assert(!tableCols.contains("n_rows"))
    assert(spark.read.parquet(path).count() ==
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count())
  }

  test("prunedRead: equals the full filtered read while touching fewer " +
      "files; empty range reads nothing; NULL-stats files are kept") {
    val path = mkTable()
    FileStats.collect(spark, path, Seq("l_shipdate"))
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-03-31 23:59:59")
    val rowPred = col("l_shipdate").between(lo, hi)
    val pruned = FileStats.prunedRead(spark, path,
      FileStats.rangeOverlaps("l_shipdate", lo, hi)).filter(rowPred)
    val full = spark.read.parquet(path).filter(rowPred)
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.select(sum("l_quantity")).as[Double].head() ==
      full.select(sum("l_quantity")).as[Double].head())
    // the zone maps must actually skip files on a clustered layout
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"no files pruned: ${pruned.inputFiles.length} of " +
        s"${full.inputFiles.length}")
    // a range beyond the data prunes everything (schema preserved)
    val none = FileStats.prunedRead(spark, path,
      FileStats.rangeOverlaps("l_shipdate",
        java.sql.Timestamp.valueOf("2100-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2100-12-31 00:00:00")))
    assert(none.count() == 0)
    assert(none.schema == spark.read.parquet(path).schema)
  }

  test("refresh: stats only files new since the last collection; " +
      "pruning stays sound afterward") {
    val path = mkTable()
    FileStats.collect(spark, path, Seq("l_shipdate"))
    val before = FileStats.stats(spark, path).count()
    assert(FileStats.refresh(spark, path, Seq("l_shipdate")) == 0L)
    // append new files with out-of-range dates
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .limit(100)
      .withColumn("l_shipdate",
        lit(java.sql.Timestamp.valueOf("2099-06-01 00:00:00")))
      .repartition(2)
      .write.mode("append").parquet(path)
    val statted = FileStats.refresh(spark, path, Seq("l_shipdate"))
    assert(statted == 2L)
    assert(FileStats.stats(spark, path).count() == before + 2)
    val hit = FileStats.prunedRead(spark, path,
      FileStats.rangeOverlaps("l_shipdate",
        java.sql.Timestamp.valueOf("2099-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2099-12-31 00:00:00")))
    assert(hit.count() == 100)
    assert(hit.inputFiles.length == 2)
  }

  test("maxDriverFiles: the driver-manifest collects are capped and fail " +
      "loud past the cap, not at it") {
    val path = mkTable()
    FileStats.collect(spark, path, Seq("l_shipdate"))
    val nFiles = FileStats.stats(spark, path).count().toInt
    assert(nFiles >= 2, s"need a multi-file table, got $nFiles")
    // at the cap: fine; one under: loud error naming the knob
    val all = FileStats.prunedRead(spark, path, lit(true),
      maxDriverFiles = nFiles)
    assert(all.inputFiles.length == nFiles)
    val ex = intercept[IllegalStateException](
      FileStats.prunedRead(spark, path, lit(true),
        maxDriverFiles = nFiles - 1))
    assert(ex.getMessage.contains("maxDriverFiles") &&
      ex.getMessage.contains("per path prefix"))
    // refresh path: appending more new files than the cap fails loud too
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .limit(10).repartition(2).write.mode("append").parquet(path)
    val ex2 = intercept[IllegalStateException](
      FileStats.refresh(spark, path, Seq("l_shipdate"), maxDriverFiles = 1))
    assert(ex2.getMessage.contains("maxDriverFiles"))
    assert(FileStats.refresh(spark, path, Seq("l_shipdate")) == 2L)
  }
}
