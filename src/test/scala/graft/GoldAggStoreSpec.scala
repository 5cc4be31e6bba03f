package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{GoldAgg, GoldAggregate}
import graft.pipeline.GoldAggOps

/** The aggregate-partial store's SIZE-SCALED write discipline
  * ([[GoldAggOps.writeSizeScaled]] — the r11-verdict fix for the
  * `coalesce(1)` single-task funnels): a dashboard-grain partial still
  * lands as ONE file (AQE coalesces the rebalance exchange, keeping
  * the file-count-as-batch-count compaction trigger exact there), while
  * a partial whose bytes exceed the advisory partition size fans out to
  * MULTIPLE tasks/files — the property that keeps `group by user_id`
  * over a 100 TB fact stream off a one-task write. Totals are
  * layout-invariant either way (the read side re-sums). */
class GoldAggStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))

  /** AQE's coalesce target under the default `parallelismFirst` is
    * `max(total / parallelism, minPartitionSize)` — the 1 MB
    * minPartitionSize floor means a sub-MB partial ALWAYS coalesces to
    * one file locally (correct: tasks scale with data). To exercise the
    * fan-out at unit-test scale, both knobs shrink so kilobyte partials
    * behave like terabyte ones. */
  private def withSmallPartitions[T](body: => T): T = {
    val keys = Seq("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "16KB"))
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("writeSizeScaled: tiny partial -> one file; advisory-exceeding " +
      "partial -> multiple files; contents layout-invariant") {
    val tiny = Seq(("A", 3L, 100L), ("B", 2L, 50L))
      .toDF("grp", "n", "sum_x1e6")
    val d1 = java.nio.file.Files.createTempDirectory("aggw1").toString
    GoldAggOps.writeSizeScaled(tiny, Seq("grp"), "overwrite", d1)
    assert(parquetFiles(d1) == 1,
      s"tiny partial wrote ${parquetFiles(d1)} files, expected 1 " +
        "(AQE should coalesce the rebalance exchange)")

    // high-cardinality partial: force the fan-out at test scale by
    // shrinking the AQE size targets (at real scale the default 64 MB
    // advisory / 1 MB floor split a data-sized partial the same way)
    withSmallPartitions {
      val wide = spark.range(0L, 60000L)
        .select(concat(lit("user_"), col("id")).as("grp"),
          lit(1L).as("n"), (col("id") * 1000L).as("sum_x1e6"))
      val d2 = java.nio.file.Files.createTempDirectory("aggw2").toString
      GoldAggOps.writeSizeScaled(wide, Seq("grp"), "overwrite", d2)
      assert(parquetFiles(d2) > 1,
        s"a partial well above the target size wrote " +
          s"${parquetFiles(d2)} file(s) - the single-task funnel is back")
      // layout-invariant read: re-summing the multi-file store equals
      // the original frame exactly
      val back = spark.read.parquet(d2)
        .groupBy($"grp").agg(sum($"n").as("n"),
          sum($"sum_x1e6").as("sum_x1e6"))
      assert(back.exceptAll(wide).isEmpty && wide.exceptAll(back).isEmpty)
    }
  }

  test("goldAggSink end-to-end at a high-cardinality group key: " +
      "multi-file appends, totals exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val a = GoldAggregate(Seq("user_id"), Seq(
      GoldAgg("count", as = "n"),
      GoldAgg("sum_x1e6", expr = "amount", as = "total_x1e6")))
    val root = java.nio.file.Files.createTempDirectory("aggsink-hc")
    withSmallPartitions {
      val mem = MemoryStream[(Long, Double)](spark)
      val q = GoldAggOps.goldAggSink(
          mem.toDF.toDF("user_id", "amount"), a,
          root.resolve("store").toString, root.resolve("cp").toString)
        .start()
      mem.addData((0L until 40000L).map(i => (i, 1.5)): _*)
      q.processAllAvailable()
      q.stop()
      val base = new java.io.File(
        root.resolve("store").resolve("agg_partials").toString)
      val gen = base.listFiles()
        .filter(f => f.isDirectory && f.getName.matches("g\\d+"))
        .maxBy(_.getName.stripPrefix("g").toLong).getPath
      assert(parquetFiles(gen) > 1,
        "a 40k-group micro-batch partial landed in one file - the " +
          "streaming sink is still a single-task write")
      val mart = GoldAggOps.readMart(spark,
        root.resolve("store").toString, a)
      val r = mart.agg(count(lit(1)), sum($"n"), sum($"total_x1e6"))
        .as[(Long, Long, Long)].head()
      assert(r == ((40000L, 40000L, 40000L * 1500000L)))
    }
  }
}
