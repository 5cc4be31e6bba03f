package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{ConfigLoader, PipelineParams}
import graft.pipeline.PipelineRunner

/** sf1 sweep of the STREAMING-CADENCE medallion (r13-verdict task 5):
  * the q_stream_medallion flow (orders ⋈ customer streaming join mart,
  * 3 CDC waves incl. updates and a gate retraction) at sf0.1 and at
  * k×-scaled data, decomposing each triggered run into the runner's
  * logged phase boundaries (bronze / silver / gold) plus the per-feed
  * `feed extract` (version-delta pair write) and `feed drain` (sink
  * micro-batch) timings maintainFeed logs. The two-point fit
  * (t = fixed + data·scale) is the DimRestrictBench posture: a
  * data-term ratio near the scale factor means the phase is data-sized
  * (expected for wave 1's initial loads), near 1 means fixed overhead
  * (expected for the steady-state delta waves — the whole point of the
  * CDC feed).
  *
  * Usage: Test/runMain graft.tools.StreamMartBench [sfDir] [k] [runs]
  * Prints per-wave, per-phase seconds at both scales (min-of-runs) and
  * the scale ratios. NEVER run concurrently with another sbt/Spark
  * process (bench hygiene).
  */
object StreamMartBench {
  private val PhaseRe = """\[pipeline \+(\d+\.\d)s\] (.*)""".r

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val runs = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaledDir = Files.createTempDirectory("smb-scaled").toString
    println(s"[bench] generating ${k}x data at $scaledDir ...")
    MakeScaledTestdata.generate(spark, scaledDir, k)

    def minFold(ms: Seq[Map[String, Double]]): Map[String, Double] =
      ms.flatMap(_.keys).distinct.map { key =>
        key -> ms.flatMap(_.get(key)).min
      }.toMap

    Seq(false, true).foreach { incr =>
      val at1 = minFold((1 to runs).map(_ =>
        flow(spark, tbl => s"$baseDir/$tbl.parquet", incr)))
      val atK = minFold((1 to runs).map(_ =>
        flow(spark, tbl => s"$scaledDir/$tbl.parquet", incr)))
      val label = if (incr) "INCREMENTAL silver (CDF feed)"
        else "FULL silver (snapshot-diff feed)"
      println(f"%n[bench] $label - phase timings (s), min-of-$runs, " +
        f"sf0.1 vs ${k}x:")
      at1.keys.toSeq.sorted.foreach { key =>
        val a = at1(key); val b = atK.getOrElse(key, Double.NaN)
        println(f"[bench]   $key%-44s ${a}%8.2f  ${b}%8.2f  x${b / a}%.2f")
      }
    }
    spark.stop()
  }

  /** One full 3-wave flow; returns "<wave>/<phase>" -> seconds. */
  private def flow(spark: SparkSession,
      table: String => String, incremental: Boolean): Map[String, Double] = {
    val src = Files.createTempDirectory("smb-src").toString
    val store = Files.createTempDirectory("smb-store").toString
    val run = s"smb${System.nanoTime() % 1000000}"
    val silverMode = if (incremental)
      """"silver_mode": "incremental",
        |  "silver_merge": "merge_on_read",
        |  "silver_buckets": 32,
        |""".stripMargin
    else ""
    val dimMode = if (incremental)
      """"silver_mode": "incremental", "silver_buckets": 8,
        |             """.stripMargin
    else ""
    Files.writeString(Paths.get(src, "dp_config_template.json"),
      s"""{"orders": {
        |  "raw_file_format": "parquet",
        |  "unique_primary_key": ["o_orderkey"],
        |  $silverMode"expect_all_or_drop": {"price_ok": "o_totalprice IS NOT NULL"},
        |  "gold": {"cadence": "streaming",
        |    "join": [
        |      {"entity": "customer", "on": "o_custkey = c_custkey",
        |       "broadcast": true}],
        |    "select": ["o_orderkey", "o_totalprice",
        |               "c_name AS customer", "c_mktsegment AS segment"]}
        |},
        |"customer": {"raw_file_format": "parquet",
        |             ${dimMode}"unique_primary_key": ["c_custkey"]}
        |}""".stripMargin)
    def orders: DataFrame = spark.read.parquet(table("orders"))
    def customer: DataFrame = spark.read.parquet(table("customer"))
    def stage(entity: String, df: DataFrame): Unit =
      df.write.mode("append").parquet(s"$src/$entity")

    def timedRun(wave: String, clock: String): Map[String, Double] = {
      val params = PipelineParams(sourceLocation = src,
        catalogName = run,
        fixedIngestedAt = Some(java.sql.Timestamp.valueOf(clock)))
      val runner = new PipelineRunner(spark, params, store)
      val buf = new java.io.ByteArrayOutputStream()
      val tee = new java.io.PrintStream(buf, true, "UTF-8")
      Console.withErr(tee) {
        runner.run(ConfigLoader.load(spark, src))
      }
      val lines = buf.toString("UTF-8").linesIterator.toSeq
      tee.flush()
      // phase boundaries from the runner's own elapsed stamps
      var marks = Map.empty[String, Double]
      var feeds = Map.empty[String, Double]
      lines.foreach {
        case PhaseRe(t, msg) =>
          if (msg.startsWith("phase ")) marks += (msg -> t.toDouble)
          else if (msg.startsWith("feed extract ") ||
              msg.startsWith("feed drain ")) {
            val Array(what, rest) = msg.split(": ", 2)
            feeds += (s"$wave/$what" ->
              (feeds.getOrElse(s"$wave/$what", 0.0) +
                rest.stripSuffix("s").toDouble))
          }
        case _ =>
      }
      val bronze = marks.getOrElse("phase bronze done", 0.0)
      val silver = marks.getOrElse("phase silver done", bronze)
      val gold = marks.getOrElse("phase gold done", silver)
      Map(s"$wave/bronze" -> bronze, s"$wave/silver" -> (silver - bronze),
        s"$wave/gold" -> (gold - silver)) ++ feeds
    }

    stage("orders", orders)
    stage("customer", customer)
    val w1 = timedRun("w1_initial", "2024-03-01 00:00:00")
    stage("orders", orders.where(col("o_orderkey") % 13 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)))
    stage("customer", customer.where(col("c_custkey") % 7 === 0)
      .withColumn("c_name", concat(lit("upd: "), col("c_name"))))
    val w2 = timedRun("w2_updates", "2024-03-02 00:00:00")
    stage("orders", orders.where(col("o_orderkey") % 11 === 0 &&
        col("o_orderkey") % 13 =!= 0)
      .withColumn("o_totalprice", lit(null).cast("double")))
    val w3 = timedRun("w3_retract", "2024-03-03 00:00:00")
    spark.sql(s"DROP DATABASE IF EXISTS ${run}_bronze CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS ${run}_silver CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS ${run}_gold CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    w1 ++ w2 ++ w3
  }
}
