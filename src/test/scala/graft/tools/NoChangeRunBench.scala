package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.{ConfigLoader, PipelineParams}
import graft.pipeline.PipelineRunner

/** Measures the NO-CHANGE RUN SKIP (round 12): the wall-clock of a
  * triggered pipeline run over a feed with nothing new, with the skip
  * ON (default) vs OFF (`republishUnchanged = true` — the pre-r12
  * behavior: full-mode silver rewrites + gold republish every run).
  * World = the q_gold_scd2 shape at the given testdata dir (two
  * entities off the events table, full-mode silver, temporal gold) —
  * the heaviest steady-state row in the bench family, so the delta
  * here is the one the flagged q_gold_scd2_incr pays per idle trigger.
  *
  * Usage: Test/runMain graft.tools.NoChangeRunBench [sfDir] */
object NoChangeRunBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("ncr-bench").toString
    Files.createDirectories(Paths.get(s"$root/src"))
    val ev = graft.analytics.Tables.withEpochMicros(
      graft.analytics.Tables(spark, dir, "events"))
    ev.select(col("event_id"), col("user_id"), col("ts_us"))
      .write.parquet(s"$root/src/activity")
    ev.select(col("event_id").as("change_id"),
        col("user_id").as("huser"), col("ts_us").as("hts"),
        col("event_type").as("htype"))
      .write.parquet(s"$root/src/user_history")
    Files.write(Paths.get(s"$root/src/dp_config_template.json"),
      """{"activity": {
        |  "raw_file_format": "parquet",
        |  "unique_primary_key": ["event_id"],
        |  "gold": {
        |    "join": [
        |      {"entity": "user_history", "on": "user_id = huser",
        |       "broadcast": true,
        |       "temporal": {"fact_ts": "ts_us", "dim_ts": "hts",
        |                    "tie_break": "change_id",
        |                    "attrs": ["htype"]}}],
        |    "select": ["event_id", "user_id", "src_change_id",
        |               "htype AS dim_type", "valid_from"]}
        |},
        |"user_history": {
        |  "raw_file_format": "parquet",
        |  "unique_primary_key": ["change_id"]
        |}}""".stripMargin.getBytes(StandardCharsets.UTF_8))
    def runOnce(republish: Boolean): Double = {
      val params = PipelineParams(sourceLocation = s"$root/src",
        catalogName = "ncrbench", republishUnchanged = republish)
      val r = new PipelineRunner(spark, params, s"$root/store")
      val t0 = System.nanoTime()
      r.run(ConfigLoader.load(spark, params.sourceLocation),
        concurrency = 2)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[ncr] build run: ${runOnce(republish = true)}%.2f s")
    def minOf2(republish: Boolean): Double =
      (1 to 2).map { _ => System.gc(); runOnce(republish) }.min
    val tPublish = minOf2(republish = true)
    val tSkip = minOf2(republish = false)
    println(f"[ncr] no-change run, skip OFF (full republish): " +
      f"$tPublish%.2f s")
    println(f"[ncr] no-change run, skip ON  (metadata only):  " +
      f"$tSkip%.2f s  (${tPublish / tSkip}%.1fx)")
    spark.stop()
  }
}
