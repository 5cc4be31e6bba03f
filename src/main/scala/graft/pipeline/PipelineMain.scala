package graft.pipeline

import org.apache.spark.sql.SparkSession

/** CLI entry point A (SURVEY §3.1) — the analog of the reference's
  * triggered pipeline run: parameters come from `spark.conf`
  * (`--conf spark.source_location=...`, exactly like the pipeline YAML's
  * `configuration:` map — reference `resources/sdp_pipeline.pipeline.yml:
  * 22-29`), the entity config from
  * `{source_location}/dp_config_template.json`.
  *
  * {{{
  * spark-submit --class graft.pipeline.PipelineMain \
  *   --conf spark.source_location=/data/raw \
  *   --conf spark.catalog_name=prod --conf spark.soft_deletes=Y \
  *   graft.jar /warehouse/graft [--full-refresh]
  * }}}
  */
object PipelineMain {
  private def flagValue(args: Array[String], flag: String): Option[String] =
    args.indexOf(flag) match {
      case -1 => None
      case i if i + 1 < args.length && !args(i + 1).startsWith("--") =>
        Some(args(i + 1))
      case _ => throw new IllegalArgumentException(s"$flag needs a value")
    }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: PipelineMain <storageRoot> [--full-refresh] " +
        "[--targets <dp_targets.json> [--target <name>]] " +
        "[--repeat-every <seconds>]")
    // --target without --targets would silently run against defaults —
    // the one config mistake that must fail loud
    require(!(args.contains("--target") && !args.contains("--targets")),
      "--target requires --targets <dp_targets.json>")
    val storageRoot = args(0)
    val fullRefresh = args.contains("--full-refresh")
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.session.timeZone",
        sys.env.getOrElse("GRAFT_TZ", "UTC")))
      .getOrCreate()
    // environment targets (the bundle's `targets:` overlay,
    // config/databricks.yml:31-49): fill conf from the selected profile's
    // variables BEFORE the prefix-copy below, so explicit --conf wins
    flagValue(args, "--targets").foreach { path =>
      val profiles = graft.config.TargetProfiles.load(spark, path)
      graft.config.TargetProfiles.applyTo(spark,
        graft.config.TargetProfiles.select(profiles, flagValue(args, "--target")))
    }
    // the reference reads params via spark.conf.get("source_location") etc.
    // (00_config_loader.py:25-31); Spark requires the `spark.` prefix on
    // --conf, so accept both spellings
    Seq("source_location", "catalog_name", "bronze_db", "silver_db",
      "external_location", "deleted_file_retention_duration", "soft_deletes",
      "max_files_per_trigger").foreach { k =>
      spark.conf.getOption(s"spark.$k")
        .foreach(v => spark.conf.set(k, v))
    }
    // scheduled-trigger analog of the reference job's daily Quartz cron
    // (resources/sdp_job.job.yml:17-19): production scheduling belongs to
    // the orchestrator (cron/Airflow/etc. re-invoking this main — runs are
    // checkpoint-idempotent and lock-protected), but --repeat-every gives
    // a self-contained interval loop for environments without one
    val repeatEvery = flagValue(args, "--repeat-every").map { v =>
      v.toLongOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"--repeat-every takes a positive interval in seconds, got '$v'"))
    }
    val (runner, entities) = PipelineRunner.fromConf(spark, storageRoot)
    // per-phase entity concurrency (flows within a phase are independent,
    // like SDP's parallel resolved flows); default sequential. Unparseable
    // or non-positive values FAIL like the other conf parsers — silently
    // running sequential would mask a typo'd parallelism setting
    val concurrency = spark.conf.getOption("spark.pipeline_concurrency")
      .orElse(spark.conf.getOption("pipeline_concurrency"))
      .map(v => v.toIntOption.filter(_ > 0).getOrElse(
        throw new IllegalArgumentException(
          s"pipeline_concurrency must be a positive int, got '$v'")))
      .getOrElse(1)
    runner.run(entities, fullRefresh, concurrency)
    // interval loop: full refresh applies to the FIRST run only (the
    // reference's full-refresh is likewise a one-shot job parameter)
    repeatEvery.foreach { secs =>
      while (true) {
        Thread.sleep(secs * 1000L)
        runner.run(entities, fullRefresh = false, concurrency)
      }
    }
    spark.stop()
  }
}
