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
        "[--repeat-every <seconds>] " +
        "[--schedule <quartz-cron> [--schedule-tz <zoneId>]] [--validate]")
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
    // scheduled-trigger analogs of the reference job's daily Quartz cron
    // (resources/sdp_job.job.yml:17-19): production scheduling belongs to
    // the orchestrator (cron/Airflow/etc. re-invoking this main — runs are
    // checkpoint-idempotent and lock-protected), but --repeat-every gives
    // a self-contained interval loop, and --schedule accepts the job
    // yaml's quartz_cron_expression + timezone_id verbatim
    val repeatEvery = flagValue(args, "--repeat-every").map { v =>
      v.toLongOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"--repeat-every takes a positive interval in seconds, got '$v'"))
    }
    val schedule = flagValue(args, "--schedule").map(QuartzCron.parse)
    require(!(repeatEvery.nonEmpty && schedule.nonEmpty),
      "--repeat-every and --schedule are mutually exclusive")
    require(!(args.contains("--schedule-tz") && schedule.isEmpty),
      "--schedule-tz requires --schedule <quartz-cron>")
    val scheduleZone = flagValue(args, "--schedule-tz")
      .map(java.time.ZoneId.of).getOrElse(java.time.ZoneId.of("UTC"))
    val (runner, entities) = PipelineRunner.fromConf(spark, storageRoot)
    // --validate: the `databricks bundle validate` analog (README.md:
    // 196-198) — resolve targets + params + entity config, report the
    // flow plan, and exit WITHOUT touching catalogs, checkpoints, or the
    // run lock. Config errors (bad JSON, unknown target, bad cron) have
    // already failed loud above; reaching here means the bundle is sound.
    if (args.contains("--validate")) {
      val p = graft.config.PipelineParams.fromConf(spark)
      println(s"[validate] source_location=${p.sourceLocation} " +
        s"catalog=${p.catalogName} bronze=${p.bronzeSchema} " +
        s"silver=${p.silverSchema} soft_deletes=${p.softDeletesEnabled}")
      // cross-entity references must resolve statically — a typo'd
      // contamination_probes_entity would otherwise surface as a
      // table-not-found deep inside the gold phase of a real run
      entities.foreach { case (name, cfg) =>
        cfg.gold.flatMap(_.curation.contaminationProbesEntity).foreach { probe =>
          require(entities.contains(probe),
            s"gold.$name.contamination_probes_entity references unknown " +
              s"entity '$probe' (known: ${entities.keys.toSeq.sorted.mkString(", ")})")
          require(probe != name,
            s"gold.$name.contamination_probes_entity must name a DIFFERENT entity")
        }
      }
      entities.toSeq.sortBy(_._1).foreach { case (name, cfg) =>
        println(s"[validate] entity $name: format=${cfg.rawFileFormat} " +
          s"pk=${cfg.uniquePrimaryKey.mkString(",")} " +
          s"expectations=${cfg.expectAllOrDrop.size} " +
          s"gold=${cfg.gold.size}")
      }
      schedule.foreach(c => println(s"[validate] schedule $c " +
        s"zone=$scheduleZone next=" +
        c.nextAfter(java.time.Instant.now(), scheduleZone).orNull))
      println(s"[validate] OK: ${entities.size} entities")
      spark.stop()
      return
    }
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
    // --rebucket: migrate any incremental-silver layout whose recorded
    // bucket count differs from the config BEFORE the run (one
    // winners-only rewrite; bronze + checkpoints untouched) — the
    // surgical alternative to --full-refresh for a silver_buckets change
    if (args.contains("--rebucket"))
      entities.toSeq.sortBy(_._1).foreach { case (name, cfg) =>
        if (cfg.silverMode == "incremental")
          runner.rebucketSilver(name, cfg)
      }
    runner.run(entities, fullRefresh, concurrency)
    // interval loop: full refresh applies to the FIRST run only (the
    // reference's full-refresh is likewise a one-shot job parameter)
    repeatEvery.foreach { secs =>
      while (true) {
        Thread.sleep(secs * 1000L)
        runner.run(entities, fullRefresh = false, concurrency)
      }
    }
    // cron loop: sleep to each next fire time in the schedule's zone.
    // A run that overruns past the next fire time does NOT double-fire:
    // the next fire is computed from "now" after the run returns (the
    // max_concurrent_runs=1 posture, sdp_job.job.yml:23).
    schedule.foreach { cron =>
      while (true) {
        val now = java.time.Instant.now()
        val next = cron.nextAfter(now, scheduleZone).getOrElse(
          throw new IllegalStateException(
            s"$cron has no future fire time (year-bounded schedule?)"))
        Thread.sleep(math.max(0L, java.time.Duration.between(now, next).toMillis))
        runner.run(entities, fullRefresh = false, concurrency)
      }
    }
    spark.stop()
  }
}
