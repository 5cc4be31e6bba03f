package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated query-name filter for local iteration
    // (SPARK_GRAFT_ONLY=q_curation,q_pack); unset = the full suite.
    // Unknown names fail loud — a typo silently benching nothing would
    // read as a pass
    // min-of-N protocol: 3 by default (round-8 showed a uniform ~14%
    // common-subset drift that min-of-2 cannot distinguish from box
    // load; a third sample collapses that noise). SPARK_GRAFT_RUNS
    // overrides for quick local iteration.
    val benchRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    require(benchRuns >= 1, s"SPARK_GRAFT_RUNS must be >= 1, got $benchRuns")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    def selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    // experiment passthrough for LOCAL A/B runs only: a comma-separated
    // "key=value,key=value" list applied on top of the fixed session conf.
    // Unset (the driver protocol) it changes nothing — the driver's
    // numbers never ride an override.
    val extraConf = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_EXTRA_CONF entry not key=value: $kv")
        (kv.take(i), kv.drop(i + 1))
      }
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = graft.analytics.GraftSession.configure(
      extraConf.foldLeft(builder0) { case (b, (k, v)) => b.config(k, v) })
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // CALIBRATION PROBE (r11 verdict: the driver record of 197.4 s vs the
    // builder's same-protocol min-of-4 of 154.7 s could only be adjudicated
    // by a manual touched-vs-untouched family decomposition, because the
    // bench JSON carried no environment control). A FIXED synthetic
    // CPU+shuffle workload — no testdata dependence, so identical bytes on
    // every box and every round — measured BEFORE and AFTER the suite and
    // recorded in the JSON: cross-session totals now divide out box load
    // (calib ratio ≈ time ratio on untouched code ⇒ environment, not a
    // regression), and a drifting probe WITHIN one run flags contamination
    // mid-suite. min-of-3 after one untimed warmup pass (the probe measures
    // the box, not codegen compilation).
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      def pass(): Unit = {
        // pmod-bounded summand: a raw xxhash64 sum overflows int64
        // under ANSI after ~2k rows; 8M × <2^20 stays far inside
        spark.range(0L, 8L * 1000L * 1000L, 1L, 32)
          .select(pmod(xxhash64(col("id")), lit(4096L)).as("k"),
            pmod(xxhash64(col("id"), lit(1L)), lit(1048576L)).as("h"))
          .groupBy(col("k"))
          .agg(sum(col("h")).as("s"), count(lit(1)).as("n"))
          .agg(sum(col("s")), sum(col("n"))).collect()
        ()
      }
      // 3 warm passes: one was measurably not enough on a cold JVM (the
      // "before" probe read ~2x the "after" probe from leftover JIT/
      // shuffle-path warmup, which would masquerade as mid-suite drift)
      (1 to 3).foreach(_ => pass())
      (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); pass()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val calibBefore = calibrate()
    // MID-SUITE probe series (r12 verdict: a per-query driver outlier —
    // q_pagerank at 1.8× its folded record — could only be adjudicated
    // by scoped re-runs after the fact; the end-point probes bound the
    // run's AVERAGE load, not a transient spike mid-suite). One
    // single-shot probe pass every ~25 queries, recorded as
    // `calib_series` [(queries_completed, sec), ...]: a query timed
    // inside a neighborhood whose probe reads ≳2× the idle floor is
    // self-adjudicating as environment, not regression. Single-shot by
    // design — the warmed-up probe is stable enough for a 2× signal and
    // 11 extra passes cost ~5 s across the suite.
    val calibEvery = 25
    val calibSeries =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    def probeAt(done: Int, names: Seq[String]): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      // reuse the calibrate() workload via one explicit pass
      import org.apache.spark.sql.functions._
      spark.range(0L, 8L * 1000L * 1000L, 1L, 32)
        .select(pmod(xxhash64(col("id")), lit(4096L)).as("k"),
          pmod(xxhash64(col("id"), lit(1L)), lit(1048576L)).as("h"))
        .groupBy(col("k"))
        .agg(sum(col("h")).as("s"), count(lit(1)).as("n"))
        .agg(sum(col("s")), sum(col("n"))).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      calibSeries += ((done, sec))
      if (sec > 2.0 * calibBefore)
        System.err.println(f"[bench] WARNING: mid-suite probe after " +
          f"$done queries read $sec%.3f s (idle floor $calibBefore%.3f)" +
          s" - timings for [${names.mkString(", ")}] ran on a LOADED " +
          "box; prefer scoped re-runs before reading them as regressions")
    }
    // warmup: pay JVM/JIT/codegen/session init once, outside the timings —
    // one full pass over every query at the smallest scale factor compiles
    // and JITs each query's generated code, so the measured runs below see
    // steady state (the first query otherwise absorbs the whole text/vector
    // kernel warmup).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // warm against the smallest sibling scale factor when present, else
    // the bench dir itself (never silently skip — an unwarmed first
    // query would re-absorb all the JIT cost into its measurement).
    // Full-scale fallback warmup roughly doubles bench wall-clock and
    // pre-populates the page cache from the measured dataset, so log it
    // LOUDLY and bound each query's warmup with limit(1) partial
    // evaluation (enough to compile + JIT the generated code paths).
    val sibling = new java.io.File(
      new java.io.File(sfDir).getParentFile, "sf0.001")
    val (warmDir, fullScaleWarm) =
      if (sibling.isDirectory) (sibling.getPath, false) else (sfDir, true)
    if (fullScaleWarm)
      System.err.println(s"[bench] WARNING: no sf0.001 sibling; warming " +
        s"against the measured dataset $sfDir with limit(1) per query")
    selected.values.foreach { fn =>
      try {
        val df = fn(spark, warmDir)
        if (fullScaleWarm) df.limit(1).count() else df.count()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] warmup failed on $warmDir: $e")
      }
    }
    var sinceProbe = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), qIdx) =>
      // min of two measured runs: single-shot timings on a shared box
      // swing ±30% run-to-run (scheduler/page-cache/GC noise); the min is
      // the standard steady-state estimator. GC between timings keeps an
      // allocation-heavy query (1.5M md5 strings in q_winnow_fp) from
      // taxing the next measurement with its garbage (measured: 3x).
      // EVERY query is guaranteed 2 measured runs (r12: a contaminated
      // 14.7 s first run of q_graph_hops — steady ~4 s — hit the old
      // one-run-past-12 s cap and became the query's recorded time; a
      // single sample of an expensive query is exactly the sample the
      // min-of-N protocol cannot repair). Beyond 2 runs the ~12 s
      // cumulative cap still stops expensive queries. The steady-state
      // pipeline queries ride the same guarantee: run 1 pays the
      // one-off history-build fixture (PipelineQueries.steadyState),
      // run 2 measures the steady-state per-publish cost.
      val steady = PipelineQueries.steadyStateQueries(name)
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var attempt = 0
      while (attempt < benchRuns &&
          (times.size < 2 || times.sum < 12.0)) {
        System.gc()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e"); false }
        // a failed run's fast-fail elapsed must NOT compete in the min —
        // only successful runs carry a timing
        if (ok) times += (System.nanoTime() - t0) / 1e9
        attempt += 1
      }
      // the steady-state guarantee is gated on attempt < benchRuns, so
      // SPARK_GRAFT_RUNS=1 would silently report the one-off
      // history-build FIXTURE cost the second run exists to exclude —
      // say so loudly rather than let a fixture time pose as steady-state
      if (steady && times.size < 2)
        System.err.println(s"[bench] WARNING: steady-state query $name " +
          s"got only ${times.size} measured run(s) (SPARK_GRAFT_RUNS=" +
          s"$benchRuns); the reported time includes the one-off " +
          "history-build fixture, NOT the steady-state per-publish cost")
      sinceProbe += name
      if ((qIdx + 1) % calibEvery == 0) {
        probeAt(qIdx + 1, sinceProbe.toSeq)
        sinceProbe = scala.collection.mutable.ArrayBuffer.empty[String]
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries carry the -1 sentinel in the per-query map but must
    // not SUBTRACT from the tracked total — a broken query reading as a
    // round-over-round speedup would hide the regression
    val failed = results.filter(_._2 < 0)
    if (failed.nonEmpty)
      System.err.println(s"[bench] FAILED queries excluded from total: " +
        failed.map(_._1).mkString(", "))
    val total = results.map(_._2).filter(_ >= 0).sum
    val calibAfter = calibrate()
    val series = calibSeries
      .map { case (n, s) => s"[$n,$s]" }.mkString("[", ",", "]")
    val calib =
      s""""calib_before_s":$calibBefore,"calib_after_s":$calibAfter,""" +
        s""""calib_series":$series"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec",$calib,"queries":$qs,"sf":"$sfDir"}"""
    // The full per-query JSON line is >4 KB at 111 queries and the driver's
    // output capture truncated it in r5 (BENCH_r05.json parsed:null). Write
    // the full JSON to a file AND print it, then keep the LAST stdout line
    // short and self-contained (total + path) so a tail capture always ends
    // on a parseable JSON line.
    val jsonPath = "/tmp/graft_bench.json"
    // second copy inside the REPO (resolved from the compiled class's
    // location, falling back to a build.sbt-bearing cwd): /tmp may not
    // survive to judging time — BENCH_local.json rides the end-of-round
    // commit. A bare relative path would silently land wherever the JVM
    // was launched from, defeating that purpose; if no repo root can be
    // found, warn loudly instead of writing a stray file.
    val repoRoot: Option[java.nio.file.Path] = {
      val fromClass =
        try {
          val loc = java.nio.file.Paths.get(Bench.getClass
            .getProtectionDomain.getCodeSource.getLocation.toURI)
          Iterator.iterate(loc)(_.getParent).takeWhile(_ != null).take(8)
            .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
        } catch { case _: Throwable => None }
      fromClass.orElse {
        val cwd = java.nio.file.Paths.get("").toAbsolutePath
        Option.when(java.nio.file.Files.exists(cwd.resolve("build.sbt")))(cwd)
      }
    }
    val localCopy = repoRoot.map(_.resolve("BENCH_local.json").toString)
    if (localCopy.isEmpty)
      System.err.println("[bench] no repo root found (build.sbt) from the " +
        "class location or cwd; skipping the committed BENCH_local.json copy")
    (jsonPath +: localCopy.toSeq).foreach { p =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), full)
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $p: $e") }
    }
    println(full)
    println(s"""{"metric":"total","value":$total,"unit":"sec",$calib,"sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size},"queries_file":"$jsonPath"}""")
    spark.stop()
  }
}
