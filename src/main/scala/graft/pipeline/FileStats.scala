package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a per-file (min, max, count) stats table for a
  * parquet directory, plus a reader that prunes the FILE LIST before the
  * scan ever starts — the manifest/data-skipping layer of every lakehouse
  * format (Delta `add.stats`, Iceberg manifests), re-expressed on plain
  * parquet. Parquet row-group stats already skip WITHIN a scan, but the
  * scan still lists and footer-reads every file; at 10⁶ files per table
  * that listing is the latency floor, and a zone-map table turns it into
  * one tiny metadata query. Pairs with [[graft.ops.ZOrder.layout]]:
  * clustering is exactly what makes per-file min/max ranges disjoint
  * enough to prune.
  *
  * The stats table lives in `<table>/_graft_stats` — underscore-prefixed
  * paths are invisible to Spark's file index, so the table's normal reads
  * are unaffected.
  *
  * Scale: stats collection is one column-pruned pass with map-side
  * partial min/max/count per file (the shuffle carries one row per file
  * × partial, never data); `refresh` stats only files NEW since the last
  * collection, so steady-state maintenance cost follows the ingest rate,
  * not the table size. Pruning reads the stats table (one row per file)
  * and hands the surviving paths to the scan.
  *
  * Driver-manifest contract: [[refresh]] and [[prunedRead]] collect FILE
  * PATH lists (never data) to the driver — manifest-scale state, the same
  * posture as a table format's log replay (Delta's driver-side `add`
  * actions, Iceberg's manifest scan). That is bounded by file COUNT, so
  * both take a `maxDriverFiles` cap (default [[DefaultMaxDriverFiles]],
  * ~1M paths ≈ low hundreds of MB of driver heap) and FAIL LOUD past it
  * instead of silently ballooning the driver: the remedy is a larger cap
  * on a bigger driver, a tighter `statsFilter`, or per-prefix refreshes.
  */
object FileStats {

  /** Default ceiling on driver-collected file paths (see the
    * driver-manifest contract above). */
  val DefaultMaxDriverFiles: Int = 1000000

  private def statsDir(tablePath: String) = s"$tablePath/_graft_stats"

  /** Collect up to `cap` strings; one row past it fails loud. */
  private def boundedPaths(df: DataFrame, cap: Int, what: String): Seq[String] = {
    require(cap > 0, s"maxDriverFiles must be > 0, got $cap")
    // saturate, don't overflow: cap = Int.MaxValue must behave as the
    // documented "raise the cap" remedy, not crash on a negative limit
    val probe = math.min(cap.toLong + 1, Int.MaxValue.toLong).toInt
    val got = df.limit(probe).collect().map(_.getString(0)).toSeq
    if (got.size > cap) throw new IllegalStateException(
      s"$what exceeds maxDriverFiles=$cap file paths: the zone-map " +
        "manifest is driver-resident by design (a table-format log-replay " +
        "posture); raise maxDriverFiles if the driver heap allows, tighten " +
        "the stats filter, or refresh/prune per path prefix")
    got
  }

  /** Per-file stats rows for `files` (or every file when None):
    * (file_path, n_rows, <c>_min, <c>_max per stats column). */
  private def computeStats(spark: SparkSession, tablePath: String,
      cols: Seq[String], files: Option[Seq[String]]): DataFrame = {
    val src = spark.read.parquet(tablePath)
      .select(col("_metadata.file_path").as("file_path") +:
        cols.map(col): _*)
    val scoped = files match {
      case Some(fs) if fs.isEmpty => src.limit(0)
      case Some(fs) => src.filter(col("file_path").isin(fs: _*))
      case None => src
    }
    scoped.groupBy(col("file_path"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
  }

  /** (Re)build the stats table from scratch for `cols`. */
  def collect(spark: SparkSession, tablePath: String,
      cols: Seq[String]): Unit =
    computeStats(spark, tablePath, cols, None)
      .write.mode("overwrite").parquet(statsDir(tablePath))

  /** Incrementally refresh: stat only files absent from the existing
    * stats table (or everything if none exists yet). Files deleted since
    * the last collection drop out of the refreshed table. Returns the
    * number of newly statted files. */
  def refresh(spark: SparkSession, tablePath: String,
      cols: Seq[String],
      maxDriverFiles: Int = DefaultMaxDriverFiles): Long = {
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(statsDir(tablePath)))) {
      collect(spark, tablePath, cols)
      return spark.read.parquet(statsDir(tablePath)).count()
    }
    val old = spark.read.parquet(statsDir(tablePath))
    val current = spark.read.parquet(tablePath)
      .select(col("_metadata.file_path").as("file_path")).distinct()
    val known = old.select("file_path")
    val newFiles = boundedPaths(
      current.join(known, Seq("file_path"), "left_anti"),
      maxDriverFiles, s"refresh($tablePath): new-file list")
    val fresh = computeStats(spark, tablePath, cols, Some(newFiles))
    // keep only stats for files that still exist, plus the fresh rows
    val kept = old.join(current, Seq("file_path"), "left_semi")
    val out = kept.unionByName(fresh).localCheckpoint(true)
    out.write.mode("overwrite").parquet(statsDir(tablePath))
    newFiles.size.toLong
  }

  /** The stats table (one row per data file). */
  def stats(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(statsDir(tablePath))

  /** Zone-map helper: files whose [min, max] range of `c` may intersect
    * [lo, hi] (NULL stats — all-null or missing column — keep the file:
    * pruning must never be unsound). */
  def rangeOverlaps(c: String, lo: Any, hi: Any): Column =
    col(s"${c}_min").isNull || col(s"${c}_max").isNull ||
      (col(s"${c}_min") <= lit(hi) && col(s"${c}_max") >= lit(lo))

  /** Read only the files whose stats row satisfies `statsFilter` (a
    * predicate over the stats schema — compose with [[rangeOverlaps]]).
    * The caller still applies the row-level filter: zone maps bound which
    * FILES can match, not which rows do. Returns an empty frame with the
    * table schema when nothing survives. */
  def prunedRead(spark: SparkSession, tablePath: String,
      statsFilter: Column,
      maxDriverFiles: Int = DefaultMaxDriverFiles): DataFrame = {
    val files = boundedPaths(
      stats(spark, tablePath).filter(statsFilter).select("file_path"),
      maxDriverFiles, s"prunedRead($tablePath): surviving-file list")
    if (files.isEmpty) spark.read.parquet(tablePath).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }
}
