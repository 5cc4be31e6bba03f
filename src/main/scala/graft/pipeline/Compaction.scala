package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for streaming-append parquet tables — the OSS
  * analog of the reference's `delta.autoOptimize.autoCompact`
  * (`01_bronze_ingestion.py:80-81`): a triggered bronze stream commits one
  * file per partition per micro-batch, and at daily-trigger × many-entity
  * scale the file count (not the byte count) becomes the scan bottleneck
  * (driver listing + task scheduling overhead).
  *
  * The streaming parquet sink is exactly-once BECAUSE of its
  * `_spark_metadata` log: readers of the sink directory trust the log,
  * not the directory listing, and the resumed stream appends entry
  * `batchId+1`. Compaction therefore must REWRITE that log, not just the
  * data files — this is exactly the bookkeeping a table format (Delta/
  * Iceberg) institutionalizes; on a bare parquet sink we do it by hand:
  *
  *  1. read the table, coalesce to ⌈bytes/target⌉ files in a staging dir;
  *  2. synthesize a fresh sink log in staging: empty entries for batches
  *     0..N−1 and entry N (the latest committed batch, `.compact`-named
  *     when N lands on the sink's compact-interval boundary) listing the
  *     compacted files under their FINAL path;
  *  3. two-rename swap of the directory.
  *
  * Writers must be paused around the call (same operational contract as
  * OPTIMIZE on a non-transactional store); the SOURCE checkpoint is
  * untouched, so ingestion resumes at batch N+1 against the new log.
  */
object Compaction {

  /** Returns (filesBefore, filesAfter). */
  def compactPath(spark: SparkSession, tablePath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(tablePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(
      totalBytes.toDouble / targetFileBytes).toInt)
    if (dataFiles.length <= targetFiles)
      return (dataFiles.length, dataFiles.length)

    // latest committed sink batch id (entries may be "<id>" or "<id>.compact")
    val metaDir = new Path(path, "_spark_metadata")
    val latestBatch: Option[Long] =
      if (fs.exists(metaDir))
        fs.listStatus(metaDir).toSeq
          .map(_.getPath.getName.stripSuffix(".compact"))
          .filter(_.forall(_.isDigit)).map(_.toLong).maxOption
      else None

    val staging = new Path(tablePath + "_compacting")
    val retired = new Path(tablePath + "_retired")
    fs.delete(staging, true); fs.delete(retired, true)
    spark.read.parquet(tablePath)
      .coalesce(targetFiles)
      .write.parquet(staging.toString)
    fs.delete(new Path(staging, "_SUCCESS"), false)

    latestBatch.foreach { n =>
      val compactInterval = spark.conf
        .get("spark.sql.streaming.fileSink.log.compactInterval", "10").toInt
      val stagingMeta = new Path(staging, "_spark_metadata")
      fs.mkdirs(stagingMeta)
      def write(p: Path, s: String): Unit = {
        val out = fs.create(p, true)
        try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
      // CompactibleFileStreamLog derives file names arithmetically: every
      // batch id with (id+1) % compactInterval == 0 MUST be "<id>.compact"
      // (readers/resume start from the LATEST such boundary). An empty
      // "v1\n" compact is valid because all live entries are in batch n.
      // Only the latest boundary and the deltas after it are ever read,
      // so synthesize exactly those — writing every historical batch file
      // is O(total batches) driver-side file creations (minutes at years
      // of frequent triggers) for files no reader opens.
      val boundary = ((n + 1) / compactInterval) * compactInterval - 1
      if (boundary >= 0 && boundary < n)
        write(new Path(stagingMeta, s"$boundary.compact"), "v1\n")
      val firstDelta = if (boundary >= 0) boundary + 1 else 0L
      (firstDelta until n).foreach { i =>
        write(new Path(stagingMeta, i.toString), "v1\n")
      }
      val entries = fs.listStatus(staging)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map { f =>
          val finalPath = new Path(fs.makeQualified(path), f.getPath.getName)
          s"""{"path":"${finalPath.toUri}","size":${f.getLen},""" +
            s""""isDir":false,"modificationTime":${f.getModificationTime},""" +
            s""""blockReplication":1,"blockSize":${f.getBlockSize},""" +
            s""""action":"add"}"""
        }
      val name = if ((n + 1) % compactInterval == 0) s"$n.compact" else n.toString
      write(new Path(stagingMeta, name), "v1\n" + entries.mkString("\n"))
    }

    // two-rename swap; pause writers around this call. Hadoop rename
    // reports most failures by returning FALSE, not throwing — an
    // unchecked first rename would leave the live table in place and the
    // second rename would nest staging INSIDE it (dst-exists-as-dir
    // semantics); an unchecked second would lose the table path entirely.
    if (!fs.rename(path, retired))
      throw new IllegalStateException(
        s"compaction aborted: could not retire $path (rename returned false); " +
          "table untouched, staging left at " + staging)
    if (!fs.rename(staging, path)) {
      val rolledBack = fs.rename(retired, path)
      throw new IllegalStateException(
        s"compaction failed: could not move $staging into place" +
          (if (rolledBack) s"; original table RESTORED at $path"
           else s"; MANUAL RECOVERY NEEDED: original at $retired"))
    }
    fs.delete(retired, true)

    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
  }
}
