package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe pinning `dropDuplicatesWithinWatermark` mechanics for
  * the q_stream_dedup_wm oracle — specifically:
  *
  *  1. which watermark the STATE LOOKUP honors during a batch (does a
  *     duplicate of an entry that is expired-by-the-current-watermark
  *     but was alive at the previous one re-emit or drop?),
  *  2. whether the late filter keeps its one-batch lag in front of the
  *     dedup operator (the LateDropProbe finding),
  *  3. what expiresAt arithmetic the state uses (event time + delay,
  *     ms-floored like the watermark).
  *
  * Fixture (delay 1h, all times on one day):
  *   w1 (b0): A@09:50, B@10:30, C@12:00  → post-b0 wm = 11:00
  *   mid (b1): empty                      → late filter catches up
  *   w2 (b2): A2@11:30 (A expired 10:50 < 11:00 → expect EMIT),
  *            B2@11:40 (B alive til 11:30 ≥ 11:00 → expect DROP),
  *            C2@11:20 (C alive til 13:00 → expect DROP),
  *            D @11:10 (new key → EMIT),
  *            E @10:30 (late, < 11:00 → filter DROP)
  * Expected emitted: b0 {A,B,C}, b2 {A2, D}.
  */
object DedupWmProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def us(hhmm: String): Long =
      java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00").getTime * 1000L
    val tmp = java.nio.file.Files.createTempDirectory("dedupwm-probe")
    val in = tmp.resolve("in"); java.nio.file.Files.createDirectories(in)
    def wave(name: String, rows: Seq[(String, Long)], mtime: Long): Unit = {
      val df = rows.toDF("k", "ts_us")
      val stagedir = tmp.resolve(s"stage_$name")
      df.coalesce(1).write.parquet(stagedir.toString)
      val part = stagedir.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = in.resolve(s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
      ()
    }
    val now = System.currentTimeMillis()
    // F expires EXACTLY at the watermark (10:00 + 1h == 11:00) — pins
    // the eviction strictness; G carries sub-ms micros (expires
    // 10:59:59.999300 — evicted only if state keeps micros, kept if it
    // floors to ms 10:59:59.999 < 11:00... both floor low; H expires
    // 11:00:00.000700 — kept only if micros survive (ms-floor would be
    // 11:00:00.000, not < wm, also kept; H' at 10:59:59.999700:
    // ms-floor 10:59:59.999 < wm evicted, micros 10:59:59.999700 < wm
    // evicted too — use I expiring 11:00:00.000300: micros not < wm →
    // kept; ms-floor 11:00:00.000 not < wm → kept. Boundary only
    // distinguishes at exact == so F is the real probe.)
    wave("w1", Seq(("A", us("09:50")), ("B", us("10:30")),
      ("C", us("12:00")), ("F", us("10:00")),
      ("G", us("10:00") - 700L), ("J", us("10:00") + 400L)),
      now - 600000L)
    wave("w2mid", Seq.empty, now - 300000L)
    wave("w3", Seq(("A", us("11:30")), ("B", us("11:40")),
      ("C", us("11:20")), ("D", us("11:10")), ("E", us("10:30")),
      ("F", us("11:45")), ("G", us("11:50")), ("J", us("11:55")),
      ("K", us("11:00")), ("L", us("11:00") + 500L)), now)
    val schema = Seq(("x", 0L)).toDF("k", "ts_us").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(in.toString)
    val q = stream
      .withColumn("ev_time", timestamp_micros(col("ts_us")))
      .withWatermark("ev_time", "1 hour")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val rows = b.select("k", "ts_us").collect()
          .map(r => s"${r.getString(0)}@${r.getLong(1)}").sorted
        println(s"[probe] batch $id emitted: ${rows.mkString(", ")}")
      }
      .option("checkpointLocation", tmp.resolve("cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.toSeq.foreach { p =>
      println(s"[probe] progress batchId=${p.batchId} " +
        s"in=${p.numInputRows} wm=${p.eventTime.get("watermark")} " +
        s"state=${p.stateOperators.toSeq.map(so =>
          (so.numRowsDroppedByWatermark, so.numRowsUpdated,
            so.numRowsTotal, so.numRowsRemoved))}")
    }
    spark.stop()
  }
}
