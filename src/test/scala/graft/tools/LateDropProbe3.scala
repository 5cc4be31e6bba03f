package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: what do the progress metrics show for the staged
  * 3-batch late-drop stream — per-batch eventTime watermark,
  * numInputRows, numRowsDroppedByWatermark? */
object LateDropProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.analytics.Tables.withEpochMicros(
        graft.analytics.Tables(spark, dir, "events"))
      .select(col("event_id"), col("ts_us"))
    val tmp = java.nio.file.Files.createTempDirectory("latedrop-probe3")
    val in = tmp.resolve("in"); java.nio.file.Files.createDirectories(in)
    def wave(name: String, df: DataFrame, mtime: Long): Unit = {
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
    wave("w1", ev.filter(col("event_id") % 3 =!= 0), now - 600000L)
    wave("mid", ev.limit(0), now - 300000L)
    wave("w2", ev.filter(col("event_id") % 3 === 0), now)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(in.toString)
    val out = tmp.resolve("out").toString
    val q = stream
      .withColumn("ev_time", timestamp_micros(col("ts_us")))
      .withWatermark("ev_time", "3599999 milliseconds")
      .groupBy(window(col("ev_time"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("n"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        println(s"[probe] batch $id emitted ${b.count()} windows")
        b.write.mode("append").parquet(out); ()
      }
      .option("checkpointLocation", tmp.resolve("cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.toSeq.zipWithIndex.foreach { case (p, i) =>
      println(s"[probe] progress $i batchId=${p.batchId} " +
        s"inputRows=${p.numInputRows} eventTime=${p.eventTime} " +
        s"stateOps=${p.stateOperators.toSeq.map(so =>
          (so.numRowsDroppedByWatermark, so.numRowsUpdated,
           so.numRowsTotal))}")
    }
    val delayMs = 3599999L
    val wm1 = ev.filter(col("event_id") % 3 =!= 0)
      .agg(max(floor(col("ts_us") / 1000L))).collect()(0).getLong(0) - delayMs
    val wmf = ev.agg(max(floor(col("ts_us") / 1000L)))
      .collect()(0).getLong(0) - delayMs
    println(s"[probe] wm1(ms)=$wm1 = ${java.time.Instant.ofEpochMilli(wm1)}")
    println(s"[probe] wmf(ms)=$wmf = ${java.time.Instant.ofEpochMilli(wmf)}")
    val lateDropped = ev.filter(col("event_id") % 3 === 0)
      .filter((floor(col("ts_us") / 1000000L / 3600L) + 1L) * 3600000L
        <= wm1).count()
    println(s"[probe] oracle-predicted w2 drops=$lateDropped")
    spark.stop()
  }
}
