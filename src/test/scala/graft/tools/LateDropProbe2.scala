package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal watermark-drop semantics probe via MemoryStream: two
  * explicit batches, known timestamps, window 1h, delay 30min. */
object LateDropProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[Long](spark) // epoch seconds
    val out = java.nio.file.Files.createTempDirectory("ldp2")
      .resolve("out").toString
    val q = mem.toDF.toDF("sec")
      .withColumn("ev_time", timestamp_seconds(col("sec")))
      .withWatermark("ev_time", "30 minutes")
      .groupBy(window(col("ev_time"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_seconds(col("window.start")).as("ws"), col("n"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getLong(1)))
        println(s"[probe2] batch $id emitted: ${rows.mkString(", ")}")
        b.write.mode("append").parquet(out); ()
      }
      .start()
    def hours(h: Double): Long = (h * 3600).toLong
    // batch 0: rows at 10:00 and 10:10 -> wm after = 09:40
    mem.addData(hours(10.0), hours(10.0) + 600)
    q.processAllAvailable()
    // batch 1: late row at 01:00 (window end 02:00 <= 09:40 -> drop?),
    // row at 09:20 (window [09:00,10:00) end 10:00 > 09:40 -> keep?),
    // row at 11:00 (advances wm to 10:30)
    mem.addData(hours(1.0), hours(9.0) + 1200, hours(11.0))
    q.processAllAvailable()
    // batch 2: row at 13:00 -> wm 12:30; emits closed windows
    mem.addData(hours(13.0))
    q.processAllAvailable()
    q.stop()
    println("[probe2] final table:")
    spark.read.parquet(out).orderBy(col("ws"))
      .collect().foreach(r => println(s"[probe2]   ws=${r.getLong(0)} n=${r.getLong(1)}"))
    spark.stop()
  }
}
