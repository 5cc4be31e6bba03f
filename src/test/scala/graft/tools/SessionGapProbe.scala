package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pin session_window's gap-boundary strictness for the
  * q_stream_session_mart oracle: does an event arriving EXACTLY at
  * last_event + gap merge into the session or start a new one?
  * (Docs say the window is [start, last + gap) — expect a new one.)
  * Also pins the emitted window's end = last event + gap. */
object SessionGapProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val gapUs = 1800000000L
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      .getTime * 1000L
    // u1: three events exactly gap apart (boundary); u2: gap-1µs apart
    // (must merge); u3: gap+1µs apart (must split)
    val rows = Seq(
      ("u1", t0), ("u1", t0 + gapUs), ("u1", t0 + 2 * gapUs),
      ("u2", t0), ("u2", t0 + gapUs - 1L),
      ("u3", t0), ("u3", t0 + gapUs + 1L))
    val df = rows.toDF("u", "ts_us")
      .withColumn("ev", timestamp_micros(col("ts_us")))
    val out = df.groupBy(col("u"),
        session_window(col("ev"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("u"), unix_micros(col("session_window.start")).as("s"),
        unix_micros(col("session_window.end")).as("e"), col("n"))
      .orderBy("u", "s").collect()
    out.foreach(r => println(s"[probe] ${r.getString(0)} " +
      s"start=${r.getLong(1) - t0} end=${r.getLong(2) - t0} " +
      s"n=${r.getLong(3)}"))
    spark.stop()
  }
}
