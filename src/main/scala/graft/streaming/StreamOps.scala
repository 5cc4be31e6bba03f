package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming analytics (T3–T6) over Structured Streaming.
  * Each transform is a pure `DataFrame => DataFrame` that works on a
  * streaming OR batch frame (Spark's unified semantics) — batch runs give
  * the DuckDB-checkable equivalents, streaming runs are exercised in
  * StreamingSpec with MemoryStream + manual event clocks.
  *
  * Scale posture: event-time windowed aggregation shuffles once on
  * (window, keys); state store size is bounded by the watermark horizon ×
  * key cardinality. Watermarks are REQUIRED on unbounded streams — without
  * one, state grows without bound at 100 TB/day rates. Session windows
  * merge on overlap in the state store (per-key state, skew follows key
  * skew — salt hot keys upstream if a single key dominates).
  */
object StreamOps {

  /** T4: event-time watermark — late rows beyond `delay` are dropped from
    * stateful operators downstream. */
  def withLateDrop(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  private def flattenWindow(agged: DataFrame, winCol: String,
      startAs: String, endAs: String): DataFrame =
    agged.select(col(s"$winCol.start").as(startAs)
      +: col(s"$winCol.end").as(endAs)
      +: agged.columns.filter(_ != winCol).map(col).toIndexedSeq: _*)

  /** T3: tumbling event-time windows with per-window aggregates
    * (aggs must carry their own aliases). */
  def tumblingAgg(df: DataFrame, tsCol: String, width: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    flattenWindow(
      df.groupBy(window(col(tsCol), width) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*),
      "window", "win_start", "win_end")

  /** T3: sliding windows (width, slide). */
  def slidingAgg(df: DataFrame, tsCol: String, width: String, slide: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    flattenWindow(
      df.groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*),
      "window", "win_start", "win_end")

  /** T5: session windows — events gap-merged per key while gaps < `gap`. */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    flattenWindow(
      df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*),
      "session_window", "sess_start", "sess_end")

  /** T6: streaming dedup with bounded state — duplicates of a key arriving
    * within the watermark horizon are dropped; state for keys older than
    * the watermark is evicted. The streaming sibling of the silver batch
    * dedup (W1). */
  def streamingDedup(df: DataFrame, keys: Seq[String], tsCol: String,
      delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
