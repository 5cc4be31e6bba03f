package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling — the missing-sensor-reading / sparse-metric
  * repair pass (north-star extension; sibling of the date-spine
  * densification `q_date_spine`).
  *
  * Both operators are per-key ordered windows: ONE hash exchange on the
  * key; forward and backward frames share the partitioning and sort, so
  * Spark plans them without a second exchange or sort. Keys are
  * high-cardinality (users, devices, series ids) ⇒ skew-proof at scale.
  * `orderCols` must be a TOTAL order per key (add a tie-breaker column —
  * the W1 dedup determinism rule) or fill values at equal timestamps are
  * tie-ambiguous.
  */
object TimeSeries {

  /** Last-observation-carried-forward: fill NULLs in each of `valueCols`
    * with the latest preceding non-NULL value of the same key. Leading
    * NULLs (no prior observation) stay NULL. */
  def locf(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Linear interpolation of NULL `valueCol` rows between their nearest
    * non-NULL neighbors in time:
    * `v = v0 + (v1 − v0) · (t − t0) / (t1 − t0)` with `t` taken from the
    * NUMERIC `timeNum` column (e.g. epoch micros — engine-portable,
    * unlike timestamp arithmetic). Edges degrade gracefully: only a
    * preceding neighbor ⇒ carry it forward (LOCF), only a following one
    * ⇒ carry it backward, neither ⇒ NULL. Non-NULL rows pass through
    * untouched. */
  def interpolate(df: DataFrame, keyCol: String, timeNum: String,
      orderCols: Seq[Column], valueCol: String): DataFrame = {
    val back = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = col(timeNum).cast("double")
    val observedT = when(col(valueCol).isNotNull, col(timeNum))
    val v0 = last(col(valueCol), ignoreNulls = true).over(back)
    val t0 = last(observedT, ignoreNulls = true).over(back).cast("double")
    val v1 = first(col(valueCol), ignoreNulls = true).over(fwd)
    val t1 = first(observedT, ignoreNulls = true).over(fwd).cast("double")
    df.withColumn(valueCol,
      when(col(valueCol).isNotNull, col(valueCol))
        .when(v0.isNotNull && v1.isNotNull && t1 =!= t0,
          v0 + (v1 - v0) * (t - t0) / (t1 - t0))
        .when(v0.isNotNull && v1.isNotNull, v0) // degenerate t1 == t0
        .when(v0.isNotNull, v0)
        .otherwise(v1))
  }
}
