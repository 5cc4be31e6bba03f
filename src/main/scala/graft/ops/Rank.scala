package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ranking without the single-task trap. `row_number() OVER
  * (ORDER BY ...)` with no PARTITION BY moves every row to ONE task
  * (Spark even warns) — unusable at corpus scale. [[globalRank]] gets the
  * same numbers with the sort machinery Spark scales: one range exchange,
  * per-partition local ranks, and a broadcast of the per-partition row
  * counts turned into exclusive prefix offsets (the q_pack/stratified
  * two-pass scheme, keyed by RANGE position instead of a hash shard
  * because rank needs the total ORDER, not just balance).
  *
  * The rank is a pure function of the row's position in the total order:
  * range boundaries shift with sampling, but local-rank + offset always
  * reconstructs the same global position — so results are deterministic
  * (and oracle-checkable) whenever `order` is a TOTAL order (callers add
  * a unique tiebreak column; ties otherwise rank arbitrarily, like any
  * row_number). */
object Rank {

  /** Append `rankCol` = 1-based global row_number by `order`. */
  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String,
      numPartitions: Option[Int] = None): DataFrame = {
    require(order.nonEmpty, "globalRank needs at least one order column")
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(df.columns.contains).next()
    val pid = fresh("_grk_pid")
    val loc = fresh("_grk_loc")
    val off = fresh("_grk_off")
    val ranged = numPartitions
      .fold(df.repartitionByRange(order: _*))(
        n => df.repartitionByRange(n, order: _*))
      .withColumn(pid, spark_partition_id())
    val wLocal = Window.partitionBy(col(pid)).orderBy(order: _*)
    val local = ranged.withColumn(loc, row_number().over(wLocal))
    // per-partition counts -> exclusive prefix offsets (rows = partition
    // count, driver-scale at any data size)
    val wOff = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(pid)).agg(max(col(loc)).as("_c"))
      .withColumn(off, coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .select(col(pid), col(off))
    local.join(broadcast(offsets), Seq(pid))
      .withColumn(rankCol, col(off) + col(loc))
      .drop(pid, loc, off)
  }
}
