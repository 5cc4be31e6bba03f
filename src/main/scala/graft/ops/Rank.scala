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

  /** Append `rankCol` = 1-based row_number by `order` WITHIN each group,
    * plus (optionally) `countCol` = the group's row count — without ever
    * windowing on the group key alone. `row_number() OVER (PARTITION BY
    * source ORDER BY …)` sends each group through ONE task; when groups
    * are few and huge (sources, languages — the calibration strata), that
    * is the q_pack low-cardinality-window trap. Here the data takes one
    * range exchange on (group ++ order) — every partition balanced
    * regardless of group skew — with per-(group, partition) local ranks
    * stitched by broadcast prefix offsets, exactly [[globalRank]] with the
    * prefix scan keyed per group.
    *
    * Contract: the offsets table has ~(#groups + #partitions) rows and is
    * broadcast — intended for LOW-cardinality groups with data-sized
    * members. High-cardinality groups (doc-keyed) don't skew and should
    * use a plain window. NULL group keys are ranked as their own group
    * (null-safe join). Deterministic whenever (group ++ order) is a total
    * order.
    *
    * `materialize` (default true) lazily localCheckpoints the ranked
    * frame: it feeds BOTH the offsets aggregate and the join side, and
    * Spark cannot reuse an exchange one branch aggregates further — an
    * unmaterialized rank recomputes the scan + order-key projection +
    * range exchange twice, and (worse) leaves correctness hostage to the
    * range sampler drawing identical boundaries on both executions.
    * Disable only to inspect the full unmaterialized plan. */
  def groupedRank(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      rankCol: String, countCol: Option[String] = None,
      numPartitions: Option[Int] = None,
      materialize: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "groupedRank needs at least one group col")
    require(order.nonEmpty, "groupedRank needs at least one order column")
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(df.columns.contains).next()
    val pid = fresh("_grk_pid")
    val loc = fresh("_grk_loc")
    val off = fresh("_grk_off")
    val tot = fresh("_grk_tot")
    val gcols = groupCols.map(col)
    val keys = gcols ++ order
    val ranged = numPartitions
      .fold(df.repartitionByRange(keys: _*))(
        n => df.repartitionByRange(n, keys: _*))
      .withColumn(pid, spark_partition_id())
    val wLocal = Window.partitionBy(col(pid) +: gcols: _*).orderBy(order: _*)
    val local0 = ranged.withColumn(loc, row_number().over(wLocal))
    val local = if (materialize) local0.localCheckpoint(false) else local0
    // (group, partition) counts -> per-group exclusive prefix offsets and
    // group totals (rows ~ #groups + #partitions: driver-scale)
    val wOff = Window.partitionBy(gcols: _*).orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gcols: _*)
    val counts = local.groupBy(gcols :+ col(pid): _*)
      .agg(max(col(loc)).as("_c"))
    val offsets = counts
      .withColumn(off, coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn(tot, sum(col("_c")).over(wTot))
      .select(groupCols.map(c => col(c).as(s"_grkj_$c")) ++
        Seq(col(pid).as(s"_grkj_$pid"), col(off), col(tot)): _*)
    // null-safe equi-join on (group, pid): NULL groups must keep ranks.
    // Every offsets-side column is aliased _grkj_* so no self-join
    // ambiguity exists for Spark to second-guess.
    val cond = groupCols.map(c => local(c) <=> col(s"_grkj_$c"))
      .reduce(_ && _) && col(pid) === col(s"_grkj_$pid")
    val joined = local.join(broadcast(offsets), cond)
      .withColumn(rankCol, col(off) + col(loc))
    countCol.fold(joined)(c => joined.withColumn(c, col(tot)))
      .drop((Seq(pid, s"_grkj_$pid", loc, off, tot) ++
        groupCols.map(c => s"_grkj_$c")): _*)
  }

  /** Append `rankCol` = 1-based global row_number by `order`.
    * `materialize` as in [[groupedRank]]: the ranked frame feeds both the
    * offsets aggregate and the join, so it checkpoints once by default. */
  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String,
      numPartitions: Option[Int] = None,
      materialize: Boolean = true): DataFrame = {
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
    val local0 = ranged.withColumn(loc, row_number().over(wLocal))
    val local = if (materialize) local0.localCheckpoint(false) else local0
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
