package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global and grouped ranking without the single-task trap. `row_number()
  * OVER (ORDER BY ...)` with no PARTITION BY moves every row to ONE task
  * (Spark even warns); `PARTITION BY source` with few huge groups does the
  * same per group. Both forms here ride the sort machinery Spark scales —
  * ONE range exchange on the order keys, per-partition positions, and a
  * broadcast of per-partition counts turned into exclusive prefix offsets
  * (the q_pack/stratified two-pass scheme, keyed by RANGE position because
  * rank needs the total ORDER, not just balance).
  *
  * Per-partition positions come from `monotonically_increasing_id()` over
  * the range-sorted partitions — the id encodes (partition << 33 | local
  * offset), so pid and the 0-based local position decode with two bit ops
  * and NO window: a pid-keyed window would make EnsureRequirements insert
  * a second DATA-SIZED hash exchange (it cannot know pid-equal rows are
  * already co-located). Requires < 2^33 rows per partition (Spark's own
  * monotonically_increasing_id bound; ~8.5B — unreachable with sane
  * partition sizing).
  *
  * The rank is a pure function of the row's position in the total order:
  * range boundaries shift with sampling, but local position + offset
  * always reconstructs the same global position — so results are
  * deterministic (and oracle-checkable) whenever the order is TOTAL
  * (callers add a unique tiebreak column; ties otherwise rank
  * arbitrarily, like any row_number). */
object Rank {

  /** Append `rankCol` = 1-based row_number by `order` WITHIN each group,
    * plus (optionally) `countCol` = the group's row count — without ever
    * windowing on the group key. Intended for LOW-cardinality groups with
    * data-sized members (sources, languages — the calibration strata):
    * the offsets table has ~(#groups + #partitions) rows and is
    * broadcast. High-cardinality groups (doc-keyed) don't skew and should
    * use a plain window. NULL group keys are ranked as their own group
    * (null-safe join).
    *
    * `materialize` (default true) lazily localCheckpoints the positioned
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
    rankCore(df, groupCols, order, rankCol, countCol, numPartitions,
      materialize)
  }

  /** Append `rankCol` = 1-based global row_number by `order`.
    * `materialize` as in [[groupedRank]]. */
  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String,
      numPartitions: Option[Int] = None,
      materialize: Boolean = true): DataFrame =
    rankCore(df, Nil, order, rankCol, None, numPartitions, materialize)

  /** One implementation for both forms: `groupCols` empty = global. */
  private def rankCore(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], rankCol: String, countCol: Option[String],
      numPartitions: Option[Int], materialize: Boolean): DataFrame = {
    require(order.nonEmpty, "rank needs at least one order column")
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(df.columns.contains).next()
    val mid = fresh("_grk_mid")
    val pid = fresh("_grk_pid")
    val off = fresh("_grk_off")
    val first = fresh("_grk_first")
    val tot = fresh("_grk_tot")
    val gcols = groupCols.map(col)
    val keys = gcols ++ order
    // range exchange + in-partition sort; the id projection sits ABOVE
    // the sort (non-deterministic expressions are optimizer barriers, so
    // it cannot be pushed below) and streams in sorted order
    val positioned0 = numPartitions
      .fold(df.repartitionByRange(keys: _*))(
        n => df.repartitionByRange(n, keys: _*))
      .sortWithinPartitions(keys: _*)
      .withColumn(mid, monotonically_increasing_id())
      .withColumn(pid, shiftright(col(mid), 33))
    val positioned =
      if (materialize) positioned0.localCheckpoint(false) else positioned0
    // per-(group, partition) extent: first id + row count. Partial
    // aggregation collapses each partition to ~#groups rows before the
    // exchange, so the aggregate's shuffle is tiny at any data size.
    val stats = positioned.groupBy(gcols :+ col(pid): _*)
      .agg(min(col(mid)).as(first), count(lit(1)).as("_c"))
    // per-group exclusive prefix offsets over pid, plus group totals —
    // windows over the driver-scale stats frame only
    val wOff = Window.partitionBy(gcols: _*).orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gcols: _*)
    val offsets = stats
      .withColumn(off, coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn(tot, sum(col("_c")).over(wTot))
      .select(groupCols.map(c => col(c).as(s"_grkj_$c")) ++
        Seq(col(pid).as(s"_grkj_$pid"), col(first), col(off),
          col(tot)): _*)
    // null-safe equi-join on (group, pid): NULL groups must keep ranks.
    // Every offsets-side column is aliased _grkj_* so no self-join
    // ambiguity exists for Spark to second-guess. Broadcast: the data
    // side needs no redistribution.
    val cond = (groupCols.map(c => positioned(c) <=> col(s"_grkj_$c")) :+
      (col(pid) === col(s"_grkj_$pid"))).reduce(_ && _)
    val joined = positioned.join(broadcast(offsets), cond)
      .withColumn(rankCol, col(off) + (col(mid) - col(first)) + lit(1L))
    countCol.fold(joined)(c => joined.withColumn(c, col(tot)))
      .drop((Seq(mid, pid, s"_grkj_$pid", first, off, tot) ++
        groupCols.map(c => s"_grkj_$c")): _*)
  }
}
