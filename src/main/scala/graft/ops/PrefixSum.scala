package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField,
  StructType}

/** GLOBAL running sums without the single-task trap — the weighted
  * companion to [[Rank]]: `sum(x) OVER (ORDER BY ...)` with no PARTITION
  * BY funnels every row through ONE task, which is fatal when the input
  * is data-sized (a continuous column's distinct-value table is ~row
  * count, not a compact aggregate). Same two-pass scheme as [[Rank]]:
  * ONE range exchange on the order keys, per-partition work, and a
  * broadcast of per-partition totals turned into exclusive prefix
  * offsets.
  *
  * [[Rank]] decodes positions from `monotonically_increasing_id` purely
  * declaratively; a WEIGHTED prefix sum has no such pure-function trick
  * (the local cumulative depends on every earlier row's value), so the
  * per-partition pass is one narrow `mapPartitions` — the justified
  * imperative exception: a scan-order-dependent accumulation over an
  * already-sorted partition, no shuffle, no state beyond one long per
  * summed column. The declarative alternative (window PARTITION BY the
  * partition id) would make EnsureRequirements insert a second
  * DATA-SIZED hash exchange, because Catalyst cannot know pid-equal rows
  * are already co-located.
  *
  * Values must be LongType (the repo's exact-integer discipline — counts
  * or floor-micro fixed point); NULLs contribute 0. Results are
  * deterministic whenever the order is total on the summed frame (range
  * boundaries shift with sampling, but local sum + offset always
  * reconstructs the same global prefix); with ties in the order key the
  * per-row sums are tie-order-dependent, exactly like any running-sum
  * window. */
object PrefixSum {

  /** Append, for each `(valueCol, outCol)` in `sums`, the INCLUSIVE
    * global running sum of `valueCol` in the total order given by
    * `order`. Input columns pass through unchanged; output partitioning
    * is the range partitioning of `order` (each partition internally
    * sorted). */
  def runningSums(df: DataFrame, order: Seq[Column],
      sums: Seq[(String, String)],
      numPartitions: Option[Int] = None): DataFrame = {
    require(order.nonEmpty, "runningSums needs at least one order column")
    require(sums.nonEmpty, "runningSums needs at least one value column")
    val inCols = df.columns
    sums.foreach { case (v, out) =>
      require(inCols.contains(v), s"value column $v missing from input")
      require(!inCols.contains(out) && v != out,
        s"output column $out collides with an input column")
      require(df.schema(v).dataType == LongType,
        s"value column $v must be LongType (exact-integer discipline), " +
          s"got ${df.schema(v).dataType}")
    }
    val outNames = sums.map(_._2)
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(c => inCols.contains(c) || outNames.contains(c)).next()
    val pid = fresh("_ps_pid")
    // 1. total order: range exchange + in-partition sort
    val positioned = numPartitions
      .fold(df.repartitionByRange(order: _*))(
        n => df.repartitionByRange(n, order: _*))
      .sortWithinPartitions(order: _*)
    // 2. ONE narrow pass: partition id + per-partition inclusive sums
    val valueIdx = sums.map { case (v, _) => positioned.schema.fieldIndex(v) }
      .toArray
    val outSchema = StructType(positioned.schema.fields ++
      (StructField(pid, IntegerType, nullable = false) +:
        sums.map { case (_, out) =>
          StructField(out, LongType, nullable = false)
        }))
    val local = positioned.mapPartitions { it =>
      val p = TaskContext.getPartitionId()
      val acc = new Array[Long](valueIdx.length)
      it.map { r =>
        var i = 0
        while (i < acc.length) {
          if (!r.isNullAt(valueIdx(i))) acc(i) += r.getLong(valueIdx(i))
          i += 1
        }
        Row.fromSeq(r.toSeq ++ (p +: acc.toSeq))
      }
    }(Encoders.row(outSchema))
      // consumed by BOTH the offsets aggregate and the join side: pin one
      // execution (and one set of range boundaries) — the Rank rationale
      .localCheckpoint(false)
    // 3. per-partition totals → exclusive prefix offsets: windows over
    //    ≤ #partitions rows only. Totals re-sum the ORIGINAL value
    //    columns (not max-of-local-cumulative, which is wrong the moment
    //    a value is negative). Empty partitions simply don't appear —
    //    they contribute 0 by construction.
    val wOff = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = local.groupBy(col(pid))
      .agg(sum(col(sums.head._1)).as(s"_pt_${outNames.head}"),
        sums.tail.map { case (v, o) => sum(col(v)).as(s"_pt_$o") }: _*)
    val offsets = totals.select(col(pid).as(s"_psj_$pid") +:
      outNames.map(o =>
        coalesce(sum(col(s"_pt_$o")).over(wOff), lit(0L)).as(s"_off_$o")): _*)
    // 4. broadcast pid join (the data side needs no redistribution);
    //    global prefix = local cumulative + earlier partitions' total
    local.join(broadcast(offsets), col(pid) === col(s"_psj_$pid"))
      .select(inCols.map(col) ++
        sums.map { case (_, out) =>
          (col(out) + col(s"_off_$out")).as(out)
        }: _*)
  }

  /** Append, for each `(valueCol, outCol)` in `mins`, the INCLUSIVE
    * global running MIN of `valueCol` in the total order given by
    * `order` — the monotone-envelope companion to [[runningSums]]
    * (suffix minima, e.g. Benjamini–Hochberg's step-up clamp, are a
    * running min over the REVERSED order). Same two-pass scheme: one
    * range exchange, a narrow per-partition scan, per-partition totals
    * turned into exclusive prefix minima over ≤ #partitions rows, and
    * a broadcast pid join combining them with `least` (which skips the
    * NULL side). A prefix that has seen no non-NULL value yet yields
    * NULL. */
  def runningMins(df: DataFrame, order: Seq[Column],
      mins: Seq[(String, String)],
      numPartitions: Option[Int] = None): DataFrame = {
    require(order.nonEmpty, "runningMins needs at least one order column")
    require(mins.nonEmpty, "runningMins needs at least one value column")
    val inCols = df.columns
    mins.foreach { case (v, out) =>
      require(inCols.contains(v), s"value column $v missing from input")
      require(!inCols.contains(out) && v != out,
        s"output column $out collides with an input column")
      require(df.schema(v).dataType == LongType,
        s"value column $v must be LongType (exact-integer discipline), " +
          s"got ${df.schema(v).dataType}")
    }
    val outNames = mins.map(_._2)
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(c => inCols.contains(c) || outNames.contains(c)).next()
    val pid = fresh("_ps_pid")
    val positioned = numPartitions
      .fold(df.repartitionByRange(order: _*))(
        n => df.repartitionByRange(n, order: _*))
      .sortWithinPartitions(order: _*)
    val valueIdx = mins.map { case (v, _) => positioned.schema.fieldIndex(v) }
      .toArray
    val outSchema = StructType(positioned.schema.fields ++
      (StructField(pid, IntegerType, nullable = false) +:
        mins.map { case (_, out) =>
          StructField(out, LongType, nullable = true)
        }))
    val local = positioned.mapPartitions { it =>
      val p = TaskContext.getPartitionId()
      val acc = new Array[Long](valueIdx.length)
      val seen = new Array[Boolean](valueIdx.length)
      it.map { r =>
        var i = 0
        while (i < acc.length) {
          if (!r.isNullAt(valueIdx(i))) {
            val v = r.getLong(valueIdx(i))
            if (!seen(i) || v < acc(i)) acc(i) = v
            seen(i) = true
          }
          i += 1
        }
        Row.fromSeq(r.toSeq ++ (p +: Seq.tabulate(acc.length) { i =>
          if (seen(i)) java.lang.Long.valueOf(acc(i)) else null
        }))
      }
    }(Encoders.row(outSchema))
      .localCheckpoint(false)
    val wOff = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    // totals re-min the ORIGINAL value columns (min-of-local-cumulative
    // happens to equal it, but the original is the invariant form)
    val totals = local.groupBy(col(pid))
      .agg(min(col(mins.head._1)).as(s"_pt_${outNames.head}"),
        mins.tail.map { case (v, o) => min(col(v)).as(s"_pt_$o") }: _*)
    val offsets = totals.select(col(pid).as(s"_psj_$pid") +:
      outNames.map(o =>
        min(col(s"_pt_$o")).over(wOff).as(s"_off_$o")): _*)
    local.join(broadcast(offsets), col(pid) === col(s"_psj_$pid"))
      .select(inCols.map(col) ++
        mins.map { case (_, out) =>
          least(col(out), col(s"_off_$out")).as(out)
        }: _*)
  }
}
