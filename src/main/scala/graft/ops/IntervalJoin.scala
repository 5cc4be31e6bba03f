package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join WITHOUT an equi key — the case the banded range
  * join (J5, `q_range_join`) cannot anchor: find all pairs of intervals
  * `[aStart, aEnd]` × `[bStart, bEnd]` with `aStart <= bEnd AND
  * bStart <= aEnd`. A raw theta join degenerates to a nested-loop cross
  * product; bucketizing time recovers an equi join.
  *
  * Shape: each interval explodes into the fixed-width buckets it covers;
  * the join keys on the bucket id with the overlap predicate as a
  * residual filter. A pair of overlapping intervals shares EVERY bucket
  * in the overlap region, so the join would emit it once per shared
  * bucket — instead of a distinct over the output, the report-once
  * condition `bucket == floorDiv(greatest(aStart, bStart))` keeps exactly
  * the bucket containing the overlap's left edge (both sides are
  * guaranteed to cover it), making the join emit each pair exactly once
  * with NO dedup shuffle.
  *
  * Scale (100 TB): shuffle volume is rows × (interval span / bucketWidth)
  * — pick `bucketWidth` near the TYPICAL interval length so most
  * intervals explode into ≤ 2 buckets. Skew = a bucket holding many
  * interval endpoints (a burst); residual filtering is per-bucket local,
  * and a hot bucket can be salted on top if a burst dominates. No
  * CartesianProduct at any size (PlanSpec-asserted).
  *
  * Times must be integral (epoch-µs style); bucket ids are exact for
  * |time| < 2^53 (the long→double division below is the only rounding
  * step, and (t − pmod) is a multiple of bucketWidth, so the quotient is
  * an integer well inside double precision for any realistic epoch).
  */
object IntervalJoin {

  private def floorDivCol(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  def overlapJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "overlapJoin requires disjoint column names between the two sides " +
        "(the residual predicate references them unqualified) — alias one")
    // fresh temp name (AsOfJoin/ZOrder discipline): never clobber a user
    // column that happens to be called _bucket
    val taken = a.columns.toSet ++ b.columns.toSet
    val bucket = Iterator.iterate("_bucket")(_ + "_")
      .dropWhile(taken.contains).next()
    def buckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn(bucket, explode(sequence(
        floorDivCol(col(s), bucketWidth), floorDivCol(col(e), bucketWidth))))
    val aB = buckets(a, aStart, aEnd)
    val bB = buckets(b, bStart, bEnd)
    aB.join(bB,
        aB(bucket) === bB(bucket) &&
          col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
          aB(bucket) === floorDivCol(greatest(col(aStart), col(bStart)),
            bucketWidth))
      .drop(bucket)
  }
}
