package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: compact a change stream
  * `(pk, ts, attrs...)` into validity intervals — one row per distinct
  * run of attribute values per key, with `valid_from`/`valid_to`/
  * `is_current`. The standard silver-layer history shape downstream of a
  * CDC bronze feed (the reference's medallion flow tracks only
  * latest-wins dedup, `02_silver_processing.py`; SCD2 is the
  * history-preserving sibling).
  *
  * Scale: ONE shuffle on `pk`. Both window passes (change detection via
  * `lag`, interval close via `lead`) share the same partitioning and
  * ordering, and the filter between them preserves sort order within
  * partitions, so Spark plans the second WindowExec with no extra
  * exchange or sort (PlanSpec-asserted). Hot keys: a key's history rides
  * one task — for million-change keys, pre-split by time range first.
  */
object Scd2 {

  /** @param tieBreak unique column ordering rows that share a timestamp
    *                  (determinism requirement, same discipline as W1
    *                  dedup); carried through as `src_<tieBreak>` for
    *                  provenance.
    * @param attrs     tracked attribute columns: a row opens a new
    *                  interval iff any of them differs (null-safely) from
    *                  the previous row's value. */
  def scd2(df: DataFrame, pk: String, ts: String, tieBreak: String,
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(pk))
      .orderBy(col(ts).asc, col(tieBreak).asc)
    val attrStruct: Column = struct(attrs.map(col): _*)
    val changed = df
      .select((pk +: ts +: tieBreak +: attrs).distinct.map(col): _*)
      .withColumn("_prev", lag(attrStruct, 1).over(w))
      // null-safe inequality: first row per key (_prev null) opens an
      // interval; a tracked attr flipping to/from null is a change too
      .filter(!(col("_prev") <=> attrStruct))
      .drop("_prev")
    changed
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(tieBreak, s"src_$tieBreak")
      .drop(ts)
  }

  /** Join facts to the dimension-history row valid at the fact's time —
    * the standard warehouse pattern downstream of [[scd2]]: equi on the
    * dimension key plus the interval predicate
    * `valid_from <= t < valid_to` (open `valid_to` = current row). The
    * equi anchor makes this a plain hash/sort-merge join with a residual
    * range filter — never a nested loop — and each fact matches at most
    * one interval by [[scd2]]'s construction. `joinType` "inner" (the
    * default warehouse convention): facts whose time precedes the key's
    * first interval, or whose key has no history at all, drop out.
    * "left": those facts survive with the interval and tracked-attribute
    * columns null-filled — cardinality-preserving because at most one
    * interval matches.
    * @param factTs NUMERIC fact-time column comparable to the dimension's
    *               `valid_from`/`valid_to` (same unit). */
  def temporalJoin(facts: DataFrame, dim: DataFrame, key: String,
      factTs: String, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left").contains(joinType),
      s"temporalJoin: joinType must be inner or left, got '$joinType' " +
        "(right/full have no at-most-one-interval cardinality guarantee)")
    require(dim.columns.contains("valid_from") &&
      dim.columns.contains("valid_to"),
      "temporalJoin: dim must carry valid_from/valid_to (an scd2 output)")
    // the interval columns are referenced unqualified in the predicate;
    // a fact side carrying the same names would be silently shadowed —
    // reject it (IntervalJoin's disjointness discipline)
    require(!facts.columns.contains("valid_from") &&
      !facts.columns.contains("valid_to"),
      "temporalJoin: facts must not carry valid_from/valid_to — alias them")
    require(!dim.columns.contains(factTs),
      s"temporalJoin: dim must not carry the fact-time column $factTs")
    // fresh temp name (AsOfJoin/ZOrder discipline)
    val taken = facts.columns.toSet ++ dim.columns.toSet
    val dimKey = Iterator.iterate("_dim_key")(_ + "_")
      .dropWhile(taken.contains).next()
    val d = dim.withColumnRenamed(key, dimKey)
    facts.join(d,
        col(key) === col(dimKey) &&
          col(factTs) >= col("valid_from") &&
          (col("valid_to").isNull || col(factTs) < col("valid_to")),
        joinType)
      .drop(dimKey)
  }
}
