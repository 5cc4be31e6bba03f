package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed percentiles (SQL `percentile_cont`) over skewed
  * low-cardinality groups — the companion to the KLL/approx sketch path
  * for when the answer must be exact (SLA reporting, oracle validation,
  * small group counts with huge groups).
  *
  * `percentile_cont(p)` needs each group's values in sorted order — the
  * naive window/sort form funnels every group through one task. Here
  * [[Rank.groupedRank]] supplies (rank, n) per row via its range-exchange
  * scheme; the target positions `p·(n−1)` (0-based, the SQL definition)
  * pick at most two ranks per (group, p); a TINY derived table (distinct
  * groups × |ps|) lists those ranks and broadcasts back, so the
  * data-sized side is one equi-join filter. The final interpolation
  * `lo + (hi − lo)·frac` runs on ≤ 2·|groups|·|ps| rows. */
object Percentiles {

  /** Returns one row per (group, p): `(groupCols…, p, value)` with
    * `value` = exact percentile_cont(p) of `valueCol` within the group.
    * NULL values are excluded (percentile_cont semantics); a group with
    * only NULLs yields no row; a NULL GROUP KEY is its own group
    * (null-safe joins throughout, matching SQL GROUP BY). Groups must be
    * low-cardinality (the groupedRank broadcast contract). `p`/`value`
    * name the output columns, so `groupCols` must not contain them. */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1], got $ps")
    require(!groupCols.contains("p") && !groupCols.contains("value"),
      "groupCols must not contain the output column names 'p'/'value'")
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(c => df.columns.contains(c)).next()
    val v = fresh("_pct_v")
    val rk = fresh("_pct_rk")
    val n = fresh("_pct_n")
    val rn = fresh("_pct_rn")
    val lo = fresh("_pct_lo")
    val hi = fresh("_pct_hi")
    val fr = fresh("_pct_frac")
    val role = fresh("_pct_role")
    val gcols = groupCols.map(col)
    val ranked = Rank.groupedRank(
      df.filter(col(valueCol).isNotNull)
        .select(gcols :+ col(valueCol).as(v): _*),
      groupCols, Seq(col(v).asc), rk, countCol = Some(n))
    // (group, n) is one row per group after distinct — tiny. Explode the
    // percentile list against it and emit the one or two ranks each
    // (group, p) needs, with the interpolation fraction.
    val needs = ranked.select(gcols :+ col(n): _*).distinct()
      .withColumn("p", explode(lit(ps.toArray)))
      .withColumn(rn, col("p") * (col(n) - lit(1L)).cast("double"))
      .withColumn(lo, floor(col(rn)).cast("long") + lit(1L))
      .withColumn(hi, ceil(col(rn)).cast("long") + lit(1L))
      .withColumn(fr, col(rn) - floor(col(rn)))
    val wanted = needs.select(
      gcols ++ Seq(col("p"), col(fr),
        explode(when(col(lo) === col(hi),
            array(struct(col(lo).as(rk), lit("lo").as(role))))
          .otherwise(array(
            struct(col(lo).as(rk), lit("lo").as(role)),
            struct(col(hi).as(rk), lit("hi").as(role)))))
          .as("_need")): _*)
      .select(groupCols.map(c => col(c).as(s"_pctj_$c")) ++
        Seq(col("p"), col(fr), col(s"_need.$rk").as(s"_pctj_$rk"),
          col(s"_need.$role").as(role)): _*)
    // broadcast the wanted-ranks table; the corpus-sized ranked frame is
    // filtered by a NULL-SAFE equi-join on (group, rank) — a plain
    // equality key would silently drop NULL-keyed groups
    val cond = (groupCols.map(c => ranked(c) <=> col(s"_pctj_$c")) :+
      (col(rk) === col(s"_pctj_$rk"))).reduce(_ && _)
    ranked.join(broadcast(wanted), cond)
      .groupBy(gcols :+ col("p"): _*)
      .agg(
        max(when(col(role) === "lo", col(v))).as("_vlo"),
        max(when(col(role) === "hi", col(v))).as("_vhi"),
        max(col(fr)).as("_f"))
      .select(gcols ++ Seq(col("p"),
        (col("_vlo") + (coalesce(col("_vhi"), col("_vlo")) - col("_vlo"))
          * col("_f")).as("value")): _*)
  }
}
