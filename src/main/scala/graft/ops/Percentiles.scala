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
    * only NULLs yields no row. Groups must be low-cardinality (the
    * groupedRank broadcast contract). */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1], got $ps")
    val gcols = groupCols.map(col)
    val ranked = Rank.groupedRank(
      df.filter(col(valueCol).isNotNull)
        .select(gcols :+ col(valueCol).as("_v"): _*),
      groupCols, Seq(col("_v").asc), "_rk", countCol = Some("_n"))
    // (group, n) is one row per group after distinct — tiny. Explode the
    // percentile list against it and emit the one or two ranks each
    // (group, p) needs, with the interpolation fraction.
    val needs = ranked.select(gcols :+ col("_n"): _*).distinct()
      .withColumn("p", explode(lit(ps.toArray)))
      .withColumn("_rn", col("p") * (col("_n") - lit(1L)).cast("double"))
      .withColumn("_lo", floor(col("_rn")).cast("long") + lit(1L))
      .withColumn("_hi", ceil(col("_rn")).cast("long") + lit(1L))
      .withColumn("_frac", col("_rn") - floor(col("_rn")))
    val wanted = needs.select(
      gcols ++ Seq(col("p"), col("_frac"),
        explode(when(col("_lo") === col("_hi"),
            array(struct(col("_lo").as("_rk"), lit("lo").as("_role"))))
          .otherwise(array(
            struct(col("_lo").as("_rk"), lit("lo").as("_role")),
            struct(col("_hi").as("_rk"), lit("hi").as("_role")))))
          .as("_need")): _*)
      .select(gcols ++ Seq(col("p"), col("_frac"),
        col("_need._rk").as("_rk"), col("_need._role").as("_role")): _*)
    // broadcast the wanted-ranks table; the corpus-sized ranked frame is
    // filtered by the equi-join on (group, rank)
    ranked.join(broadcast(wanted), groupCols :+ "_rk")
      .groupBy(gcols :+ col("p"): _*)
      .agg(
        max(when(col("_role") === "lo", col("_v"))).as("_vlo"),
        max(when(col("_role") === "hi", col("_v"))).as("_vhi"),
        max(col("_frac")).as("_f"))
      .select(gcols ++ Seq(col("p"),
        (col("_vlo") + (coalesce(col("_vhi"), col("_vlo")) - col("_vlo"))
          * col("_f")).as("value")): _*)
  }
}
