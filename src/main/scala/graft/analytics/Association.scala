package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Fixed.ldiv

/** Pairwise co-occurrence mining over (basket, item) rows — association
  * rules / item-item similarity / the count side of PMI. In a training
  * corpus the same pass powers "which domains co-cite", "which tokens
  * collocate" (lift is exp(PMI)), and related-item retrieval from
  * interaction logs.
  *
  * Scale posture: the pair generation is a SELF-JOIN WITHIN BASKET —
  * quadratic in basket size, linear in basket count. That is safe
  * exactly when baskets are bounded, so `maxBasketSize` is a first-class
  * contract, not an option: baskets above it are DROPPED before pairing
  * (the standard market-basket guard; one oversized basket — a crawl
  * page listing every product — otherwise contributes O(n²) pairs and
  * one straggler task). The join itself shuffles both sides on the
  * basket key; both sides are the same deduplicated frame, so the
  * exchange is planned once and reused. Pair counts, item counts, and
  * the basket total are ordinary hash aggregates; metrics are exact
  * integer micro-units (floor divisions in decimal space — no float, no
  * overflow at web scale).
  */
object Association {

  /** Co-occurrence pairs with support ≥ `minSupport`, one row per
    * unordered item pair (item_a < item_b by the column's natural
    * order). Output metrics, all exact ×10⁶ fixed-point:
    *  - `jaccard_x1e6`  = n_ab / (n_a + n_b − n_ab) — item similarity;
    *  - `conf_ab_x1e6`  = n_ab / n_a — confidence of rule a ⇒ b;
    *  - `lift_x1e6`     = n_ab·N / (n_a·n_b) — association strength
    *    (1.0 = independent; this is exp(PMI) over basket frequencies).
    * Counts are DISTINCT-basket counts (an item twice in one basket
    * counts once — set semantics, the standard support definition). */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L, maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val b = df.select(col(basketCol).as("_bk"), col(itemCol).as("_it"))
      .distinct()
    val keptBaskets = b.groupBy(col("_bk"))
      .agg(count(lit(1)).as("_sz"))
      .filter(col("_sz") <= maxBasketSize)
      .select(col("_bk"))
    val bb = b.join(keptBaskets, "_bk")
    val x = bb.select(col("_bk"), col("_it").as("_a"))
    val y = bb.select(col("_bk"), col("_it").as("_b"))
    val pairs = x.join(y, Seq("_bk"))
      .filter(col("_a") < col("_b"))
      .groupBy(col("_a"), col("_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val itemCounts = bb.groupBy(col("_it")).agg(count(lit(1)).as("_n"))
    val nRow = broadcast(bb.agg(count_distinct(col("_bk")).as("_nb")))
    val d = (c: Column) => c.cast("decimal(38,0)")
    pairs
      .join(itemCounts.select(col("_it").as("_a"), col("_n").as("n_a")), "_a")
      .join(itemCounts.select(col("_it").as("_b"), col("_n").as("n_b")), "_b")
      .crossJoin(nRow)
      .select(col("_a").as("item_a"), col("_b").as("item_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        ldiv(col("n_ab") * lit(1000000L),
          col("n_a") + col("n_b") - col("n_ab")).as("jaccard_x1e6"),
        ldiv(col("n_ab") * lit(1000000L), col("n_a")).as("conf_ab_x1e6"),
        ldiv(d(col("n_ab")) * d(col("_nb")) * lit(1000000L),
          d(col("n_a")) * d(col("n_b"))).cast("long").as("lift_x1e6"))
  }
}
