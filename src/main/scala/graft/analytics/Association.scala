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
  * Scale posture: pair generation is IN-ARRAY WITHIN BASKET —
  * quadratic in basket size, linear in basket count. That is safe
  * exactly when baskets are bounded, so `maxBasketSize` is a
  * first-class contract, not an option: baskets above it are DROPPED
  * before pairing (the standard market-basket guard; one oversized
  * basket — a crawl page listing every product — otherwise contributes
  * O(n²) pairs and one straggler task). The only data-sized exchange
  * is the basket grouping (collect_set partials combine map-side); the
  * generated pairs collapse into distinct-pair counts in the (a, b)
  * aggregate's map-side combine before its exchange. Item counts and
  * the basket total are ordinary hash aggregates; metrics are exact
  * integer micro-units (floor divisions in decimal space — no float,
  * no overflow at web scale).
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
    // ONE basket-keyed shuffle (collect_set has a map-side partial),
    // then pairs generate IN-ARRAY per basket — the n² fan-out happens
    // inside a generator whose pair counts collapse in the map-side
    // combine of the (a, b) aggregate, so the only data-sized exchange
    // is the basket grouping. The previous distinct + size-filter join
    // + within-basket self-join shape paid three data-sized shuffles
    // and measured ~13 s at sf1; this measures ~4 s with identical
    // output (sort_array ⇒ a < b in the type's natural order — the
    // same order the self-join's `<` used).
    val baskets = df
      .select(col(basketCol).as("_bk"), col(itemCol).as("_it"))
      // explicit NULL contract (the old self-join shape dropped null
      // baskets implicitly via a null-unsafe join; a groupBy would
      // instead FABRICATE one merged basket from them): null basket
      // keys and null items participate in nothing
      .filter(col("_bk").isNotNull && col("_it").isNotNull)
      .groupBy(col("_bk"))
      .agg(sort_array(collect_set(col("_it"))).as("_items"))
      .filter(size(col("_items")) <= maxBasketSize)
      .localCheckpoint(false) // feeds pairs, item counts, basket total
    val pairs = baskets
      .filter(size(col("_items")) >= 2) // sequence(0,-1) walks BACKWARD
      .select(explode(expr(
        "flatten(transform(sequence(0, size(_items) - 2), " +
          "i -> transform(sequence(i + 1, size(_items) - 1), " +
          "j -> struct(_items[i] AS a, _items[j] AS b))))")).as("_p"))
      .groupBy(col("_p.a").as("_a"), col("_p.b").as("_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val itemCounts = baskets.select(explode(col("_items")).as("_it"))
      .groupBy(col("_it")).agg(count(lit(1)).as("_n"))
    val nRow = broadcast(baskets.agg(count(lit(1)).as("_nb")))
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

  /** ITEM-ITEM COLLABORATIVE SIMILARITY, top-k per item — the
    * "customers who bought X also bought Y" retrieval table built from
    * the same co-occurrence pass: cosine over binary basket vectors,
    * cos(a,b) = n_ab / √(n_a·n_b), as exact-input micros
    * `cos_x1e6 = ⌊n_ab·10⁶ / √(n_a·n_b)⌋` (integer counts and products;
    * the lone double op is one IEEE mul/sqrt/div sequence, identical in
    * any engine). Each co-occurring pair appears in BOTH directions and
    * each item keeps its `k` best neighbors by (cos desc, neighbor asc
    * — a total tie order). Output: (`item`, `neighbor`, `n_ab`,
    * `cos_x1e6`, `rank`), ordered.
    *
    * Scale posture: inherits [[coOccurrence]]'s basket guard (the n²
    * fan-out is bounded by `maxBasketSize`); the top-k window
    * partitions by item — rank-1-filter shape (WindowGroupLimit prunes
    * map-side), keys are items ⇒ high cardinality, skew-safe. */
  def itemSimilarityTopK(df: DataFrame, basketCol: String,
      itemCol: String, k: Int, minSupport: Long = 1L,
      maxBasketSize: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // materialized: the pair table feeds BOTH union directions — an
    // unmaterialized frame re-mines the whole within-basket self-join
    // per branch (measured 21 s → 12 s at sf1)
    val co = coOccurrence(df, basketCol, itemCol, minSupport,
      maxBasketSize)
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"))
      .localCheckpoint(false)
    val sym = co.unionByName(co.select(
      col("item_b").as("item_a"), col("item_a").as("item_b"),
      col("n_ab"), col("n_b").as("n_a"), col("n_a").as("n_b")))
    val cos = floor(col("n_ab").cast("double") * lit(1e6) /
      sqrt((col("n_a") * col("n_b")).cast("double"))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item_a"))
      .orderBy(col("cos_x1e6").desc, col("item_b").asc)
    sym.withColumn("cos_x1e6", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item_a").as("item"), col("item_b").as("neighbor"),
        col("n_ab"), col("cos_x1e6"), col("rank"))
      .orderBy(col("item"), col("rank"))
  }
}
