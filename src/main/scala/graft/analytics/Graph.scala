package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over an edge table — the curation-side
  * graph signals a web-scale training corpus needs: host-level PageRank
  * is a standard quality prior in crawl filtering (the CommonCrawl host
  * ranks consumed by C4/RefinedWeb-style pipelines), and degree
  * statistics feed spam/link-farm heuristics.
  *
  * Everything here is FIXED-POINT INTEGER arithmetic (ranks live in
  * units of `scale⁻¹`, divisions are explicit floor divisions). That is
  * not a portability gimmick: float PageRank is non-deterministic under
  * parallel summation (fp addition is order-sensitive), so two runs of
  * the same job can rank hosts differently at the decision boundary.
  * Integer fixed-point makes every iteration associative and therefore
  * bit-identical across partitionings, engines, and re-runs — which is
  * also what lets a DuckDB oracle replay it exactly.
  *
  * Scale posture (the GraphX/Pregel shape, declaratively):
  *  - edges are deduplicated and joined with out-degrees ONCE, then
  *    `localCheckpoint`ed — the per-iteration joins reuse that
  *    materialization instead of re-shuffling the raw edge table;
  *  - each iteration is one (ranks ⋈ edges) shuffle + one groupBy(dst)
  *    aggregate (map-side combined) + one broadcast of the two scalar
  *    aggregates (node count, dangling mass). Nothing is ever collected
  *    beyond those scalars;
  *  - ranks are `localCheckpoint`ed per iteration to truncate lineage —
  *    without it the unrolled plan re-computes rank subtrees
  *    exponentially (each iteration reads the previous one three times:
  *    contributions, dangling mass, and the node left join). O(nodes)
  *    materialized state per iteration is the standard iterative-graph
  *    trade (GraphX checkpoints the same way).
  */
object Graph {

  /** True integer floor division (Spark's `div` operator / DuckDB's
    * `//`). `Column./` on longs is DOUBLE division — casting its result
    * back to long truncates the correctly-ROUNDED quotient, which can
    * exceed the true floor when the rational quotient sits within half
    * an ulp below an integer, silently breaking bit-exactness. */
  private def ldiv(a: Column, b: Column): Column =
    call_function("div", a, b)

  /** PageRank with damping `dampingNum/dampingDen` (default 0.85) and
    * uniform-teleport dangling-mass redistribution, `iters` synchronous
    * iterations from the uniform start vector.
    *
    * `edges` must expose `srcCol`/`dstCol`; duplicate (src,dst) pairs
    * are collapsed first (an unweighted simple digraph — multi-edge
    * weighting belongs to the caller via an explicit weight column on a
    * pre-aggregated edge table). Nodes are the union of endpoints.
    *
    * The recurrence, entirely in `Long` fixed-point (`scale` = one unit
    * of rank mass; all divisions floor):
    * {{{
    *   r0(u)   = scale div N
    *   dang_t  = Σ r_t(u) over nodes with out-degree 0
    *   c_t(v)  = Σ_{u→v} ( r_t(u) div outdeg(u) )
    *   r_{t+1}(v) = ((dampingDen-dampingNum)·scale) div (dampingDen·N)
    *              + (dampingNum·(c_t(v) + dang_t div N)) div dampingDen
    * }}}
    * Floor-division truncation loses < 1 unit per term, so total mass
    * drifts by at most a few N units out of `scale` — irrelevant for
    * ranking and exactly reproduced by any conforming re-implementation.
    *
    * Overflow: every intermediate is ≤ dampingNum · scale ≤ 85·10¹² with
    * the defaults — 5 orders of magnitude under Long.MaxValue.
    *
    * Returns (`node`, `rank_fp`): one row per node, rank in scale⁻¹
    * units. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingNum: Long = 85L, dampingDen: Long = 100L,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingNum > 0 && dampingNum < dampingDen,
      s"damping must satisfy 0 < num < den, got $dampingNum/$dampingDen")

    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .distinct()
    val outdeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_outdeg"))
    // ONE materialized (src, dst, outdeg) table drives every iteration —
    // and, because the inner join keeps every edge (each edge's src has
    // outdeg >= 1), the node and source sets derive from this checkpoint
    // too: the raw edge table is scanned/deduplicated exactly once
    val edgesDeg = e.join(outdeg, "_src").localCheckpoint(eager = false)
    val nodes = edgesDeg.select(col("_src").as("node"))
      .union(edgesDeg.select(col("_dst"))).distinct()
      .localCheckpoint(eager = false)
    val srcNodes = edgesDeg.select(col("_src")).distinct()
      .localCheckpoint(eager = false)

    // the two graph scalars, broadcast everywhere they're needed
    val nRow = broadcast(nodes.agg(count(lit(1)).as("_n")))
    val teleport =
      ldiv(lit((dampingDen - dampingNum) * scale), lit(dampingDen) * col("_n"))

    var ranks = nodes.crossJoin(nRow)
      .select(col("node"), ldiv(lit(scale), col("_n")).as("_r"))
      .localCheckpoint(eager = false)

    for (_ <- 1 to iters) {
      val dangRow = broadcast(
        ranks.join(srcNodes, ranks("node") === srcNodes("_src"), "left_anti")
          .agg(coalesce(sum(col("_r")), lit(0L)).as("_dang")))
      val contrib = ranks
        .join(edgesDeg, ranks("node") === edgesDeg("_src"))
        .groupBy(col("_dst"))
        .agg(sum(ldiv(col("_r"), col("_outdeg"))).as("_c"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("_dst"), "left")
        .crossJoin(nRow).crossJoin(dangRow)
        .select(nodes("node"),
          (teleport
            + ldiv(lit(dampingNum)
                     * (coalesce(col("_c"), lit(0L))
                        + ldiv(col("_dang"), col("_n"))),
                   lit(dampingDen))).as("_r"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), col("_r").as("rank_fp"))
  }

  /** Per-node degree summary of a digraph: `out_deg`/`in_deg` (0 for
    * absent direction — every endpoint appears exactly once). One
    * dedup + two count aggregates + an outer merge; no windows. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .distinct()
    val out = e.groupBy(col("_src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("_dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
