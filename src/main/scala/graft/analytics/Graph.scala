package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Fixed.ldiv

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
  *    aggregate (map-side combined) + one scalar aggregate (dangling
  *    mass) collected to the driver as a single long and folded into
  *    the next iteration's expressions as a literal (the GraphX/Pregel
  *    posture for per-superstep scalars). Nothing is ever collected
  *    beyond those O(1) scalars;
  *  - ranks are `localCheckpoint`ed per iteration to truncate lineage —
  *    without it the unrolled plan re-computes rank subtrees
  *    exponentially (each iteration reads the previous one three times:
  *    contributions, dangling mass, and the node left join). O(nodes)
  *    materialized state per iteration is the standard iterative-graph
  *    trade (GraphX checkpoints the same way).
  */
object Graph {

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
      scale: Long = 1000000000000L): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iters, dampingNum, dampingDen,
      scale, seeds = None)

  /** PERSONALIZED PageRank: teleport (and dangling) mass returns only
    * to the `seeds` set instead of uniformly — rank becomes proximity
    * to the trusted set, the "quality flows outward from known-good
    * hosts" prior (TrustRank) rather than global centrality. Same
    * fixed-point integer recurrence as [[pageRank]] with the teleport
    * term gated on seed membership and |S| replacing N in the
    * teleport/dangling denominators; non-seed start mass is 0. Seeds
    * are broadcast (the scarce-trust contract); seed ids absent from
    * the graph are ignored (the restart vector normalizes over
    * |S ∩ V| — only seeds that exist in the graph hold mass). */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String, iters: Int,
      dampingNum: Long = 85L, dampingDen: Long = 100L,
      scale: Long = 1000000000000L): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iters, dampingNum, dampingDen,
      scale, seeds = Some(seeds.select(col(seedCol).as("_seed"))
        .distinct()))

  private def pageRankCore(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int, dampingNum: Long, dampingDen: Long,
      scale: Long, seeds: Option[DataFrame]): DataFrame = {
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
    val bare = edgesDeg.select(col("_src").as("node"))
      .union(edgesDeg.select(col("_dst"))).distinct()
    // `_is_seed` gates where teleport/dangling mass returns; the uniform
    // form flags every node, so ONE recurrence serves both (and the
    // denominator `_d` is N there, |S ∩ V| when personalized — restart
    // mass normalizes over seeds that exist in the graph).
    // `_has_out` is stamped ONCE here so the per-iteration dangling-mass
    // term is a plain filtered aggregate over the rank vector instead of
    // a node-sized anti-join per iteration (one whole shuffle/broadcast
    // removed from every iteration, at any scale — opt guide §2.4)
    val srcNodes = edgesDeg.select(col("_src").as("node")).distinct()
    val flagged = bare.join(srcNodes.withColumn("_has_out", lit(true)),
      Seq("node"), "left")
      .withColumn("_has_out", coalesce(col("_has_out"), lit(false)))
    val nodes = seeds.fold(flagged.withColumn("_is_seed", lit(true))) { sd =>
      flagged.join(broadcast(sd), flagged("node") === sd("_seed"), "left")
        .withColumn("_is_seed", col("_seed").isNotNull).drop("_seed")
    }.localCheckpoint(eager = false)

    // the two denominators of the recurrence are SCALARS (seed count and
    // per-iteration dangling mass). Collecting them to the driver — O(1)
    // longs, the GraphX/Pregel posture — replaces two broadcast-scalar
    // joins per iteration with literal constants folded into codegen;
    // the integer math is unchanged (Math.floorDiv ≡ Fixed.ldiv on
    // longs), so every rank value is bit-identical
    val d = nodes.agg(sum(when(col("_is_seed"), 1L).otherwise(0L)))
      .collect()(0).getLong(0)
    val teleportSeed = Math.floorDiv(
      (dampingDen - dampingNum) * scale, dampingDen * d)
    def teleport = when(col("_is_seed"), lit(teleportSeed)).otherwise(0L)

    var ranks = nodes
      .select(col("node"), col("_is_seed"), col("_has_out"),
        when(col("_is_seed"), lit(Math.floorDiv(scale, d)))
          .otherwise(0L).as("_r"))
      .localCheckpoint(eager = false)

    for (_ <- 1 to iters) {
      // dangling mass: one filtered scalar aggregate over the (cached)
      // rank vector — the anti-join against the source-node set is gone
      val dang = ranks.filter(!col("_has_out"))
        .agg(coalesce(sum(col("_r")), lit(0L)))
        .collect()(0).getLong(0)
      val dangSeed = Math.floorDiv(dang, d)
      val dangShare = when(col("_is_seed"), lit(dangSeed)).otherwise(0L)
      val contrib = ranks
        .join(edgesDeg, ranks("node") === edgesDeg("_src"))
        .groupBy(col("_dst"))
        .agg(sum(ldiv(col("_r"), col("_outdeg"))).as("_c"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("_dst"), "left")
        .select(nodes("node"), nodes("_is_seed"), nodes("_has_out"),
          (teleport
            + ldiv(lit(dampingNum)
                     * (coalesce(col("_c"), lit(0L)) + dangShare),
                   lit(dampingDen))).as("_r"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), col("_r").as("rank_fp"))
  }

  /** Semi-supervised LABEL PROPAGATION over the undirected form of the
    * edge set — spread sparse trusted labels (a hand-rated quality tier,
    * a verified language, a topic) to unlabeled nodes through
    * connectivity, the standard cheap alternative to training a
    * classifier when labels are scarce but structure is dense.
    *
    * Synchronous iterations; each round every node takes the MOST
    * FREQUENT label among its neighbors' current labels, ties broken by
    * the SMALLEST label (a total order — no RNG, unlike classic async
    * LPA, so results are deterministic and engine-replayable). Seed
    * nodes are CLAMPED: their label never changes (the semi-supervised
    * contract); unlabeled nodes start empty and may stay empty if no
    * labeled node is reachable in `iters` hops. Counts are integers and
    * the tie-break is lexicographic, so every iteration is bit-exact.
    *
    * Scale shape: per iteration one (labels ⋈ edges) shuffle + one
    * (node, label) count aggregate + one per-node `min(struct(-n,
    * label))` hash aggregate (the argmin encoding of "most frequent,
    * ties to the smallest label" — struct comparison is
    * lexicographic, so min over (−count, label) IS that total order;
    * a hash aggregate where a rank-1 window would pay a per-partition
    * sort) + ONE vote left join back onto the node set (the seed
    * clamp label is stamped on the node frame once, not re-joined
    * every round); labels `localCheckpoint` per round (same lineage
    * argument as [[pageRank]]). `seeds` is BROADCAST (one init join) —
    * the scarce-labels contract this operator exists for; for a
    * beyond-broadcast seed set, the labels frame would already be the
    * answer. Returns (`node`, `label`) — label NULL if never reached. */
  def labelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedNodeCol: String, seedLabelCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dir = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
    // undirected: both directions, self-loops dropped, deduplicated
    val und = dir.union(dir.select(col("_v").as("_u"), col("_u").as("_v")))
      .filter(col("_u") =!= col("_v"))
      .distinct()
      .localCheckpoint(eager = false)
    val seedsDf = broadcastableSeeds(seeds, seedNodeCol, seedLabelCol)
    // the clamp label rides the node frame from the start — the
    // per-iteration seed re-join is gone (guide §2.4: don't re-derive
    // what a carried column already says)
    val nodes = und.select(col("_u").as("node")).distinct()
      .join(seedsDf, col("node") === seedsDf("_s_node"), "left")
      .select(col("node"), col("_s_label"))
      .localCheckpoint(eager = false)

    var labels = nodes
      .select(col("node"), col("_s_label").as("_label"))
      .localCheckpoint(eager = false)

    for (_ <- 1 to iters) {
      val voted = labels.filter(col("_label").isNotNull)
        .join(und, labels("node") === und("_u"))
        .groupBy(col("_v"), col("_label").as("_cand"))
        .agg(count(lit(1)).as("_n"))
        // argmin over the (−count, label) total order ≡ the old
        // rank-1-of-(count desc, label asc) window, value for value
        .groupBy(col("_v"))
        .agg(min(struct((-col("_n")).as("_neg"), col("_cand")))
          .as("_top"))
        .select(col("_v").as("_vn"), col("_top._cand").as("_cand"))
      labels = nodes
        .join(voted, nodes("node") === voted("_vn"), "left")
        // seeds clamp; otherwise adopt the vote; otherwise keep nothing
        // (a node with no labeled neighbor this round stays unlabeled —
        // monotone frontier growth comes from neighbors keeping theirs)
        .select(col("node"),
          coalesce(col("_s_label"), col("_cand")).as("_label"))
        .localCheckpoint(eager = false)
    }
    labels.select(col("node"), col("_label").as("label"))
  }

  private def broadcastableSeeds(seeds: DataFrame, nodeCol: String,
      labelCol: String): DataFrame =
    broadcast(seeds.select(col(nodeCol).as("_s_node"),
      col(labelCol).as("_s_label")).distinct())

  /** TRIANGLE COUNT + local clustering coefficient per node — the
    * community-structure census (how clique-ish is each node's
    * neighborhood): per node, its undirected simple degree, the number
    * of triangles through it, and the local clustering coefficient
    * 2·t/(d·(d−1)) in exact integer micro-units (NULL when d < 2).
    *
    * Algorithm is the standard DEGREE ORIENTATION: orient every
    * undirected edge from its lower-(degree, id) endpoint — a total
    * order, so the oriented graph is acyclic and every triangle has
    * EXACTLY one node with both out-edges (its minimal member), counted
    * once by one wedge join + one closing-edge semi-join. At scale this
    * is the whole point: wedge fan-out is Σ outdeg², and orientation
    * caps every out-degree at O(√m) — the skew a raw neighbor self-join
    * dies on (a celebrity node's d² wedges) never materializes.
    *
    * Input edges are treated as UNDIRECTED; duplicates, reversed
    * duplicates, self-loops, and NULL endpoints are dropped. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false) // consumed 3×: degrees, wedges, closing
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("_da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("_db")), Seq("b"))
    val aFirst = col("_da") < col("_db") ||
      (col("_da") === col("_db") && col("a") < col("b"))
    val o = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint(false) // self-joined below
    // one wedge per unordered neighbor pair (v < w), closed against the
    // sorted undirected edge set
    val wedges = o.as("x").join(o.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("_n1"), col("x.v").as("_n2"),
        col("y.v").as("_n3"))
    val tris = wedges.join(und,
      col("_n2") === col("a") && col("_n3") === col("b"), "left_semi")
    val perNode = tris
      .select(explode(array(col("_n1"), col("_n2"), col("_n3"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("t"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        when(col("d") >= 2, graft.ops.Fixed.ldiv(
          coalesce(col("t"), lit(0L)) * lit(2000000L),
          col("d") * (col("d") - lit(1L)))).as("clustering_x1e6"))
  }

  /** LINK PREDICTION scores — common-neighbor count + neighborhood
    * Jaccard for NON-adjacent node pairs (the classic "people you may
    * know" / co-purchase recommendation primitive, and the graph twin
    * of the similarity family's set-overlap joins). One row per
    * candidate pair: (`id_a`, `id_b`, `common`, `deg_a`, `deg_b`,
    * `jaccard_x1e6`, `ra_x1e6`) with jaccard = common/(deg_a + deg_b −
    * common) and the resource-allocation index Σ_c 1/deg(c), both in
    * exact floored micros ([[graft.ops.Fixed.ldiv]]).
    *
    * HUB EXCLUSION is the scale contract: a candidate pair is generated
    * once per shared neighbor, so a degree-d hub fans out d² wedge
    * rows — the celebrity blowup [[triangles]] dodges via orientation.
    * Orientation cannot help here (BOTH sides of every hub wedge are
    * genuine candidates), so instead common neighbors are counted only
    * through centers with degree ≤ `maxCenterDegree` — bounding wedge
    * fan-out at cap² per node — and `deg_a`/`deg_b` count the SAME
    * capped universe, keeping the Jaccard a true set overlap of
    * N≤cap(·). The semantic loss is the stop-word argument: a neighbor
    * shared with everyone carries no signal about THIS pair. The cap is
    * part of the declared contract (the oracle replicates it), not a
    * silent truncation.
    *
    * Shape: edge dedup + degree aggregate, one capped self-join on the
    * center key, a (pair)-keyed count, an anti-join against the edge
    * set (predict NEW links only), two degree joins. No global windows,
    * no driver state. */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      maxCenterDegree: Long = 64L, minCommon: Long = 2L): DataFrame = {
    require(maxCenterDegree >= 1,
      s"maxCenterDegree must be >= 1, got $maxCenterDegree")
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false) // consumed 3×: degrees, wedges, anti-join
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val adjF = und.select(col("a").as("c"), col("b").as("m"))
      .unionAll(und.select(col("b").as("c"), col("a").as("m")))
      .join(deg.select(col("n").as("c"), col("d")), Seq("c"))
      .filter(col("d") <= maxCenterDegree)
      .select(col("c"), col("m"), col("d"))
      .localCheckpoint(false) // self-joined + capped-degree counts
    val degF = adjF.groupBy(col("m")).agg(count(lit(1)).as("df"))
    // resource-allocation index Σ 1/deg(center) — the exact-rational
    // member of the weighted-common-neighbor family (Adamic–Adar's
    // 1/log d needs a transcendental; RA outperforms it in the original
    // Zhou-Lü-Zhang comparison and floors exactly per center)
    val cand = adjF.as("x").join(adjF.as("y"),
        col("x.c") === col("y.c") && col("x.m") < col("y.m"))
      .groupBy(col("x.m").as("id_a"), col("y.m").as("id_b"))
      .agg(count(lit(1)).as("common"),
        sum(graft.ops.Fixed.ldiv(lit(1000000L), col("x.d")))
          .as("ra_x1e6"))
      .filter(col("common") >= minCommon)
    val newPairs = cand.join(und,
      cand("id_a") === und("a") && cand("id_b") === und("b"), "left_anti")
    newPairs
      .join(degF.select(col("m").as("id_a"), col("df").as("deg_a")),
        Seq("id_a"))
      .join(degF.select(col("m").as("id_b"), col("df").as("deg_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("common"),
        col("deg_a"), col("deg_b"),
        graft.ops.Fixed.ldiv(col("common") * lit(1000000L),
          col("deg_a") + col("deg_b") - col("common")).as("jaccard_x1e6"),
        col("ra_x1e6"))
  }

  /** K-CORE of the undirected graph — the standard cohesion filter
    * (drop everything that isn't embedded in a mutually-dense region):
    * iteratively peel every node whose degree among SURVIVORS is < k
    * until a fixpoint; what remains is the (unique, order-independent)
    * maximal subgraph where every node keeps ≥ k neighbors. Returns the
    * surviving nodes with their within-core degree. Rounds are
    * SYNCHRONOUS (all under-k nodes drop together), so the peel
    * sequence — and any fixed-round replay of it — is deterministic.
    *
    * Shape: per round one endpoint-count aggregate + two anti-joins
    * against the (node-sized) peel set, with `localCheckpoint` lineage
    * truncation and one driver-side count to detect the fixpoint — the
    * [[pageRank]] iteration posture. Round COUNT is data-dependent
    * (worst case O(n) on a path; degenerate-free graphs converge in a
    * handful); `maxIters` fails loud rather than returning a
    * half-peeled graph. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def degreesOf(e: DataFrame): DataFrame =
      e.select(col("a").as("n"))
        .unionAll(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
    var cur = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)
    var round = 0
    while (round < maxIters) {
      val deg = degreesOf(cur).localCheckpoint(false)
      val bad = deg.filter(col("d") < k).select(col("n"))
      if (bad.isEmpty)
        return deg.select(col("n").as("node"), col("d").as("core_degree"))
      cur = cur
        .join(bad.select(col("n").as("a")), Seq("a"), "left_anti")
        .join(bad.select(col("n").as("b")), Seq("b"), "left_anti")
        .localCheckpoint(false)
      round += 1
    }
    throw new IllegalStateException(
      s"kCore(k=$k) did not converge within $maxIters peel rounds — " +
        "raise maxIters (a near-path graph peels one layer per round)")
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

  /** NEWMAN MODULARITY of a community assignment — the quality score
    * that closes the community loop ([[labelPropagate]] proposes,
    * modularity judges): over the undirected simple graph,
    *   Q = Σ_c [e_c/m − (d_c/2m)²]
    *     = (4m·Σe_c − Σd_c²) / (4m²)
    * with e_c the intra-community edge count, d_c the community degree
    * sum, m the edge count — the right-hand identity makes Q a SINGLE
    * exact decimal floor over integers (`q_x1e6`). Unlabeled nodes
    * (propagation didn't reach them) count as SINGLETON communities —
    * no intra edges, their degree mass still penalizes — so Q stays
    * comparable across assignments that label different subsets. ONE
    * row: (`n_nodes`, `n_communities`, `m_edges`, `intra_edges`,
    * `q_x1e6`); NULL Q on an edgeless graph. Community identity is the
    * label's string form (any label type).
    *
    * Shape: canonical-edge distinct (one data-sized exchange), a
    * degree aggregate, two label joins on the edge table, and scalar
    * broadcasts — the [[triangles]] posture, no windows, no driver
    * state beyond the single m count. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, nodeCol: String, labelCol: String): DataFrame = {
    val dirE = edges
      .select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .filter(col("_u").isNotNull && col("_v").isNotNull &&
        col("_u") =!= col("_v"))
    val canon = dirE
      .select(least(col("_u"), col("_v")).as("_a"),
        greatest(col("_u"), col("_v")).as("_b"))
      .distinct()
      .localCheckpoint(false) // feeds degrees, intra join, and m
    val lab = labels.select(col(s"`$nodeCol`").as("_n"),
      col(s"`$labelCol`").as("_l"))
    val deg = canon.select(col("_a").as("_n"))
      .unionByName(canon.select(col("_b").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
    val nodeLab = deg.join(lab, Seq("_n"), "left")
      .select(col("_n"), col("_d"),
        coalesce(col("_l").cast("string"),
          concat(lit("_singleton_"), col("_n").cast("string")))
          .as("_comm"))
      .localCheckpoint(false) // both intra sides + the degree sums
    def dec(c: Column) = c.cast("decimal(38,0)")
    val scal = broadcast(nodeLab.groupBy(col("_comm"))
      .agg(sum(col("_d")).as("_dc"))
      .agg(sum(dec(col("_dc")) * dec(col("_dc"))).as("_sd2"),
        count(lit(1)).as("n_communities")))
    val nn = broadcast(nodeLab.agg(count(lit(1)).as("n_nodes")))
    val mm = broadcast(canon.agg(count(lit(1)).as("m_edges")))
    val intra = canon
      .join(nodeLab.select(col("_n").as("_a"), col("_comm").as("_ca")),
        Seq("_a"))
      .join(nodeLab.select(col("_n").as("_b"), col("_comm").as("_cb")),
        Seq("_b"))
      .agg(coalesce(sum(when(col("_ca") === col("_cb"), 1L)), lit(0L))
        .as("intra_edges"))
    intra.crossJoin(nn).crossJoin(mm).crossJoin(scal)
      .select(col("n_nodes"), col("n_communities"), col("m_edges"),
        col("intra_edges"),
        when(col("m_edges") > 0, ldiv(
          (lit(4L) * dec(col("m_edges")) * dec(col("intra_edges")) -
            col("_sd2")) * lit(1000000L),
          lit(4L) * dec(col("m_edges")) * dec(col("m_edges"))))
          .as("q_x1e6"))
  }

  /** DEGREE ASSORTATIVITY (Newman 2002, Phys. Rev. Lett. 89) of the
    * undirected simple graph — the Pearson correlation of endpoint
    * degrees over edges. Positive: hubs link to hubs (social-network
    * shape); negative: hubs link to leaves (web/biology shape; also the
    * signature of a link farm feeding one hub). With per-edge endpoint
    * degrees (j, k) and M edges, clearing the classical formula's 1/2M
    * normalizations to integers:
    * {{{
    *   r = (4M·Σjk − (Σ(j+k))²) / (2M·Σ(j²+k²) − (Σ(j+k))²)
    * }}}
    * — every sum an exact int128 power sum, one floor division at the
    * end. ONE row: (`m_edges`, `r_x1e6`); NULL r when the denominator
    * is 0 (all degrees equal — correlation undefined).
    *
    * Shape: canonical-edge distinct, one degree aggregate, two degree
    * joins back onto edges, one power-sum aggregate
    * ([[graft.functions.Int128Sum]] — exact at any scale, none of the
    * decimal-sum hot-loop tax). No windows, no driver state. */
  def assortativity(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    import graft.functions.Int128Sum.int128Sum
    import graft.functions.Int128SumProd.int128SumProd
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("_a"),
        greatest(col(srcCol), col(dstCol)).as("_b"))
      .filter(col("_a").isNotNull && col("_b").isNotNull &&
        col("_a") =!= col("_b"))
      .distinct()
      .localCheckpoint(false) // feeds the degree agg AND the edge join
    val deg = canon.select(col("_a").as("_n"))
      .unionByName(canon.select(col("_b").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
    val jk = canon
      .join(deg.select(col("_n").as("_a"), col("_d").as("_j")), Seq("_a"))
      .join(deg.select(col("_n").as("_b"), col("_d").as("_k")), Seq("_b"))
    val sums = jk.agg(
      count(lit(1)).as("m_edges"),
      int128Sum(col("_j") + col("_k")).as("_s1"),
      int128SumProd(col("_j"), col("_j")).as("_sj2"),
      int128SumProd(col("_k"), col("_k")).as("_sk2"),
      int128SumProd(col("_j"), col("_k")).as("_s3"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    sums.select(col("m_edges"),
      when(lit(2L) * dec(col("m_edges")) * (col("_sj2") + col("_sk2")) -
          col("_s1") * col("_s1") > 0,
        ldiv((lit(4L) * dec(col("m_edges")) * col("_s3") -
            col("_s1") * col("_s1")) * lit(1000000L),
          lit(2L) * dec(col("m_edges")) * (col("_sj2") + col("_sk2")) -
            col("_s1") * col("_s1")).cast("long"))
        .as("r_x1e6"))
  }

  /** SALSA hub/authority scores (Lempel & Moran 2000) — the
    * degree-NORMALIZED variant of Kleinberg's HITS, chosen here over
    * raw HITS deliberately: normalizing each contribution by the
    * emitting node's degree makes both half-steps stochastic, so score
    * mass is conserved (up to floor drift) and the recurrence runs in
    * the same overflow-free `Long` fixed-point discipline as
    * [[pageRank]] — raw HITS needs a per-iteration global
    * re-normalization whose exact integer form overflows 64 bits on
    * large graphs. A hub is a node whose outgoing links concentrate on
    * well-cited targets; an authority is a well-cited target of good
    * hubs (in a supplier→customer shipment graph: diversified
    * suppliers / popular customers).
    *
    * The recurrence, from the uniform hub start over source nodes
    * (`scale` = one unit of mass; all divisions floor):
    * {{{
    *   h0(u)     = scale div |src nodes|
    *   a_t(v)    = Σ_{u→v} ( h_{t-1}(u) div outdeg(u) )
    *   h_t(u)    = Σ_{u→v} ( a_t(v)     div indeg(v)  )
    * }}}
    * Returns one row per node: (`node`, `hub_fp`, `auth_fp`) — NULL on
    * the side where the node does not act (a pure sink has no hub
    * score). Bit-exact under any partitioning; an external engine
    * replays it as an unrolled CTE chain.
    *
    * Shape: the [[pageRank]] posture — degrees joined onto the
    * deduplicated edge table ONCE and `localCheckpoint`ed; each
    * half-step is one (scores ⋈ edges) shuffle + one map-side-combined
    * aggregate; per-iteration checkpoints truncate the unrolled
    * lineage. */
  def salsa(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .filter(col("_src").isNotNull && col("_dst").isNotNull)
      .distinct()
    val outdeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_outdeg"))
    val indeg = e.groupBy(col("_dst")).agg(count(lit(1)).as("_indeg"))
    val edgesDeg = e.join(outdeg, "_src").join(indeg, "_dst")
      .localCheckpoint(eager = false)
    val srcs = edgesDeg.select(col("_src")).distinct()
      .localCheckpoint(eager = false)
    // |src nodes| is an O(1) scalar — a driver literal, not a
    // broadcast-join (the [[pageRank]] discipline); floorDiv ≡ ldiv
    val nSrc = srcs.count()
    var h = srcs
      .select(col("_src").as("node"),
        lit(Math.floorDiv(scale, nSrc)).as("_h"))
      .localCheckpoint(eager = false)
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = h.join(edgesDeg, h("node") === edgesDeg("_src"))
        .groupBy(col("_dst"))
        .agg(sum(ldiv(col("_h"), col("_outdeg"))).as("_a"))
        .localCheckpoint(eager = false)
      h = a.join(edgesDeg, Seq("_dst"))
        .groupBy(col("_src"))
        .agg(sum(ldiv(col("_a"), col("_indeg"))).as("_h"))
        .select(col("_src").as("node"), col("_h"))
        .localCheckpoint(eager = false)
    }
    h.select(col("node"), col("_h").as("hub_fp"))
      .join(a.select(col("_dst").as("node"), col("_a").as("auth_fp")),
        Seq("node"), "full_outer")
  }

  /** MULTI-SOURCE BFS: shortest hop count from a seed set over the
    * undirected form of the edge table, bounded at `maxHops` — the
    * reachability pass behind "how far is every document/host from the
    * trusted core" (crawl-frontier depth, contamination blast radius).
    * Layered synchronous BFS: the first layer that reaches a node IS
    * its hop count, so no per-node min is ever recomputed. Returns
    * (`node`, `hops`) for reached nodes only (hop 0 = seed ∩ graph;
    * seeds absent from the graph are ignored, unreached nodes are
    * absent — the caller left-joins if it wants NULLs).
    *
    * Shape: per layer one (frontier ⋈ edges) shuffle + one anti-join
    * against the settled set + a driver emptiness probe (the [[kCore]]
    * loop posture); settled/frontier are `localCheckpoint`ed so the
    * unrolled lineage never replays earlier layers. Early-exits when a
    * layer is empty. */
  def shortestHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("_a"),
        greatest(col(srcCol), col(dstCol)).as("_b"))
      .filter(col("_a").isNotNull && col("_b").isNotNull &&
        col("_a") =!= col("_b"))
      .distinct()
    val und = canon.select(col("_a").as("_u"), col("_b").as("_v"))
      .unionByName(canon.select(col("_b").as("_u"), col("_a").as("_v")))
      .localCheckpoint(eager = false)
    val sd = seeds.select(col(s"`$seedCol`").as("_seed")).distinct()
    var dist = und.select(col("_u").as("node")).distinct()
      .join(broadcast(sd), col("node") === col("_seed"), "left_semi")
      .withColumn("hops", lit(0))
      .localCheckpoint(eager = false)
    var frontier = dist
    var hop = 1
    while (hop <= maxHops) {
      val nxt = frontier
        .join(und, frontier("node") === und("_u"))
        .select(col("_v").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint(eager = false)
      if (nxt.isEmpty) return dist
      dist = dist.unionByName(nxt).localCheckpoint(eager = false)
      frontier = nxt
      hop += 1
    }
    dist
  }
}
