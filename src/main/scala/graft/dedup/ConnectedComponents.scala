package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair table — the cluster
  * resolution step a near-dup pipeline needs between "pairs detected" and
  * "one representative kept": pairwise dropping (remove the higher id of
  * each pair) can leave chained duplicates behind (A–B and A–C pair, B–C
  * never does ⇒ dropping per pair keeps B even though {A,B,C} is one
  * duplicate cluster); components keep exactly one doc per cluster.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each round is
  * two groupBy-join passes over the CURRENT edge set, and the edge set
  * contracts toward a star per component (every node → its component's
  * min id) in O(log n) rounds. No vertex ever holds its whole component in
  * memory and no round shuffles more than O(|edges|) rows, so the operator
  * scales to pair tables far beyond one machine — unlike label propagation
  * whose round count is the component DIAMETER, not its log.
  *
  * Scale notes (100 TB corpora): the input here is the near-dup PAIR table
  * (≪ corpus — only detected duplicates appear), and each iteration
  * `localCheckpoint`s the new edge set (truncating the otherwise
  * exponentially nesting join lineage) and runs one exact set-difference
  * action for the convergence test. This operator is therefore EAGER —
  * calling it runs jobs — which is intrinsic to iterate-to-fixpoint on
  * data-dependent depth (GraphX/GraphFrames do the same).
  */
object ConnectedComponents {

  /** Resolve components of the undirected graph given by a pair table.
    *
    * @param pairs one row per undirected edge; self-loops and duplicate
    *   rows are tolerated (ignored / deduped)
    * @param aCol  left endpoint column (any orderable id type)
    * @param bCol  right endpoint column (same type as aCol)
    * @return one row per node that appears in `pairs`:
    *   (`id`, `component`) where `component` is the MINIMUM id in the
    *   node's connected component (so `id === component` marks the
    *   canonical representative). Nodes absent from `pairs` (singletons)
    *   are the caller's to re-attach — typically
    *   `coalesce(component, id)` after a left join.
    */
  def apply(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 50): DataFrame = {
    val init = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()

    var edges = init
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: for each node u over the SYMMETRIZED neighborhood,
      // m = min(N(u) ∪ {u}); connect every strictly larger neighbor to m.
      // Keeps every component connected while strictly shrinking large
      // nodes' distance to the minimum.
      val nbrs = edges.union(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      val mins = nbrs.groupBy(col("src").as("u"))
        .agg(min(col("dst")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = nbrs.join(mins, col("src") === col("u"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      // small-star: direct every edge from its larger to its smaller
      // endpoint; for each node u, m = min of its smaller neighborhood;
      // re-point u and all those neighbors at m.
      val dir = large.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      val smins = dir.groupBy("u").agg(min(col("v")).as("m"))
      val next = dir.join(smins, "u")
        .select(col("v").as("src"), col("m").as("dst"))
        .union(smins.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint() // truncate the per-round join lineage
      // exact convergence: the edge SET is unchanged (both differences
      // empty). Star graphs are fixpoints of both operations, so equality
      // ⇒ done; count-only checks can alias distinct edge sets.
      converged = next.exceptAll(edges).isEmpty && edges.exceptAll(next).isEmpty
      edges = next
      iter += 1
    }
    require(converged || edges.isEmpty,
      s"connectedComponents did not converge in $maxIter iterations")
    // at the fixpoint every non-minimum node has exactly one out-edge to
    // its component min; the mins themselves appear only as dst
    edges.select(col("src").as("id"), col("dst").as("component"))
      .union(edges.select(col("dst").as("id"), col("dst").as("component")))
      .distinct()
  }
}
