package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed connected components over a pair table — the cluster
  * resolution step a near-dup pipeline needs between "pairs detected" and
  * "one representative kept": pairwise dropping (remove the higher id of
  * each pair) can leave chained duplicates behind (A–B and A–C pair, B–C
  * never does ⇒ dropping per pair keeps B even though {A,B,C} is one
  * duplicate cluster); components keep exactly one doc per cluster.
  *
  * Two execution paths behind one contract:
  *
  *  - **small edge sets** (≤ [[defaultDriverMaxEdges]], counted after
  *    dedup): classic union-find on the driver — near-dup pair tables are
  *    ≪ corpus (only detected duplicates appear), so at the usual scale
  *    this is one collect of two id columns and microseconds of CPU,
  *    instead of a multi-round join loop whose per-round job overhead
  *    dwarfs the data. The bound keeps driver memory capped (~tens of MB
  *    at the default).
  *  - **large edge sets**: alternating large-star / small-star (Kiveris
  *    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
  *    each round is two groupBy-join passes over the CURRENT edge set,
  *    contracting toward a star per component (every node → its
  *    component's min id) in O(log n) rounds. No vertex ever holds its
  *    whole component in memory and no round shuffles more than
  *    O(|edges|) rows — the path that survives a pair table too big for
  *    any single machine. Each round `localCheckpoint`s the new edge set
  *    (truncating the otherwise exponentially nesting join lineage) and
  *    runs one exact set-equality action for the convergence test.
  *
  * Either way the operator is EAGER — calling it runs jobs — which is
  * intrinsic to iterate-to-fixpoint on data-dependent depth
  * (GraphX/GraphFrames do the same).
  */
object ConnectedComponents {

  /** Driver path cutover. Collected edges are EXTERNAL Rows (Row wrapper
    * + field array + two boxed ids ≈ 100–150 B each) and union-find adds
    * up to 2 boxed HashMap entries per edge, so 1M edges costs roughly
    * 300–500 MB peak on the driver — inside a default-sized driver heap
    * with headroom, and still far above every near-dup pair table seen in
    * practice at matching corpus scale (only detected duplicates appear).
    * Raise it only with a driver sized for ~0.5 KB per edge. */
  val defaultDriverMaxEdges: Long = 1L << 20

  /** Resolve components of the undirected graph given by a pair table.
    *
    * @param pairs one row per undirected edge; self-loops and duplicate
    *   rows are tolerated (ignored / deduped)
    * @param aCol  left endpoint column (any orderable id type)
    * @param bCol  right endpoint column (same type as aCol)
    * @param driverMaxEdges deduped-edge-count threshold below which the
    *   driver union-find path runs; 0 forces the distributed loop
    * @return one row per node that appears in `pairs`:
    *   (`id`, `component`) where `component` is the MINIMUM id in the
    *   node's connected component (so `id === component` marks the
    *   canonical representative). Nodes absent from `pairs` (singletons)
    *   are the caller's to re-attach — typically
    *   `coalesce(component, id)` after a left join.
    */
  def apply(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 50,
      driverMaxEdges: Long = defaultDriverMaxEdges): DataFrame = {
    val init = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .filter(col("src") =!= col("dst")) // also drops null endpoints
      .distinct()
      .localCheckpoint()
    val nEdges = init.count()
    val idOrdering = ordering(init.schema("src").dataType)
    if (nEdges <= driverMaxEdges && idOrdering.isDefined)
      driverUnionFind(init, idOrdering.get)
    else starLoop(init, nEdges, maxIter)
  }

  /** Natural ordering of the collected (EXTERNAL) representation of an id
    * type; None = type we don't order on the driver → distributed path. */
  private def ordering(dt: DataType): Option[Ordering[Any]] = {
    def of[T](o: Ordering[T]): Option[Ordering[Any]] =
      Some(o.asInstanceOf[Ordering[Any]])
    dt match {
      case LongType    => of(Ordering.Long)
      case IntegerType => of(Ordering.Int)
      case ShortType   => of(Ordering.Short)
      case ByteType    => of(Ordering.Byte)
      case StringType  => of(Ordering.String)
      case _           => None
    }
  }

  /** Union-find with path compression + min-id roots, over the collected
    * edge list. One Spark job (the collect); everything else is driver
    * CPU linear in |edges| α(n). */
  private def driverUnionFind(edges: DataFrame,
      ord: Ordering[Any]): DataFrame = {
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.collect().foreach { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        // min id becomes the root, so find() yields the component min
        if (ord.lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val dt = edges.schema("src").dataType
    val out = new java.util.ArrayList[Row](parent.size())
    parent.keySet().forEach(k => out.add(Row(k, find(k))))
    edges.sparkSession.createDataFrame(out, StructType(Seq(
      StructField("id", dt, nullable = false),
      StructField("component", dt, nullable = false))))
  }

  /** The alternating star contraction — O(|edges|) shuffle per round,
    * O(log n) rounds, exact set-equality convergence test. */
  private def starLoop(init: DataFrame, nEdges: Long,
      maxIter: Int): DataFrame = {
    var edges = init
    var converged = nEdges == 0
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
