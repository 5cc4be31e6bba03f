package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Graph

/** Graph analytics: PageRank's fixed-point recurrence against a
  * hand-computed reference, the invariants that make it trustworthy
  * (mass conservation up to floor-truncation, partitioning
  * determinism), and the degree summary. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // a→b, a→c, b→c: c is dangling, a has fan-out 2 — both division
  // paths and the dangling redistribution are exercised
  private def triangle = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    .toDF("src", "dst")

  test("pageRank matches the hand-computed fixed-point recurrence") {
    // scale 1000, damping 1/2 — small enough to hand-verify:
    //   r0 = 333 each, teleport = 1000 div 6 = 166
    //   iter1: dang=333 (c), dang div 3=111
    //     c(b)=333 div 2=166; c(c)=166+333=499
    //     r1 = (a 221, b 304, c 471)
    //   iter2: dang=471, div 3=157
    //     c(b)=221 div 2=110; c(c)=110+304=414
    //     r2 = (a 244, b 299, c 451)
    val r = Graph.pageRank(triangle, "src", "dst", iters = 2,
        dampingNum = 1L, dampingDen = 2L, scale = 1000L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("a" -> 244L, "b" -> 299L, "c" -> 451L))
  }

  test("duplicate edges collapse to the simple digraph") {
    val dup = triangle.union(triangle).union(triangle)
    val a = Graph.pageRank(triangle, "src", "dst", iters = 2,
      dampingNum = 1L, dampingDen = 2L, scale = 1000L).collect().toSet
    val b = Graph.pageRank(dup, "src", "dst", iters = 2,
      dampingNum = 1L, dampingDen = 2L, scale = 1000L).collect().toSet
    assert(a === b)
  }

  test("rank mass is conserved up to floor truncation; identical across partitionings") {
    // 60-node graph: ring + chords + a dangling tail
    val edges = spark.range(60).select(
        concat(lit("n"), col("id")).as("src"),
        concat(lit("n"), (col("id") + 1) % 50).as("dst"))
      .union(spark.range(20).select(
        concat(lit("n"), col("id")).as("src"),
        concat(lit("n"), (col("id") * 7 + 3) % 50).as("dst")))
    val r1 = Graph.pageRank(edges, "src", "dst", iters = 4)
    val total = r1.agg(sum("rank_fp")).as[Long].head()
    val n = 60L
    // each of the ~3 floor divisions per node per iteration loses < 1
    // unit; teleport truncation loses < N per iteration
    assert(total <= 1000000000000L)
    assert(total > 1000000000000L - 5 * 4 * n * 2,
      s"mass drifted too far: $total")

    val r2 = Graph.pageRank(edges.repartition(13), "src", "dst", iters = 4)
    assert(r1.collect().toSet === r2.collect().toSet,
      "fixed-point ranks must be independent of input partitioning")
  }

  test("degrees: per-node in/out counts with zero-fill on both sides") {
    val d = Graph.degrees(triangle, "src", "dst")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(d === Set(("a", 2L, 0L), ("b", 1L, 1L), ("c", 0L, 2L)))
  }

  test("personalizedPageRank: mass concentrates near the seed set and " +
      "decays with distance; off-seed teleport is zero") {
    // chain s -> a -> b -> c -> s (cycle keeps mass flowing) plus a far
    // branch b -> d
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("c", "s"),
      ("b", "d")).toDF("src", "dst")
    val seeds = Seq("s").toDF("n")
    val r = Graph.personalizedPageRank(edges, "src", "dst", seeds, "n",
        iters = 4)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // the seed holds the teleport mass; trust decays along the chain
    assert(r("s") > r("a") && r("a") > r("b") && r("b") > r("c"))
    // d is dangling and far: least mass (shares b's inflow with c but
    // gets no teleport and no dangling return)
    assert(r("d") <= r("c"))
    // hand-check the first iteration: d=1, r0 = (s:1e12, others 0)
    //   iter1: dang = r(c)+r(d) = 0; contrib(a) = 1e12
    //   r1(s) = 15e13 div 100 = 1.5e11 ; r1(a) = 85e12 div 100 = 8.5e11
    //   r1(b..d) = 0
    val r1 = Graph.personalizedPageRank(edges, "src", "dst", seeds, "n",
        iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1("s") === 150000000000L && r1("a") === 850000000000L)
    assert(r1("b") === 0L && r1("c") === 0L && r1("d") === 0L)
    // seeds absent from the graph are ignored (|S ∩ V| normalization)
    val r2 = Graph.personalizedPageRank(edges, "src", "dst",
      Seq("s", "ghost").toDF("n"), "n", iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r2 === r1)
  }

  test("labelPropagate: hand-traced frontier growth, majority vote with " +
      "min-label ties, seed clamping, unreachable stays NULL") {
    // chain s1 - a - b - c, plus s2 - a (two seeds vote on a), and an
    // isolated pair x - y with no seed
    val edges = Seq(("s1", "a"), ("a", "b"), ("b", "c"), ("s2", "a"),
      ("x", "y")).toDF("src", "dst")
    val seeds = Seq(("s1", "L1"), ("s2", "L2")).toDF("n", "l")
    def run(iters: Int) =
      Graph.labelPropagate(edges, "src", "dst", seeds, "n", "l", iters)
        .collect().map(r => r.getString(0) ->
          Option(r.getString(1))).toMap
    val r1 = run(1)
    // a sees L1 and L2 once each: tie → min label L1; b sees nothing yet
    assert(r1("a") === Some("L1") && r1("b") === None && r1("c") === None)
    assert(r1("s1") === Some("L1") && r1("s2") === Some("L2")) // clamped
    val r2 = run(2)
    assert(r2("b") === Some("L1") && r2("c") === None)
    val r3 = run(3)
    assert(r3("c") === Some("L1"))
    // the seedless component never labels
    assert(r3("x") === None && r3("y") === None)
    // seeds never drift even when neighbors disagree
    assert(r3("s1") === Some("L1") && r3("s2") === Some("L2"))
    // deterministic under repartitioning
    val again = Graph.labelPropagate(edges.repartition(7), "src", "dst",
      seeds, "n", "l", 3).collect().map(r =>
        r.getString(0) -> Option(r.getString(1))).toMap
    assert(again === r3)
  }

  test("labelPropagate: majority beats minority; duplicate seed rows collapse") {
    // t gets two L2 neighbors vs one L1 neighbor: majority L2 wins
    // even though L1 < L2 lexicographically
    val edges = Seq(("m1", "t"), ("m2", "t"), ("k1", "t"))
      .toDF("src", "dst")
    val seeds = Seq(("m1", "L2"), ("m2", "L2"), ("k1", "L1"),
      ("m1", "L2")).toDF("n", "l")
    val r = Graph.labelPropagate(edges, "src", "dst", seeds, "n", "l", 1)
      .collect().map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(r("t") === Some("L2"))
  }

  test("triangles: K4 is all-clique, pendant nodes get NULL clustering, " +
      "dirty edges (dupes/reversals/self-loops) are ignored") {
    // K4 on 1..4 with noise: duplicate, reversed, self-loop
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (2L, 1L), (1L, 2L), (3L, 3L)).toDF("s", "d")
    val r = Graph.triangles(k4, "s", "d")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    r.values.foreach { row =>
      assert(row.getLong(1) == 3L && row.getLong(2) == 3L)
      assert(row.getLong(3) == 1000000L) // clustering = 1
    }

    // triangle {1,2,3} + pendant 3-4
    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val t = Graph.triangles(tp, "s", "d")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(t(3L).getLong(1) == 3L && t(3L).getLong(2) == 1L)
    assert(t(3L).getLong(3) == 2000000L / 6L) // 2t/(d(d-1)) = 1/3
    assert(t(4L).getLong(2) == 0L && t(4L).isNullAt(3)) // d=1
    assert(t(1L).getLong(2) == 1L && t(1L).getLong(3) == 1000000L)

    // star: no triangles anywhere
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("s", "d")
    assert(Graph.triangles(star, "s", "d")
      .agg(sum(col("triangles"))).head.getLong(0) == 0L)
  }

  test("kCore: cascade peel (pendant chain unravels), K4 core survives, " +
      "within-core degrees, k beyond the graph empties it") {
    // K4 on 1..4, plus a chain 4-5-6 hanging off it: at k=2 the chain
    // unravels over TWO rounds (6 peels first, THEN 5 — the cascade the
    // synchronous fixpoint must capture), leaving exactly K4 with
    // within-core degree 3
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("s", "d")
    val r = Graph.kCore(g, "s", "d", k = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), r.toString)
    // k=3: K4 still stands (every node keeps 3 neighbors)
    val r3 = Graph.kCore(g, "s", "d", k = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=4: nothing survives
    assert(Graph.kCore(g, "s", "d", k = 4).isEmpty)
    // dirty edges (dupes/reversals/self-loops) are ignored like triangles
    val dirty = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L), (2L, 3L),
      (1L, 3L)).toDF("s", "d")
    val rd = Graph.kCore(dirty, "s", "d", k = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rd == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("declared q_pagerank runs on sf0.001 with full coverage of both node types") {
    val df = SparkEntry.queries("q_pagerank")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_.getString(0))
    assert(nodes.exists(_.startsWith("s")) && nodes.exists(_.startsWith("c")))
    // descending rank order with the node tie-break
    val ranks = rows.map(_.getLong(1))
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x >= y })
    // suppliers have out-edges, customers are dangling — yet every node
    // must hold at least the teleport mass
    assert(ranks.last > 0L)
  }

  test("linkPrediction: hand-traced common-neighbor Jaccard, adjacent " +
      "pairs excluded, hub exclusion empties the capped universe") {
    // triangle 1-2-3 plus 4 adjacent to {2,3} and a pendant 5 on 1:
    // the only non-adjacent pair with 2 common neighbors is (1,4)
    // through centers 2 and 3 — jaccard 2/(3+2-2) = 2/3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L)).toDF("src", "dst")
    val r = Graph.linkPrediction(edges, "src", "dst").collect()
    // resource allocation through centers 2 and 3 (degree 3 each):
    // 2·⌊1e6/3⌋ = 666666 — coincidentally equal to the jaccard micros
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toSeq ==
      Seq((1L, 4L, 2L, 3L, 2L, 666666L, 666666L)))
    // minCommon = 1 admits the single-neighbor pairs through node 1
    val r1 = Graph.linkPrediction(edges, "src", "dst", minCommon = 1L)
      .orderBy("id_a", "id_b").collect()
    assert(r1.map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSeq == Seq((1L, 4L, 2L), (2L, 5L, 1L), (3L, 5L, 1L)))
    // jaccard for (2,5): common {1}, capped neighborhoods |N(2)|=3,
    // |N(5)|=1 — 1/(3+1-1) = 1/3 floored; RA through center 1 (deg 3)
    assert(r1(1).getLong(5) == 333333L && r1(1).getLong(6) == 333333L)
    // cap at 2 excludes every degree-3 center (1, 2, 3): the (1,4)
    // evidence disappears and nothing else reaches minCommon
    val rc = Graph.linkPrediction(edges, "src", "dst",
      maxCenterDegree = 2L, minCommon = 1L).collect()
    assert(rc.isEmpty)
    // dirty input: self-loops, duplicates, reversed duplicates collapse
    val dirty = edges.unionAll(Seq((2L, 1L), (1L, 1L), (1L, 2L))
      .toDF("src", "dst"))
    val rd = Graph.linkPrediction(dirty, "src", "dst").collect()
    assert(rd.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 4L)))
  }

  test("modularity: hand-computed Q on the bridged-triangles graph, " +
      "singleton penalty, one-community zero, dirty-edge dedup") {
    // triangles a-b-c and d-e-f bridged by c-d: m = 7,
    // degrees (2,2,3,3,2,2)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")).toDF("s", "t")
    def lab(rows: (String, Option[String])*) = rows.toSeq.toDF("n", "l")
    // the natural split: intra 6, d_X = d_Y = 7 ⇒
    // Q = (4·7·6 − 98)/196 = 70/196 → 357142
    val r = Graph.modularity(edges, "s", "t",
      lab("a" -> Some("X"), "b" -> Some("X"), "c" -> Some("X"),
        "d" -> Some("Y"), "e" -> Some("Y"), "f" -> Some("Y")),
      "n", "l").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (6L, 2L, 7L, 6L, 357142L))
    // an unlabeled node becomes a singleton: intra 4,
    // Σd² = 49+25+4 ⇒ Q = 34/196 → 173469
    val rs = Graph.modularity(edges, "s", "t",
      lab("a" -> Some("X"), "b" -> Some("X"), "c" -> Some("X"),
        "d" -> Some("Y"), "e" -> Some("Y"), "f" -> None), "n", "l").head
    assert((rs.getLong(1), rs.getLong(3), rs.getLong(4)) ==
      (3L, 4L, 173469L))
    // one community holds everything: Q = 0 exactly
    val r1 = Graph.modularity(edges, "s", "t",
      lab(Seq("a", "b", "c", "d", "e", "f").map(_ -> Some("Z")): _*),
      "n", "l").head
    assert(r1.getLong(4) == 0L)
    // duplicates / reversals / self-loops collapse before counting
    val dirty = edges.unionAll(Seq(("b", "a"), ("a", "a"), ("a", "b"))
      .toDF("s", "t"))
    val rdir = Graph.modularity(dirty, "s", "t",
      lab("a" -> Some("X"), "b" -> Some("X"), "c" -> Some("X"),
        "d" -> Some("Y"), "e" -> Some("Y"), "f" -> Some("Y")),
      "n", "l").head
    assert(rdir.toSeq == r.toSeq)
  }

  test("assortativity: star is exactly -1, triangle+pendant hits the " +
      "negative floor, regular graph is NULL, direction is ignored") {
    // star x-{a,b,c}: every edge pairs degree 1 with degree 3 — the
    // textbook perfectly-disassortative graph
    val star = Seq(("x", "a"), ("x", "b"), ("x", "c")).toDF("s", "d")
    val rs = Graph.assortativity(star, "s", "d").head
    assert(rs.getLong(0) == 3L && rs.getLong(1) == -1000000L)
    // triangle a-b-c + pendant c-d: M=4, S1=18, S2=44, S3=19
    //   num = (4*4*19 - 324)*1e6 = -20e6, den = 2*4*44 - 324 = 28
    //   r_x1e6 = floor(-20e6/28) = -714286 (floor, NOT truncation)
    val tp = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
      .toDF("s", "d")
    val rt = Graph.assortativity(tp, "s", "d").head
    assert(rt.getLong(0) == 4L && rt.getLong(1) == -714286L)
    // 4-cycle: all degrees equal, zero variance, r undefined
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("s", "d")
    assert(Graph.assortativity(cyc, "s", "d").head.isNullAt(1))
    // reversed + duplicated edges collapse to the same undirected graph
    val dup = tp.union(tp.select(col("d"), col("s")))
    assert(Graph.assortativity(dup, "s", "d").head.getLong(1)
      == -714286L)
  }

  test("salsa: hand-traced half-steps on the 2-hub bipartite graph; " +
      "one-sided nodes carry NULL on the absent side") {
    // a->x, a->y, b->y; outdeg a=2 b=1; indeg x=1 y=2; scale 1200
    //   h0: a=600, b=600
    //   a1(x) = 600//2 = 300; a1(y) = 600//2 + 600 = 900
    //   h1(a) = 300//1 + 900//2 = 750; h1(b) = 900//2 = 450
    val e = Seq(("a", "x"), ("a", "y"), ("b", "y")).toDF("s", "d")
    val r = Graph.salsa(e, "s", "d", iters = 1, scale = 1200L)
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)),
         if (x.isNullAt(2)) None else Some(x.getLong(2)))).toMap
    assert(r === Map(
      "a" -> (Some(750L), None), "b" -> (Some(450L), None),
      "x" -> (None, Some(300L)), "y" -> (None, Some(900L))))
    // mass conservation up to floor drift: hub mass stays within
    // (#divisions) units of scale
    val hubSum = 750L + 450L
    assert(hubSum <= 1200L && hubSum >= 1200L - 4L)
  }

  test("shortestHops: layered BFS from a multi-seed set — first touch " +
      "is the hop count, absent seeds ignored, bound + early exit") {
    // path a-b-c-d plus disconnected e-f; seeds {a, zz (absent)}
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"))
      .toDF("s", "d")
    val seeds = Seq("a", "zz").toDF("node")
    val r = Graph.shortestHops(e, "s", "d", seeds, "node", maxHops = 2)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    // d is 3 hops (beyond the bound), e/f unreachable — all absent
    assert(r === Map("a" -> 0, "b" -> 1, "c" -> 2))
    // early exit: the star saturates at layer 1; a generous bound
    // must not change the result (and the loop stops on the empty
    // layer rather than running 50 rounds)
    val star = Seq(("x", "a"), ("x", "b"), ("x", "c")).toDF("s", "d")
    val rs = Graph.shortestHops(star, "s", "d",
        Seq("x").toDF("node"), "node", maxHops = 50)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(rs === Map("x" -> 0, "a" -> 1, "b" -> 1, "c" -> 1))
    // hop-0 only: maxHops = 0 returns just the seeded nodes
    val r0 = Graph.shortestHops(e, "s", "d", seeds, "node", maxHops = 0)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r0 === Map("a" -> 0))
  }
}
