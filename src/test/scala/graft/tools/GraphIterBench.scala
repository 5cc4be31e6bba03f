package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling DECOMPOSITION for the graph-iterative family (SCALE.md,
  * round-11 evidence): the r10 verdict observed sf1/sf0.1 wall-clock
  * ratios of 5–7× for `q_salsa`, `q_assortativity`, `q_graph_hops`,
  * `q_modularity`, `q_textrank` at 10× data and asked whether that is a
  * superlinear DATA term (a scale-killer at 100×) or a large FIXED
  * per-round job overhead diluting at scale (the asserted posture).
  * This tool separates the two directly:
  *
  *  1. K-SWEEP: run each query end-to-end at K ∈ {1, 2, 5, 10} copies
  *     of sf0.1 ([[MakeScaledTestdata]] worlds) and fit t(K) = a + b·K
  *     by least squares. A superlinear data term shows as positive
  *     curvature (t(10) well above the line through the small-K
  *     points); reported as `lin10` = (a + 10b) vs measured t(10).
  *
  *  2. ROUNDS-SWEEP (iterative ops): at FIXED data (K=1 and K=10),
  *     measure t(iters=lo) and t(iters=hi); the marginal per-round cost
  *     m = (t_hi − t_lo)/(hi − lo) contains NO fixed setup, so
  *     m(K=10)/m(K=1) IS the data-term ratio per round — ≤ ~10 means
  *     the per-round work is linear in data.
  *
  *  3. REPEAT-SWEEP (non-iterative ops — r11 verdict task 7):
  *     `q_assortativity` and `q_modularity` have no rounds knob, so
  *     their per-round analog is the marginal cost per APPLICATION:
  *     with inputs built ONCE and checkpointed, run the op `lo` and
  *     `hi` times back to back — the difference removes the one-time
  *     setup (edge derivation, label-prop, JIT) exactly like the
  *     rounds-sweep, leaving the pure data term, and m(K=10)/m(K=1)
  *     is the data-term ratio at 10× data.
  *
  * Usage: Test/runMain graft.tools.GraphIterBench [baseOutDir] [section]
  * (generates the scaled worlds under baseOutDir when absent;
  * section ∈ {all, ksweep, rounds, repeat}, default all). */
object GraphIterBench {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def shipmentEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("c"), col("o_custkey").cast("string")).as("dst"))

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def minOf(n: Int)(f: => Unit): Double =
    (1 to n).map { _ => System.gc(); time(f) }.min

  def main(args: Array[String]): Unit = {
    val baseOut = args.headOption.getOrElse("/tmp/graft_scaled")
    val section = args.lift(1).getOrElse("all")
    require(Set("all", "ksweep", "rounds", "repeat")(section),
      s"unknown section '$section' (all|ksweep|rounds|repeat)")
    def run(s: String): Boolean = section == "all" || section == s
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ks = Seq(1, 2, 5, 10)
    val dirs: Map[Int, String] = ks.map { k =>
      if (k == 1) k -> "/root/testdata/sf0.1"
      else {
        val d = s"$baseOut/k$k"
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(
            s"$d/lineitem.parquet"))) {
          println(s"[gen] building K=$k world at $d")
          MakeScaledTestdata.generate(spark, d, k)
        }
        k -> d
      }
    }.toMap

    import graft.analytics.Graph
    val ops: Seq[(String, String => Unit)] = Seq(
      "q_salsa" -> { d: String =>
        Graph.salsa(shipmentEdges(spark, d), "src", "dst", iters = 2)
          .count(); () },
      "q_assortativity" -> { d: String =>
        Graph.assortativity(shipmentEdges(spark, d), "src", "dst")
          .count(); () },
      "q_graph_hops" -> { d: String =>
        val seeds = t(spark, d, "supplier")
          .filter(col("s_suppkey") % 97 === 0)
          .select(concat(lit("s"), col("s_suppkey").cast("string"))
            .as("node"))
        Graph.shortestHops(shipmentEdges(spark, d), "src", "dst",
          seeds, "node", maxHops = 4).count(); () },
      "q_modularity" -> { d: String =>
        val seeds = t(spark, d, "supplier")
          .filter(col("s_suppkey") % 3 === 0)
          .join(t(spark, d, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .select(concat(lit("s"), col("s_suppkey").cast("string"))
            .as("node"), col("n_name").as("lbl"))
        val edges = shipmentEdges(spark, d).localCheckpoint(false)
        val communities = Graph.labelPropagate(
          edges, "src", "dst", seeds, "node", "lbl", iters = 3)
        Graph.modularity(edges, "src", "dst", communities,
          "node", "label").count(); () },
      "q_textrank" -> { d: String =>
        val pairs = t(spark, d, "documents")
          .select(explode(graft.text.TextOps
            .adjacentTokenPairs(col("text"), minLen = 4)).as("_p"))
          .select(col("_p.src").as("src"), col("_p.dst").as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        Graph.pageRank(edges, "src", "dst", iters = 3)
          .orderBy(col("rank_fp").desc, col("node")).limit(50)
          .count(); () })

    // ---- 1. K-sweep + least-squares linear fit --------------------------
    // the fit uses ONLY the small-K points {1, 2, 5} and EXTRAPOLATES to
    // K=10: including the K=10 point would let its leverage drag the
    // line toward itself and under-report exactly the curvature this
    // sweep exists to detect
    if (run("ksweep")) {
    println("== K-sweep: t(K) end-to-end, min-of-2; fit over K<=5, " +
      "t(10) held out ==")
    val fits = ops.map { case (name, run) =>
      run(dirs(1)) // warm once (JIT/codegen) before any timing
      val pts = ks.map(k => k.toDouble -> minOf(2)(run(dirs(k))))
      val fitPts = pts.init // {1, 2, 5}
      val n = fitPts.size.toDouble
      val sx = fitPts.map(_._1).sum; val sy = fitPts.map(_._2).sum
      val sxx = fitPts.map(p => p._1 * p._1).sum
      val sxy = fitPts.map(p => p._1 * p._2).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val lin10 = a + 10 * b
      val t10 = pts.last._2
      println(f"$name%-18s " + pts.map(p =>
          f"K=${p._1.toInt}%2d ${p._2}%6.2fs").mkString(" ") +
        f"  fit(K<=5) a=$a%5.2f b=$b%5.3f  t(10)=$t10%6.2f vs " +
        f"extrapolated=$lin10%6.2f")
      (name, a, b, t10, lin10)
    }
    }

    // ---- 2. rounds-sweep at fixed data: marginal per-round cost ---------
    def marginal(d: String, lo: Int, hi: Int)(run: Int => Unit): Double = {
      run(lo) // warm
      val tl = minOf(2)(run(lo)); val th = minOf(2)(run(hi))
      (th - tl) / (hi - lo)
    }
    if (run("rounds")) {
    println("== rounds-sweep: marginal per-round cost at K=1 vs K=10 ==")
    val iterOps: Seq[(String, (String, Int) => Unit)] = Seq(
      "salsa" -> { (d: String, it: Int) =>
        Graph.salsa(shipmentEdges(spark, d), "src", "dst", iters = it)
          .count(); () },
      "graph_hops" -> { (d: String, it: Int) =>
        val seeds = t(spark, d, "supplier")
          .filter(col("s_suppkey") % 97 === 0)
          .select(concat(lit("s"), col("s_suppkey").cast("string"))
            .as("node"))
        Graph.shortestHops(shipmentEdges(spark, d), "src", "dst",
          seeds, "node", maxHops = it).count(); () },
      "label_prop" -> { (d: String, it: Int) =>
        val seeds = t(spark, d, "supplier")
          .filter(col("s_suppkey") % 3 === 0)
          .join(t(spark, d, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .select(concat(lit("s"), col("s_suppkey").cast("string"))
            .as("node"), col("n_name").as("lbl"))
        Graph.labelPropagate(shipmentEdges(spark, d), "src", "dst",
          seeds, "node", "lbl", iters = it).count(); () },
      "pagerank_text" -> { (d: String, it: Int) =>
        val pairs = t(spark, d, "documents")
          .select(explode(graft.text.TextOps
            .adjacentTokenPairs(col("text"), minLen = 4)).as("_p"))
          .select(col("_p.src").as("src"), col("_p.dst").as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        Graph.pageRank(edges, "src", "dst", iters = it).count(); () })
    iterOps.foreach { case (name, run) =>
      val (lo, hi) = (2, 6)
      val m1 = marginal(dirs(1), lo, hi)(it => run(dirs(1), it))
      val m10 = marginal(dirs(10), lo, hi)(it => run(dirs(10), it))
      println(f"$name%-14s per-round marginal K=1 ${m1}%6.3fs  " +
        f"K=10 ${m10}%6.3fs  data-term ratio ${m10 / m1}%5.2fx " +
        "(<= ~10x = linear per-round work)")
    }
    }

    // ---- 3. repeat-sweep for the non-iterative flagged ops ---------------
    // assortativity/modularity measured DIRECTLY (not via label_prop
    // inheritance): inputs built once + checkpointed per world, the op
    // applied lo..hi times — the marginal per application is the pure
    // data term (setup and JIT cancel in the difference).
    if (run("repeat")) {
    println("== repeat-sweep: marginal per-APPLICATION cost, K=1 vs " +
      "K=10 (non-iterative ops, inputs checkpointed) ==")
    val repOps: Seq[(String, String => Int => Unit)] = Seq(
      "assortativity" -> { d: String =>
        val edges = shipmentEdges(spark, d).localCheckpoint(false)
        edges.count() // materialize outside the timings
        (n: Int) => (1 to n).foreach { _ =>
          Graph.assortativity(edges, "src", "dst").count(); () }
      },
      "modularity" -> { d: String =>
        val edges = shipmentEdges(spark, d).localCheckpoint(false)
        val seeds = t(spark, d, "supplier")
          .filter(col("s_suppkey") % 3 === 0)
          .join(t(spark, d, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .select(concat(lit("s"), col("s_suppkey").cast("string"))
            .as("node"), col("n_name").as("lbl"))
        val communities = Graph.labelPropagate(
            edges, "src", "dst", seeds, "node", "lbl", iters = 3)
          .localCheckpoint(false)
        communities.count() // the op under test is modularity ALONE
        (n: Int) => (1 to n).foreach { _ =>
          Graph.modularity(edges, "src", "dst", communities,
            "node", "label").count(); () }
      })
    repOps.foreach { case (name, mk) =>
      val (lo, hi) = (1, 3)
      val r1 = mk(dirs(1))
      val m1 = marginal(dirs(1), lo, hi)(r1)
      val r10 = mk(dirs(10))
      val m10 = marginal(dirs(10), lo, hi)(r10)
      println(f"$name%-14s per-application marginal K=1 ${m1}%6.3fs  " +
        f"K=10 ${m10}%6.3fs  data-term ratio ${m10 / m1}%5.2fx " +
        "(<= ~10x = linear per-pass work)")
    }
    }
    spark.stop()
  }
}
