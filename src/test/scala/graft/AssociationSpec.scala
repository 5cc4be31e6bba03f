package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Association

/** Co-occurrence mining: hand-computed support/confidence/lift, set
  * semantics, the oversized-basket guard, and the self-join plan
  * shape. */
class AssociationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // baskets: 1:{p,q,r} 2:{p,q} 3:{p,r} 4:{q} — N=4
  private def baskets = Seq(
    (1L, "p"), (1L, "q"), (1L, "r"),
    (2L, "p"), (2L, "q"),
    (3L, "p"), (3L, "r"),
    (4L, "q")).toDF("bk", "it")

  test("hand-computed pair metrics: support, jaccard, confidence, lift") {
    val r = Association.coOccurrence(baskets, "bk", "it")
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
          x.getLong(6), x.getLong(7))).toMap
    // n_p=3 n_q=3 n_r=2; pairs: pq=2 pr=2 qr=1
    // pq: jacc=2/4=0.5, conf=2/3, lift=2*4/(3*3)=8/9
    assert(r(("p", "q")) === (2L, 3L, 3L, 500000L, 666666L, 888888L))
    // pr: jacc=2/3, conf=2/3, lift=2*4/(3*2)=4/3
    assert(r(("p", "r")) === (2L, 3L, 2L, 666666L, 666666L, 1333333L))
    // qr: jacc=1/4, conf=1/3, lift=1*4/(3*2)=2/3
    assert(r(("q", "r")) === (1L, 3L, 2L, 250000L, 333333L, 666666L))
    assert(r.size === 3)
  }

  test("set semantics: repeated (basket,item) rows do not inflate support") {
    val r = Association.coOccurrence(baskets.union(baskets), "bk", "it")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r === Map(("p", "q") -> 2L, ("p", "r") -> 2L, ("q", "r") -> 1L))
  }

  test("minSupport filters pairs; oversized baskets are dropped entirely") {
    val r2 = Association.coOccurrence(baskets, "bk", "it", minSupport = 2L)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(r2 === Set(("p", "q"), ("p", "r")))

    // a 5-item basket above the cap contributes NO pairs, and its items
    // don't even count toward item/basket totals (dropped pre-pairing)
    val big = (1 to 5).map(i => (9L, s"z$i")).toDF("bk", "it")
    val capped = Association.coOccurrence(baskets.union(big), "bk", "it",
      maxBasketSize = 4)
    val pairs = capped.collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(!pairs.exists { case (a, b) => a.startsWith("z") || b.startsWith("z") })
    // metrics identical to the uncapped small-basket run
    assert(capped.collect().toSet ===
      Association.coOccurrence(baskets, "bk", "it").collect().toSet)
  }

  test("itemSimilarityTopK: hand-computed binary cosine, symmetric " +
      "directions, tie broken by neighbor order, k prunes") {
    // n_p=3 n_q=3 n_r=2; n_pq=2 n_pr=2 n_qr=1
    // cos(p,q) = ⌊2e6/3⌋ = 666666; cos(p,r) = ⌊2e6/√6⌋ = 816496;
    // cos(q,r) = ⌊1e6/√6⌋ = 408248
    val k2 = Association.itemSimilarityTopK(baskets, "bk", "it", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    assert(k2 == Seq(
      ("p", "r", 2L, 816496L, 1), ("p", "q", 2L, 666666L, 2),
      ("q", "p", 2L, 666666L, 1), ("q", "r", 1L, 408248L, 2),
      ("r", "p", 2L, 816496L, 1), ("r", "q", 1L, 408248L, 2)))
    // k=1 keeps only each item's best neighbor
    val k1 = Association.itemSimilarityTopK(baskets, "bk", "it", k = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(k1 == Seq(("p", "r"), ("q", "p"), ("r", "p")))
    // equal cosines: the (cos desc, neighbor asc) total order picks the
    // lexicographically smaller neighbor — 1:{a,b} 2:{a,c} gives
    // cos(a,b) = cos(a,c) = ⌊1e6/√2⌋ = 707106
    val tie = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c"))
      .toDF("bk", "it")
    val t1 = Association.itemSimilarityTopK(tie, "bk", "it", k = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .toSeq
    assert(t1 == Seq(("a", "b", 707106L), ("b", "a", 707106L),
      ("c", "a", 707106L)))
    // minSupport drops the qr pair from BOTH directions
    val ms = Association.itemSimilarityTopK(baskets, "bk", "it", k = 5,
      minSupport = 2L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(ms == Set(("p", "q"), ("p", "r"), ("q", "p"), ("r", "p")))
    intercept[IllegalArgumentException] {
      Association.itemSimilarityTopK(baskets, "bk", "it", k = 0)
    }
  }

  test("NULL contract: null basket keys and null items participate in " +
      "nothing — never a fabricated merged basket") {
    // null-basket rows carrying real items, and a null item inside a
    // real basket: output must equal the clean-input run (a groupBy
    // without the guard would mine one merged basket from all
    // null-key rows)
    val dirty = baskets
      .union(Seq((Option.empty[Long], Option("p")),
        (Option.empty[Long], Option("q")),
        (Option(1L), Option.empty[String]))
        .toDF("bk", "it"))
    assert(Association.coOccurrence(dirty, "bk", "it").collect().toSet
      === Association.coOccurrence(baskets, "bk", "it").collect().toSet)
    assert(Association.itemSimilarityTopK(dirty, "bk", "it", k = 2)
      .collect().toSeq ===
      Association.itemSimilarityTopK(baskets, "bk", "it", k = 2)
        .collect().toSeq)
  }

  test("plan: no cartesian product, no join on the pair path — pairs " +
      "generate in-array and collapse in the map-side combine") {
    val df = spark.range(2000).select((col("id") % 500).as("bk"),
      concat(lit("i"), col("id") % 37).as("it"))
    val q = Association.coOccurrence(df, "bk", "it")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"),
      "pair mining must not shuffle-join data-sized frames — the only " +
        "data-sized exchange is the basket grouping")
    assert(plan.contains("Generate"), "in-array pair generator expected")
  }
}
