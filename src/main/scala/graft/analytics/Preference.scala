package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference strength estimation — the reward-modeling
  * primitive of preference datasets (RLHF comparison logs, A/B taste
  * tests, match results): given "i beat j" rows, recover a latent
  * strength per item such that P(i beats j) = p_i/(p_i + p_j).
  *
  * Reference behavior: the Bradley–Terry model fit by Hunter (2004)'s
  * MM algorithm — p_i ← W_i / Σ_j n_ij/(p_i + p_j) with W_i = i's
  * total wins and n_ij = comparisons between i and j, renormalized
  * each round. A public-domain estimator; no reference-repo analog
  * (the template has no preference surface).
  */
object Preference {

  /** BRADLEY–TERRY strengths via `iters` MM rounds, in EXACT integer
    * micro fixed point so any engine replays bit-for-bit (the
    * PageRank discipline — every division floors):
    *
    *   p⁰_i = ⌊10⁶/k⌋;
    *   denom_i = Σ_{j: n_ij>0, p_i+p_j>0} ⌊n_ij·10¹²/(p_i + p_j)⌋;
    *   praw_i  = denom_i > 0 ? ⌊W_i·10¹²/denom_i⌋ : 0;
    *   p_i     = S > 0 ? ⌊praw_i·10⁶/S⌋ : 0   with S = Σ praw.
    *
    * Zero-win items sink to strength 0 (the MM fixed point for
    * W_i = 0); an all-zero round leaves every strength 0 rather than
    * dividing by zero. Rows with a NULL side drop; items appear iff
    * they occur in some comparison. Returns one row per item:
    * (`item`, `wins`, `losses`, `strength_x1e6`), strength desc /
    * item asc.
    *
    * Shape: ONE distributed aggregate to the (winner, loser) count
    * matrix — item-vocabulary²-bounded in the intended regime (a
    * bounded item catalog), then the MM rounds on the driver over that
    * matrix (the [[Evaluation.cohensKappa]] / Markov-absorption
    * driver-chain posture); an external engine replays the rounds as
    * unrolled CTEs.
    *
    * LOUD CAP: distinct observed pairs ARE data-sized in the worst
    * case (a long-tail preference log — RLHF comparison data — where
    * most pairs are unique), so the collect is bounded by `maxPairs`:
    * the driver pulls at most `maxPairs + 1` rows and FAILS with the
    * remedy when the matrix exceeds the cap (the Kaplan–Meier
    * `maxSteps` discipline — never an unbounded driver materialize,
    * not even to count). Past the cap: bucket items into a bounded
    * catalog first, or fit with a distributed MM (one join + aggregate
    * per round) instead of the driver chain. */
  def bradleyTerry(pairs: DataFrame, winnerCol: String,
      loserCol: String, iters: Int = 10,
      maxPairs: Int = 2000000): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(maxPairs >= 1, s"maxPairs must be >= 1, got $maxPairs")
    val spark = pairs.sparkSession
    import spark.implicits._
    val cm = pairs
      .filter(col(s"`$winnerCol`").isNotNull &&
        col(s"`$loserCol`").isNotNull)
      .groupBy(col(s"`$winnerCol`").cast("string").as("_w"),
        col(s"`$loserCol`").cast("string").as("_l"))
      .agg(count(lit(1)).as("_c"))
      .limit(maxPairs + 1)
      .as[(String, String, Long)].collect()
    require(cm.length <= maxPairs,
      s"bradleyTerry: > $maxPairs distinct (winner, loser) pairs - the " +
        "driver MM matrix is pair-vocabulary-sized by design; bucket " +
        "items into a bounded catalog or raise maxPairs (or fit a " +
        "distributed MM) for long-tail preference logs")
    val items = (cm.iterator.map(_._1) ++ cm.iterator.map(_._2))
      .toArray.distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val wins = new Array[Long](k)
    val losses = new Array[Long](k)
    val n = scala.collection.mutable.Map.empty[(Int, Int), Long]
    cm.foreach { case (w, l, c) =>
      val (i, j) = (idx(w), idx(l))
      wins(i) += c; losses(j) += c
      n((i, j)) = n.getOrElse((i, j), 0L) + c
      n((j, i)) = n.getOrElse((j, i), 0L) + c
    }
    var p = Array.fill(k)(if (k > 0) 1000000L / k else 0L)
    for (_ <- 1 to iters) {
      val praw = Array.tabulate(k) { i =>
        var denom = BigInt(0)
        n.foreach { case ((a, b), c) =>
          if (a == i && p(a) + p(b) > 0L)
            denom += BigInt(c) * BigInt(1000000000000L) /
              BigInt(p(a) + p(b))
        }
        if (denom > 0) (BigInt(wins(i)) * BigInt(1000000000000L) /
          denom).toLong
        else 0L
      }
      val s = praw.iterator.map(BigInt(_)).sum
      p = Array.tabulate(k)(i =>
        if (s > 0) (BigInt(praw(i)) * 1000000L / s).toLong else 0L)
    }
    items.indices.map(i => (items(i), wins(i), losses(i), p(i)))
      .toDF("item", "wins", "losses", "strength_x1e6")
      .orderBy(col("strength_x1e6").desc, col("item").asc)
  }
}
