package graft.similarity

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed K-MEANS (Lloyd's algorithm) over an embedding column —
  * the corpus-organization primitive under IVF cells, topic bucketing,
  * cluster-balanced sampling, and SemDeDup-style pruning. The
  * driver-side sampled k-means in [[ProductQuantizer]] trains CODEBOOKS
  * from a bounded sample; this one clusters the WHOLE corpus
  * distributed, one pass per iteration.
  *
  * Exactness (the engine-replayable contract, same discipline as the
  * cosine family):
  *  - centroids live as micro-integer vectors. Init = the `k`
  *    smallest-id vectors quantized per component (`floor(x·10⁶)`);
  *    each update is a pure integer floor-divided component mean of the
  *    members' quantized components, so centroids are bit-identical in
  *    any engine.
  *  - assignment distances use one fixed IEEE chain: `cd = c/10⁶`
  *    (correctly-rounded double division), then
  *    `d² = ⟨x,x⟩ − 2⟨x,cd⟩ + ⟨cd,cd⟩` with ascending-index dot
  *    products — the same `list_dot_product` chain DuckDB replays
  *    bit-exactly. Ties break to the smaller centroid id.
  *  - an empty cluster keeps its previous centroid (the
  *    [[ProductQuantizer]] rule).
  *
  * Scale: per iteration ONE pass over the data — a typed map assigns
  * each vector (k·dim work against broadcast centroids), then a typed
  * [[Aggregator]] with map-side partial merge reduces to k component-sum
  * buffers (k·dim longs — config-sized driver state, never data-sized).
  * No shuffle wider than k rows leaves an executor. The per-row argmin
  * loop is the documented justified-imperative exception (inherently a
  * k-way scan; HOF expressions do not codegen).
  */
object Clustering {

  /** Per-cluster accumulator: component sums of members' quantized
    * micro components + member count. */
  final case class VecAcc(sums: Array[Long], n: Long)

  private final class QVecSum(dim: Int)
      extends Aggregator[(Int, Array[Long]), VecAcc, VecAcc] {
    override def zero: VecAcc = VecAcc(new Array[Long](dim), 0L)
    override def reduce(b: VecAcc, row: (Int, Array[Long])): VecAcc = {
      val q = row._2
      var t = 0
      while (t < dim) { b.sums(t) += q(t); t += 1 }
      VecAcc(b.sums, b.n + 1L)
    }
    override def merge(a: VecAcc, b: VecAcc): VecAcc = {
      var t = 0
      while (t < dim) { a.sums(t) += b.sums(t); t += 1 }
      VecAcc(a.sums, a.n + b.n)
    }
    override def finish(b: VecAcc): VecAcc = b
    override def bufferEncoder: Encoder[VecAcc] = Encoders.product[VecAcc]
    override def outputEncoder: Encoder[VecAcc] = Encoders.product[VecAcc]
  }

  private def quantize(x: Array[Float]): Array[Long] = {
    val q = new Array[Long](x.length)
    var t = 0
    while (t < x.length) {
      q(t) = math.floor(x(t).toDouble * 1000000.0).toLong
      t += 1
    }
    q
  }

  /** The shared IEEE chain: centroid micros → doubles once, plus each
    * centroid's ⟨cd,cd⟩ self-dot (the same value whether hoisted or
    * recomputed per row — dot products are deterministic). */
  private def centroidDoubles(cents: Array[Array[Long]])
      : (Array[Array[Double]], Array[Double]) = {
    val cd = cents.map { c =>
      val d = new Array[Double](c.length)
      var t = 0
      while (t < c.length) { d(t) = c(t).toDouble / 1000000.0; t += 1 }
      d
    }
    val g = cd.map { d =>
      var s = 0.0
      var t = 0
      while (t < d.length) { s += d(t) * d(t); t += 1 }
      s
    }
    (cd, g)
  }

  /** argmin_cid of `d² = xx − 2⟨x,cd⟩ + ⟨cd,cd⟩`, strict-less scan in
    * ascending cid order (ties keep the smaller id). Returns (cid, d²). */
  private def assign(x: Array[Float], cd: Array[Array[Double]],
      g: Array[Double]): (Int, Double) = {
    var xx = 0.0
    var t = 0
    while (t < x.length) {
      val v = x(t).toDouble
      xx += v * v
      t += 1
    }
    var best = -1
    var bestD = Double.MaxValue
    var cid = 0
    while (cid < cd.length) {
      val c = cd(cid)
      var b = 0.0
      t = 0
      while (t < c.length) { b += x(t).toDouble * c(t); t += 1 }
      val d2 = xx - 2 * b + g(cid)
      if (d2 < bestD) { best = cid; bestD = d2 }
      cid += 1
    }
    (best, bestD)
  }

  /** The shared Lloyd loop: `iters` assign-update rounds from the
    * deterministic smallest-`k`-ids init. Returns (typed input dataset,
    * final micro-integer centroids). */
  private def train(vecs: DataFrame, k: Int, iters: Int, idCol: String,
      vecCol: String)
      : (org.apache.spark.sql.Dataset[(Long, Array[Float])],
         Array[Array[Long]]) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = vecs.sparkSession
    import spark.implicits._
    val data = vecs
      .select(col(s"`$idCol`").cast("long"), col(s"`$vecCol`"))
      .toDF("id", "v").as[(Long, Array[Float])]
    val init = data.orderBy(col("id").asc).limit(k).collect()
    require(init.length == k,
      s"k=$k exceeds the ${init.length} input vectors")
    val dim = init.head._2.length
    var cents: Array[Array[Long]] = init.map(r => quantize(r._2))
    val agg = new QVecSum(dim).toColumn
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = data.mapPartitions { rows =>
        val (cd, g) = centroidDoubles(bc.value)
        rows.map { case (_, x) => (assign(x, cd, g)._1, quantize(x)) }
      }.groupByKey(_._1)
        .agg(agg)
        .collect()
      val next = cents.map(identity)
      partials.foreach { case (cid, acc) =>
        if (acc.n > 0L)
          next(cid) = acc.sums.map(s => Math.floorDiv(s, acc.n))
      }
      cents = next
      bc.destroy()
      it += 1
    }
    (data, cents)
  }

  /** `iters` Lloyd rounds from the deterministic smallest-`k`-ids init,
    * then the final assignment under the updated centroids. Returns
    * (`idCol`, `cluster`, `d2_x1e6`): the 0-based centroid id (ranked by
    * init vector id) and the floored-micro squared distance. */
  def kmeansAssign(vecs: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val (data, cents) = train(vecs, k, iters, idCol, vecCol)
    val bcF = spark.sparkContext.broadcast(cents)
    data.mapPartitions { rows =>
      val (cd, g) = centroidDoubles(bcF.value)
      rows.map { case (id, x) =>
        val (cid, d2) = assign(x, cd, g)
        (id, cid, math.floor(d2 * 1000000.0).toLong)
      }
    }.toDF(idCol, "cluster", "d2_x1e6")
  }

  /** CLUSTER EXEMPLARS — centroid-proximal sampling: the `m` vectors
    * closest to each final centroid (d² asc, id ties), the
    * "most representative documents per topic" read that powers
    * cluster inspection, balanced curation, and few-shot pool
    * assembly. Rides [[kmeansAssign]]'s exact trajectory; the
    * per-cluster rank is a WindowGroupLimit top-m (map-side pruned —
    * k partitions never see more than partition-local m candidates
    * before the merge). Returns (`cluster`, `rank`, `idCol`,
    * `d2_x1e6`), rank 1..m. */
  def exemplars(vecs: DataFrame, k: Int, iters: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val assigned = kmeansAssign(vecs, k, iters, idCol, vecCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("d2_x1e6").asc, col(s"`$idCol`").asc)
    assigned
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col("cluster"), col("rank"), col(s"`$idCol`"),
        col("d2_x1e6"))
  }

  /** SIMPLIFIED SILHOUETTE per cluster — the O(n·k) cluster-quality
    * readout (Hruschka et al.'s centroid form of Rousseeuw's
    * silhouette: `a` = distance to the OWN centroid, `b` = distance to
    * the nearest OTHER centroid; the O(n²) pairwise form cannot exist
    * at corpus scale). `s = (b − a)/max(a, b)` in [−1, 1]; s = 0 when
    * both distances are 0 (the duplicate-centroid convention).
    *
    * Exactness: runs the same [[kmeansAssign]] training trajectory;
    * a/b are `sqrt` (correctly-rounded IEEE) of the best and
    * SECOND-BEST d² under the assignment ordering (d² asc, cid asc) —
    * exactly rows 1 and 2 of the oracle's ranked cross join — and the
    * per-cluster mean is a floor division of summed floored micros.
    *
    * Shape: one pass (k·dim work per row against broadcast centroids) +
    * one k-row hash aggregate. Returns one row per cluster:
    * (`cluster`, `n`, `mean_sil_x1e6`). */
  def silhouette(vecs: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2, got $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    val (data, cents) = train(vecs, k, iters, idCol, vecCol)
    val bcF = spark.sparkContext.broadcast(cents)
    data.mapPartitions { rows =>
      val (cd, g) = centroidDoubles(bcF.value)
      rows.map { case (_, x) =>
        // best + second-best d² with the (d² asc, cid asc) tie order
        var xx = 0.0
        var t = 0
        while (t < x.length) {
          val v = x(t).toDouble; xx += v * v; t += 1
        }
        var best = -1; var bestD = Double.MaxValue
        var secD = Double.MaxValue
        var cid = 0
        while (cid < cd.length) {
          val c = cd(cid)
          var b = 0.0
          t = 0
          while (t < c.length) { b += x(t).toDouble * c(t); t += 1 }
          val d2 = xx - 2 * b + g(cid)
          if (d2 < bestD) { secD = bestD; best = cid; bestD = d2 }
          else if (d2 < secD) secD = d2
          cid += 1
        }
        // d² can dip a few ulps below 0 when x ≈ centroid — clamp
        // before sqrt (NaN otherwise), same greatest(d2, 0) as the
        // oracle
        val a = math.sqrt(math.max(bestD, 0.0))
        val b = math.sqrt(math.max(secD, 0.0))
        val den = math.max(a, b)
        val s = if (den == 0.0) 0.0 else (b - a) / den
        (best, math.floor(s * 1000000.0).toLong)
      }
    }.toDF("cluster", "_s")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("_s")).as("_ss"))
      .select(col("cluster"), col("n"),
        graft.ops.Fixed.ldiv(col("_ss"), col("n")).as("mean_sil_x1e6"))
  }
}
