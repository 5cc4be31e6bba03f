package graft.analytics

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fitted PCA basis: `mean` (d), the top-r `components` (r × d,
  * orthonormal rows, descending `eigenvalues`). Eigenvector signs are
  * canonicalized (largest-magnitude coordinate positive) so the fit is
  * reproducible run-to-run up to floating-point merge order. */
final case class PcaModel(mean: Array[Double],
    components: Array[Array[Double]], eigenvalues: Array[Double]) {
  def dim: Int = mean.length
  def r: Int = components.length
}

/** First/second raw-moment sums of a vector column: `n`, Σx (d), and the
  * upper triangle of Σ x xᵀ (d(d+1)/2), row-major). Dimensions initialize
  * lazily from the first vector seen, so the aggregator needs no schema
  * peek (and an all-empty partition merges as the zero buffer). */
final case class PcaMoments(n: Long, sums: Array[Double],
    prods: Array[Double])

/** Distributed PCA / whitening over an embedding column — the classic
  * d²-small/n-huge decomposition: ONE map-side-combined aggregation pass
  * accumulates (n, Σx, Σxxᵀ) — d(d+3)/2 doubles per partial, ~17 KB at
  * d=64 — the 64×64 covariance eigendecomposes ON THE DRIVER (cyclic
  * Jacobi, deterministic, microseconds at this size), and projection is a
  * narrow per-row map against the broadcast-literal basis. Nothing
  * data-sized ever shuffles: the plan is scan → partial agg → single
  * merged row, then scan → project. At 100 TB the fit pass reads the
  * embedding column only (parquet column pruning) and the model is a few
  * KB regardless of corpus size.
  *
  * Feeds the embedding pipeline: whitened vectors make cosine thresholds
  * comparable across dimensions (SemDedup-style pruning), and the top-r
  * projection is the standard dimensionality reduction ahead of
  * clustering/ANN ([[graft.similarity.SimilarityOps]]).
  */
object Pca {

  private final class MomentAggregator
      extends Aggregator[Array[Float], PcaMoments, PcaMoments] {
    override def zero: PcaMoments = PcaMoments(0L, Array.empty, Array.empty)

    private def init(d: Int): PcaMoments =
      PcaMoments(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))

    override def reduce(b0: PcaMoments, x: Array[Float]): PcaMoments = {
      if (x == null) return b0
      val b = if (b0.n == 0L && b0.sums.isEmpty) init(x.length) else b0
      require(x.length == b.sums.length,
        s"inconsistent vector dims: ${x.length} vs ${b.sums.length}")
      var i = 0
      var t = 0
      while (i < x.length) {
        val xi = x(i).toDouble
        b.sums(i) += xi
        var j = i
        while (j < x.length) {
          b.prods(t) += xi * x(j).toDouble
          t += 1
          j += 1
        }
        i += 1
      }
      PcaMoments(b.n + 1L, b.sums, b.prods)
    }

    override def merge(a: PcaMoments, b: PcaMoments): PcaMoments = {
      if (a.n == 0L && a.sums.isEmpty) return b
      if (b.n == 0L && b.sums.isEmpty) return a
      require(a.sums.length == b.sums.length,
        s"inconsistent vector dims: ${a.sums.length} vs ${b.sums.length}")
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      i = 0
      while (i < a.prods.length) { a.prods(i) += b.prods(i); i += 1 }
      PcaMoments(a.n + b.n, a.sums, a.prods)
    }

    override def finish(b: PcaMoments): PcaMoments = b
    override def bufferEncoder: Encoder[PcaMoments] =
      Encoders.javaSerialization[PcaMoments]
    override def outputEncoder: Encoder[PcaMoments] =
      Encoders.javaSerialization[PcaMoments]
  }

  /** Fit the top-`r` principal components of `vecCol` (array&lt;float&gt;;
    * NULL vectors skipped). One aggregation job; see object doc for the
    * scale shape. */
  def fit(df: DataFrame, vecCol: String, r: Int): PcaModel = {
    require(r >= 1, s"r must be >= 1, got $r")
    val spark = df.sparkSession
    import spark.implicits._
    val m = df.select(col(vecCol).cast("array<float>"))
      .na.drop()
      .as[Array[Float]]
      .select(new MomentAggregator().toColumn)
      .head()
    fitMoments(m, r)
  }

  /** Append `outCol` = the r-dim projection of `vecCol` onto the model
    * basis (mean-centered; `whiten` additionally scales each coordinate
    * by 1/√λ so projected covariance is the identity). Narrow per-row
    * map: the centered vector lands in an inner projection so it
    * evaluates once, then r broadcast-literal dot products. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      whiten: Boolean = false, outCol: String = "pca"): DataFrame = {
    // fresh temp name (Robust/AsOfJoin discipline): never clobber a user
    // column that happens to be called _pca_ctr
    val ctr = Iterator.iterate("_pca_ctr")(_ + "_")
      .dropWhile(df.columns.contains).next()
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedLit(model.mean.toSeq), (a, b) => a - b)
    val comps = (0 until model.r).map { j =>
      val dot = aggregate(
        zip_with(col(ctr), typedLit(model.components(j).toSeq),
          (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
      if (whiten) dot / math.sqrt(math.max(model.eigenvalues(j), 1e-12))
      else dot
    }
    df.withColumn(ctr, centered)
      .withColumn(outCol, array(comps: _*))
      .drop(ctr)
  }

  // ---- mergeable moment tables (incremental / streaming fit) -------------

  /** Per-stratum moment rows: (strata..., moments BINARY) — the
    * PCA analog of the HLL/KLL sketch tables: moments are ADDITIVE, so a
    * persisted moments table refreshes a PCA model from new data alone,
    * never rescanning the corpus. The binary cell is the
    * java-serialized [[PcaMoments]]. */
  def momentsTable(df: DataFrame, vecCol: String,
      strata: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = org.apache.spark.sql.functions.udaf(new MomentAggregator(),
      implicitly[Encoder[Array[Float]]])
    df.groupBy(strata.map(col): _*)
      .agg(agg(col(vecCol).cast("array<float>")).as("moments"))
  }

  /** Streaming writer: one moments row per (stratum, micro-batch)
    * appended to a parquet table — [[momentsTable]] on the streaming
    * surface. Moments are additive (NOT replay-idempotent, unlike HLL
    * register-max), so `batch_id` is written and [[fitFromMoments]]
    * dedupes on it: an at-least-once replayed batch cannot double-count.
    * Per batch this is one map-side-combined aggregate down to ~17 KB
    * rows at d=64. */
  def momentsSink(stream: DataFrame, vecCol: String, strata: Seq[String],
      path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        momentsTable(batch, vecCol, strata)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(path)
        ()
      }
      .option("checkpointLocation", checkpoint)

  private def deserialize(bytes: Array[Byte]): PcaMoments = {
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readObject().asInstanceOf[PcaMoments] finally in.close()
  }

  /** Fit a model from a persisted moments table (all strata pooled),
    * deduping replayed (strata, batch_id) rows when a `batch_id` column
    * is present. The table is KB-sized per row — a driver-side merge. */
  def fitFromMoments(table: DataFrame, r: Int): PcaModel = {
    val strata = table.columns.filter(c =>
      c != "moments" && c != "batch_id").toSeq
    val deduped =
      if (!table.columns.contains("batch_id")) table
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy((strata :+ "batch_id").map(col): _*)
          .orderBy(col("batch_id"))
        table.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      }
    val blobs = deduped.select(col("moments")).collect()
      .map(row => deserialize(row.getAs[Array[Byte]](0)))
    require(blobs.nonEmpty, "empty moments table")
    val agg = new MomentAggregator
    val total = blobs.reduce(agg.merge)
    fitMoments(total, r)
  }

  private def fitMoments(m: PcaMoments, r: Int): PcaModel = {
    require(m.n >= 2, s"PCA needs at least 2 vectors, got ${m.n}")
    val d = m.sums.length
    require(r <= d, s"r ($r) exceeds vector dim ($d)")
    val n = m.n.toDouble
    val mean = m.sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (m.prods(t) - n * mean(i) * mean(j)) / (n - 1.0)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val (evals, evecs) = symEigen(cov)
    PcaModel(mean, evecs.take(r), evals.take(r))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — all
    * eigenpairs, descending eigenvalue order, sign-canonicalized
    * (largest-|coordinate| positive). Deterministic: fixed sweep order,
    * no RNG. O(d³) per sweep, ~8 sweeps at d=64 — driver-side
    * microseconds, the right home for a d×d problem. */
  private[graft] def symEigen(a: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2.0 * m(i)(j) * m(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    val frob = math.sqrt(m.map(_.map(x => x * x).sum).sum)
    val tol = 1e-14 * math.max(frob, 1.0)
    var sweep = 0
    while (sweep < 64 && offNorm > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > tol / (d * d)) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val tn = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tn * tn + 1.0)
            val s = tn * c
            var k = 0
            while (k < d) {
              val mkp = m(k)(p)
              val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < d) {
              val mpk = m(p)(k)
              val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p)
              val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // columns of v are the eigenvectors; sort by eigenvalue desc and
    // canonicalize sign so the basis is reproducible
    val pairs = (0 until d).map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      val amax = vec.indices.maxBy(i => math.abs(vec(i)))
      if (vec(amax) < 0) { var i = 0; while (i < d) { vec(i) = -vec(i); i += 1 } }
      (m(j)(j), vec)
    }.sortBy(-_._1)
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }
}
