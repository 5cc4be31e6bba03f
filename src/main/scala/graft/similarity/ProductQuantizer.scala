package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PqExpressions

/** Trained PQ codebooks: `m` subspaces of `dsub` dims, `k` centroids per
  * subspace. `centroids((j*k + c)*dsub + t)` — a plain float array so it
  * ships to executors as one broadcast-reference object inside the
  * codegen'd expressions. `normSq(j*k + c) = |cent_jc|²` feeds the
  * reconstruction-norm lookup. */
final case class PqModel(m: Int, k: Int, dsub: Int,
    centroids: Array[Float]) {
  def dim: Int = m * dsub
  lazy val normSq: Array[Double] = {
    val out = new Array[Double](m * k)
    var jc = 0
    while (jc < m * k) {
      var acc = 0.0d
      var t = 0
      while (t < dsub) {
        val v = centroids(jc * dsub + t).toDouble
        acc += v * v
        t += 1
      }
      out(jc) = acc
      jc += 1
    }
    out
  }
}

/** Product quantization for billion-scale ANN (Jégou et al. 2011, the
  * FAISS IVF-PQ building block; no reference-repo counterpart —
  * north-star extension).
  *
  * Memory story at 100 TB: a 64-dim float32 vector is 256 bytes; its PQ
  * code at the m=32 default is 32 bytes (beyond SQ8's 4× this is 8×; m
  * dials compression against recall — m=16 gives 16×), and ADC scores a
  * candidate with m byte-indexed table reads instead of d float
  * multiplies. The codebooks themselves are tiny (m·k·dsub floats) and
  * ride into generated code as reference objects. Defaults (m=32, k=32,
  * 4 Lloyd passes) measure recall@3 ≈ 0.75 vs exact cosine on the
  * near-random synthetic embeddings — a hard case for PQ; clustered
  * real-world embeddings do better at equal bytes.
  *
  * Training runs on a BOUNDED, DETERMINISTIC sample (first `sampleSize`
  * rows by id) collected once to the driver — the standard PQ practice
  * (FAISS trains codebooks on 10⁴–10⁵ samples regardless of corpus
  * size), so the driver cost is a constant, not a function of corpus
  * size; encoding and search remain fully distributed. Seeds are the
  * first `k` sample subvectors, refined by `lloydIters` k-means passes
  * (L2, ties → lowest index, empty cluster keeps its centroid) — pure
  * deterministic arithmetic, no RNG. */
object ProductQuantizer {

  def train(corpus: DataFrame, m: Int = 32, k: Int = 32,
      lloydIters: Int = 4, sampleSize: Int = 4096,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqModel = {
    require(k >= 1 && k <= 128, s"k must be in [1,128] (byte codes), got $k")
    val sample: Array[Array[Float]] = corpus.orderBy(col(idCol))
      .limit(sampleSize).select(col(vecCol))
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "pq train: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"pq train: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val centroids = new Array[Float](m * k * dsub)
    var j = 0
    while (j < m) {
      val subs = sample.map(v => v.slice(j * dsub, (j + 1) * dsub))
      // seed: first k subvectors (id order); duplicates tolerated — Lloyd
      // separates them or the empty-cluster rule keeps them harmless
      val cents = Array.tabulate(k)(c =>
        subs(c % subs.length).map(_.toDouble))
      var it = 0
      while (it < lloydIters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        subs.foreach { s =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d2 = 0.0d
            var t = 0
            while (t < dsub) {
              val diff = s(t).toDouble - cents(c)(t)
              d2 += diff * diff
              t += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          var t = 0
          while (t < dsub) { sums(best)(t) += s(t).toDouble; t += 1 }
          counts(best) += 1
        }
        var c = 0
        while (c < k) {
          if (counts(c) > 0) {
            var t = 0
            while (t < dsub) { cents(c)(t) = sums(c)(t) / counts(c); t += 1 }
          }
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < k) {
        var t = 0
        while (t < dsub) {
          centroids((j * k + c) * dsub + t) = cents(c)(t).toFloat
          t += 1
        }
        c += 1
      }
      j += 1
    }
    PqModel(m, k, dsub, centroids)
  }

  /** `(vec_id, pq_codes, recon_norm)` — the stored search payload
    * (m bytes + one double per vector). Narrow, shuffle-free; persist it
    * (optionally under [[SimilarityOps.ivfBuildIndex]]-style cell
    * partitioning) and keep the float vectors out of the hot path. */
  def encode(df: DataFrame, model: PqModel, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).as("vec_id"),
        PqExpressions.pqEncode(col(vecCol), model.m, model.k, model.dsub,
          model.centroids).as("pq_codes"))
      .withColumn("recon_norm",
        PqExpressions.pqReconNorm(col("pq_codes"), model.k, model.normSq))

  /** Approximate top-k by ADC cosine: probes carry their per-probe lookup
    * table (m·k subspace dot products, computed once) and broadcast;
    * every candidate costs m table reads. Score =
    * adc⟨probe, recon(c)⟩ / (|probe| · |recon(c)|); zero-norm guard as in
    * [[SimilarityOps.sq8TopK]]. Rank ≤ kNN → WindowGroupLimit. */
  def adcTopK(corpus: DataFrame, probes: DataFrame, model: PqModel,
      kNN: Int, idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame =
    adcScore(encode(corpus, model, idCol, vecCol),
      probeSide(probes, model, idCol, vecCol), model, kNN)

  /** `(probe_id, lut, probe_norm)` — the broadcastable probe payload. */
  private def probeSide(probes: DataFrame, model: PqModel, idCol: String,
      vecCol: String): DataFrame =
    probes.select(col(idCol).as("probe_id"),
      PqExpressions.pqLut(col(vecCol), model.m, model.k, model.dsub,
        model.centroids).as("lut"),
      SimilarityOps.norm(col(vecCol)).as("probe_norm"))

  /** ADC-cosine rank-k of encoded candidates against probe payloads —
    * shared by the brute scan and the IVF-PQ index path. `enc` must
    * carry (vec_id, pq_codes, recon_norm) (+ any join keys already
    * applied); `p` is broadcast. */
  private def adcScore(enc: DataFrame, p: DataFrame, model: PqModel,
      kNN: Int, joinKeys: Seq[String] = Nil): DataFrame = {
    val joined =
      if (joinKeys.isEmpty) enc.crossJoin(broadcast(p))
      else enc.join(broadcast(p), joinKeys)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("pqcos").desc, col("vec_id").asc)
    joined
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("pqcos",
        when(col("probe_norm") * col("recon_norm") > 0,
          PqExpressions.adcDot(col("lut"), col("pq_codes"), model.k) /
            (col("probe_norm") * col("recon_norm")))
          .otherwise(lit(0.0d)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNN)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("pqcos"))
  }

  /** BUILD the IVF-PQ layout — the FAISS workhorse at billion scale:
    * coarse IVF cells as parquet partition directories (probed cells
    * prune at file-listing time, the [[SimilarityOps.ivfBuildIndex]]
    * contract) holding PQ codes instead of vectors (m bytes + one double
    * per vector). Writes `<path>/centroids` (coarse, float),
    * `<path>/pq_model` (the codebooks, one row), and
    * `<path>/index/cell=<id>/(vec_id, pq_codes, recon_norm)`. */
  def ivfPqBuildIndex(corpus: DataFrame, path: String, model: PqModel,
      nlist: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding", lloydIters: Int = 1): Unit = {
    import corpus.sparkSession.implicits._
    Seq((model.m, model.k, model.dsub, model.centroids.toSeq))
      .toDF("m", "k", "dsub", "centroids")
      .write.mode("overwrite").parquet(s"$path/pq_model")
    // the cell layout itself (checkpoint discipline, centroid write,
    // partitionBy) is owned by SimilarityOps.ivfWriteIndex — the PQ
    // codec only supplies its stored payload
    SimilarityOps.ivfWriteIndex(corpus, path, nlist, lloydIters, idCol,
        vecCol) { assigned =>
      assigned.select(col("vec_id"),
          PqExpressions.pqEncode(col("vec"), model.m, model.k, model.dsub,
            model.centroids).as("pq_codes"), col("cell"))
        .withColumn("recon_norm",
          PqExpressions.pqReconNorm(col("pq_codes"), model.k,
            model.normSq))
    }
  }

  /** Read back the codebooks persisted by [[ivfPqBuildIndex]]. */
  def readModel(spark: org.apache.spark.sql.SparkSession, path: String)
      : PqModel = {
    val r = spark.read.parquet(s"$path/pq_model").head()
    PqModel(r.getAs[Int]("m"), r.getAs[Int]("k"), r.getAs[Int]("dsub"),
      r.getAs[Seq[Float]]("centroids").toArray)
  }

  /** Query the [[ivfPqBuildIndex]] layout: coarse probe assignment on
    * the float centroids picks nprobe cells per probe; the scan prunes
    * to those cell directories; candidates score by ADC. At nprobe =
    * nlist this equals [[adcTopK]] exactly (spec'd). */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, probes: DataFrame, kNN: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      // pass the codebooks when the caller already holds them — skips
      // the per-invocation pq_model parquet read job
      model0: Option[PqModel] = None): DataFrame = {
    val model = model0.getOrElse(readModel(spark, path))
    val pFloat = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("probe_vec"),
      SimilarityOps.norm(col(vecCol)).as("probe_norm"))
      .localCheckpoint(false) // feeds cell assignment AND the LUT side
    val (pAssigned, idx) =
      SimilarityOps.ivfProbeScaffold(spark, path, pFloat, nprobe)
    // candidates pick up probe_id from the THIN (cell, probe_id)
    // assignment; the m·k-double LUTs ride a separate broadcast keyed by
    // probe_id, shipping each LUT ONCE instead of once per probed cell —
    // and the LUT projection reuses the checkpointed pFloat rather than
    // re-running the probe source plan
    val enc = idx
      .select(col("vec_id"), col("pq_codes"), col("recon_norm"),
        col("cell"))
      .join(pAssigned.select(col("cell"), col("probe_id")), Seq("cell"))
    val p = pFloat.select(col("probe_id"),
      PqExpressions.pqLut(col("probe_vec"), model.m, model.k, model.dsub,
        model.centroids).as("lut"),
      col("probe_norm"))
    adcScore(enc, p, model, kNN, joinKeys = Seq("probe_id"))
  }
}
