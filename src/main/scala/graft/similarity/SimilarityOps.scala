package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column (`array<float>`), testdata
  * `embeddings.parquet` (64-dim, `vec_id`, `label`).
  *
  * All vector math is higher-order built-ins (`zip_with` dot product,
  * `aggregate` folds) — no UDF, so it compiles to codegen'd loops.
  *
  * Scale design (100 TB / billions of vectors):
  *  - [[bruteForceTopK]] is probes × corpus: right for SMALL probe sets
  *    (broadcast the probes, stream the corpus once, per-group top-k via
  *    the rank filter that Spark rewrites to WindowGroupLimit — corpus
  *    never re-shuffled, k rows per probe per map partition cross the
  *    exchange).
  *  - [[lshAssign]]/[[lshTopK]] is the scale path: sign-random-projection
  *    buckets (Charikar, STOC'02) turn the cross product into an equi-join
  *    on bucket id; recall is tuned by `planes` (bucket granularity) and
  *    `probesPerBucket` multi-probe. An IVF analog would swap the hash for
  *    learned centroids; the join shape is identical.
  */
object SimilarityOps {

  /** Dot product of two equal-length float-array columns, accumulated in
    * double, index order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for each probe vector: broadcast probes ×
    * corpus, rank filter (→ WindowGroupLimit). Deterministic tie-break on
    * corpus id. Returns (probe_id, rank, vec_id, cos). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    c.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Sign-random-projection bucket id: bit i = sign of ⟨v, h_i⟩ where
    * hyperplane h_i's components are deterministic pseudo-random ±1 from
    * `xxhash64(plane, dim)` — data-independent, reproducible, and shipped
    * as an expression rather than a model artifact. */
  def lshBucket(vec: Column, planes: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast("double") *
              when(xxhash64(p, i).bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)),
          lit(0.0), (s, v) => s + v)
        acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), p))
          .otherwise(lit(0L)))
      })

  /** Corpus bucketing pass — at scale this is written once
    * (partitioned/bucketed by `bucket`) and reused across query batches. */
  def lshAssign(corpus: DataFrame, planes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      lshBucket(col(vecCol), planes).as("bucket"))

  /** ANN top-k: probes join the corpus on bucket equality (instead of the
    * cross product), then exact cosine + rank within the candidates.
    * Bits-agreement multi-probe would add neighbor buckets; here a probe
    * searches its own bucket only — recall measured in the spec. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = lshAssign(corpus, planes, idCol, vecCol)
    val p = lshAssign(probes, planes, idCol, vecCol)
      .withColumnsRenamed(Map("vec_id" -> "probe_id", "vec" -> "probe_vec"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    c.join(p, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold). The exact
    * form is the symmetric self cross-join; the scale path reuses
    * [[lshAssign]] so only same-bucket pairs are scored (near-dups agree
    * on sign buckets with high probability at cos ≳ 0.9). */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      exact: Boolean = true, planes: Int = 8): DataFrame = {
    val base =
      if (exact) {
        val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
        val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
      } else {
        val assigned = lshAssign(df, planes, idCol, vecCol)
        val a = assigned.withColumnsRenamed(
          Map("vec_id" -> "id_a", "vec" -> "vec_a"))
        val b = assigned.withColumnsRenamed(
          Map("vec_id" -> "id_b", "vec" -> "vec_b"))
        a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      }
    base.withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
