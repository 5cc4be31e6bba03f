package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independently-ranked candidate lists (lexical
  * BM25, dense cosine, …) with reciprocal-rank fusion — RRF (Cormack,
  * Clarke & Büttcher, SIGIR 2009): `score(d) = Σ_lists 1/(k0 + rank_d)`,
  * the standard first-stage fusion in RAG / retrieval pipelines because
  * it needs no score calibration between components (ranks only).
  *
  * Scale posture: each component is already a top-N-per-probe list
  * (WindowGroupLimit-bounded at its source — [[SimilarityOps]] ANN /
  * [[graft.text.CorpusStats.bm25TopK]]), so the union holds ≤
  * N·|components| rows per probe BY CONSTRUCTION and the per-probe
  * rank window is bounded the same way — the one shuffle is keyed by
  * (probe, doc), never data-sized. At 100 TB the components are where
  * the scale lives (ANN indexes, sharded BM25); fusion stays KB-per-probe.
  *
  * Determinism/portability: per-list contributions are cast to
  * `DECIMAL(28,15)` before the sum (the repo's decimal-exact-aggregate
  * discipline), so the fused score is independent of aggregation order
  * at ANY component count — and exactly reproducible in the DuckDB
  * oracle. Ties break (score DESC, id ASC).
  */
object HybridSearch {

  /** Fuse `components` — each `(probe_id, id, rank)`-shaped, ranks
    * 1-based within that component's own list — into the top-`k` per
    * probe. Returns (probe_id, rank, id, rrf_score, n_lists) where
    * n_lists = how many components surfaced the id (the usual RRF
    * confidence signal). */
  def rrfFuse(components: Seq[DataFrame], k0: Int = 60, k: Int = 10)
      : DataFrame = {
    require(components.nonEmpty, "need >= 1 ranked component")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(k >= 1, s"k must be >= 1, got $k")
    val normed = components.map(
      _.select(col("probe_id"), col("id"), col("rank")))
    val fused = normed.reduce(_ unionByName _)
      .select(col("probe_id"), col("id"),
        (lit(1.0) / (lit(k0).cast("double") + col("rank").cast("double")))
          .cast("decimal(28,15)").as("_c"))
      .groupBy(col("probe_id"), col("id"))
      .agg(sum(col("_c")).as("_s"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("_s").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("id"),
        col("_s").cast("double").as("rrf_score"), col("n_lists"))
  }

  /** Related-document hybrid retrieval over the documents+embeddings
    * pair: for each probe document, BM25 ranks the corpus against the
    * probe's own text (lexical recall) and cosine ranks the corpus
    * embeddings (semantic recall); RRF fuses both lists. Self-matches
    * are dropped from each component (keeping that component's own rank
    * positions — the list a downstream consumer would actually see).
    *
    * `idsMatch`: `docs.idCol` and `embeddings.vecIdCol` must share the
    * id space (the testdata contract: doc_id ≡ vec_id). */
  def relatedDocsHybrid(docs: DataFrame, embeddings: DataFrame,
      probeFilter: Column, nPerList: Int = 20, k0: Int = 60, k: Int = 10,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val probesTxt = docs.filter(probeFilter)
      .select(col(idCol).as("query_id"), col(textCol).as("query_text"))
    val bm25 = graft.text.CorpusStats
      .bm25TopK(docs, idCol, textCol, probesTxt, "query_id", "query_text",
        k = nPerList)
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id").as("probe_id"), col(idCol).as("id"),
        col("rank"))
    val dense = SimilarityOps
      .bruteForceTopK(embeddings,
        embeddings.join(
          docs.filter(probeFilter).select(col(idCol).as(vecIdCol)),
          Seq(vecIdCol)),
        k = nPerList, idCol = vecIdCol, vecCol = vecCol)
      .select(col("probe_id"), col(vecIdCol).as("id"), col("rank"))
    rrfFuse(Seq(bm25, dense), k0 = k0, k = k)
  }
}
