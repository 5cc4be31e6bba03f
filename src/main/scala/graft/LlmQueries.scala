package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import graft.dedup.{ConnectedComponents, DedupOps}
import graft.functions.HashExpressions
import graft.similarity.{Clustering, SimilarityOps}
import graft.text.{CorpusStats, TextOps}

/** LLM-training-data queries (north-star [EXT] surface): text analysis,
  * dedup family, embedding similarity — over `documents.parquet` /
  * `embeddings.parquet`. Hash-based operators (MinHash, SimHash, LSH)
  * have no DuckDB oracle (engine-specific hash seeds) and are covered by
  * ScalaTest against exact ground truth instead; everything else has a
  * bit-exact oracle.
  */
object LlmQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ANN indexes built ONCE per dataset dir and reused across invocations —
  // the build-once/query-many contract the persisted indexes exist for
  // (the bench harness calls each query several times per session).
  // CONTRACT: the driver's testdata dirs are immutable for a session; a
  // regenerated dataset at the same path would serve a stale index (the
  // cache has no content-based invalidation), and the temp index trees
  // live until the JVM exits — both fine for the harness, neither a
  // general-purpose cache (library users call ivf/lshBuildIndex with
  // their own lifecycle).
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ivfSq8IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val pqModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, similarity.PqModel]()
  private val pcaModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, analytics.PcaModel]()
  private val bpeModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, text.BpeModel]()
  private val ivfPqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val lshIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** DuckDB-equivalent normalization (mirrors TextOps.normalize). */
  private val duckNorm =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- F6 [EXT]: per-document text statistics + quality score. Raw
    //    ratios land in an inner projection and quality derives from the
    //    COLUMNS: CollapseProject keeps non-cheap expressions referenced
    //    more than once in their own project, so each interpreted
    //    higher-order ratio evaluates exactly once per row.
    // -- [EXT]: Flesch readability per document — deterministic
    //    word/sentence/vowel-group counts, the classic 206.835 formula
    "q_readability" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.readability(col("text")).as("_r"))
        .select(col("doc_id"), col("_r.n_words"), col("_r.n_sentences"),
          col("_r.n_syllables"), col("_r.flesch"))
        .orderBy(col("doc_id"))
    }),

    "q_text_stats" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(txt).cast("long").as("n_tokens"),
        TextOps.bpeTokenCount(txt).cast("long").as("n_bpe_tokens"),
        length(txt).as("n_chars_raw"),
        TextOps.punctRatio(txt).as("punct_raw"),
        TextOps.stopwordRatio(txt).as("sw_raw"),
        TextOps.meanWordLen(txt).as("mwl_raw"))
        .select(
          col("doc_id"), col("n_tokens"), col("n_bpe_tokens"),
          round(col("punct_raw"), 6).as("punct_ratio"),
          round(col("sw_raw"), 6).as("stopword_ratio"),
          round(col("mwl_raw"), 6).as("mean_word_len"),
          round(TextOps.qualityFromComponents(col("n_chars_raw"),
            col("sw_raw"), col("punct_raw"), col("mwl_raw")), 6)
            .as("quality"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: DISTRIBUTED LOGISTIC TRAINING — fixed-step GD on the
    //    hard-sigmoid surrogate in exact integer micros (truncating
    //    division in all three engines), one aggregate per iteration,
    //    driver state = k+1 longs. The oracle replays all 5 iterations
    //    as unrolled CTEs — training is engine-exact, not approximate.
    "q_logit_train" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.analytics.Regression.logisticTrain(docs,
        col("lang") === "en" || col("n_chars") > 400,
        Seq(
          "chars_h" -> (col("n_chars").cast("double") / lit(100.0)),
          "is_en" -> when(col("lang") === "en", 1.0).otherwise(0.0),
          "id_noise" ->
            ((col("doc_id") % 10).cast("double") / lit(10.0))),
        iters = 5, lrX1e6 = 250000L)
    }),

    // -- [EXT]: the TRAIN → DEPLOY quality loop as one declared
    //    surface: fit hard-sigmoid logistic weights on the corpus
    //    (label = stored lang 'en', features = the stopword/punctuation
    //    signal columns logisticQuality scores with), then score EVERY
    //    document with the TRAINED weights — both halves exact integer
    //    micros, so the oracle replays training (unrolled GD CTEs) and
    //    scoring (one clamp expression) with no float tolerance at all.
    "q_trained_quality" -> ((s, dir) => {
      import graft.analytics.Regression
      val feats = Seq(
        "sw" -> TextOps.stopwordRatio(col("text")),
        "punct" -> TextOps.punctRatio(col("text")))
      val docs = t(s, dir, "documents")
      val w = Regression.logisticTrain(docs, col("lang") === "en",
          feats, iters = 5, lrX1e6 = 2000000L)
        .orderBy(col("idx"))
        .select(col("weight_x1e6")).as[Long](s.implicits.newLongEncoder)
        .collect().toSeq
      // score exactly the training rows: label non-null AND finite
      // features (a NULL score marks the complete-case drops)
      docs.filter(col("lang").isNotNull)
        .select(col("doc_id"), col("lang"),
          Regression.hardSigmoidScoreX1e6(w, feats.map(_._2))
            .as("score_x1e6"))
        .filter(col("score_x1e6").isNotNull)
        .withColumn("predicted_en", col("score_x1e6") >= 500000L)
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: HELD-OUT train → eval loop — the r11-verdict composition
    //    closing the training story: deterministic shardAssign split
    //    (seeded md5, engine-portable), L2-regularized logisticTrain on
    //    shards ≠ 0 (decoupled weight decay, exact integer micros),
    //    hard-sigmoid scoring of the UNSEEN shard 0, and the
    //    Mann–Whitney AUC rank identity over the held-out scores. The
    //    oracle replays all four stages exactly: the md5 shard hash, the
    //    unrolled GD+decay CTEs, the truncating-clamp score, and the
    //    2·avgrank integer rank sum — one double division at the very
    //    end. Scale: train = one hash aggregate per iteration over the
    //    7/8 split, eval = one rank exchange over the 1/8 split.
    "q_logit_eval" -> ((s, dir) => {
      import graft.analytics.{Evaluation, Regression}
      val feats = Seq(
        "chars_h" -> (col("n_chars").cast("double") / lit(100.0)),
        "is_en" -> when(col("lang") === "en", 1.0).otherwise(0.0),
        "id_noise" ->
          ((col("doc_id") % 10).cast("double") / lit(10.0)))
      val label = col("lang") === "en" || col("n_chars") > 400
      val sharded = graft.ops.Sampling.shardAssign(
        t(s, dir, "documents"), "doc_id", 8)
      val w = Regression.logisticTrain(
          sharded.filter(col("shard") =!= 0), label, feats,
          iters = 5, lrX1e6 = 250000L, l2X1e6 = 10000L)
        .orderBy(col("idx"))
        .select(col("weight_x1e6")).as[Long](s.implicits.newLongEncoder)
        .collect().toSeq
      val heldOut = sharded.filter(col("shard") === 0)
        .select(col("shard"), label.as("y"),
          Regression.hardSigmoidScoreX1e6(w, feats.map(_._2))
            .as("score_x1e6"))
        .filter(col("y").isNotNull && col("score_x1e6").isNotNull)
      Evaluation.aucByGroup(heldOut, Seq("shard"), col("y"),
          "score_x1e6")
        .orderBy(col("shard"))
    }),

    // -- [EXT]: language-ID heuristic (marker-stopword argmax)
    "q_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.languageId(col("text")).as("guess"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: Cohen's kappa between the stored lang label and the
    //    language-ID heuristic — chance-corrected annotation agreement
    //    (the label-QA twin of q_lang_id)
    "q_kappa" -> ((s, dir) => {
      graft.analytics.Evaluation.cohensKappa(
        t(s, dir, "documents")
          .select(col("lang"), TextOps.languageId(col("text")).as("guess")),
        "lang", "guess")
    }),

    // -- [EXT]: Krippendorff's alpha over a 3-rater panel with missing
    //    data (stored lang, the lang-ID heuristic, and a spot-check
    //    rater covering only even docs) — the multi-rater agreement
    //    readout beside q_kappa
    "q_kripp_alpha" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val r1 = docs.select(col("doc_id"), col("lang").as("v"))
      val r2 = docs.select(col("doc_id"),
        TextOps.languageId(col("text")).as("v"))
      val r3 = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang").as("v"))
      graft.analytics.Evaluation.krippendorffAlpha(
        r1.unionByName(r2).unionByName(r3), "doc_id", "v")
    }),

    // -- [EXT]: Fleiss' kappa over the same 2-rater panel as q_kappa —
    //    POOLED marginals (= Scott's pi at n = 2), so it diverges from
    //    Cohen's kappa exactly where the raters' marginals differ;
    //    exact BigInt rational clearing
    "q_fleiss_kappa" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val r1 = docs.select(col("doc_id"), col("lang").as("v"))
      val r2 = docs.select(col("doc_id"),
        TextOps.languageId(col("text")).as("v"))
      graft.analytics.Evaluation.fleissKappa(
        r1.unionByName(r2), "doc_id", "v", raters = 2)
    }),

    // -- [EXT]: TextRank corpus keywords — unweighted PageRank over the
    //    adjacent-token co-occurrence graph of the ≥4-char filtered
    //    token stream (the Mihalcea–Tarau unweighted form: window 2
    //    over the filtered sequence, both directions, self-loops
    //    dropped); top-50 terms on the exact fixed-point ranks
    "q_textrank" -> ((s, dir) => {
      val pairs = t(s, dir, "documents")
        .select(explode(
          TextOps.adjacentTokenPairs(col("text"), minLen = 4)).as("_p"))
        .select(col("_p.src").as("src"), col("_p.dst").as("dst"))
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.analytics.Graph.pageRank(edges, "src", "dst", iters = 3)
        .orderBy(col("rank_fp").desc, col("node")).limit(50)
    }),

    // -- [EXT]: per-rater majority agreement over the q_kripp_alpha
    //    panel — which rater drags the panel down; exact integer
    //    majority (label-asc ties) and agreement micros
    "q_rater_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val r1 = docs.select(col("doc_id"), lit("stored").as("rater"),
        col("lang").as("v"))
      val r2 = docs.select(col("doc_id"), lit("heuristic").as("rater"),
        TextOps.languageId(col("text")).as("v"))
      val r3 = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), lit("spot").as("rater"),
          col("lang").as("v"))
      graft.analytics.Evaluation.raterAgreement(
          r1.unionByName(r2).unionByName(r3), "doc_id", "rater", "v")
        .orderBy(col("rater"))
    }),

    // -- A5 [EXT]: exact dedup on md5(normalized text), min doc_id wins
    "q_exact_dedup" -> ((s, dir) => {
      DedupOps.exactDedup(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: n-gram novelty vs a reference snapshot (even docs) —
    //    the memorization-risk / freshness score: fraction of each odd
    //    doc's distinct trigrams the reference never saw, exact ×10⁶
    "q_ngram_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      DedupOps.ngramNovelty(docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: n-gram Jaccard near-dup pairs (exact inverted-index join)
    "q_ngram_jaccard" -> ((s, dir) => {
      DedupOps.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5, maxPrefixFreq = Int.MaxValue)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- U2 [EXT]: MinHash+LSH near-dup. ORACLE-CHECKED against the exact
    //    string-trigram Jaccard pair set: with b=16/r=4 the S-curve puts
    //    candidate probability at ~1.0 for j>=0.5 (verified exhaustively
    //    in LlmOpsSpec), and the verification stage's hashed-shingle
    //    Jaccard equals the string-shingle value (same set cardinalities),
    //    so the LSH output IS the exact answer on this corpus.
    "q_minhash_neardup" -> ((s, dir) => {
      DedupOps.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- [EXT]: incremental dedup against a historical corpus — Bloom
    //    prefilter (only probable hits reach the anti-join) + exact
    //    verification, so the OUTPUT is exact and fully oracle-checkable.
    //    even doc_ids play the 10^9-doc history, odd ones the new batch.
    "q_incr_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      DedupOps.dedupAgainstHistory(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0),
          "text", expectedHistoryItems = 100000L)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: substring-level exact dedup (ExactSubstr) — every repeated
    //    8-token span keeps its first (doc_id, pos) occurrence; later
    //    occurrences' tokens are removed and the text rebuilt. md5 gram
    //    hashes are engine-portable, so this is a full oracle row.
    "q_substr_dedup" -> ((s, dir) => {
      DedupOps.substringDedup(t(s, dir, "documents"), "doc_id", "text", k = 8)
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: line-level (segment) exact dedup, the C4-style rule — a
    //    span duplicated anywhere in the corpus survives only at its first
    //    (doc_id, pos) occurrence; unlike q_substr_dedup the spans are a
    //    PARTITION of the document (fixed 8-token width stands in for
    //    newline splits: the synthetic corpus has no line structure), so
    //    reassembly is exact and k× cheaper. One fingerprint shuffle.
    "q_line_dedup" -> ((s, dir) => {
      DedupOps.fixedSpanDedup(t(s, dir, "documents"), "doc_id", "text",
          k = 8)
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: boilerplate removal — 4-token spans appearing in >= 4
    //    distinct documents are dropped from EVERY document (including
    //    the first occurrence): the nav-bar/footer rule, distinct from
    //    keep-first dedup. Doc-frequency aggregate + anti-join, both on
    //    the segment fingerprint.
    "q_boilerplate" -> ((s, dir) => {
      DedupOps.boilerplateRemove(t(s, dir, "documents"), "doc_id", "text",
          k = 4, minDocFreq = 4)
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: near-dup CLUSTER resolution — connected components over
    //    the MinHash-LSH pair graph (alternating large-star/small-star),
    //    component = min doc id. ORACLE-CHECKED via a DuckDB recursive CTE
    //    over the exact Jaccard pair set (LSH is candidate-exact on this
    //    corpus, same argument as q_minhash_neardup). Catches A–B–C chains
    //    that pairwise dropping leaves behind (spec'd in LlmOpsSpec).
    "q_neardup_groups" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.minhashLsh(docs, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      val comp = ConnectedComponents(pairs, "id_a", "id_b")
      docs.join(comp, docs("doc_id") === comp("id"), "left")
        .select(docs("doc_id"),
          coalesce(col("component"), docs("doc_id")).as("component"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: deflate compression ratio — the low-entropy/repetition
    //    quality signal (codegen'd DeflateRatio expression; zlib output
    //    is JVM-deterministic but not engine-portable, so rows-only: no
    //    DuckDB oracle). Narrow projection, zero shuffles before the sort.
    "q_compress_ratio" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(graft.functions.CompressExpression
            .deflateRatio(col("text")), 6).as("deflate_ratio"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: SimHash near-dup with Manku-style chunk blocking. FULL
    //    ORACLE via the portable hash family: token hashes are
    //    md5_lower64 (≡ DuckDB md5_number_lower), so the oracle rebuilds
    //    every 64-bit signature with integer SQL and checks the pair set
    //    exactly — the blocking's losslessness is thereby
    //    driver-verified, not just spec-asserted. Production calls
    //    default to the faster xxhash64 family (same plan shape; the
    //    hash choice only affects which pairs count as near).
    "q_simhash_neardup" -> ((s, dir) => {
      DedupOps.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxDist = 3, tokenHash = HashExpressions.md5lo)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- F9/U1 [EXT]: brute-force cosine top-k (probes broadcast, corpus
    //    streamed once, WindowGroupLimit keeps the exchange at k rows/probe)
    "q_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 3)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: MMR diverse re-ranking — relevance-but-not-redundancy
    //    greedy selection from each probe's cosine pool (RAG context
    //    assembly / diverse few-shot picking); pure integer micros
    //    after the one proven-bit-exact double cosine boundary, so the
    //    whole selection ORDER is oracle-replayable
    "q_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.mmrRerank(emb, emb.filter(col("vec_id") < 5),
          k = 5, poolSize = 8, lambdaX1e6 = 700000L)
        .orderBy(col("probe_id"), col("mmr_rank"))
    }),

    // -- [EXT]: distributed k-means (Lloyd's) — whole-corpus clustering
    //    with micro-integer centroids (init = k smallest ids, floored
    //    integer component means per round, the shared IEEE d² chain),
    //    so assignments AND distances replay exactly in any engine
    "q_kmeans" -> ((s, dir) => {
      Clustering.kmeansAssign(t(s, dir, "embeddings"), k = 4, iters = 2)
        .orderBy(col("vec_id"))
    }),

    // -- [EXT]: cluster exemplars — the 5 vectors closest to each final
    //    centroid (centroid-proximal sampling; ranked on the FLOORED
    //    micro distance so the order key is integer on both engines)
    "q_cluster_sample" -> ((s, dir) => {
      Clustering.exemplars(t(s, dir, "embeddings"), k = 4, iters = 2,
          m = 5)
        .orderBy(col("cluster"), col("rank"))
    }),

    // -- [EXT]: simplified (centroid) silhouette of the same k-means
    //    run — O(n·k) cluster-quality readout; b = nearest-other-
    //    centroid distance = the second-best d² under the identical
    //    assignment tie order
    "q_silhouette" -> ((s, dir) => {
      Clustering.silhouette(t(s, dir, "embeddings"), k = 4, iters = 2)
        .orderBy(col("cluster"))
    }),

    // -- [EXT]: unit-L2 normalization (cosine = dot over unit vectors).
    //    Exploded to (vec_id, pos, u) rows so the doubles compare
    //    NUMERICALLY — double→string formatting is not engine-portable
    //    (Java "1.0E-6" vs DuckDB "1e-06").
    "q_l2_normalize" -> ((s, dir) => {
      SimilarityOps.l2Normalize(t(s, dir, "embeddings"))
        .select(col("vec_id"), posexplode(col("unit")).as(Seq("pos", "u")))
        .withColumn("u", round(col("u"), 6))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // -- [EXT]: hard-negative mining — per anchor, top-5 corpus vectors
    //    with cosine in [0.15, 0.45): similar enough to inform a
    //    contrastive loss, below the near-dup band that would make them
    //    false negatives. Band filters BEFORE the rank, so the
    //    WindowGroupLimit heaps see only in-band candidates.
    "q_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.hardNegatives(emb, emb.filter(col("vec_id") < 5),
          k = 5, cosLo = 0.15, cosHi = 0.45)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: embedding-cosine near-dup pairs — EXACT via the
    //    block-partitioned all-pairs equi-join (no CartesianProduct; the
    //    n²/2 compares spread over B²/2 balanced tasks with O(n·B) shuffle;
    //    PlanSpec-asserted). Equality with the naive cross-join asserted
    //    in LlmOpsSpec; the pruning path for cos ≳ 0.9 corpora is
    //    SimilarityOps.cosineNearDupPairsLsh (recall-spec'd).
    "q_embed_neardup" -> ((s, dir) => {
      SimilarityOps.cosineNearDupPairs(t(s, dir, "embeddings"), 0.4)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- [EXT]: semantic decontamination — vec_id < 5 stand in for the
    //    embedded eval benchmark; every corpus vector with cosine >= 0.3
    //    against ANY probe drops (the paraphrase-leakage twin of
    //    q_decontaminate's n-gram containment). Probe side broadcasts.
    "q_embed_decontaminate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.semanticDecontaminate(
          emb.filter(col("vec_id") >= 5), emb.filter(col("vec_id") < 5),
          threshold = 0.3)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // -- [EXT]: LSH-bucketed ANN top-k. Declared at probesPerTable =
    //    2^planes: the multi-probe perturbation lattice covers EVERY
    //    bucket, so candidates = whole corpus and the result provably
    //    equals bruteForceTopK (exact rescoring + identical tie-break) —
    //    the q_ivf_topk promotion trick, so the full cosine oracle
    //    applies while the query still exercises the LSH machinery
    //    end-to-end (bucketing, multi-probe fan-out, id-only candidate
    //    dedup, vector join-back). The PRUNED probesPerTable<2^planes
    //    path is covered by q_lsh_indexed + the LlmOpsSpec recall specs.
    "q_lsh_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 3,
        planes = 4, tables = 16, probesPerTable = 16)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: PII scrub — emails/URLs/IPs redacted with typed
    //    placeholders (synthetic PII appended per doc so the redaction is
    //    actually exercised; testdata text itself is PII-free)
    "q_pii_scrub" -> ((s, dir) => {
      val aug = concat(col("text"), lit(" contact a"),
        col("doc_id").cast("string"),
        lit("@ex.com via http://x.io/a?b=1 from 10.0.0.1"))
      t(s, dir, "documents")
        .withColumn("aug", aug)
        .withColumn("pii", TextOps.piiCounts(col("aug")))
        .select(col("doc_id"),
          md5(TextOps.redactPii(col("aug"))).as("redacted_md5"),
          col("pii.urls").as("n_urls"), col("pii.emails").as("n_emails"),
          col("pii.ips").as("n_ips"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: Gopher-style repetition score (duplicate trigram fraction)
    "q_repetition" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.repetitionScore(col("text"), 3), 6).as("rep_score"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: winnowing document fingerprint (Schleimer et al.
    //    SIGMOD'03): char-5-gram hashes, min per 4-gram sliding window,
    //    one row per distinct selected gram, fused into one shuffle-free
    //    kernel (see TextOps.winnowFingerprints scale notes). The md5
    //    mode is ENGINE-PORTABLE (hex strings order the same everywhere),
    //    so this is a full DuckDB oracle row; the library default stays
    //    xxhash64.
    "q_winnow_fp" -> ((s, dir) => {
      TextOps.winnowFingerprints(t(s, dir, "documents"),
          "doc_id", "text", k = 5, w = 4, portable = true)
        .orderBy(col("doc_id"), col("fp"))
    }),

    // -- [EXT]: benchmark-contamination detection — containment of probe
    //    (doc_id < 100, standing in for an eval benchmark) shingle sets in
    //    every corpus doc; probes broadcast, corpus streams one pass
    "q_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      DedupOps.containmentPairs(docs, docs.filter(col("doc_id") < 100),
          "doc_id", "text", n = 3, threshold = 0.5)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- [EXT]: deterministic stratified subsampling — keep ~30% of each
    //    language, membership a pure function of doc_id (data-mixing step)
    "q_stratified_sample" -> ((s, dir) => {
      graft.ops.Sampling.stratified(t(s, dir, "documents"),
          "lang", "doc_id", 0.3)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: Efraimidis–Spirakis weighted sampling without
    //    replacement — keep the 20 docs per language with the largest
    //    A-ES key ln(u)/w (u a seeded-md5 uniform, w = n_chars), so
    //    inclusion probability is proportional to document length;
    //    deterministic, RNG-free, bit-exact across engines.
    "q_weighted_sample" -> ((s, dir) => {
      graft.ops.Sampling.weightedSample(t(s, dir, "documents"),
          "lang", "doc_id", "n_chars", k = 20)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: blocked edit-distance near-dup pairs — levenshtein ≤ 8
    //    within (8-char normalized prefix, adjacent length-bucket)
    //    blocks; thresholded (banded) levenshtein verification.
    "q_editdist_neardup" -> ((s, dir) => {
      DedupOps.editDistancePairs(t(s, dir, "documents"), "doc_id", "text",
          maxDist = 8, prefixLen = 8, lenBucket = 16)
        .withColumn("dist", col("dist").cast("long"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- [EXT]: sorted-neighborhood near-dup pairs (SNM) — global sort
    //    by normalized text via the range-exchange rank (never a
    //    single-task window), compare each doc to its 4 successors,
    //    levenshtein ≤ 8. The multi-pass complement of prefix blocking.
    "q_snm_neardup" -> ((s, dir) => {
      DedupOps.sortedNeighborhoodPairs(t(s, dir, "documents"), "doc_id",
          "text", window = 4, maxDist = 8)
        .withColumn("dist", col("dist").cast("long"))
        .orderBy(col("id_lo"), col("id_hi"))
    }),

    // -- [EXT]: Jaro–Winkler entity-resolution pairs over part names —
    //    the name-matching companion to q_snm_neardup (length-
    //    normalized, transposition-aware, prefix-weighted); DuckDB's
    //    native jaro_winkler_similarity independently verifies the
    //    codegen kernel pair by pair
    "q_jaro_names" -> ((s, dir) => {
      DedupOps.jaroNeighborhoodPairs(t(s, dir, "part"), "p_partkey",
          "p_name", window = 4, minSim = 0.88)
        .orderBy(col("id_lo"), col("id_hi"))
    }),

    // -- [EXT]: entity resolution closed end-to-end — the q_jaro_names
    //    match graph resolved into canonical entities (min-id per
    //    connected component, unmatched records their own entity): the
    //    blocking → scoring → clustering → survivorship chain of a
    //    record-linkage pipeline, on the q_neardup_groups machinery
    "q_entity_groups" -> ((s, dir) => {
      val parts = t(s, dir, "part")
      val pairs = DedupOps.jaroNeighborhoodPairs(parts, "p_partkey",
        "p_name", window = 4, minSim = 0.88)
      val comp = graft.dedup.ConnectedComponents(pairs, "id_lo", "id_hi")
      parts.join(comp, parts("p_partkey") === comp("id"), "left")
        .select(parts("p_partkey"),
          coalesce(col("component"), parts("p_partkey")).as("entity_id"))
        .orderBy(col("p_partkey"))
    }),

    // -- [EXT]: proportional source interleaving — the stable epoch
    //    order a data loader reads: every prefix holds each source in
    //    proportion to its size. Both passes are the skew-safe rank
    //    machinery (grouped rank per source, global rank on the
    //    fraction); RNG-free, engine-exact.
    "q_interleave" -> ((s, dir) => {
      graft.ops.Sampling.interleaveBySource(t(s, dir, "documents"),
          "source", Seq(col("doc_id").asc))
        .select(col("doc_id"), col("source"), col("pos"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: source-weighted data mixing — per-source target fractions
    //    (keep all of src0, half of src1, a tenth of src2, 20% elsewhere)
    //    with exact quotas, deterministic md5 membership.
    "q_source_mix" -> ((s, dir) => {
      graft.ops.Sampling.stratifiedWeighted(t(s, dir, "documents"),
          "source", "doc_id",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1),
          defaultFraction = 0.2)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: temperature-based mixture resampling (sample languages
    //    ∝ n^0.5) — the multilingual-LM rebalancing rule on the corpus's
    //    naturally skewed lang column (en ≈ 3.4× fr): a 300-doc budget
    //    drawn by √-damped size lifts low-resource languages' share while
    //    keeping the big ones ahead
    "q_temperature_mix" -> ((s, dir) => {
      graft.ops.Sampling.temperatureResample(t(s, dir, "documents"),
          "lang", "doc_id", budget = 300L)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: token-budget data mixing — keep each source's docs, in
    //    deterministic md5 order, until the cumulative token count hits
    //    the source's budget (cap crawl at N tokens, keep all of a small
    //    curated source)
    "q_token_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      graft.ops.Sampling.tokenBudget(docs, "source", "doc_id", "n_tokens",
          Map("src0" -> 800L, "src1" -> 400L), defaultBudget = 1000L)
        .select(col("doc_id"), col("source"), col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: epoch mixing — per-source repeat weights (src0 x2.5:
    //    everyone twice, the first half of the md5 order a 3rd time;
    //    src1 x0.4 downsamples; elsewhere x1), one row per (doc, epoch)
    "q_upsample" -> ((s, dir) => {
      graft.ops.Sampling.upsample(t(s, dir, "documents"),
          "source", "doc_id", Map("src0" -> 2.5, "src1" -> 0.4),
          defaultWeight = 1.0)
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    }),

    // -- [EXT]: decontamination as a transform — docs with id >= 100 are
    //    the corpus, docs with id < 100 stand in for an eval benchmark;
    //    every corpus doc containing a probe (containment >= 0.5) is
    //    REMOVED (the curation-stage form of q_contamination)
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      DedupOps.decontaminate(docs.filter(col("doc_id") >= 100),
          docs.filter(col("doc_id") < 100), "doc_id", "text",
          n = 3, threshold = 0.5)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: the composed corpus-curation pipeline. ORACLE-CHECKED:
    //    every stage is SQL-expressible, and the MinHash-LSH near-dup
    //    stage equals the exact trigram-Jaccard pair set at threshold
    //    0.8 on this corpus (same argument as q_minhash_neardup; row
    //    counts verified identical at sf0.01 AND sf0.1). Stage semantics
    //    additionally asserted in CurationSpec.
    "q_curation" -> ((s, dir) => {
      graft.llm.Curation.curateFrame(
        t(s, dir, "documents"), "doc_id", "text", langCol = Some("lang"))
        .select(col("doc_id"), col("lang"), round(col("quality"), 6).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: the curation stateless subset EXECUTED AS A STREAM — a
    //    real Structured Streaming path on the declared surface: file
    //    stream over the documents table → StreamOps.curatedStreamStateless
    //    (quality gate + PII scrub; per-row pure, so output is
    //    deterministic under any micro-batching) → parquet sink +
    //    checkpoint under Trigger.AvailableNow, then a batch read of the
    //    sink. Oracle = the batch equivalent (q_curation's scored/gated
    //    stages): stream replay == batch, driver-checked. The keyed-dedup
    //    stage (arrival-order-dependent winner) stays in StreamingSpec.
    "q_stream_curation" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val path = s"$dir/documents.parquet"
      val schema = s.read.parquet(path).schema
      val tmp = java.nio.file.Files.createTempDirectory("graft-streamcur")
      // the testdata table is a single FILE; the file-stream source
      // watches its parent DIRECTORY with a glob pinned to the table
      // (a directory table streams as-is)
      val stream =
        if (new java.io.File(path).isDirectory)
          s.readStream.schema(schema).parquet(path)
        else s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
      graft.streaming.StreamOps.curatedStreamStateless(stream, "text")
        .select(col("doc_id"), col("lang"),
          round(col("quality"), 6).as("quality"),
          md5(col("text")).as("redacted_md5"))
        .writeStream.format("parquet")
        .option("path", tmp.resolve("out").toString)
        .option("checkpointLocation", tmp.resolve("cp").toString)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(tmp.resolve("out").toString).orderBy(col("doc_id"))
    }),

    // -- [EXT]: the FULL incremental-gold prefix EXECUTED AS A STREAM —
    //    quality gate + PII scrub + normalize-once fingerprint/shingle
    //    derivation + repetition gate (Curation.prefixStages via
    //    StreamOps.goldPrefixStream), every stage row-local, through a
    //    real parquet sink + checkpoint under Trigger.AvailableNow. The
    //    oracle replays the same stages in SQL and checks the PERSISTED
    //    prefix columns (fingerprint, shingle count) — the continuous
    //    twin of the batch pipeline's per-run prefix append.
    "q_stream_gold_prefix" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val path = s"$dir/documents.parquet"
      val schema = s.read.parquet(path).schema
      val tmp = java.nio.file.Files.createTempDirectory("graft-streamgp")
      val stream =
        if (new java.io.File(path).isDirectory)
          s.readStream.schema(schema).parquet(path)
        else s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
      graft.streaming.StreamOps
        .goldPrefixStream(stream, "doc_id", "text", Some("lang"))
        .select(col("doc_id"), col("lang"),
          round(col("quality"), 6).as("quality"),
          col("_fp").as("fp"),
          size(col("_sh")).cast("long").as("n_shingles"))
        .writeStream.format("parquet")
        .option("path", tmp.resolve("out").toString)
        .option("checkpointLocation", tmp.resolve("cp").toString)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(tmp.resolve("out").toString).orderBy(col("doc_id"))
    }),

    // -- [EXT]: context-window chunking — split each document into
    //    overlapping 32-token windows with stride 24 (the pretraining
    //    packing primitive), exploded to one row per chunk.
    "q_chunk" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.chunkTokens(col("text"), 32, 24))
            .as(Seq("chunk_idx", "chunk_text")))
        .withColumn("n_chunk_tokens",
          size(split(col("chunk_text"), "\\s+")).cast("long"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // -- [EXT]: cross-document sequence packing — the concat-and-chunk
    //    pretraining recipe: documents concatenate in ONE deterministic
    //    global order (shard asc, doc_id asc) and split into fixed token
    //    windows; each doc's window id and offset derive from the exact
    //    running token count of its predecessors in that order.
    //
    //    Two-pass shard-offset scheme so packing parallelizes at corpus
    //    scale: (1) running sum WITHIN each of 32 hash(doc_id) shards —
    //    high-cardinality key, so no task ever sees more than ~1/32 of
    //    the corpus (a lang-keyed window would serialize per language);
    //    (2) the 32 per-shard token totals turn into exclusive-prefix
    //    offsets (a window over 32 AGGREGATE rows, constant size at any
    //    corpus scale) and broadcast-join back. Offsets are exact token
    //    counts, so windows spanning shard boundaries pack seamlessly.
    //    The shard hash is the same engine-portable md5 prefix as
    //    q_stable_split, so the DuckDB oracle reproduces it bit-exactly.
    "q_pack" -> ((s, dir) => {
      val ctx = 2048
      val nShards = 32
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
        .withColumn("shard",
          (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int") % nShards))
      val byShard = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = docs.withColumn("cum_local",
        coalesce(sum(col("n_tokens")).over(byShard), lit(0L)))
      val shardOrder = Window.orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = docs.groupBy(col("shard"))
        .agg(sum(col("n_tokens")).as("shard_total"))
        .withColumn("shard_off",
          coalesce(sum(col("shard_total")).over(shardOrder), lit(0L)))
        .select(col("shard"), col("shard_off"))
      local.join(broadcast(offsets), Seq("shard"))
        .withColumn("cum_prev", col("shard_off") + col("cum_local"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("shard"),
          (col("cum_prev") / ctx).cast("long").as("window_id"),
          (col("cum_prev") % ctx).as("offset_in_window"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: deterministic hash-based train/eval split — the stable-
    //    split primitive of a training-data pipeline: assignment depends
    //    only on the document id (md5, engine-portable), so re-runs,
    //    backfills, and different engines agree; no RNG state, no
    //    sampling seed to version. Scale: a narrow projection.
    "q_stable_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("h",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int"))
        .select(col("doc_id"),
          when(col("h") % 100 < 90, "train").otherwise("eval").as("split"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: IVF ANN top-k. Declared at nprobe=nlist: every cell is
    //    probed, candidates = whole corpus, and the result provably equals
    //    bruteForceTopK (same exact rescoring + (cos desc, id asc)
    //    tie-break) — so the full q_cosine_topk oracle applies while the
    //    query still exercises the IVF machinery end-to-end (Lloyd
    //    centroid train, cell assignment, cell-keyed candidate join). The
    //    PRUNED nprobe<nlist path is covered by q_ivf_indexed + the
    //    LlmOpsSpec recall/equivalence specs.
    "q_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 3,
        nlist = 16, nprobe = 16)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: IVF ANN against a PERSISTED cell-partitioned index — the
    //    build-once/query-many form (index built one time per dataset and
    //    cached; each query prunes to its probed cell directories at
    //    file-listing time). Declared at nprobe=nlist, the q_ivf_topk
    //    promotion trick: every cell directory is read THROUGH the real
    //    persisted-index IO path (partition listing, persisted norms,
    //    candidate join) and the result provably equals brute force, so
    //    the full cosine-top-k oracle applies. The PRUNED nprobe<nlist
    //    path keeps its LlmOpsSpec equivalence/plan specs.
    "q_ivf_indexed" -> ((s, dir) => {
      val path = ivfIndexCache.computeIfAbsent(dir, _ => {
        val p = java.nio.file.Files
          .createTempDirectory("graft_ivfidx").toString
        SimilarityOps.ivfBuildIndex(t(s, dir, "embeddings"), p, nlist = 16)
        p
      })
      SimilarityOps.ivfTopKIndexed(s, path,
          t(s, dir, "embeddings").filter(col("vec_id") < 5), k = 3,
          nprobe = 16)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: LSH ANN against the PERSISTED bucket layout — id-only
    //    bucket rows partitioned by (tbl, bucket); the probe batch prunes
    //    to its (multi-probe) bucket directories at file-listing time
    //    Declared at probesPerTable=2^planes (the same promotion trick
    //    as q_ivf_indexed): the multi-probe lattice lists EVERY bucket
    //    directory through the persisted-index IO path, candidates =
    //    whole corpus, result provably brute force ⇒ full cosine oracle.
    //    The PRUNED probesPerTable<2^planes path keeps its LlmOpsSpec
    //    recall/equivalence specs.
    "q_lsh_indexed" -> ((s, dir) => {
      val path = lshIndexCache.computeIfAbsent(dir, _ => {
        val p = java.nio.file.Files
          .createTempDirectory("graft_lshidx").toString
        SimilarityOps.lshBuildIndex(t(s, dir, "embeddings"), p,
          planes = 4, tables = 16)
        p
      })
      SimilarityOps.lshTopKIndexed(s, path,
          t(s, dir, "embeddings").filter(col("vec_id") < 5), k = 3,
          planes = 4, tables = 16, probesPerTable = 16)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: vocabulary construction — top-100 corpus terms by total
    //    frequency with document frequency (TakeOrderedAndProject; each
    //    partition forwards <= 100 rows)
    "q_vocab_topk" -> ((s, dir) => {
      CorpusStats.vocabularyTopK(t(s, dir, "documents"),
        "doc_id", "text", k = 100)
    }),

    // -- [EXT]: per-document top-3 TF-IDF terms — keyword extraction.
    //    Every score input is an integer (tf, df, N), so the ranking is
    //    engine-exact; ties break on (tf desc, term asc).
    "q_tfidf_topk" -> ((s, dir) => {
      CorpusStats.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text",
          k = 3)
        .withColumn("tfidf", round(col("tfidf"), 6))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // -- [EXT]: Lorenz curve of token mass over documents — "the top
    //    decile of docs holds X% of the tokens", the concentration
    //    statement beside q_hhi/q_gini; exact tie-safe rank bands
    "q_lorenz" -> ((s, dir) => {
      graft.analytics.Profiler.lorenzCurve(
          t(s, dir, "documents").withColumn("n_tokens",
            TextOps.tokenCount(col("text")).cast("double")),
          "n_tokens")
        .orderBy(col("decile"))
    }),

    // -- [EXT]: Herfindahl–Hirschman source concentration — how
    //    dominated is the corpus by its biggest sources (Σ share²; the
    //    reciprocal is the "effective number of sources" a mixing plan
    //    actually draws from); exact integer squares, floored micros
    "q_hhi" -> ((s, dir) =>
      graft.analytics.Profiler.concentration(
        t(s, dir, "documents"), "source")),

    // -- [EXT]: tokenizer fertility per language — subword-tokens per
    //    word (the tokenizer-efficiency number multilingual data work
    //    budgets by: high-fertility languages pay more sequence length
    //    per word); exact count sums, floored-micro ratio
    "q_fertility" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents")
        .filter(col("lang").isNotNull)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(txt).cast("long")).as("n_words"),
          sum(TextOps.bpeTokenCount(txt).cast("long")).as("n_subwords"))
        .withColumn("fertility_x1e6",
          when(col("n_words") > 0L, graft.ops.Fixed.ldiv(
            col("n_subwords") * lit(1000000L), col("n_words"))))
        .orderBy(col("lang"))
    }),

    // -- [EXT]: top collocations by Dunning's G² — the phrase-discovery
    //    pass before tokenizer training (pairs co-occurring beyond their
    //    unigram rates); exact 2×2 bigram-token cells, pinned ln chain,
    //    rounded before ranking
    "q_collocations" -> ((s, dir) => {
      CorpusStats.collocations(t(s, dir, "documents"), "doc_id", "text",
        k = 20, minCount = 5L)
    }),

    // -- [EXT]: Zipf power-law fit — OLS slope of ln(tf) on ln(rank)
    //    over the top-1000 vocabulary (natural corpora slope ≈ −1; a
    //    synthetic or templated corpus shows up as a flat or kinked
    //    line — a cheap provenance fingerprint); rides olsByGroup's
    //    exact micro power sums
    "q_zipf" -> ((s, dir) => {
      val rv = CorpusStats.rankedVocabulary(t(s, dir, "documents"),
        "doc_id", "text", k = 1000)
      graft.analytics.Regression.olsByGroup(
        rv.select(lit("corpus").as("corpus"),
          log(col("id").cast("double")).as("ln_rank"),
          log(col("tf").cast("double")).as("ln_tf")),
        Seq("corpus"), "ln_rank", "ln_tf")
    }),

    // -- [EXT]: Heaps' law vocabulary-growth fit — V ≈ K·T^β over 10
    //    doc-rank checkpoints (slope = β: ~0.5 natural text, ~1
    //    templated/ID-heavy — the provenance fingerprint beside q_zipf
    //    and the tokenizer-vocab capacity planner); skew-safe global
    //    rank, ln-micro OLS
    "q_heaps" -> ((s, dir) => {
      CorpusStats.heapsLaw(t(s, dir, "documents"), "doc_id", "text",
        checkpoints = 10)
    }),

    // -- [EXT]: chi-square discriminative terms per language — the
    //    supervised term screen beside q_tfidf_topk (which terms
    //    fingerprint a labeled slice); exact 2×2 presence cells,
    //    pinned-order χ², rounded before ranking
    "q_chi2_terms" -> ((s, dir) => {
      CorpusStats.chiSquareTerms(t(s, dir, "documents"), "doc_id",
          "lang", "text", k = 5)
        .orderBy(col("lang"), col("rank"))
    }),

    // -- [EXT]: hashing-trick TF features — the no-global-vocabulary
    //    vectorizer (signed buckets debias collisions). All-integer
    //    output ⇒ bit-exact oracle.
    "q_hashing_tf" -> ((s, dir) => {
      CorpusStats.hashingTf(t(s, dir, "documents"), "doc_id", "text",
          numFeatures = 256)
        .orderBy(col("doc_id"), col("feature"))
    }),

    // -- [EXT]: DSIR importance weights — every doc scored by hashed-
    //    unigram likelihood ratio target-domain vs raw corpus (sources
    //    src0/src1 stand in for the curated target); resampling ∝
    //    exp(logw) shifts the crawl toward the target. 64 buckets so
    //    collisions are actually exercised at sf-test vocab size.
    "q_dsir_weights" -> ((s, dir) => {
      CorpusStats.dsirLogWeights(t(s, dir, "documents"), "doc_id", "text",
          target = col("source").isin("src0", "src1"), numFeatures = 64)
        .withColumn("logw", round(col("logw"), 6))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: HTML → text extraction — the web-corpus entry stage
    //    (testdata text is already plain, so each doc is wrapped in a
    //    deterministic HTML shell — title/style/script/comment/entities —
    //    the same way q_pii_scrub appends synthetic PII; the extraction
    //    must strip everything it added and decode the entities)
    "q_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>"), col("source"), lit("</title>"),
        lit("<style type=\"text/css\">body { margin: 0; }</style>"),
        lit("<script>var n = 1; if (n < 2) { n = 2; }</script></head>"),
        lit("<body><!-- doc "), col("doc_id").cast("string"), lit(" -->"),
        lit("<h1>Title &amp; Header</h1><p>"), col("text"),
        lit("</p><ul><li>alpha&nbsp;beta</li>"),
        lit("<li>&lt;tag&gt; &#39;q&#39; &quot;z&quot;</li></ul>"),
        lit("</body></html>"))
      t(s, dir, "documents")
        .withColumn("extract", TextOps.htmlExtract(html))
        .select(col("doc_id"),
          length(col("extract")).as("n_extract_chars"),
          md5(col("extract")).as("extract_md5"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: unigram-LM fluency score — mean token log-prob under the
    //    corpus's own unigram model (the KenLM-style quality signal)
    "q_unigram_logprob" -> ((s, dir) => {
      CorpusStats.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("logprob", round(col("logprob"), 6))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: bigram-LM fluency scoring — mean log CONDITIONAL
    //    probability under corpus self-counts; the order-sensitive
    //    upgrade of the unigram LM (bigrams form in-row, no window)
    "q_bigram_logprob" -> ((s, dir) => {
      CorpusStats.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("logprob", round(col("logprob"), 6))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: corpus domain-similarity matrix — pairwise
    //    Jensen–Shannon divergence between per-source token
    //    distributions (the signal behind mixing decisions and
    //    domain-shift monitoring). One (source, term) aggregate, one
    //    term-keyed self-join; absent-in-one-side mass enters via the
    //    shared-mass decomposition, never an outer join.
    "q_source_divergence" -> ((s, dir) => {
      CorpusStats.sourceDivergence(t(s, dir, "documents"),
          "source", "text")
        .withColumn("js", round(col("js"), 6))
        .orderBy(col("stratum_a"), col("stratum_b"))
    }),

    // -- [EXT]: BM25 keyword search — top-10 docs per probe query (the
    //    targeted-subset-selection retrieval primitive). Query terms
    //    broadcast; per-doc sum decimal-cast (merge-order-independent);
    //    rank via (query, shard)-keyed WindowGroupLimit then a final
    //    window over the <= 32·k survivors — never a low-cardinality
    //    query-id window at data size. "watermark" is OOV on purpose.
    "q_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val probes = Seq(
        ("q1", "hash join merge"),
        ("q2", "customer order line"),
        ("q3", "stream window watermark")).toDF("query_id", "query_text")
      CorpusStats.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          probes, "query_id", "query_text", k = 10)
        .withColumn("score", round(col("score"), 6))
        .orderBy(col("query_id"), col("rank"))
    }),

    // -- [EXT]: hybrid retrieval — BM25 (lexical) + dense cosine
    //    (semantic) candidate lists fused by reciprocal-rank fusion
    //    (Cormack et al., SIGIR 2009), the standard RAG first stage.
    //    Probes are documents themselves (related-doc retrieval); each
    //    component contributes its own top-20 list, fusion keeps top-10.
    //    Decimal-exact contribution sums make the fused scores
    //    order-independent and oracle-reproducible.
    "q_hybrid_rrf" -> ((s, dir) => {
      graft.similarity.HybridSearch.relatedDocsHybrid(
          t(s, dir, "documents"), t(s, dir, "embeddings"),
          col("doc_id") < 3)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: logistic quality classifier — σ(w·x) over the
    //    interpretable quality features (fastText-style scoring pass with
    //    fixed published weights)
    "q_quality_logit" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(CorpusStats.logisticQuality(col("text")), 6)
            .as("quality_logit"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: percentile-gated quality filter — keep the best 30% per
    //    source by logistic quality (relative threshold preserves the
    //    source mix where an absolute cut skews it). Ordering key is the
    //    ROUNDED score (engine-portable); tie-break doc_id. One shuffle.
    "q_quality_topfrac" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          round(CorpusStats.logisticQuality(col("text")), 6).as("ql6"))
      graft.ops.Sampling
        .topFractionPerGroup(scored, "source", col("ql6"), "doc_id", 0.3)
        .select(col("doc_id"), col("source"),
          col("ql6").as("quality_logit"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: tokenize-to-ids — encode each doc as token ids under the
    //    rank-20 corpus vocabulary (OOV → 0); ids joined to one string for
    //    the engine-portable compare (the operator returns a real array)
    "q_tokenize_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = CorpusStats.rankedVocabulary(docs, "doc_id", "text", k = 20)
      CorpusStats.tokenizeIds(docs, "doc_id", "text", vocab)
        .select(col("doc_id"),
          array_join(col("token_ids").cast("array<string>"), " ")
            .as("token_ids_str"),
          col("n_unk"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: BPE tokenizer training + encoding — distributed
    //    word-count shuffle, driver greedy merge loop over the word
    //    table (the sentencepiece/HF shape), broadcast-ranks encode.
    //    FULL oracle since r14: the trained merge table for the
    //    driver-verified corpus sizes is COMMITTED as a fixture
    //    (fixtures/bpe_merges.csv, keyed by the documents row count);
    //    training must reproduce it exactly (the require below — the
    //    trainer is deterministic by construction: count-desc/lexi
    //    tie-breaks, ordered truncation), and the DuckDB oracle
    //    replays ENCODING from the same fixture in recursive SQL
    //    (min-rank leftmost-occurrence merge steps to fixpoint — one
    //    occurrence per step is equivalent to the all-occurrences pass
    //    because newly created adjacencies always involve the merged
    //    symbol, whose merges rank strictly later). Corpus sizes
    //    without a fixture entry (not a driver gate point) train and
    //    encode exactly as before. BpeSpec keeps the hand-checkable
    //    merge sequence, round-trip, and partitioning invariance.
    "q_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = bpeModelCache.computeIfAbsent(dir,
        _ => text.Bpe.train(docs, "text", numMerges = 200))
      val fixtureFile = {
        val local = new java.io.File("fixtures/bpe_merges.csv")
        if (local.isFile) local
        else new java.io.File("/root/repo/fixtures/bpe_merges.csv")
      }
      if (fixtureFile.isFile) {
        // corpus key = (rows, total chars) — rows alone collide across
        // the driver's scale factors (sf0.001 and sf0.01 are both 500)
        val Seq(docsN, charsN) = docs
          .agg(count(lit(1)), sum(length(col("text"))))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toSeq
        val fixture = scala.io.Source.fromFile(fixtureFile, "UTF-8")
        val expected = try {
          fixture.getLines().drop(1).map(_.split(",", 5)).collect {
            case Array(n, ch, r, p1, p2)
                if n.toLong == docsN && ch.toLong == charsN =>
              (r.toInt, (p1, p2))
          }.toVector.sortBy(_._1).map(_._2)
        } finally fixture.close()
        if (expected.nonEmpty)
          require(model.merges == expected,
            s"q_bpe_encode: training on $docsN documents did not " +
              s"reproduce the committed merge fixture (got " +
              s"${model.merges.take(5)}... vs ${expected.take(5)}...) - " +
              "the trainer or the normalization changed; re-run " +
              "tools/MakeBpeFixture and re-verify")
      }
      text.Bpe.encode(docs, "text", model)
        .select(col("doc_id"), col("pieces_n"),
          array_join(slice(col("pieces"), 1, 12), " ").as("pieces_head"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: per-source corpus profile — the reporting pass before/
    //    after mixing: docs, tokens, languages, mean quality per source
    "q_corpus_profile" -> ((s, dir) => {
      CorpusStats.sourceProfile(t(s, dir, "documents"),
          "source", "text", "lang")
        .withColumn("mean_quality", round(col("mean_quality"), 6))
        .orderBy(col("source"))
    }),

    // -- [EXT]: distinct-1/distinct-2 lexical diversity per source —
    //    the mode-collapse / boilerplate detector of generated-text
    //    and corpus-mix evals; exact unique-to-total micro ratios over
    //    the normalized token stream
    "q_distinct_ngrams" -> ((s, dir) => {
      CorpusStats.distinctNgrams(t(s, dir, "documents"), "text",
          Seq("source"))
        .orderBy(col("source"))
    }),

    // -- [EXT]: mutual information between source and lang — the
    //    feature-redundancy diagnostic; per-cell exact counts, rational
    //    probabilities, ln only at the rounded last step (Σ mi_term =
    //    the MI in nats)
    "q_mutual_info" -> ((s, dir) => {
      graft.analytics.Profiler.mutualInformation(
          t(s, dir, "documents"), "source", "lang")
        .orderBy(col("source"), col("lang"))
    }),

    // -- [EXT]: PSI distribution drift between two corpus snapshots
    //    (here: even vs odd doc ids) on the lang column — Laplace-
    //    smoothed integer rates, psi_term doubles only at the last step
    //    (Σ psi_term = the PSI; >= 0.2 = conventional drift alarm)
    "q_drift_psi" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.analytics.Profiler.categoricalDrift(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), "lang")
        .orderBy(col("category"))
    }),

    // -- [EXT]: embedding-centroid drift — the semantic counterpart of
    //    q_drift_psi: per label, cosine between the even- and odd-id
    //    halves' mean embeddings (scale-invariance ⇒ computed on exact
    //    integer per-dim sums; doubles only at the last step)
    "q_embed_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      graft.similarity.SimilarityOps.centroidDrift(
          e.filter(col("vec_id") % 2 === 0),
          e.filter(col("vec_id") % 2 === 1),
          "label", "embedding")
        .orderBy(col("label"))
    }),

    // -- [EXT]: SemDeDup semantic dedup — cluster embeddings (16
    //    deterministic id-seeded cells), resolve same-cell cos>=0.4
    //    near-dup GROUPS via connected components, keep min id. Output is
    //    integer-only ⇒ bit-exact oracle.
    "q_semdedup" -> ((s, dir) => {
      SimilarityOps.semDedup(t(s, dir, "embeddings"), threshold = 0.4,
          nlist = 16)
        .orderBy(col("vec_id"))
    }),

    // -- [EXT]: distributed PCA whitening — ONE moment-aggregation pass
    //    (d(d+3)/2 doubles per partial), driver-side 64×64 Jacobi
    //    eigensolve, broadcast-literal projection. No oracle (float
    //    eigenbasis); PcaSpec asserts recovery/diagonalization/trace.
    "q_pca_project" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = pcaModelCache.computeIfAbsent(dir,
        _ => analytics.Pca.fit(emb, "embedding", r = 8))
      analytics.Pca.project(emb, "embedding", model, whiten = true)
        .select(col("vec_id") +:
          (0 until 8).map(j =>
            element_at(col("pca"), j + 1).as(s"pc${j + 1}")): _*)
        .orderBy(col("vec_id"))
    }),

    // -- [EXT]: URL canonicalization + host / registered-domain
    //    extraction (the RefinedWeb/CCNet URL-curation pass). The
    //    synthetic corpus carries no URL column, so the query BINDS a
    //    derived messy URL per row (mixed-case scheme+host, default
    //    port, tracking params, fragment) — the operators are
    //    column-generic and every normalization rule is exercised.
    //    Narrow shuffle-free projection.
    "q_url_normalize" -> ((s, dir) => {
      // even ids exercise tracking-param removal; odd ids exercise the
      // fragment-then-trailing-slash path
      val url = concat(lit("HTTP://WWW."), upper(col("source")),
        lit(".Example.COM:80/Docs/"), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0,
          concat(lit("/?utm_source=feed&ref="), col("lang"),
            lit("&fbclid=x#top")))
          .otherwise(lit("/#top")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          text.UrlOps.normalizeUrl(url).as("url_norm"),
          text.UrlOps.urlHost(url).as("host"),
          text.UrlOps.registeredDomain(text.UrlOps.urlHost(url))
            .as("domain"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: Unicode NFC normalization — the canonical first step of
    //    web-corpus cleanup (decomposed accents, compatibility forms).
    //    The synthetic corpus is pure ASCII, so the query BINDS
    //    deterministic decomposed sequences per row (e → e+U+0301 on
    //    doc_id%3==0 rows, a decomposed Å prefix on %3==1 rows, the
    //    already-normalized fast path on the rest) — the expression is
    //    column-generic. Narrow shuffle-free projection; normalization
    //    is UAX #15-stabilized so the JDK and DuckDB's utf8proc agree.
    "q_unicode_nfc" -> ((s, dir) => {
      val messy = when(col("doc_id") % 3 === 0,
          regexp_replace(col("text"), "e", "e\u0301"))   // e + COMBINING ACUTE
        .when(col("doc_id") % 3 === 1,
          concat(lit("A\u030A "), col("text")))          // A + COMBINING RING
        .otherwise(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), messy.as("messy"))
        .select(col("doc_id"),
          graft.functions.UnicodeExpression
            .normalizeUnicode(col("messy"), "NFC").as("norm_text"),
          (col("messy") =!= graft.functions.UnicodeExpression
            .normalizeUnicode(col("messy"), "NFC")).as("changed"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: per-domain document cap — at most 5 docs per source,
    //    preferring the longest (n_chars desc, doc_id tie-break): the
    //    anti-domination rule of web-corpus mixing. One shuffle on the
    //    domain key, rank bounded map-side by WindowGroupLimit.
    "q_domain_cap" -> ((s, dir) => {
      text.UrlOps.domainCap(t(s, dir, "documents"), "source", 5,
          Seq(col("n_chars").desc, col("doc_id").asc))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // -- [EXT]: SQ8 int8 quantization codes — symmetric per-vector scalar
    //    quantization (codegen'd Sq8Encode), 4× smaller than float32.
    //    INTEGER-ONLY output (codes + exact squared norm) ⇒ bit-exact
    //    oracle; the float scale is spec-covered. Narrow, shuffle-free.
    "q_sq8_codes" -> ((s, dir) => {
      SimilarityOps.sq8Quantize(t(s, dir, "embeddings"))
        .select(col("vec_id"),
          array_join(col("codes").cast("array<string>"), " ")
            .as("codes_str"),
          graft.functions.VectorExpressions
            .int8Dot(col("codes"), col("codes")).as("norm_sq"))
        .orderBy(col("vec_id"))
    }),

    // -- [EXT]: top-k by QUANTIZED cosine — bruteForceTopK's exact shape
    //    (broadcast probes, WindowGroupLimit) over int8 codes: the
    //    memory-bandwidth exhaustive search. Scales cancel in cosine so
    //    the score is integer-derived ⇒ full oracle; recall vs the float
    //    form is additionally spec'd.
    "q_sq8_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.sq8TopK(emb, emb.filter(col("vec_id") < 5), k = 3)
        .withColumn("qcos", round(col("qcos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: IVF-SQ8 — ANN against the persisted cell-partitioned
    //    index holding int8 CODES instead of float vectors (4× smaller
    //    probed-cell reads; scoring in the int8 domain). nprobe=nlist
    //    here makes candidates = whole corpus, so the result provably
    //    equals q_sq8_topk (spec'd); the declared row is the integer-
    //    derived full oracle reusing q_sq8_topk's SQL.
    "q_ivf_sq8" -> ((s, dir) => {
      val path = ivfSq8IndexCache.computeIfAbsent(dir, _ => {
        val p = java.nio.file.Files
          .createTempDirectory("graft_ivfsq8idx").toString
        SimilarityOps.ivfBuildIndex(t(s, dir, "embeddings"), p,
          nlist = 16, quantized = true)
        p
      })
      SimilarityOps.ivfTopKIndexed(s, path,
          t(s, dir, "embeddings").filter(col("vec_id") < 5), k = 3,
          nprobe = 16, quantized = true)
        .withColumn("qcos", round(col("qcos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: product-quantization ADC top-k — PQ codes per vector,
    //    candidates scored with m table reads each. DECLARED in the
    //    provably-SQL-expressible configuration (the q_ivf_topk
    //    promotion pattern): m = dim ⇒ dsub = 1, lloydIters = 0 and
    //    sampleSize = k = 16 ⇒ the codebook IS the first 16 vectors'
    //    per-dimension values verbatim (no k-means floats), so the ADC
    //    score is exactly cosine(probe, per-dim-quantized
    //    reconstruction) — a full DuckDB oracle. The whole PQ machinery
    //    still executes end-to-end (codebook build, argmin encode, LUT,
    //    ADC table-read scoring, recon norms); the Lloyd-TRAINED path
    //    keeps its determinism/recall/equivalence specs in LlmOpsSpec.
    "q_pq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = pqModelCache.computeIfAbsent(dir,
        _ => similarity.ProductQuantizer.train(emb,
          m = 64, k = 16, lloydIters = 0, sampleSize = 16))
      similarity.ProductQuantizer
        .adcTopK(emb, emb.filter(col("vec_id") < 5), model, kNN = 3)
        .withColumn("pqcos", round(col("pqcos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: IVF-PQ — the FAISS billion-scale workhorse: coarse cells
    //    as partition directories (pruned at file-listing time) holding
    //    PQ codes; probed cells score by ADC. nprobe=nlist makes
    //    candidates = whole corpus and the shared exact-configuration
    //    model (see q_pq_topk) makes ADC SQL-expressible ⇒ the same
    //    full oracle; the pruned nprobe<nlist path keeps its LlmOpsSpec
    //    equivalence/recall specs.
    "q_ivf_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = pqModelCache.computeIfAbsent(dir,
        _ => similarity.ProductQuantizer.train(emb,
          m = 64, k = 16, lloydIters = 0, sampleSize = 16))
      val path = ivfPqIndexCache.computeIfAbsent(dir, _ => {
        val p = java.nio.file.Files
          .createTempDirectory("graft_ivfpqidx").toString
        similarity.ProductQuantizer.ivfPqBuildIndex(emb, p, model,
          nlist = 16)
        p
      })
      similarity.ProductQuantizer.ivfPqTopKIndexed(s, path,
          emb.filter(col("vec_id") < 5), kNN = 3, nprobe = 16,
          model0 = Some(model))
        .withColumn("pqcos", round(col("pqcos"), 6))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // -- [EXT]: deterministic global shuffle — the seeded md5 order that
    //    decorrelates training batches from crawl order, reproducibly.
    //    One range exchange + local sorts at scale. Full oracle.
    "q_global_shuffle" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.Sampling.shuffleKey(col("doc_id"), "train-shuffle")
            .as("skey"))
        // nulls-last matches DuckDB's default ASC NULL placement (the
        // skill-doc NULL-ordering gotcha); skey itself is never null
        .orderBy(col("skey"), col("doc_id").asc_nulls_last)
    }),

    // -- [EXT]: training-shard assignment — seeded-hash shard in [0,8);
    //    pure function of (seed, id) so incremental builds never move
    //    existing rows. Narrow projection. Full oracle.
    "q_shard_assign" -> ((s, dir) => {
      graft.ops.Sampling.shardAssign(t(s, dir, "documents"), "doc_id", 8)
        .select(col("doc_id"), col("shard"))
        .orderBy(col("doc_id").asc_nulls_last)
    })
  )

  private val duckToks = "regexp_split_to_array(trim(text), '\\s+')"
  private val duckToksLower = "regexp_split_to_array(trim(lower(text)), '\\s+')"

  /** (doc_id, lang, guess): the marker-stopword argmax language-ID
    * replay — shared by the q_lang_id oracle and the kappa confusion
    * matrix built on top of it. */
  private lazy val langGuessSql: String = {
    val markers = TextOps.LangMarkers.map { case (lang, ws) =>
      lang -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
    }
    val scores = markers.map { case (lang, arr) =>
      s"len(list_intersect(toks, $arr)) AS s_$lang"
    }.mkString(",\n    ")
    val best = markers.map { case (lang, _) => s"s_$lang" }
      .mkString("greatest(", ", ", ")")
    val cases = markers.map { case (lang, _) =>
      s"WHEN s_$lang = $best AND s_$lang > 0 THEN '$lang'"
    }.mkString("\n    ")
    s"""SELECT doc_id, lang,
       |  CASE
       |    $cases
       |    ELSE 'und' END AS guess
       |FROM (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM (SELECT doc_id, lang, list_distinct($duckToksLower) AS toks FROM documents))""".stripMargin
  }
  private val stopList = TextOps.EnglishStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")

  /** `(doc_id, source, ql)` — the UNROUNDED logistic-quality score
    * (mirrors CorpusStats.logisticQuality); shared by the q_quality_logit
    * and q_quality_topfrac oracles. */
  private lazy val duckLogitSub =
    s"""SELECT doc_id, source, 1.0 / (1.0 + exp(-(
       |    -2.0 + 6.0 * (sw_hits / n_toks_d)
       |    + -4.0 * (punct_chars / n_chars_d)
       |    + 0.15 * (tok_chars / n_toks_d)
       |    + 0.25 * ln(n_chars_d)
       |    + -3.0 * (1.0 - n_tri_distinct / tri_total)))) AS ql
       |FROM (
       |  SELECT doc_id, source,
       |    length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE AS punct_chars,
       |    length(text)::DOUBLE AS n_chars_d,
       |    len(list_filter($duckToksLower, t -> list_contains($stopList, t)))::DOUBLE AS sw_hits,
       |    len($duckToks)::DOUBLE AS n_toks_d,
       |    list_sum(list_transform($duckToks, t -> length(t)))::DOUBLE AS tok_chars,
       |    len(list_distinct(CASE WHEN len(ntoks) < 3
       |      THEN [array_to_string(ntoks, ' ')]
       |      ELSE list_transform(range(1, len(ntoks) - 1),
       |        i -> array_to_string(ntoks[i:i+2], ' ')) END))::DOUBLE AS n_tri_distinct,
       |    greatest(len(ntoks) - 2, 1)::DOUBLE AS tri_total
       |  FROM (SELECT *, string_split($duckNorm, ' ') AS ntoks FROM documents))""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // Exact SQL reimplementation of the md5-family SimHash: rebuild every
    // 64-bit signature (per-bit ±1 sums over md5_number_lower token
    // hashes — identical little-endian semantics to the engine's
    // md5_lower64), then check ALL pairs at Hamming ≤ 3. The engine's
    // chunk-blocked join must find exactly this set (Manku pigeonhole).
    "q_simhash_neardup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS term
         |  FROM documents
         |), th AS (
         |  SELECT doc_id, md5_number_lower(term) AS h FROM toks
         |), sbits AS (
         |  SELECT doc_id, t.b AS b,
         |    CASE WHEN sum(CASE WHEN (h >> CAST(t.b AS INTEGER)) & 1 = 1
         |                       THEN 1 ELSE -1 END) > 0
         |         THEN 1 ELSE 0 END AS sbit
         |  FROM th CROSS JOIN range(64) t(b)
         |  GROUP BY doc_id, t.b
         |), sigs AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN sbit = 1
         |             THEN (1::UBIGINT << CAST(b AS INTEGER))
         |             ELSE 0::UBIGINT END) AS sig
         |  FROM sbits GROUP BY doc_id
         |), pairs AS (
         |  SELECT a.doc_id AS id_a, c.doc_id AS id_b,
         |    bit_count(xor(CAST(a.sig AS UBIGINT), CAST(c.sig AS UBIGINT)))
         |      AS dist
         |  FROM sigs a JOIN sigs c ON a.doc_id < c.doc_id
         |)
         |SELECT id_a, id_b, CAST(dist AS INTEGER) AS dist FROM pairs
         |WHERE dist <= 3 ORDER BY id_a, id_b""".stripMargin,

    // the same three surrogate counts (whitespace words, [.!?]+ runs,
    // [aeiouy]+ runs) and the same fixed double sequence
    "q_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) > 0 THEN
        |      CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    ELSE 0 END AS n_words,
        |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT), 1) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS syl_raw
        |  FROM documents),
        |s AS (SELECT doc_id, n_words, n_sentences,
        |        greatest(syl_raw, n_words) AS n_syllables FROM c)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
        |          - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE), 6)
        |  END AS flesch
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_text_stats" ->
      s"""SELECT doc_id, n_tokens, n_bpe_tokens,
         |  round(punct_chars / n_chars_d, 6) AS punct_ratio,
         |  round(sw_hits / n_toks_d, 6) AS stopword_ratio,
         |  round(tok_chars / n_toks_d, 6) AS mean_word_len,
         |  round(
         |    (CASE WHEN n_chars_d >= 50 AND n_chars_d <= 10000 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN sw_hits / n_toks_d >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN punct_chars / n_chars_d <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
         |    + (CASE WHEN tok_chars / n_toks_d >= 2.0 AND tok_chars / n_toks_d <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2,
         |    6) AS quality
         |FROM (
         |  SELECT doc_id,
         |    len($duckToks) AS n_tokens,
         |    len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
         |    length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE AS punct_chars,
         |    length(text)::DOUBLE AS n_chars_d,
         |    len(list_filter($duckToksLower, t -> list_contains($stopList, t)))::DOUBLE AS sw_hits,
         |    len($duckToks)::DOUBLE AS n_toks_d,
         |    list_sum(list_transform($duckToks, t -> length(t)))::DOUBLE AS tok_chars
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q_lang_id" -> s"$langGuessSql\nORDER BY doc_id",
    "q_logit_train" -> logitTrainOracle(5, 250000L),
    "q_logit_eval" -> logitEvalOracle(5, 250000L, 10000L),
    "q_trained_quality" -> trainedQualityOracle(5, 2000000L),

    // exact integer kappa over the (lang, guess) confusion matrix the
    // q_lang_id oracle already replays: po/pe cleared to
    // (n·agree − Σ aᶜbᶜ)·10⁶ // (n² − Σ aᶜbᶜ), the spelled-out
    // negative floor (kappa < 0 = below-chance agreement)
    // same rational clearing as the engine: group units by m, lcm of
    // (m−1) via list_reduce, HUGEINT throughout, spelled-out negative
    // floor on the final micro division
    "q_kripp_alpha" ->
      s"""WITH g AS MATERIALIZED ($langGuessSql),
         |r AS (SELECT doc_id AS u, lang AS v FROM g
         |      UNION ALL SELECT doc_id, guess FROM g
         |      UNION ALL SELECT doc_id, lang FROM g WHERE doc_id % 2 = 0),
         |uv AS MATERIALIZED (
         |  SELECT u, v, COUNT(*) AS c FROM r GROUP BY u, v),
         |per AS MATERIALIZED (
         |  SELECT u, SUM(c) AS m, SUM(c * c) AS sq FROM uv GROUP BY u
         |  HAVING SUM(c) >= 2),
         |sm AS MATERIALIZED (
         |  SELECT m, SUM(m * m - sq) AS s, COUNT(*) AS nu
         |  FROM per GROUP BY m),
         |l AS (SELECT list_reduce(list(m - 1), (a, b) -> lcm(a, b)) AS lc
         |      FROM sm),
         |tot AS (SELECT SUM(m * nu) AS n, SUM(nu) AS n_units FROM sm),
         |nc AS (SELECT v, SUM(c) AS cnt
         |       FROM uv JOIN per USING (u) GROUP BY v),
         |de AS (SELECT SUM(CAST(cnt AS HUGEINT) * cnt) AS sq2 FROM nc),
         |don AS (SELECT SUM(s * ((SELECT lc FROM l) // (m - 1))) AS dn
         |        FROM sm),
         |f AS (SELECT tot.n, tot.n_units,
         |        (SELECT lc FROM l)
         |          * (CAST(tot.n AS HUGEINT) * tot.n
         |             - (SELECT sq2 FROM de)) AS den,
         |        (CAST(tot.n AS HUGEINT) - 1) * (SELECT dn FROM don) AS num
         |      FROM tot)
         |SELECT CAST(n_units AS BIGINT) AS n_units,
         |  CAST(n AS BIGINT) AS n_ratings,
         |  CASE WHEN den > 0 THEN
         |    CAST(CASE WHEN ((den - num) * 1000000) % den <> 0
         |        AND (den - num) < 0
         |      THEN ((den - num) * 1000000) // den - 1
         |      ELSE ((den - num) * 1000000) // den END AS BIGINT)
         |  END AS alpha_x1e6
         |FROM f""".stripMargin,

    // unit majority via row_number over (count desc, label asc) — the
    // engine's min_by(-count, label) tie order — then one rater
    // aggregate; all non-negative integers, // is the floor
    "q_rater_quality" ->
      s"""WITH g AS MATERIALIZED ($langGuessSql),
         |r AS (SELECT doc_id AS u, 'stored' AS rater, lang AS v FROM g
         |      UNION ALL
         |      SELECT doc_id, 'heuristic', guess FROM g
         |      UNION ALL
         |      SELECT doc_id, 'spot', lang FROM g WHERE doc_id % 2 = 0),
         |uv AS (SELECT u, v, count(*) AS c FROM r GROUP BY 1, 2),
         |m AS (SELECT u, v AS gold FROM (
         |        SELECT u, v, row_number() OVER (PARTITION BY u
         |          ORDER BY c DESC, v ASC) AS rn FROM uv)
         |      WHERE rn = 1),
         |a AS (SELECT rater, count(*)::BIGINT AS n_rated,
         |        SUM(CASE WHEN r.v = m.gold THEN 1 ELSE 0 END)::BIGINT
         |          AS n_agree
         |      FROM r JOIN m USING (u) GROUP BY 1)
         |SELECT rater, n_rated, n_agree,
         |  CAST((n_agree * 1000000) // n_rated AS BIGINT) AS agree_x1e6
         |FROM a ORDER BY rater""".stripMargin,

    // pooled-marginal clearing by N²n²(n−1) with the panel n = 2 as a
    // literal; units off the fixed panel drop (none here — both raters
    // cover every doc)
    "q_fleiss_kappa" ->
      s"""WITH g AS ($langGuessSql),
         |r AS (SELECT doc_id AS u, lang AS v FROM g
         |      UNION ALL SELECT doc_id, guess FROM g),
         |uv AS MATERIALIZED (
         |  SELECT u, v, COUNT(*) AS c FROM r GROUP BY u, v),
         |per AS MATERIALIZED (
         |  SELECT u, SUM(c) AS m, SUM(c * c) AS sq FROM uv GROUP BY u
         |  HAVING SUM(c) = 2),
         |t AS (SELECT COUNT(*) AS nu, COALESCE(SUM(sq), 0) AS a FROM per),
         |nc AS (SELECT v, SUM(c) AS cnt
         |       FROM uv JOIN per USING (u) GROUP BY v),
         |de AS (SELECT COALESCE(SUM(CAST(cnt AS HUGEINT) * cnt), 0)
         |         AS sq2 FROM nc),
         |f AS (SELECT nu, a,
         |        ((CAST(a AS HUGEINT) - CAST(nu AS HUGEINT) * 2)
         |           * nu * 2 - (SELECT sq2 FROM de)) * 1000000 AS num,
         |        CAST(nu AS HUGEINT) * nu * 4
         |          - (SELECT sq2 FROM de) AS den
         |      FROM t)
         |SELECT CAST(nu AS BIGINT) AS n_units,
         |  CAST(nu * 2 AS BIGINT) AS n_ratings,
         |  CASE WHEN den <> 0 THEN
         |    CAST(CASE WHEN num % den <> 0
         |        AND ((num < 0) <> (den < 0))
         |      THEN num // den - 1 ELSE num // den END AS BIGINT)
         |  END AS kappa_x1e6
         |FROM f""".stripMargin,

    "q_kappa" ->
      s"""WITH g AS ($langGuessSql),
         |cm AS (SELECT lang AS a, guess AS b, COUNT(*) AS c
         |       FROM g GROUP BY 1, 2),
         |t AS (SELECT SUM(c) AS n,
         |        SUM(CASE WHEN a = b THEN c ELSE 0 END) AS agree
         |      FROM cm),
         |ma AS (SELECT a AS cat, SUM(c) AS ca FROM cm GROUP BY 1),
         |mb AS (SELECT b AS cat, SUM(c) AS cb FROM cm GROUP BY 1),
         |pe AS (SELECT COALESCE(SUM(CAST(ca AS HUGEINT) * cb), 0) AS p
         |       FROM ma JOIN mb USING (cat)),
         |f AS (SELECT CAST(n AS HUGEINT) AS n, agree,
         |        (CAST(n AS HUGEINT) * agree - p) * 1000000 AS num,
         |        CAST(n AS HUGEINT) * n - p AS den
         |      FROM t CROSS JOIN pe)
         |SELECT CAST(n AS BIGINT) AS n_items, CAST(agree AS BIGINT) AS agree,
         |  CASE WHEN den <> 0 THEN
         |    CAST(CASE WHEN num % den <> 0 AND num < 0
         |      THEN num // den - 1 ELSE num // den END AS BIGINT)
         |  END AS kappa_x1e6
         |FROM f""".stripMargin,

    // the shared fixed-point PageRank replay over text-derived edges:
    // parallel unnest of the shifted filtered-token slices, both
    // directions, self-loops dropped
    "q_textrank" -> RelQueries.pageRankOracle(3,
      s"""WITH sel AS (
         |  SELECT f FROM (
         |    SELECT list_filter(string_split($duckNorm, ' '),
         |      t -> len(t) >= 4) AS f
         |    FROM documents)
         |  WHERE len(f) >= 2),
         |pr AS (SELECT unnest(f[1:len(f)-1]) AS a,
         |         unnest(f[2:len(f)]) AS b
         |       FROM sel)
         |SELECT DISTINCT src, dst FROM (
         |  SELECT a AS src, b AS dst FROM pr WHERE a <> b
         |  UNION ALL SELECT b, a FROM pr WHERE a <> b)""".stripMargin,
      topK = Some(50)),

    "q_exact_dedup" ->
      s"""SELECT doc_id, fp FROM (
         |  SELECT doc_id, md5($duckNorm) AS fp,
         |    row_number() OVER (PARTITION BY md5($duckNorm)
         |      ORDER BY doc_id) AS rn
         |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // shared shingle CTE; reference = distinct even-doc shingles;
    // membership counted per odd doc; exact integer novelty
    "q_ngram_novelty" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3
         |      THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')) END) AS s
         |  FROM (SELECT doc_id, string_split($duckNorm, ' ') AS toks
         |        FROM documents)),
         |d AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 2 = 1),
         |r AS (SELECT DISTINCT g FROM (
         |        SELECT unnest(s) AS g FROM sh WHERE doc_id % 2 = 0)),
         |t AS (SELECT doc_id, count(*) AS n_grams,
         |        CAST(SUM(CASE WHEN g IN (SELECT g FROM r)
         |            THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
         |      FROM d GROUP BY 1)
         |SELECT doc_id, n_grams, n_seen,
         |  ((n_grams - n_seen) * 1000000) // n_grams AS novelty_x1e6
         |FROM t ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3
         |      THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')) END) AS s
         |  FROM (SELECT doc_id, string_split($duckNorm, ' ') AS toks
         |        FROM documents)),
         |inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common,
         |  count(*)::DOUBLE
         |    / (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE AS jaccard
         |FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |HAVING count(*)::DOUBLE
         |    / (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "q_contamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3
         |      THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')) END) AS s
         |  FROM (SELECT doc_id, string_split($duckNorm, ' ') AS toks
         |        FROM documents)),
         |b AS (SELECT doc_id, s, len(s) AS n_b FROM sh WHERE doc_id < 100)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.s, b.s))::BIGINT AS n_common,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE / b.n_b::DOUBLE, 6)
         |    AS containment
         |FROM sh a JOIN b ON a.doc_id <> b.doc_id
         |WHERE len(list_intersect(a.s, b.s))::DOUBLE / b.n_b::DOUBLE >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // mirrors Sampling.stratified's two-pass construction exactly:
    // shard by md5 hex chars 9-10, rank within (lang, shard), prefix-sum
    // shard counts in shard order, keep global rank <= floor(f*(n-1))+1
    // centroid drift: cos(mean_a, mean_b) == cos(sum_a, sum_b) (scale
    // invariance), per-dim sums in exact integer micro-units, HUGEINT
    // products (engine: decimal(38,0) — same integers), doubles only at
    // the final division/sqrt/round
    "q_embed_drift" ->
      """WITH x AS (
        |  SELECT vec_id, label,
        |    CAST(CAST(unnest(embedding::DOUBLE[]) AS DECIMAL(15,6))
        |         * 1000000 AS BIGINT) AS v,
        |    unnest(range(len(embedding))) AS pos
        |  FROM embeddings),
        |s AS (SELECT label, pos,
        |        SUM(CASE WHEN vec_id % 2 = 0 THEN v END) AS sa,
        |        SUM(CASE WHEN vec_id % 2 = 1 THEN v END) AS sb,
        |        COUNT(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS na,
        |        COUNT(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS nb
        |      FROM x GROUP BY 1, 2),
        |g AS (SELECT label,
        |        SUM(CAST(sa AS HUGEINT) * sb) AS dot,
        |        SUM(CAST(sa AS HUGEINT) * sa) AS aa,
        |        SUM(CAST(sb AS HUGEINT) * sb) AS bb,
        |        MAX(na) AS n_a, MAX(nb) AS n_b
        |      FROM s GROUP BY 1)
        |SELECT label, n_a, n_b,
        |  CASE WHEN aa > 0 AND bb > 0 THEN
        |    round(CAST(dot AS DOUBLE)
        |          / sqrt(CAST(aa AS DOUBLE) * CAST(bb AS DOUBLE)), 6)
        |  END AS cos_shift
        |FROM g ORDER BY label""".stripMargin,

    // per-cell MI terms from rational probabilities (the PSI pattern)
    "q_mutual_info" ->
      """WITH c AS (
        |  SELECT source, lang, count(*) AS n_xy FROM documents
        |  GROUP BY 1, 2),
        |xm AS (SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_x
        |       FROM c GROUP BY 1),
        |ym AS (SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_y
        |       FROM c GROUP BY 1),
        |t AS (SELECT sum(n_xy) AS n FROM c)
        |SELECT c.source, c.lang, n_xy, n_x, n_y,
        |  round((CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln((CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
        |          / ((CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE))
        |             * (CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
        |    AS mi_term
        |FROM c JOIN xm USING (source) JOIN ym USING (lang) CROSS JOIN t
        |ORDER BY c.source, c.lang""".stripMargin,

    // PSI drift: Laplace-smoothed rates (n+1)/(N+K) as exact integer
    // micro-units; the ln enters only at the rounded last step
    "q_drift_psi" ->
      """WITH u AS (
        |  SELECT lang, doc_id % 2 AS side FROM documents),
        |c AS (SELECT lang AS category,
        |        CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_b
        |      FROM u GROUP BY 1),
        |s AS (SELECT sum(n_a) AS na, sum(n_b) AS nb, count(*) AS k FROM c),
        |r AS (SELECT category, n_a, n_b,
        |        CAST(((n_a + 1) * 1000000) // (na + k) AS BIGINT)
        |          AS rate_a_x1e6,
        |        CAST(((n_b + 1) * 1000000) // (nb + k) AS BIGINT)
        |          AS rate_b_x1e6,
        |        CAST(n_a + 1 AS DOUBLE) / CAST(na + k AS DOUBLE) AS ra,
        |        CAST(n_b + 1 AS DOUBLE) / CAST(nb + k AS DOUBLE) AS rb
        |      FROM c CROSS JOIN s)
        |SELECT category, n_a, n_b, rate_a_x1e6, rate_b_x1e6,
        |  round((ra - rb) * ln(ra / rb), 6) AS psi_term
        |FROM r ORDER BY category""".stripMargin,

    // temperature resampling: per-lang integer weight w = ⌊√n·10⁶⌋ (√ is
    // IEEE-correctly-rounded ⇒ bit-exact), target = (budget·w) div Σw in
    // exact HUGEINT arithmetic (the Spark side uses decimal(38,0) — same
    // exact integers), membership by the stratified md5 shard-major rank
    "q_temperature_mix" ->
      """WITH r AS (
        |  SELECT doc_id, lang, md5(doc_id::VARCHAR) AS h,
        |         substring(md5(doc_id::VARCHAR), 9, 2) AS shard
        |  FROM documents),
        |rn AS (SELECT doc_id, lang, shard, row_number() OVER (
        |         PARTITION BY lang, shard ORDER BY h, doc_id) AS rn
        |       FROM r),
        |c AS (SELECT lang, shard, count(*) AS c FROM r GROUP BY 1, 2),
        |o AS (SELECT lang, shard,
        |        coalesce(sum(c) OVER (PARTITION BY lang ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |      FROM c),
        |s AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n,
        |        CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS w FROM s),
        |tot AS (SELECT SUM(w) AS tw FROM w),
        |tgt AS (SELECT lang,
        |          least((CAST(300 AS HUGEINT) * w) // tw,
        |                CAST(n AS HUGEINT)) AS tgt
        |        FROM w CROSS JOIN tot)
        |SELECT rn.doc_id, rn.lang FROM rn
        |JOIN o ON rn.lang = o.lang AND rn.shard = o.shard
        |JOIN tgt ON rn.lang = tgt.lang
        |WHERE rn.rn + o.off <= tgt.tgt
        |ORDER BY rn.doc_id""".stripMargin,

    "q_stratified_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang, md5(doc_id::VARCHAR) AS h,
        |         substring(md5(doc_id::VARCHAR), 9, 2) AS shard
        |  FROM documents),
        |rn AS (SELECT doc_id, lang, shard, row_number() OVER (
        |         PARTITION BY lang, shard ORDER BY h, doc_id) AS rn
        |       FROM r),
        |c AS (SELECT lang, shard, count(*) AS c FROM r GROUP BY 1, 2),
        |o AS (SELECT lang, shard,
        |        coalesce(sum(c) OVER (PARTITION BY lang ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
        |        sum(c) OVER (PARTITION BY lang) AS n
        |      FROM c)
        |SELECT rn.doc_id, rn.lang FROM rn JOIN o
        |  ON rn.lang IS NOT DISTINCT FROM o.lang AND rn.shard = o.shard
        |WHERE rn.rn + o.off <= floor(0.3 * (n - 1)) + 1
        |ORDER BY rn.doc_id""".stripMargin,

    // A-ES weighted sampling: skey = ln(u)/w with u the 48-bit seeded-md5
    // uniform (+0.5 keeps it in (0,1)); top-20 per language by skey DESC.
    "q_weighted_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang, n_chars,
        |    ln((('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)),
        |          1, 12))::BIGINT::DOUBLE + 0.5) / 281474976710656.0)
        |      / n_chars::DOUBLE AS skey
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars::DOUBLE > 0)
        |SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars, row_number() OVER (
        |    PARTITION BY lang ORDER BY skey DESC, doc_id) AS rn
        |  FROM r) WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,

    // Blocked editdist: candidates share the 8-char normalized prefix and
    // sit within one length bucket (|Δ(len÷16)| ≤ 1 — no recall loss vs
    // prefix-only blocking since dist ≤ 8 bounds Δlen by 8 < 16).
    "q_editdist_neardup" ->
      s"""WITH n AS (SELECT doc_id, $duckNorm AS t FROM documents)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  levenshtein(a.t, b.t) AS dist
         |FROM n a JOIN n b
         |  ON substr(a.t, 1, 8) = substr(b.t, 1, 8)
         | AND abs(length(a.t) // 16 - length(b.t) // 16) <= 1
         | AND a.doc_id < b.doc_id
         |WHERE levenshtein(a.t, b.t) <= 8
         |ORDER BY id_a, id_b""".stripMargin,

    // SNM: rank by (normalized text, id) — a total order, so ranks (and
    // the window-successor pairs) are engine-independent.
    // DuckDB's native jaro_winkler_similarity is the independent
    // referee for the codegen kernel; both sides round at 4 BEFORE the
    // threshold so the gate sits on a shared grid, not a raw double
    // boundary
    "q_jaro_names" ->
      s"""WITH n AS (SELECT p_partkey,
         |  ${duckNorm.replace("text", "p_name")} AS t FROM part),
         |r AS (SELECT p_partkey, t,
         |        row_number() OVER (ORDER BY t, p_partkey) AS rk FROM n)
         |SELECT least(a.p_partkey, b.p_partkey) AS id_lo,
         |  greatest(a.p_partkey, b.p_partkey) AS id_hi,
         |  round(jaro_winkler_similarity(a.t, b.t), 4) AS sim
         |FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 4
         |WHERE round(jaro_winkler_similarity(a.t, b.t), 4) >= 0.88
         |ORDER BY id_lo, id_hi""".stripMargin,

    // the q_jaro_names pair graph closed by the recursive min-label
    // reachability (the q_neardup_groups closure shape)
    "q_entity_groups" ->
      s"""WITH RECURSIVE n AS (SELECT p_partkey,
         |  ${duckNorm.replace("text", "p_name")} AS t FROM part),
         |r AS (SELECT p_partkey, t,
         |        row_number() OVER (ORDER BY t, p_partkey) AS rk FROM n),
         |pairs AS (
         |  SELECT least(a.p_partkey, b.p_partkey) AS id_lo,
         |    greatest(a.p_partkey, b.p_partkey) AS id_hi
         |  FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 4
         |  WHERE round(jaro_winkler_similarity(a.t, b.t), 4) >= 0.88),
         |edges AS (SELECT id_lo AS a, id_hi AS b FROM pairs
         |          UNION SELECT id_hi, id_lo FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS label FROM edges
         |  UNION
         |  SELECT e.b AS node, r2.label FROM reach r2
         |  JOIN edges e ON e.a = r2.node),
         |comp AS (SELECT node, min(label) AS component
         |         FROM reach GROUP BY node)
         |SELECT p.p_partkey,
         |  coalesce(c.component, p.p_partkey) AS entity_id
         |FROM part p LEFT JOIN comp c ON p.p_partkey = c.node
         |ORDER BY p_partkey""".stripMargin,

    "q_snm_neardup" ->
      s"""WITH n AS (SELECT doc_id, $duckNorm AS t FROM documents),
         |r AS (SELECT doc_id, t,
         |        row_number() OVER (ORDER BY t, doc_id) AS rk FROM n)
         |SELECT least(a.doc_id, b.doc_id) AS id_lo,
         |  greatest(a.doc_id, b.doc_id) AS id_hi,
         |  levenshtein(a.t, b.t) AS dist
         |FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 4
         |WHERE levenshtein(a.t, b.t) <= 8
         |ORDER BY id_lo, id_hi""".stripMargin,

    // interleave: fractional position (rk-0.5)/n per source, global
    // row_number over (frac, source, rk) — a total order of pure
    // integer-derived doubles, engine-exact
    "q_interleave" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source, row_number() OVER (
        |    ORDER BY (rk::DOUBLE - 0.5) / n::DOUBLE, source, rk) AS pos
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      s"""SELECT doc_id,
         |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
         |    'https?://[^\\s]+', '<URL>', 'g'),
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'))
         |    AS redacted_md5,
         |  len(regexp_extract_all(aug, 'https?://[^\\s]+')) AS n_urls,
         |  len(regexp_extract_all(regexp_replace(aug, 'https?://[^\\s]+', ' ', 'g'),
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
         |  len(regexp_extract_all(aug,
         |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ips
         |FROM (SELECT doc_id,
         |  text || ' contact a' || CAST(doc_id AS VARCHAR)
         |       || '@ex.com via http://x.io/a?b=1 from 10.0.0.1' AS aug
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      s"""SELECT doc_id,
         |  round(1.0 - len(list_distinct(
         |      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |        ELSE list_transform(range(1, len(toks) - 1),
         |          i -> array_to_string(toks[i:i+2], ' ')) END))::DOUBLE
         |    / greatest(len(toks) - 2, 1)::DOUBLE, 6) AS rep_score
         |FROM (SELECT doc_id, string_split($duckNorm, ' ') AS toks
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    // winnowing: grams[i] = md5 of the 5-char window at 1-based offset i
    // of the normalized text; fingerprint = sorted distinct mins of each
    // 4-gram window. DuckDB list slices are 1-based inclusive, matching
    // Spark's slice(arr, start, length) one-for-one.
    "q_winnow_fp" ->
      s"""WITH n AS (SELECT doc_id, $duckNorm AS norm FROM documents),
         |g AS (SELECT doc_id,
         |        list_transform(range(1, greatest(length(norm) - 4, 1) + 1),
         |          i -> md5(substring(norm, i::INT, 5))) AS grams
         |      FROM n),
         |w AS (SELECT doc_id,
         |        list_sort(list_distinct(list_transform(
         |          range(0, greatest(len(grams) - 4, 0) + 1),
         |          i -> list_min(grams[(i+1)::INT:(i+4)::INT])))) AS fps
         |      FROM g)
         |SELECT doc_id, unnest(fps) AS fp FROM w
         |ORDER BY doc_id, fp""".stripMargin,

    "q_minhash_neardup" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3
         |      THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')) END) AS s
         |  FROM (SELECT doc_id, string_split($duckNorm, ' ') AS toks
         |        FROM documents)),
         |inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  count(*)::DOUBLE
         |    / (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE AS jaccard
         |FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |HAVING count(*)::DOUBLE
         |    / (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // the stratified machinery with a per-source CASE fraction
    "q_source_mix" ->
      """WITH r AS (
        |  SELECT doc_id, source, md5(doc_id::VARCHAR) AS h,
        |         substring(md5(doc_id::VARCHAR), 9, 2) AS shard
        |  FROM documents),
        |rn AS (SELECT doc_id, source, shard, row_number() OVER (
        |         PARTITION BY source, shard ORDER BY h, doc_id) AS rn
        |       FROM r),
        |c AS (SELECT source, shard, count(*) AS c FROM r GROUP BY 1, 2),
        |o AS (SELECT source, shard,
        |        coalesce(sum(c) OVER (PARTITION BY source ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
        |        sum(c) OVER (PARTITION BY source) AS n
        |      FROM c)
        |SELECT rn.doc_id, rn.source FROM rn JOIN o
        |  ON rn.source IS NOT DISTINCT FROM o.source AND rn.shard = o.shard
        |WHERE rn.rn + o.off <= floor(
        |    (CASE rn.source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |      WHEN 'src2' THEN 0.1 ELSE 0.2 END) * (n - 1)) + 1
        |ORDER BY rn.doc_id""".stripMargin,

    // batch (odd ids) minus rows whose normalized-text fingerprint exists
    // in the history (even ids) — the Bloom stage is a prefilter only, so
    // plain NOT IN is the exact semantics
    "q_incr_dedup" ->
      s"""WITH h AS (SELECT md5($duckNorm) AS fp FROM documents
         |           WHERE doc_id % 2 = 0)
         |SELECT doc_id, md5($duckNorm) AS fp FROM documents
         |WHERE doc_id % 2 = 1
         |  AND md5($duckNorm) NOT IN (SELECT fp FROM h)
         |ORDER BY doc_id""".stripMargin,

    // ExactSubstr: flag every non-first occurrence of each 8-token gram
    // (first = min (doc_id, pos)), expand flags to covered token
    // positions, rebuild each text from the uncovered tokens in order.
    "q_substr_dedup" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |g AS (
        |  SELECT doc_id, i AS pos, md5(array_to_string(toks[i:i+7], ' ')) AS g
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 8 + 2)) AS i
        |        FROM t WHERE len(toks) >= 8)),
        |f AS (SELECT doc_id, pos FROM (
        |        SELECT doc_id, pos, row_number() OVER (
        |          PARTITION BY g ORDER BY doc_id, pos) AS rn FROM g)
        |      WHERE rn > 1),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS tp FROM f),
        |tok AS (SELECT doc_id, u.tp, u.tok FROM (
        |          SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
        |            i -> struct_pack(tp := i, tok := toks[i::INT]))) AS u
        |          FROM t)),
        |kept AS (SELECT tok.doc_id, tok.tp, tok.tok
        |         FROM tok LEFT JOIN cov
        |           ON tok.doc_id = cov.doc_id AND tok.tp = cov.tp
        |         WHERE cov.tp IS NULL),
        |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS dedup_text,
        |               count(*) AS n_kept
        |        FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(reb.dedup_text, '') AS dedup_text,
        |  len(t.toks)::BIGINT AS n_tokens,
        |  (len(t.toks) - coalesce(reb.n_kept, 0))::BIGINT AS n_dropped
        |FROM t LEFT JOIN reb ON t.doc_id = reb.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // Line-level (fixed 8-token span) dedup: partition each doc into
    // spans, keep-first globally by (doc_id, pos), reassemble.
    "q_line_dedup" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |seg AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' ') AS seg
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(1, cast(ceil(len(toks)/8.0) AS BIGINT) + 1)) AS i
        |        FROM t)),
        |k AS (SELECT doc_id, pos, seg FROM (
        |        SELECT doc_id, pos, seg, row_number() OVER (
        |          PARTITION BY md5(seg) ORDER BY doc_id, pos) AS rn FROM seg)
        |      WHERE rn = 1),
        |reb AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS dedup_text,
        |               count(*) AS n_kept FROM k GROUP BY doc_id),
        |n AS (SELECT doc_id, cast(ceil(len(toks)/8.0) AS BIGINT) AS n_segments
        |      FROM t)
        |SELECT n.doc_id, coalesce(reb.dedup_text, '') AS dedup_text,
        |  n.n_segments,
        |  (n.n_segments - coalesce(reb.n_kept, 0))::BIGINT AS n_dropped
        |FROM n LEFT JOIN reb ON n.doc_id = reb.doc_id
        |ORDER BY n.doc_id""".stripMargin,

    // Boilerplate removal: 4-token spans with doc-frequency >= 4 removed
    // from every document.
    "q_boilerplate" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |seg AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(toks[(i-1)*4+1:(i-1)*4+4], ' ') AS seg
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(1, cast(ceil(len(toks)/4.0) AS BIGINT) + 1)) AS i
        |        FROM t)),
        |b AS (SELECT md5(seg) AS h FROM seg
        |      GROUP BY md5(seg) HAVING count(DISTINCT doc_id) >= 4),
        |k AS (SELECT doc_id, pos, seg FROM seg
        |      WHERE md5(seg) NOT IN (SELECT h FROM b)),
        |reb AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
        |               count(*) AS n_kept FROM k GROUP BY doc_id),
        |n AS (SELECT doc_id, cast(ceil(len(toks)/4.0) AS BIGINT) AS n_segments
        |      FROM t)
        |SELECT n.doc_id, coalesce(reb.clean_text, '') AS clean_text,
        |  n.n_segments,
        |  (n.n_segments - coalesce(reb.n_kept, 0))::BIGINT AS n_dropped
        |FROM n LEFT JOIN reb ON n.doc_id = reb.doc_id
        |ORDER BY n.doc_id""".stripMargin,

    // Near-dup components: recursive min-label closure over the exact
    // Jaccard >= 0.5 pair graph (symmetrized), keeping every document
    // with its component's minimum id (singletons map to themselves).
    "q_neardup_groups" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3
         |      THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')) END) AS s
         |  FROM (SELECT doc_id, string_split($duckNorm, ' ') AS toks
         |        FROM documents)),
         |inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |  HAVING count(*)::DOUBLE
         |    / (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.5),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS label FROM edges
         |  UNION
         |  SELECT e.b AS node, r.label FROM reach r JOIN edges e ON e.a = r.node),
         |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
         |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
         |ORDER BY doc_id""".stripMargin,

    // The composed curation pipeline, stage by stage: quality gate on the
    // RAW text -> PII scrub -> repetition gate on the SCRUBBED text ->
    // exact dedup on md5(normalized scrubbed) keeping the min doc_id ->
    // exact trigram-Jaccard >= 0.8 near-dup pair graph (== the Spark
    // side's MinHash-LSH stage, which is candidate-exact on this corpus)
    // resolved into connected components via a recursive min-label
    // closure, keeping each component's minimum doc id.
    "q_stream_curation" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, text,
         |    (CASE WHEN n_chars_d >= 50 AND n_chars_d <= 10000 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN sw_hits / n_toks_d >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN punct_chars / n_chars_d <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
         |    + (CASE WHEN tok_chars / n_toks_d >= 2.0 AND tok_chars / n_toks_d <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
         |    AS quality
         |  FROM (
         |    SELECT doc_id, lang, text,
         |      length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE AS punct_chars,
         |      length(text)::DOUBLE AS n_chars_d,
         |      len(list_filter($duckToksLower, t -> list_contains($stopList, t)))::DOUBLE AS sw_hits,
         |      len($duckToks)::DOUBLE AS n_toks_d,
         |      list_sum(list_transform($duckToks, t -> length(t)))::DOUBLE AS tok_chars
         |    FROM documents))
         |SELECT doc_id, lang, round(quality, 6) AS quality,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    'https?://[^\\s]+', '<URL>', 'g'),
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'))
         |    AS redacted_md5
         |FROM scored WHERE quality >= 0.5
         |ORDER BY doc_id""".stripMargin,

    "q_curation" ->
      s"""WITH RECURSIVE scored AS (
         |  SELECT doc_id, lang, text,
         |    (CASE WHEN n_chars_d >= 50 AND n_chars_d <= 10000 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN sw_hits / n_toks_d >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN punct_chars / n_chars_d <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
         |    + (CASE WHEN tok_chars / n_toks_d >= 2.0 AND tok_chars / n_toks_d <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
         |    AS quality
         |  FROM (
         |    SELECT doc_id, lang, text,
         |      length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE AS punct_chars,
         |      length(text)::DOUBLE AS n_chars_d,
         |      len(list_filter($duckToksLower, t -> list_contains($stopList, t)))::DOUBLE AS sw_hits,
         |      len($duckToks)::DOUBLE AS n_toks_d,
         |      list_sum(list_transform($duckToks, t -> length(t)))::DOUBLE AS tok_chars
         |    FROM documents)),
         |gated AS (
         |  SELECT doc_id, lang, quality,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      'https?://[^\\s]+', '<URL>', 'g'),
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |      '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g') AS text
         |  FROM scored WHERE quality >= 0.5),
         |normed AS (
         |  SELECT doc_id, lang, quality,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
         |  FROM gated),
         |shingled AS (
         |  SELECT doc_id, lang, quality, norm, toks,
         |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')) END) AS s
         |  FROM (SELECT *, string_split(norm, ' ') AS toks FROM normed)),
         |kept AS (
         |  SELECT * FROM shingled
         |  WHERE 1.0 - len(s)::DOUBLE / greatest(len(toks) - 2, 1)::DOUBLE <= 0.5),
         |exact AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (
         |      PARTITION BY md5(norm) ORDER BY doc_id) AS rn FROM kept)
         |  WHERE rn = 1),
         |inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM exact),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |  HAVING count(*)::DOUBLE
         |    / (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.8),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS label FROM edges
         |  UNION
         |  SELECT e.b AS node, r.label FROM reach r JOIN edges e ON e.a = r.node),
         |losers AS (
         |  SELECT node AS id_b FROM reach GROUP BY node
         |  HAVING min(label) <> node)
         |SELECT doc_id, lang, round(quality, 6) AS quality FROM exact
         |WHERE doc_id NOT IN (SELECT id_b FROM losers)
         |ORDER BY doc_id""".stripMargin,

    // the prefix CTEs of the q_curation oracle (quality → gate → scrub →
    // normalize → shingle → repetition), exposing the persisted prefix
    // columns: fp = md5(normalized scrubbed text), n_shingles = distinct
    // trigram count (== size of the engine's hashed shingle set)
    "q_stream_gold_prefix" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, text,
         |    (CASE WHEN n_chars_d >= 50 AND n_chars_d <= 10000 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN sw_hits / n_toks_d >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN punct_chars / n_chars_d <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
         |    + (CASE WHEN tok_chars / n_toks_d >= 2.0 AND tok_chars / n_toks_d <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
         |    AS quality
         |  FROM (
         |    SELECT doc_id, lang, text,
         |      length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE AS punct_chars,
         |      length(text)::DOUBLE AS n_chars_d,
         |      len(list_filter($duckToksLower, t -> list_contains($stopList, t)))::DOUBLE AS sw_hits,
         |      len($duckToks)::DOUBLE AS n_toks_d,
         |      list_sum(list_transform($duckToks, t -> length(t)))::DOUBLE AS tok_chars
         |    FROM documents)),
         |gated AS (
         |  SELECT doc_id, lang, quality,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      'https?://[^\\s]+', '<URL>', 'g'),
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |      '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g') AS text
         |  FROM scored WHERE quality >= 0.5),
         |normed AS (
         |  SELECT doc_id, lang, quality,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
         |  FROM gated),
         |shingled AS (
         |  SELECT doc_id, lang, quality, norm, toks,
         |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')) END) AS s
         |  FROM (SELECT *, string_split(norm, ' ') AS toks FROM normed))
         |SELECT doc_id, lang, round(quality, 6) AS quality,
         |  md5(norm) AS fp, CAST(len(s) AS BIGINT) AS n_shingles
         |FROM shingled
         |WHERE 1.0 - len(s)::DOUBLE / greatest(len(toks) - 2, 1)::DOUBLE <= 0.5
         |ORDER BY doc_id""".stripMargin,

    "q_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |chunked AS (
        |  SELECT doc_id,
        |    list_transform(range(0,
        |        1 + greatest(0, CAST(ceil((len(t) - 32)::DOUBLE / 24) AS INT))),
        |      i -> struct_pack(idx := i,
        |        chunk := array_to_string(t[i*24+1 : i*24+32], ' '))) AS cs
        |  FROM toks)
        |SELECT doc_id, CAST(u.idx AS INTEGER) AS chunk_idx,
        |  u.chunk AS chunk_text,
        |  CAST(len(regexp_split_to_array(u.chunk, '\s+')) AS BIGINT)
        |    AS n_chunk_tokens
        |FROM (SELECT doc_id, unnest(cs) AS u FROM chunked)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 32)
        |      AS shard
        |  FROM documents),
        |loc AS (
        |  SELECT doc_id, lang, n_tokens, shard,
        |    COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY shard
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS cum_local
        |  FROM t),
        |tot AS (SELECT shard, SUM(n_tokens) AS shard_total FROM t GROUP BY shard),
        |off AS (
        |  SELECT shard,
        |    COALESCE(CAST(SUM(shard_total) OVER (ORDER BY shard
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS shard_off
        |  FROM tot)
        |SELECT doc_id, lang, n_tokens, shard,
        |  (shard_off + cum_local) // 2048 AS window_id,
        |  (shard_off + cum_local) % 2048 AS offset_in_window
        |FROM loc JOIN off USING (shard) ORDER BY doc_id""".stripMargin,

    "q_stable_split" ->
      """SELECT doc_id,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 90
        |    THEN 'train' ELSE 'eval' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_cosine_topk" -> cosineTopkSql,

    "q_kmeans" -> kmeansOracle(4, 2),

    "q_silhouette" -> silhouetteOracle(4, 2),

    "q_cluster_sample" -> exemplarsOracle(4, 2, 5),

    // the greedy selection replayed through a recursive CTE carrying
    // the selected set; cosines are the same double chain as
    // cosineTopkSql, floored to micros, then the scoring/argmax is
    // pure BIGINT — ties by smallest vec_id on both sides
    "q_mmr_rerank" ->
      """WITH RECURSIVE ev AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM ev
        |      WHERE vec_id < 5),
        |sc AS (SELECT probe_id, vec_id,
        |    list_dot_product(pv, v) / (sqrt(list_dot_product(pv, pv))
        |      * sqrt(list_dot_product(v, v))) AS c
        |  FROM ev CROSS JOIN p WHERE vec_id != probe_id),
        |pool AS (SELECT probe_id, vec_id,
        |    CAST(floor(c * 1000000.0) AS BIGINT) AS rel
        |  FROM (SELECT probe_id, vec_id, c,
        |          row_number() OVER (PARTITION BY probe_id
        |            ORDER BY c DESC, vec_id ASC) AS rn
        |        FROM sc) WHERE rn <= 8),
        |pv AS (SELECT pool.probe_id, pool.vec_id, pool.rel, ev.v
        |       FROM pool JOIN ev USING (vec_id)),
        |sims AS (SELECT x.probe_id, x.vec_id AS va, y.vec_id AS vb,
        |    CAST(floor(list_dot_product(x.v, y.v)
        |      / (sqrt(list_dot_product(x.v, x.v))
        |        * sqrt(list_dot_product(y.v, y.v)))
        |      * 1000000.0) AS BIGINT) AS s
        |  FROM pv x JOIN pv y ON x.probe_id = y.probe_id
        |    AND x.vec_id <> y.vec_id),
        |sel(probe_id, step, vec_id, rel, score, sel_list) AS (
        |  SELECT probe_id, 1, vec_id, rel, 700000 * rel, [vec_id]
        |  FROM (SELECT probe_id, vec_id, rel,
        |          row_number() OVER (PARTITION BY probe_id
        |            ORDER BY rel DESC, vec_id ASC) AS rn FROM pool)
        |  WHERE rn = 1
        |  UNION ALL
        |  SELECT probe_id, step, vec_id, rel, score,
        |    list_append(sel_list, vec_id)
        |  FROM (
        |    SELECT s.probe_id, s.step + 1 AS step, c.vec_id, c.rel,
        |      700000 * c.rel - 300000 * max(m.s) AS score,
        |      s.sel_list,
        |      row_number() OVER (PARTITION BY s.probe_id
        |        ORDER BY 700000 * c.rel - 300000 * max(m.s) DESC,
        |          c.vec_id ASC) AS rn
        |    FROM sel s
        |    JOIN pool c ON c.probe_id = s.probe_id
        |      AND NOT list_contains(s.sel_list, c.vec_id)
        |    JOIN sims m ON m.probe_id = s.probe_id
        |      AND m.va = c.vec_id AND list_contains(s.sel_list, m.vb)
        |    WHERE s.step < 5
        |    GROUP BY s.probe_id, s.step, c.vec_id, c.rel, s.sel_list)
        |  WHERE rn = 1)
        |SELECT probe_id, CAST(step AS INTEGER) AS mmr_rank, vec_id,
        |  rel AS rel_x1e6, score AS score_x1e12
        |FROM sel ORDER BY probe_id, mmr_rank""".stripMargin,

    // Unit-L2 normalization; zipped unnests align value and 0-based pos.
    "q_l2_normalize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nm FROM e),
        |x AS (SELECT vec_id, nm, unnest(v) AS xv,
        |         unnest(range(len(v))) AS pos FROM n)
        |SELECT vec_id, CAST(pos AS INTEGER) AS pos,
        |  round(CASE WHEN nm = 0 THEN 0.0 ELSE xv / nm END, 6) AS u
        |FROM x ORDER BY vec_id, pos""".stripMargin,

    // IVF at nprobe=nlist probes every cell: candidates = whole corpus,
    // exact rescoring + identical tie-break ⇒ exactly the brute-force
    // cosine top-k (the q_ivf_sq8 promotion trick, applied to the float
    // form).
    "q_ivf_topk" -> cosineTopkSql,

    // nprobe=nlist through the PERSISTED index IO path: every cell
    // directory read, result provably brute-force ⇒ same oracle
    "q_ivf_indexed" -> cosineTopkSql,

    // LSH at probesPerTable=2^planes probes every bucket: candidates =
    // whole corpus ⇒ same equivalence, same oracle.
    "q_lsh_topk" -> cosineTopkSql,

    // every bucket directory through the persisted LSH index IO path
    "q_lsh_indexed" -> cosineTopkSql,

    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
        |sc AS (SELECT probe_id, vec_id,
        |    list_dot_product(pv, v)
        |      / (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(v, v))) AS c
        |  FROM e CROSS JOIN p WHERE vec_id != probe_id),
        |r AS (SELECT probe_id, vec_id, c,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY c DESC, vec_id ASC) AS rank
        |  FROM sc WHERE c >= 0.15 AND c < 0.45)
        |SELECT probe_id, rank, vec_id, round(c, 6) AS cos
        |FROM r WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    "q_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    // anti-join against the probe-cosine hit set (same list_dot_product
    // cosine as q_embed_neardup)
    "q_embed_decontaminate" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |c AS (SELECT * FROM e WHERE vec_id >= 5),
        |p AS (SELECT * FROM e WHERE vec_id < 5),
        |hit AS (SELECT DISTINCT c.vec_id FROM c JOIN p ON
        |          list_dot_product(c.v, p.v)
        |            / (sqrt(list_dot_product(c.v, c.v))
        |               * sqrt(list_dot_product(p.v, p.v))) >= 0.3)
        |SELECT vec_id FROM c
        |WHERE vec_id NOT IN (SELECT vec_id FROM hit)
        |ORDER BY vec_id""".stripMargin,

    // the tokenBudget machinery: inclusive running token sums within
    // (source, md5-shard), exclusive shard offsets in shard order, keep
    // while the shard-offset cumulative count clears the source's budget
    "q_token_budget" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_tokens,
        |    md5(doc_id::VARCHAR) AS h,
        |    substring(md5(doc_id::VARCHAR), 9, 2) AS shard
        |  FROM documents),
        |cum AS (SELECT doc_id, source, n_tokens, shard,
        |          sum(n_tokens) OVER (PARTITION BY source, shard
        |            ORDER BY h, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_local
        |        FROM r),
        |tot AS (SELECT source, shard, sum(n_tokens) AS sw FROM r GROUP BY 1, 2),
        |o AS (SELECT source, shard,
        |        coalesce(sum(sw) OVER (PARTITION BY source ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |      FROM tot)
        |SELECT cum.doc_id, cum.source, cum.n_tokens
        |FROM cum JOIN o
        |  ON cum.source IS NOT DISTINCT FROM o.source AND cum.shard = o.shard
        |WHERE o.off + cum.cum_local <=
        |  (CASE cum.source WHEN 'src0' THEN 800 WHEN 'src1' THEN 400
        |    ELSE 1000 END)
        |ORDER BY cum.doc_id""".stripMargin,

    // the upsample machinery: global md5 rank per source, copies =
    // floor(w) + (rank <= floor((w - floor(w)) * n) ? 1 : 0), one row per
    // (doc, epoch)
    "q_upsample" ->
      """WITH r AS (
        |  SELECT doc_id, source, md5(doc_id::VARCHAR) AS h,
        |         substring(md5(doc_id::VARCHAR), 9, 2) AS shard
        |  FROM documents),
        |rn AS (SELECT doc_id, source, shard, row_number() OVER (
        |         PARTITION BY source, shard ORDER BY h, doc_id) AS rn
        |       FROM r),
        |c AS (SELECT source, shard, count(*) AS c FROM r GROUP BY 1, 2),
        |o AS (SELECT source, shard,
        |        coalesce(sum(c) OVER (PARTITION BY source ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
        |        sum(c) OVER (PARTITION BY source) AS n
        |      FROM c),
        |w AS (SELECT rn.doc_id, rn.source,
        |        (CASE rn.source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.4
        |          ELSE 1.0 END) AS wt,
        |        rn.rn + o.off AS grank, o.n
        |      FROM rn JOIN o
        |        ON rn.source IS NOT DISTINCT FROM o.source
        |        AND rn.shard = o.shard),
        |cp AS (SELECT doc_id, source,
        |         (floor(wt)::BIGINT + CASE WHEN grank <=
        |            floor((wt - floor(wt)::BIGINT) * n) THEN 1 ELSE 0 END)
        |           AS copies
        |       FROM w)
        |SELECT doc_id, source, unnest(range(0, copies)) AS epoch
        |FROM cp WHERE copies > 0
        |ORDER BY doc_id, epoch""".stripMargin,

    // q_contamination's detector turned into the anti-join transform
    "q_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3
         |      THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')) END) AS s
         |  FROM (SELECT doc_id, string_split($duckNorm, ' ') AS toks
         |        FROM documents)),
         |b AS (SELECT doc_id, s, len(s) AS n_b FROM sh WHERE doc_id < 100),
         |bad AS (
         |  SELECT DISTINCT a.doc_id FROM sh a JOIN b ON a.doc_id >= 100
         |  WHERE len(list_intersect(a.s, b.s))::DOUBLE / b.n_b::DOUBLE >= 0.5)
         |SELECT doc_id, source FROM documents
         |WHERE doc_id >= 100 AND doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY doc_id""".stripMargin,

    "q_vocab_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS term
         |  FROM documents)
         |SELECT term, count(*)::BIGINT AS tf,
         |  count(DISTINCT doc_id)::BIGINT AS df
         |FROM tok WHERE length(term) > 0
         |GROUP BY term
         |ORDER BY tf DESC, term ASC LIMIT 100""".stripMargin,

    // Hashing-trick features: same md5 bucket/sign derivation; zero-sum
    // buckets dropped on both sides.
    "q_hashing_tf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS term
         |  FROM documents),
         |h AS (SELECT doc_id,
         |    CAST(('0x' || substr(md5(term), 1, 8))::BIGINT % 256 AS INTEGER)
         |      AS feature,
         |    CASE WHEN ('0x' || substr(md5(term), 9, 1))::INTEGER % 2 = 0
         |      THEN 1 ELSE -1 END AS s
         |  FROM tok WHERE length(term) > 0)
         |SELECT doc_id, feature, CAST(SUM(s) AS BIGINT) AS weight
         |FROM h GROUP BY doc_id, feature
         |HAVING SUM(s) <> 0
         |ORDER BY doc_id, feature""".stripMargin,

    // hashed-unigram likelihood ratio: the hashingTf md5 bucket (no sign),
    // add-1 smoothing over 64 buckets, decimal-cast per-doc sum
    "q_dsir_weights" ->
      s"""WITH tok AS (
         |  SELECT doc_id, source IN ('src0','src1') AS tgt,
         |    unnest(string_split($duckNorm, ' ')) AS term
         |  FROM documents),
         |db AS (SELECT doc_id,
         |    CAST(('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS INTEGER)
         |      AS bucket,
         |    count(*)::BIGINT AS n, max(tgt) AS tgt
         |  FROM tok WHERE length(term) > 0 GROUP BY 1, 2),
         |bt AS (SELECT bucket,
         |    sum(CASE WHEN tgt THEN n ELSE 0 END)::BIGINT AS ct,
         |    sum(n)::BIGINT AS cr FROM db GROUP BY 1),
         |tot AS (SELECT sum(ct)::BIGINT AS tt, sum(cr)::BIGINT AS tr FROM bt)
         |SELECT doc_id, sum(n)::BIGINT AS n_tokens,
         |  round(CAST(sum(CAST(n::DOUBLE *
         |    (ln((ct::DOUBLE + 1) / (tt::DOUBLE + 64)) -
         |     ln((cr::DOUBLE + 1) / (tr::DOUBLE + 64)))
         |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS logw
         |FROM db JOIN bt USING (bucket) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the exact regexp_replace chain of TextOps.htmlExtract (RE2-safe
    // patterns ⇒ identical semantics); entities via plain replace()
    "q_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><title>' || source || '</title>'
        |    || '<style type="text/css">body { margin: 0; }</style>'
        |    || '<script>var n = 1; if (n < 2) { n = 2; }</script></head>'
        |    || '<body><!-- doc ' || CAST(doc_id AS VARCHAR) || ' -->'
        |    || '<h1>Title &amp; Header</h1><p>' || text
        |    || '</p><ul><li>alpha&nbsp;beta</li>'
        |    || '<li>&lt;tag&gt; &#39;q&#39; &quot;z&quot;</li></ul>'
        |    || '</body></html>' AS html
        |  FROM documents),
        |x AS (SELECT doc_id, trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html,
        |              '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |    '[ \t\n\r]+', ' ', 'g')) AS extract
        |  FROM h)
        |SELECT doc_id, length(extract)::INTEGER AS n_extract_chars,
        |  md5(extract) AS extract_md5
        |FROM x ORDER BY doc_id""".stripMargin,

    "q_tfidf_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
         |       WHERE length(term) > 0 GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT doc_id, rank, term, tf, round(tfidf, 6) AS tfidf FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf,
         |    tf.tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE) AS tfidf,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE) DESC,
         |        tf.term ASC) AS rank
         |  FROM tf JOIN dfq USING (term) CROSS JOIN n)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // row-level replay of the engine's ascending rank bands (ties are
    // interchangeable for both counts AND sums); all non-negative so
    // // is the floor
    "q_lorenz" ->
      s"""WITH b AS (
         |  SELECT CAST(floor((len($duckToks)::DOUBLE) * 1000000.0)
         |    AS BIGINT) AS q
         |  FROM documents),
         |r AS (SELECT q,
         |        row_number() OVER (ORDER BY q) - 1 AS rk,
         |        count(*) OVER () AS n
         |      FROM b),
         |a AS (SELECT (rk * 10) // n AS decile, count(*)::BIGINT AS n_d,
         |        SUM(CAST(q AS HUGEINT)) AS sm
         |      FROM r GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n,
         |        SUM(sm) AS tot FROM a),
         |c AS (SELECT decile, n_d, sm,
         |        SUM(n_d) OVER (ORDER BY decile) AS cum_n,
         |        SUM(sm) OVER (ORDER BY decile) AS cs
         |      FROM a)
         |SELECT decile, n_d AS n, CAST(sm AS BIGINT) AS sum_x1e6,
         |  CAST(cum_n AS BIGINT) AS cum_n,
         |  CAST(cs AS BIGINT) AS cum_sum_x1e6,
         |  CAST((CAST(cum_n AS HUGEINT) * 1000000)
         |    // (SELECT n FROM t) AS BIGINT) AS pop_share_x1e6,
         |  CASE WHEN (SELECT tot FROM t) > 0 THEN
         |    CAST((cs * 1000000) // (SELECT tot FROM t) AS BIGINT)
         |  END AS value_share_x1e6
         |FROM c ORDER BY decile""".stripMargin,

    // one source aggregate; Σn² in HUGEINT, both ratios floored micros
    "q_hhi" ->
      """WITH s AS (SELECT source, count(*)::BIGINT AS n
        |           FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_sources,
        |        CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_docs,
        |        COALESCE(SUM(CAST(n AS HUGEINT) * n), 0) AS sq
        |      FROM s),
        |h AS (SELECT n_sources, n_docs,
        |        CASE WHEN n_docs > 0 THEN
        |          CAST((sq * 1000000)
        |            // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
        |        END AS hhi_x1e6
        |      FROM a)
        |SELECT n_sources, n_docs, hhi_x1e6,
        |  CASE WHEN hhi_x1e6 > 0 THEN
        |    CAST(1000000000000 // hhi_x1e6 AS BIGINT)
        |  END AS eff_sources_x1e6
        |FROM h""".stripMargin,

    // whitespace vs BPE-ish regex counts (the q_text_stats kernels)
    // summed per language; non-negative // is the floor
    "q_fertility" ->
      s"""WITH d AS (
         |  SELECT lang,
         |    len($duckToks)::BIGINT AS w,
         |    len(regexp_extract_all(text,
         |      '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS b
         |  FROM documents WHERE lang IS NOT NULL),
         |g AS (SELECT lang, count(*)::BIGINT AS n_docs,
         |        CAST(SUM(w) AS BIGINT) AS n_words,
         |        CAST(SUM(b) AS BIGINT) AS n_subwords
         |      FROM d GROUP BY 1)
         |SELECT lang, n_docs, n_words, n_subwords,
         |  CASE WHEN n_words > 0 THEN
         |    CAST((n_subwords * 1000000) // n_words AS BIGINT)
         |  END AS fertility_x1e6
         |FROM g ORDER BY lang""".stripMargin,

    // the q_bigram_logprob pairing; margins from the bigram-count
    // frame; zero cells contribute 0 (their E is 0 by the margin
    // identity — the CASE guards the ln); rank over the top-20 head
    "q_collocations" ->
      s"""WITH toks AS (
         |  SELECT list_filter(string_split($duckNorm, ' '),
         |    x -> length(x) > 0) AS t
         |  FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i]))
         |      AS w1,
         |    unnest(list_transform(range(1, len(t)), i -> t[i + 1]))
         |      AS w2
         |  FROM toks WHERE len(t) >= 2),
         |cab AS (SELECT w1, w2, count(*)::BIGINT AS n_ab
         |        FROM bg GROUP BY 1, 2),
         |ca AS (SELECT w1, CAST(SUM(n_ab) AS BIGINT) AS n_a
         |       FROM cab GROUP BY 1),
         |cb AS (SELECT w2, CAST(SUM(n_ab) AS BIGINT) AS n_b
         |       FROM cab GROUP BY 1),
         |nn AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM cab),
         |sc AS (SELECT w1, w2, n_ab, n_a, n_b,
         |         round(2.0 * (
         |           (CASE WHEN n_ab > 0 THEN n_ab::DOUBLE
         |              * ln(n_ab::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE
         |                / n::DOUBLE)) ELSE 0.0 END
         |           + CASE WHEN n_a - n_ab > 0
         |              THEN (n_a - n_ab)::DOUBLE
         |              * ln((n_a - n_ab)::DOUBLE / (n_a::DOUBLE
         |                * (n::DOUBLE - n_b::DOUBLE) / n::DOUBLE))
         |              ELSE 0.0 END)
         |           + CASE WHEN n_b - n_ab > 0
         |              THEN (n_b - n_ab)::DOUBLE
         |              * ln((n_b - n_ab)::DOUBLE
         |                / ((n::DOUBLE - n_a::DOUBLE) * n_b::DOUBLE
         |                  / n::DOUBLE)) ELSE 0.0 END
         |           + CASE WHEN n - n_a - n_b + n_ab > 0
         |              THEN (n - n_a - n_b + n_ab)::DOUBLE
         |              * ln((n - n_a - n_b + n_ab)::DOUBLE
         |                / ((n::DOUBLE - n_a::DOUBLE)
         |                  * (n::DOUBLE - n_b::DOUBLE) / n::DOUBLE))
         |              ELSE 0.0 END), 6) AS g2
         |       FROM cab JOIN ca USING (w1) JOIN cb USING (w2)
         |       CROSS JOIN nn
         |       WHERE n_ab >= 5),
         |topk AS (SELECT * FROM sc
         |         ORDER BY g2 DESC, w1 ASC, w2 ASC LIMIT 20)
         |SELECT row_number() OVER (ORDER BY g2 DESC, w1 ASC, w2 ASC)
         |    AS rank,
         |  w1, w2, n_ab, n_a, n_b, g2
         |FROM topk ORDER BY rank""".stripMargin,

    // top-1000 vocab head (tf desc, term asc), ln-micro quantization,
    // then the q_ols_group closed form on the 'corpus' literal group
    "q_zipf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS term
         |  FROM documents),
         |v AS (SELECT term, count(*)::BIGINT AS tf FROM tok
         |      WHERE length(term) > 0 GROUP BY 1),
         |topk AS (SELECT term, tf FROM v
         |         ORDER BY tf DESC, term ASC LIMIT 1000),
         |r AS (SELECT row_number() OVER (ORDER BY tf DESC, term ASC)
         |        AS id, tf FROM topk),
         |q AS (SELECT
         |        CAST(floor(ln(id::DOUBLE) * 1000000.0) AS HUGEINT)
         |          AS xm,
         |        CAST(floor(ln(tf::DOUBLE) * 1000000.0) AS HUGEINT)
         |          AS ym
         |      FROM r),
         |g AS (SELECT 'corpus' AS corpus, count(*) AS n,
         |        SUM(xm)::DOUBLE / 1000000.0 AS sx,
         |        SUM(ym)::DOUBLE / 1000000.0 AS sy,
         |        SUM(xm * xm)::DOUBLE / 1000000000000.0 AS sxx,
         |        SUM(ym * ym)::DOUBLE / 1000000000000.0 AS syy,
         |        SUM(xm * ym)::DOUBLE / 1000000000000.0 AS sxy
         |      FROM q)
         |SELECT corpus, n,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0 THEN
         |    round((n::DOUBLE * sxy - sx * sy)
         |          / (n::DOUBLE * sxx - sx * sx), 6) END AS slope,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0 THEN
         |    round((sy - ((n::DOUBLE * sxy - sx * sy)
         |                 / (n::DOUBLE * sxx - sx * sx)) * sx)
         |          / n::DOUBLE, 6) END AS intercept,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0
         |        AND n::DOUBLE * syy - sy * sy > 0.0 THEN
         |    round(((n::DOUBLE * sxy - sx * sy)
         |           * (n::DOUBLE * sxy - sx * sy))
         |          / ((n::DOUBLE * sxx - sx * sx)
         |             * (n::DOUBLE * syy - sy * sy)), 6) END AS r2
         |FROM g""".stripMargin,

    // doc ranks by row_number, ceil-bucket checkpoints ((a+b-1)//b on
    // positive operands), first-occurrence vocab by min doc, cumulative
    // windows, then the q_zipf ln-micro OLS closed form
    "q_heaps" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN $duckNorm = '' THEN 0
         |         ELSE length(string_split($duckNorm, ' ')) END AS nt
         |  FROM documents),
         |r AS (SELECT doc_id, nt,
         |        row_number() OVER (ORDER BY doc_id) AS rk,
         |        count(*) OVER () AS nd
         |      FROM d),
         |b AS (SELECT doc_id, nt, (rk * 10 + nd - 1) // nd AS k FROM r),
         |dc AS (SELECT k, SUM(nt) AS tk FROM b GROUP BY 1),
         |tok AS (SELECT doc_id,
         |          unnest(string_split($duckNorm, ' ')) AS term
         |        FROM documents),
         |fd AS (SELECT term, min(doc_id) AS fid FROM tok
         |       WHERE length(term) > 0 GROUP BY 1),
         |fb AS (SELECT b.k, count(*) AS nv FROM fd
         |       JOIN b ON fd.fid = b.doc_id GROUP BY 1),
         |pts AS (SELECT dc.k,
         |          SUM(dc.tk) OVER (ORDER BY dc.k) AS tokens,
         |          SUM(COALESCE(fb.nv, 0)) OVER (ORDER BY dc.k) AS vocab
         |        FROM dc LEFT JOIN fb ON dc.k = fb.k),
         |q AS (SELECT
         |        CAST(floor(ln(tokens::DOUBLE) * 1000000.0) AS HUGEINT)
         |          AS xm,
         |        CAST(floor(ln(vocab::DOUBLE) * 1000000.0) AS HUGEINT)
         |          AS ym
         |      FROM pts WHERE tokens > 0 AND vocab > 0),
         |g AS (SELECT 'corpus' AS corpus, count(*) AS n,
         |        SUM(xm)::DOUBLE / 1000000.0 AS sx,
         |        SUM(ym)::DOUBLE / 1000000.0 AS sy,
         |        SUM(xm * xm)::DOUBLE / 1000000000000.0 AS sxx,
         |        SUM(ym * ym)::DOUBLE / 1000000000000.0 AS syy,
         |        SUM(xm * ym)::DOUBLE / 1000000000000.0 AS sxy
         |      FROM q)
         |SELECT corpus, n,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0 THEN
         |    round((n::DOUBLE * sxy - sx * sy)
         |          / (n::DOUBLE * sxx - sx * sx), 6) END AS slope,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0 THEN
         |    round((sy - ((n::DOUBLE * sxy - sx * sy)
         |                 / (n::DOUBLE * sxx - sx * sx)) * sx)
         |          / n::DOUBLE, 6) END AS intercept,
         |  CASE WHEN n > 0 AND n::DOUBLE * sxx - sx * sx > 0.0
         |        AND n::DOUBLE * syy - sy * sy > 0.0 THEN
         |    round(((n::DOUBLE * sxy - sx * sy)
         |           * (n::DOUBLE * sxy - sx * sy))
         |          / ((n::DOUBLE * sxx - sx * sx)
         |             * (n::DOUBLE * syy - sy * sy)), 6) END AS r2
         |FROM g""".stripMargin,

    // per-doc in-list distinct then one (class, term) presence count;
    // the engine's pinned χ² op order — e = ad−bc as doubles, N·e·e
    // over the margin product — rounded BEFORE the rank window
    "q_chi2_terms" ->
      s"""WITH dt AS (
         |  SELECT lang AS c,
         |    unnest(list_distinct(string_split($duckNorm, ' '))) AS term
         |  FROM documents WHERE lang IS NOT NULL),
         |a AS (SELECT c, term, count(*)::BIGINT AS a FROM dt
         |      WHERE length(term) > 0 GROUP BY 1, 2),
         |t AS (SELECT term, CAST(SUM(a) AS BIGINT) AS dft
         |      FROM a GROUP BY 1),
         |nc AS (SELECT lang AS c, count(*)::BIGINT AS ncd
         |       FROM documents WHERE lang IS NOT NULL GROUP BY 1),
         |nn AS (SELECT count(*)::BIGINT AS n FROM documents
         |       WHERE lang IS NOT NULL),
         |x AS (SELECT a.c, a.term, a.a, t.dft, nc.ncd, nn.n,
         |        round(n::DOUBLE
         |          * (a::DOUBLE * (n - ncd - (dft - a))::DOUBLE
         |             - (dft - a)::DOUBLE * (ncd - a)::DOUBLE)
         |          * (a::DOUBLE * (n - ncd - (dft - a))::DOUBLE
         |             - (dft - a)::DOUBLE * (ncd - a)::DOUBLE)
         |          / (dft::DOUBLE * (n - dft)::DOUBLE
         |             * ncd::DOUBLE * (n - ncd)::DOUBLE), 6) AS chi2
         |      FROM a JOIN t USING (term) JOIN nc USING (c)
         |      CROSS JOIN nn
         |      WHERE t.dft < nn.n AND nc.ncd < nn.n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY c
         |        ORDER BY chi2 DESC, term ASC) AS rank FROM x)
         |SELECT c AS lang, rank, term, a AS df_in_class,
         |  dft AS df_total, chi2
         |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    // tf-weighted mean over the (doc, term) count frame — same shape as
    // CorpusStats.unigramLogProb (sum tf·ln(p) / sum tf)
    "q_unigram_logprob" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
         |       WHERE length(term) > 0 GROUP BY 1, 2),
         |c AS (SELECT term, sum(tf)::BIGINT AS c FROM tf GROUP BY 1),
         |t AS (SELECT sum(c)::BIGINT AS t_total FROM c)
         |SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
         |  round(sum((tf::DOUBLE * ln(c::DOUBLE / t_total::DOUBLE))
         |      ::DECIMAL(28,12))::DOUBLE
         |    / sum(tf)::DOUBLE, 6) AS logprob
         |FROM tf JOIN c USING (term) CROSS JOIN t
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // bigrams via 1-based list indexing over the filtered token array —
    // same adjacency as CorpusStats.bigramLogProb's in-row transform;
    // denominator is the bigram-PREFIX count (sum of tf by prev), not the
    // raw unigram count
    "q_bigram_logprob" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split($duckNorm, ' '),
         |      x -> length(x) > 0) AS t
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS prev,
         |    unnest(list_transform(range(1, len(t)),
         |      i -> t[i] || ' ' || t[i + 1])) AS bigram
         |  FROM toks WHERE len(t) >= 2),
         |tf AS (SELECT doc_id, prev, bigram, count(*)::BIGINT AS tf
         |       FROM bg GROUP BY 1, 2, 3),
         |cb AS (SELECT bigram, sum(tf)::BIGINT AS cb FROM tf GROUP BY 1),
         |cp AS (SELECT prev, sum(tf)::BIGINT AS cp FROM tf GROUP BY 1)
         |SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
         |  round(sum((tf::DOUBLE * ln(cb::DOUBLE / cp::DOUBLE))
         |      ::DECIMAL(28,12))::DOUBLE
         |    / sum(tf)::DOUBLE, 6) AS logprob
         |FROM tf JOIN cb USING (bigram) JOIN cp USING (prev)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // JS divergence via the shared-mass decomposition — the same IEEE
    // double ops in the same order; decimal-cast sums
    "q_source_divergence" ->
      s"""WITH tok AS (SELECT source AS s,
         |    unnest(string_split($duckNorm, ' ')) AS term FROM documents),
         |cnt AS (SELECT s, term, count(*)::BIGINT AS c FROM tok
         |        WHERE length(term) > 0 GROUP BY 1, 2),
         |tot AS (SELECT s, sum(c)::BIGINT AS t FROM cnt GROUP BY 1),
         |p AS (SELECT s, term, c::DOUBLE / t::DOUBLE AS p
         |      FROM cnt JOIN tot USING (s)),
         |sh AS (SELECT a.s AS sa, b.s AS sb,
         |    sum(((a.p * ln(2.0 * a.p / (a.p + b.p)))
         |       + (b.p * ln(2.0 * b.p / (a.p + b.p))))::DECIMAL(28,12))
         |      ::DOUBLE AS shared,
         |    sum(a.p::DECIMAL(28,12))::DOUBLE AS ma,
         |    sum(b.p::DECIMAL(28,12))::DOUBLE AS mb
         |  FROM p a JOIN p b ON a.term = b.term AND a.s < b.s
         |  GROUP BY 1, 2),
         |pairs AS (SELECT a.s AS sa, b.s AS sb
         |  FROM tot a CROSS JOIN tot b WHERE a.s < b.s)
         |SELECT sa AS stratum_a, sb AS stratum_b,
         |  round(0.5 * coalesce(shared, 0.0)
         |    + (0.5 * ln(2.0)) * ((1.0 - coalesce(ma, 0.0))
         |        + (1.0 - coalesce(mb, 0.0))), 6) AS js
         |FROM pairs LEFT JOIN sh USING (sa, sb)
         |ORDER BY stratum_a, stratum_b""".stripMargin,

    // BM25: every score input is integer-derived (tf, df, N, dl) except
    // avgdl (one double division) — per-term doubles are bit-identical
    // across engines (the q_unigram_logprob precedent), the per-doc sum
    // is decimal-cast per term, and the rank orders on the DECIMAL sum.
    // The bm25 + cosine oracles composed verbatim (top-20 lists, self
    // dropped from each component keeping its own rank positions), then
    // the decimal-exact RRF fold at k0=60, top-10.
    "q_hybrid_rrf" ->
      s"""WITH q AS (SELECT doc_id AS query_id,
         |    $duckNorm AS qnorm FROM documents WHERE doc_id < 3),
         |qt AS (SELECT DISTINCT query_id,
         |    unnest(string_split(qnorm, ' ')) AS term FROM q),
         |tok AS (SELECT doc_id,
         |    unnest(string_split($duckNorm, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
         |       WHERE length(term) > 0 GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n_docs,
         |    sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM dl),
         |sc AS (SELECT qt.query_id, tf.doc_id,
         |    sum((ln(1.0 + (n_docs::DOUBLE - df::DOUBLE + 0.5)
         |          / (df::DOUBLE + 0.5))
         |        * (tf::DOUBLE * 2.2)
         |        / (tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl)))
         |      ::DECIMAL(28,12)) AS s
         |  FROM tf JOIN qt USING (term) JOIN dfq USING (term)
         |    JOIN dl USING (doc_id) CROSS JOIN st
         |  GROUP BY 1, 2),
         |br AS (SELECT query_id, doc_id, row_number() OVER
         |    (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
         |  FROM sc),
         |bm AS (SELECT query_id AS probe_id, doc_id AS id, rank
         |  FROM br WHERE rank <= 20 AND doc_id != query_id),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 3),
         |dsc AS (SELECT probe_id, vec_id,
         |    list_dot_product(pv, v)
         |      / (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(v, v))) AS c
         |  FROM e CROSS JOIN p WHERE vec_id != probe_id),
         |dr AS (SELECT probe_id, vec_id AS id, row_number() OVER
         |    (PARTITION BY probe_id ORDER BY c DESC, vec_id ASC) AS rank
         |  FROM dsc),
         |dn AS (SELECT probe_id, id, rank FROM dr WHERE rank <= 20),
         |u AS (SELECT * FROM bm UNION ALL SELECT * FROM dn),
         |f AS (SELECT probe_id, id,
         |    sum(CAST(1.0 / (60.0 + rank::DOUBLE) AS DECIMAL(28,15))) AS s,
         |    count(*) AS n_lists
         |  FROM u GROUP BY 1, 2),
         |fr AS (SELECT probe_id, id, s, n_lists, row_number() OVER
         |    (PARTITION BY probe_id ORDER BY s DESC, id ASC) AS rank
         |  FROM f)
         |SELECT probe_id, rank, id, s::DOUBLE AS rrf_score, n_lists
         |FROM fr WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    "q_bm25_topk" ->
      s"""WITH q AS (SELECT * FROM (VALUES
         |    ('q1', 'hash join merge'),
         |    ('q2', 'customer order line'),
         |    ('q3', 'stream window watermark'))
         |  AS v(query_id, query_text)),
         |qt AS (SELECT DISTINCT query_id,
         |    unnest(string_split(query_text, ' ')) AS term FROM q),
         |tok AS (SELECT doc_id,
         |    unnest(string_split($duckNorm, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
         |       WHERE length(term) > 0 GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n_docs,
         |    sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM dl),
         |sc AS (SELECT qt.query_id, tf.doc_id,
         |    sum((ln(1.0 + (n_docs::DOUBLE - df::DOUBLE + 0.5)
         |          / (df::DOUBLE + 0.5))
         |        * (tf::DOUBLE * 2.2)
         |        / (tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl)))
         |      ::DECIMAL(28,12)) AS s
         |  FROM tf JOIN qt USING (term) JOIN dfq USING (term)
         |    JOIN dl USING (doc_id) CROSS JOIN st
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, s, row_number() OVER
         |    (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
         |  FROM sc)
         |SELECT query_id, rank, doc_id, round(s::DOUBLE, 6) AS score
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // same left-fold order as CorpusStats.logisticQuality's z expression
    "q_quality_logit" ->
      s"""SELECT doc_id, round(ql, 6) AS quality_logit
         |FROM ($duckLogitSub)
         |ORDER BY doc_id""".stripMargin,

    // Percentile-gated quality: keep the best 30% per source by the
    // ROUNDED logit (rounding first makes the sort key engine-portable;
    // the raw doubles agree only to ~1 ulp), percent_rank (= (rank-1)/
    // (n-1), identical definition in both engines) over a unique order.
    "q_quality_topfrac" ->
      s"""WITH s AS (SELECT doc_id, source, round(ql, 6) AS ql6
         |           FROM ($duckLogitSub)),
         |r AS (SELECT doc_id, source, ql6, percent_rank() OVER (
         |        PARTITION BY source ORDER BY ql6 DESC, doc_id ASC) AS pr
         |      FROM s)
         |SELECT doc_id, source, ql6 AS quality_logit
         |FROM r WHERE pr <= 0.3 ORDER BY doc_id""".stripMargin,

    "q_tokenize_ids" ->
      s"""WITH n AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks
         |           FROM documents),
         |tok AS (SELECT doc_id, u.pos, u.term FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
         |      i -> struct_pack(pos := i, term := toks[i::INT]))) AS u
         |    FROM n)
         |  WHERE length(u.term) > 0),
         |v AS (SELECT term, row_number() OVER (ORDER BY tf DESC, term ASC)
         |        AS id
         |      FROM (SELECT term, count(*) AS tf FROM tok GROUP BY 1
         |            ORDER BY tf DESC, term ASC LIMIT 20)),
         |j AS (SELECT tok.doc_id, tok.pos, coalesce(v.id, 0) AS tid
         |      FROM tok LEFT JOIN v USING (term)),
         |enc AS (SELECT doc_id,
         |    array_to_string(list(tid ORDER BY pos), ' ') AS token_ids_str,
         |    sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT AS n_unk
         |  FROM j GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(enc.token_ids_str, '') AS token_ids_str,
         |  coalesce(enc.n_unk, 0)::BIGINT AS n_unk
         |FROM documents d LEFT JOIN enc USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // BPE ENCODING replayed from the committed merge fixture in
    // recursive SQL (training itself is pinned by the in-query
    // fixture-equality require on the Spark side): per distinct word,
    // start from characters + '</w>' and repeatedly apply the
    // LOWEST-RANK merge at its LEFTMOST occurrence until none applies —
    // one occurrence per recursive step is equivalent to the encoder's
    // all-occurrences pass because newly created adjacencies always
    // involve the merged symbol, whose merges rank strictly later
    "q_bpe_encode" ->
      """WITH RECURSIVE merges AS (
        |  SELECT rank, p1, p2
        |  FROM read_csv('/root/repo/fixtures/bpe_merges.csv',
        |    header=true, columns={'docs_n':'BIGINT','chars_n':'BIGINT',
        |      'rank':'INTEGER','p1':'VARCHAR','p2':'VARCHAR'})
        |  WHERE docs_n = (SELECT count(*) FROM documents)
        |    AND chars_n = (SELECT sum(length(text)) FROM documents)),
        |chk AS (
        |  SELECT CASE WHEN (SELECT count(*) FROM merges) = 0
        |    THEN error('bpe_merges.csv has no entry for this corpus ' ||
        |      '(docs_n, chars_n) - run graft.tools.MakeBpeFixture for ' ||
        |      'this scale factor') END AS ok),
        |d AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |wpos AS (
        |  SELECT doc_id, i, ws[i] AS w
        |  FROM (SELECT doc_id, string_split(norm, ' ') AS ws FROM d
        |        WHERE norm IS NOT NULL AND norm <> ''),
        |       unnest(range(1, len(ws) + 1)) t(i)),
        |uw AS (SELECT DISTINCT w FROM wpos),
        |enc AS (
        |  SELECT w, list_append(string_split(w, ''), '</w>') AS p FROM uw
        |  UNION ALL
        |  SELECT w, p[1:best_i-1] || [p[best_i] || p[best_i+1]]
        |           || p[best_i+2:]
        |  FROM (
        |    SELECT w, p,
        |      (SELECT i FROM unnest(range(1, len(p))) t(i)
        |       JOIN merges m ON p[i] = m.p1 AND p[i+1] = m.p2
        |       ORDER BY m.rank, i LIMIT 1) AS best_i
        |    FROM enc) s
        |  WHERE best_i IS NOT NULL),
        |done AS (
        |  SELECT w, p FROM enc e
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM unnest(range(1, len(e.p))) t(i)
        |    JOIN merges m ON e.p[i] = m.p1 AND e.p[i+1] = m.p2)),
        |docpieces AS (
        |  SELECT doc_id, flatten(list(p ORDER BY i)) AS pieces
        |  FROM wpos JOIN done USING (w) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(len(pieces), 0)::INTEGER AS pieces_n,
        |  COALESCE(array_to_string(pieces[1:12], ' '), '') AS pieces_head
        |FROM d LEFT JOIN docpieces USING (doc_id) CROSS JOIN chk
        |ORDER BY d.doc_id""".stripMargin,

    "q_corpus_profile" ->
      s"""SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_toks)::BIGINT AS n_tokens,
         |  count(DISTINCT lang)::BIGINT AS n_langs,
         |  round(sum((
         |    (CASE WHEN n_chars_d >= 50 AND n_chars_d <= 10000 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN sw_hits / n_toks_d >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.3
         |    + (CASE WHEN punct_chars / n_chars_d <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
         |    + (CASE WHEN tok_chars / n_toks_d >= 2.0 AND tok_chars / n_toks_d <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
         |  )::DECIMAL(18,12))::DOUBLE / count(*)::DOUBLE, 6) AS mean_quality
         |FROM (
         |  SELECT source, lang,
         |    len($duckToks)::BIGINT AS n_toks,
         |    length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE AS punct_chars,
         |    length(text)::DOUBLE AS n_chars_d,
         |    len(list_filter($duckToksLower, t -> list_contains($stopList, t)))::DOUBLE AS sw_hits,
         |    len($duckToks)::DOUBLE AS n_toks_d,
         |    list_sum(list_transform($duckToks, t -> length(t)))::DOUBLE AS tok_chars
         |  FROM documents)
         |GROUP BY source ORDER BY source""".stripMargin,

    // same normalized token stream; bigrams indexed 1-based from the
    // filtered array; exact floored micro ratios
    "q_distinct_ngrams" ->
      s"""WITH t0 AS (
         |  SELECT source,
         |    list_filter(string_split($duckNorm, ' '),
         |      x -> length(x) > 0) AS t
         |  FROM documents),
         |uni AS (SELECT source, count(*)::BIGINT AS n_tokens,
         |          count(DISTINCT term)::BIGINT AS d1
         |        FROM (SELECT source, unnest(t) AS term FROM t0)
         |        GROUP BY 1),
         |bi AS (SELECT source, count(*)::BIGINT AS n_bigrams,
         |         count(DISTINCT term)::BIGINT AS d2
         |       FROM (SELECT source, t[i] || ' ' || t[i + 1] AS term
         |             FROM (SELECT source, t,
         |                     unnest(generate_series(1, len(t) - 1))
         |                       AS i
         |                   FROM t0 WHERE len(t) >= 2))
         |       GROUP BY 1)
         |SELECT uni.source, n_tokens,
         |  (d1 * 1000000) // n_tokens AS distinct_1_x1e6,
         |  COALESCE(n_bigrams, 0) AS n_bigrams,
         |  CASE WHEN n_bigrams > 0
         |    THEN (d2 * 1000000) // n_bigrams END AS distinct_2_x1e6
         |FROM uni LEFT JOIN bi
         |  ON uni.source IS NOT DISTINCT FROM bi.source
         |ORDER BY uni.source""".stripMargin,

    "q_semdedup" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
        |         ORDER BY vec_id LIMIT 16),
        |sim AS (SELECT e.vec_id, cent_id,
        |    list_dot_product(v, cv)
        |      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS s
        |  FROM e CROSS JOIN cent),
        |asg AS (SELECT vec_id, cell FROM (
        |    SELECT vec_id, cent_id AS cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY s DESC, cent_id ASC) AS rn
        |    FROM sim) WHERE rn = 1),
        |av AS (SELECT a.vec_id, a.cell, e.v FROM asg a JOIN e USING (vec_id)),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a AS node, a AS label FROM edges
        |  UNION
        |  SELECT g.b AS node, r.label FROM reach r JOIN edges g ON g.a = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
        |SELECT a.vec_id, a.cell, coalesce(c.component, a.vec_id) AS component
        |FROM asg a LEFT JOIN comp c ON a.vec_id = c.node
        |ORDER BY vec_id""".stripMargin,

    // URL canonicalization — same rule sequence as UrlOps.normalizeUrl.
    // DuckDB regexp_replace needs the 'g' flag (Spark replaces all by
    // default) and \1-style backreferences (Spark uses $1).
    "q_url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTP://WWW.' || upper(source) || '.Example.COM:80/Docs/' ||
        |    cast(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '/?utm_source=feed&ref=' || lang || '&fbclid=x#top'
        |      ELSE '/#top' END AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, trim(url) AS t0,
        |  regexp_extract(trim(url),
        |    '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*', 0) AS pre FROM u),
        |s2 AS (SELECT doc_id, t0,
        |  lower(pre) || substr(t0, len(pre) + 1) AS t1 FROM s1),
        |s3 AS (SELECT doc_id, t0,
        |  regexp_replace(t1, '#.*', '', 'g') AS t2 FROM s2),
        |s4 AS (SELECT doc_id, t0, regexp_replace(t2,
        |  '&(?:utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)=[^&#]*', '', 'g')
        |  AS t3 FROM s3),
        |s5 AS (SELECT doc_id, t0, regexp_replace(t3,
        |  '\?(?:utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)=[^&#]*&', '?', 'g')
        |  AS t4 FROM s4),
        |s6 AS (SELECT doc_id, t0, regexp_replace(t4,
        |  '\?(?:utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)=[^&#]*$', '', 'g')
        |  AS t5 FROM s5),
        |s7 AS (SELECT doc_id, t0, regexp_replace(t5,
        |  '^(http://[^/:?#]+):80([/?#].*|$)', '\1\2', 'g') AS t6 FROM s6),
        |s8 AS (SELECT doc_id, t0, regexp_replace(t6,
        |  '^(https://[^/:?#]+):443([/?#].*|$)', '\1\2', 'g') AS t7 FROM s7),
        |s9 AS (SELECT doc_id, t0,
        |  regexp_replace(t7, '/+$', '', 'g') AS url_norm FROM s8),
        |h AS (SELECT doc_id, lower(regexp_extract(t0,
        |  '^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1))
        |  AS host FROM s9),
        |d AS (SELECT doc_id, host, regexp_extract(host,
        |  '([^.]+\.(?:co|com|org|net|ac|gov|edu)\.[a-z]{2}|[^.]+\.[^.]+)$',
        |  1) AS m FROM h)
        |SELECT s9.doc_id, s9.url_norm, d.host,
        |  CASE WHEN d.m = '' THEN d.host ELSE d.m END AS domain
        |FROM s9 JOIN d ON s9.doc_id = d.doc_id
        |ORDER BY s9.doc_id""".stripMargin,

    // Unicode NFC — same derived decomposed bindings (chr() codepoints
    // 0x301/0x30A mirror the Scala \u escapes); normalization is
    // UAX #15-stabilized so JDK and utf8proc agree.
    "q_unicode_nfc" ->
      """WITH m AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769))
        |       WHEN doc_id % 3 = 1 THEN 'A' || chr(778) || ' ' || text
        |       ELSE text END AS messy
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(messy) AS norm_text,
        |  messy <> nfc_normalize(messy) AS changed
        |FROM m ORDER BY doc_id""".stripMargin,

    // Seeded md5 global shuffle order (NULL-id sentinel mirrors
    // Sampling.shuffleKey).
    "q_global_shuffle" ->
      """SELECT doc_id,
        |  md5('train-shuffle:' ||
        |    coalesce(CAST(doc_id AS VARCHAR), ' null')) AS skey
        |FROM documents ORDER BY skey, doc_id""".stripMargin,

    // Seeded-hash shard assignment (8 hex digits need BIGINT).
    "q_shard_assign" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5('shard:' ||
        |    coalesce(CAST(doc_id AS VARCHAR), ' null')),
        |    1, 8))::BIGINT % 8 AS INTEGER) AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Per-domain cap: keep the 5 longest docs per source.
    "q_domain_cap" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars, row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 5
        |ORDER BY doc_id""".stripMargin,

    // SQ8 codes: round-half-away(127*x/amax) per element; DuckDB round()
    // on doubles is also half-away-from-zero, and 127.0 * x::DOUBLE /
    // amax restates the kernel's exact double-op order.
    "q_sq8_codes" ->
      """WITH a AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CASE WHEN amax = 0 THEN 0
        |      ELSE cast(round(127.0 * x::DOUBLE / amax) AS BIGINT) END)
        |      AS codes
        |  FROM a)
        |SELECT vec_id, array_to_string(codes, ' ') AS codes_str,
        |  cast(list_sum(list_transform(codes, c -> c * c)) AS BIGINT)
        |    AS norm_sq
        |FROM q ORDER BY vec_id""".stripMargin,

    // Quantized-cosine top-k over the SQ8 codes (scales cancel).
    "q_sq8_topk" -> sq8TopkSql,

    // exact-configuration PQ (see pqExactTopkSql): the brute ADC scan and
    // the exhaustive-probe IVF-PQ index produce the same rows
    "q_pq_topk" -> pqExactTopkSql,
    "q_ivf_pq" -> pqExactTopkSql,

    // IVF-SQ8 at nprobe=nlist probes every cell, so candidates = the
    // whole corpus and the result is exactly the quantized top-k.
    "q_ivf_sq8" -> sq8TopkSql
  )

  /** Unrolled-CTE replay of [[graft.analytics.Regression.logisticTrain]]
    * on the documents quality labels: each GD iteration is one
    * residual/gradient/weight CTE triple over a one-row weight table
    * (CROSS JOIN — never a scalar-subquery forest). Every division
    * TRUNCATES toward zero, where DuckDB `//`, Spark `div`, and Scala
    * `BigInt./` all agree, so negative gradients replay with no floor
    * gymnastics. */
  private def logitTrainOracle(iters: Int, lr: Long): String = {
    val base =
      """WITH f AS MATERIALIZED (
        |  SELECT CASE WHEN lang = 'en' OR n_chars > 400
        |              THEN 1000000 ELSE 0 END AS y6,
        |    CAST(floor((n_chars / 100.0) * 1000000.0) AS BIGINT) AS x1,
        |    CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS x2,
        |    CAST(floor(((doc_id % 10) / 10.0) * 1000000.0) AS BIGINT)
        |      AS x3
        |  FROM documents
        |  WHERE (lang = 'en' OR n_chars > 400) IS NOT NULL
        |    AND n_chars IS NOT NULL AND doc_id IS NOT NULL),
        |w0 AS (SELECT CAST(0 AS HUGEINT) AS b, CAST(0 AS HUGEINT) AS w1,
        |         CAST(0 AS HUGEINT) AS w2, CAST(0 AS HUGEINT) AS w3)"""
        .stripMargin
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT
         |    LEAST(1000000, GREATEST(0, 500000 +
         |      ((w.b * 1000000 + w.w1 * f.x1 + w.w2 * f.x2
         |        + w.w3 * f.x3) // 1000000) // 4)) - f.y6 AS r,
         |    f.x1, f.x2, f.x3
         |  FROM f CROSS JOIN w${i - 1} w),
         |g$i AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |    SUM(CAST(r AS HUGEINT)) * 1000000 AS g0,
         |    SUM(CAST(r AS HUGEINT) * x1) AS g1,
         |    SUM(CAST(r AS HUGEINT) * x2) AS g2,
         |    SUM(CAST(r AS HUGEINT) * x3) AS g3
         |  FROM r$i),
         |w$i AS (SELECT
         |    w.b  - ($lr * (g.g0 // g.n)) // 1000000000000 AS b,
         |    w.w1 - ($lr * (g.g1 // g.n)) // 1000000000000 AS w1,
         |    w.w2 - ($lr * (g.g2 // g.n)) // 1000000000000 AS w2,
         |    w.w3 - ($lr * (g.g3 // g.n)) // 1000000000000 AS w3
         |  FROM w${i - 1} w CROSS JOIN g$i g)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rounds
       |SELECT idx, feature, weight_x1e6,
       |  (SELECT CAST(n AS BIGINT) FROM g1) AS n
       |FROM (
       |  SELECT 0 AS idx, '__bias' AS feature, CAST(b AS BIGINT)
       |    AS weight_x1e6 FROM w$iters
       |  UNION ALL SELECT 1, 'chars_h', CAST(w1 AS BIGINT) FROM w$iters
       |  UNION ALL SELECT 2, 'is_en', CAST(w2 AS BIGINT) FROM w$iters
       |  UNION ALL SELECT 3, 'id_noise', CAST(w3 AS BIGINT) FROM w$iters)
       |ORDER BY idx""".stripMargin
  }

  /** Unrolled replay of the HELD-OUT train → eval loop
    * (`q_logit_eval`): the [[logitTrainOracle]] GD-iteration shape with
    * (a) the seeded-md5 shard split (train = shards ≠ 0, eval = shard
    * 0 — the q_shard_assign hash expression verbatim), (b) the
    * DECOUPLED L2 decay term per round (computed on the
    * iteration-start weight, bias undecayed, truncating `//` — the
    * engine's BigInt convention), (c) one truncating-clamp scoring
    * select over the UNSEEN shard, and (d) the q_auc Mann–Whitney
    * 2·avgrank rank-sum identity over the held-out scores. Exact
    * integers end to end; ONE double division in the final AUC. */
  private def logitEvalOracle(iters: Int, lr: Long, l2: Long): String = {
    val shardExpr =
      """CAST(('0x' || substr(md5('shard:' ||
        |    coalesce(CAST(doc_id AS VARCHAR), ' null')),
        |    1, 8))::BIGINT % 8 AS INTEGER)""".stripMargin
    val featCols =
      """CAST(floor((n_chars / 100.0) * 1000000.0) AS BIGINT) AS x1,
        |    CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS x2,
        |    CAST(floor(((doc_id % 10) / 10.0) * 1000000.0) AS BIGINT)
        |      AS x3""".stripMargin
    val completeCase =
      """(lang = 'en' OR n_chars > 400) IS NOT NULL
        |    AND n_chars IS NOT NULL AND doc_id IS NOT NULL""".stripMargin
    val base =
      s"""WITH f AS MATERIALIZED (
         |  SELECT CASE WHEN lang = 'en' OR n_chars > 400
         |              THEN 1000000 ELSE 0 END AS y6,
         |    $featCols
         |  FROM documents
         |  WHERE $completeCase
         |    AND $shardExpr <> 0),
         |w0 AS (SELECT CAST(0 AS HUGEINT) AS b, CAST(0 AS HUGEINT) AS w1,
         |         CAST(0 AS HUGEINT) AS w2, CAST(0 AS HUGEINT) AS w3)"""
        .stripMargin
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT
         |    LEAST(1000000, GREATEST(0, 500000 +
         |      ((w.b * 1000000 + w.w1 * f.x1 + w.w2 * f.x2
         |        + w.w3 * f.x3) // 1000000) // 4)) - f.y6 AS r,
         |    f.x1, f.x2, f.x3
         |  FROM f CROSS JOIN w${i - 1} w),
         |g$i AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |    SUM(CAST(r AS HUGEINT)) * 1000000 AS g0,
         |    SUM(CAST(r AS HUGEINT) * x1) AS g1,
         |    SUM(CAST(r AS HUGEINT) * x2) AS g2,
         |    SUM(CAST(r AS HUGEINT) * x3) AS g3
         |  FROM r$i),
         |w$i AS (SELECT
         |    w.b  - ($lr * (g.g0 // g.n)) // 1000000000000 AS b,
         |    w.w1 - ($lr * (g.g1 // g.n)) // 1000000000000
         |         - ($l2 * w.w1) // 1000000 AS w1,
         |    w.w2 - ($lr * (g.g2 // g.n)) // 1000000000000
         |         - ($l2 * w.w2) // 1000000 AS w2,
         |    w.w3 - ($lr * (g.g3 // g.n)) // 1000000000000
         |         - ($l2 * w.w3) // 1000000 AS w3
         |  FROM w${i - 1} w CROSS JOIN g$i g)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rounds,
       |h AS (
       |  SELECT (lang = 'en' OR n_chars > 400) AS y,
       |    $featCols
       |  FROM documents
       |  WHERE $completeCase
       |    AND $shardExpr = 0),
       |sc AS (
       |  SELECT h.y,
       |    CAST(LEAST(1000000, GREATEST(0, 500000 +
       |      ((w.b * 1000000 + w.w1 * h.x1 + w.w2 * h.x2
       |        + w.w3 * h.x3) // 1000000) // 4)) AS BIGINT) AS s
       |  FROM h CROSS JOIN w$iters w),
       |rk AS (SELECT y,
       |         2 * rank() OVER (ORDER BY s)
       |           + count(*) OVER (PARTITION BY s) - 1 AS r2
       |       FROM sc),
       |a AS (SELECT
       |        CAST(count(*) FILTER (WHERE y) AS BIGINT) AS n_pos,
       |        CAST(count(*) FILTER (WHERE NOT y) AS BIGINT) AS n_neg,
       |        SUM(CASE WHEN y THEN CAST(r2 AS HUGEINT) END) AS rp2
       |      FROM rk)
       |SELECT CAST(0 AS INTEGER) AS shard, n_pos, n_neg,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    round((rp2::DOUBLE - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0))
       |          / (2.0 * n_pos::DOUBLE * n_neg::DOUBLE), 6) END AS auc
       |FROM a""".stripMargin
  }

  /** Unrolled replay of the whole TRAIN → DEPLOY loop
    * (`q_trained_quality`): the [[logitTrainOracle]] GD-iteration shape
    * over the stopword/punctuation signal columns, then ONE scoring
    * select applying the final weight row with the same truncating
    * clamp the engine's `hardSigmoidScoreX1e6` runs — exact integers on
    * both halves, no float tolerance anywhere. */
  private def trainedQualityOracle(iters: Int, lr: Long): String = {
    val base =
      s"""WITH f AS MATERIALIZED (
         |  SELECT doc_id, lang,
         |    CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y6,
         |    CAST(floor((sw_hits / n_toks_d) * 1000000.0) AS BIGINT)
         |      AS x1,
         |    CAST(floor((punct_chars / n_chars_g) * 1000000.0) AS BIGINT)
         |      AS x2
         |  FROM (
         |    SELECT doc_id, lang,
         |      len(list_filter($duckToksLower,
         |        t -> list_contains($stopList, t)))::DOUBLE AS sw_hits,
         |      len($duckToks)::DOUBLE AS n_toks_d,
         |      length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
         |        ::DOUBLE AS punct_chars,
         |      greatest(length(text), 1)::DOUBLE AS n_chars_g
         |    FROM documents)
         |  WHERE (lang = 'en') IS NOT NULL
         |    AND isfinite(sw_hits / n_toks_d)
         |    AND isfinite(punct_chars / n_chars_g)),
         |w0 AS (SELECT CAST(0 AS HUGEINT) AS b, CAST(0 AS HUGEINT) AS w1,
         |         CAST(0 AS HUGEINT) AS w2)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT
         |    LEAST(1000000, GREATEST(0, 500000 +
         |      ((w.b * 1000000 + w.w1 * f.x1 + w.w2 * f.x2)
         |        // 1000000) // 4)) - f.y6 AS r,
         |    f.x1, f.x2
         |  FROM f CROSS JOIN w${i - 1} w),
         |g$i AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |    SUM(CAST(r AS HUGEINT)) * 1000000 AS g0,
         |    SUM(CAST(r AS HUGEINT) * x1) AS g1,
         |    SUM(CAST(r AS HUGEINT) * x2) AS g2
         |  FROM r$i),
         |w$i AS (SELECT
         |    w.b  - ($lr * (g.g0 // g.n)) // 1000000000000 AS b,
         |    w.w1 - ($lr * (g.g1 // g.n)) // 1000000000000 AS w1,
         |    w.w2 - ($lr * (g.g2 // g.n)) // 1000000000000 AS w2
         |  FROM w${i - 1} w CROSS JOIN g$i g)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rounds
       |SELECT f.doc_id, f.lang,
       |  CAST(LEAST(1000000, GREATEST(0, 500000 +
       |    ((w.b * 1000000 + w.w1 * f.x1 + w.w2 * f.x2)
       |      // 1000000) // 4)) AS BIGINT) AS score_x1e6,
       |  LEAST(1000000, GREATEST(0, 500000 +
       |    ((w.b * 1000000 + w.w1 * f.x1 + w.w2 * f.x2)
       |      // 1000000) // 4)) >= 500000 AS predicted_en
       |FROM f CROSS JOIN w$iters w
       |ORDER BY f.doc_id""".stripMargin
  }

  /** The k-means replay, unrolled per iteration: init = the k
    * smallest-id vectors quantized to micros; each round assigns by the
    * shared `⟨x,x⟩ − 2⟨x,c/10⁶⟩ + ⟨c/10⁶,c/10⁶⟩` double chain (ties →
    * smaller cid) and recomputes centroids as exact floor-divided
    * integer component means (the `//`-truncation-corrected negative
    * floor, the ldiv contract); empty clusters keep their centroid. */
  private def kmeansOracle(k: Int, iters: Int): String = {
    def assignStage(n: Int, cents: String): String =
      s"""a$n AS (
         |  SELECT vec_id, cid, d2,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2 ASC, cid ASC) AS rn
         |  FROM (
         |    SELECT q.vec_id, c.cid,
         |      list_dot_product(q.v, q.v)
         |      - 2 * list_dot_product(q.v,
         |          list_transform(c.c, e -> e / 1000000.0))
         |      + list_dot_product(list_transform(c.c, e -> e / 1000000.0),
         |          list_transform(c.c, e -> e / 1000000.0)) AS d2
         |    FROM q CROSS JOIN $cents c))""".stripMargin
    def updateStage(n: Int): String =
      s"""u$n AS (
         |  SELECT cid, list(s ORDER BY pos) AS c
         |  FROM (
         |    SELECT cid, pos,
         |      CAST(CASE WHEN ssum % cnt <> 0 AND ssum < 0
         |        THEN ssum // cnt - 1 ELSE ssum // cnt END AS BIGINT) AS s
         |    FROM (
         |      SELECT cid, pos, SUM(qc) AS ssum, COUNT(*) AS cnt
         |      FROM (
         |        SELECT a.cid, unnest(q.qv) AS qc,
         |          unnest(range(len(q.qv))) AS pos
         |        FROM (SELECT vec_id, cid FROM a$n WHERE rn = 1) a
         |        JOIN q USING (vec_id))
         |      GROUP BY cid, pos))
         |  GROUP BY cid),
         |c$n AS (
         |  SELECT p.cid, COALESCE(u$n.c, p.c) AS c
         |  FROM c${n - 1} p LEFT JOIN u$n USING (cid))""".stripMargin
    val rounds = (1 to iters)
      .map(n => assignStage(n, s"c${n - 1}") + ",\n" + updateStage(n))
      .mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    list_transform(embedding::DOUBLE[],
       |      x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
       |    AS cid, qv AS c
       |  FROM q ORDER BY vec_id LIMIT $k),
       |$rounds,
       |${assignStage(iters + 1, s"c$iters")}
       |SELECT vec_id, cid AS cluster,
       |  CAST(floor(d2 * 1000000.0) AS BIGINT) AS d2_x1e6
       |FROM a${iters + 1} WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** The same trained trajectory as [[kmeansOracle]], read at rn ≤ 2:
    * a² = best d², b² = second-best (the nearest OTHER centroid under
    * the identical tie order); s = (√b² − √a²)/max — with the
    * greatest(d², 0) clamp both engines apply before sqrt — floored to
    * micros per vector, then an exact negative-safe floor mean per
    * cluster. */
  private def silhouetteOracle(k: Int, iters: Int): String = {
    val base = kmeansOracle(k, iters)
    val cut = base.lastIndexOf("SELECT vec_id, cid AS cluster")
    require(cut > 0, "kmeansOracle shape changed; update silhouetteOracle")
    base.take(cut).stripLineEnd + ",\n" +
      s"""sel AS (
         |  SELECT vec_id,
         |    MAX(CASE WHEN rn = 1 THEN cid END) AS cluster,
         |    sqrt(greatest(MAX(CASE WHEN rn = 1 THEN d2 END), 0)) AS a,
         |    sqrt(greatest(MAX(CASE WHEN rn = 2 THEN d2 END), 0)) AS b
         |  FROM a${iters + 1} WHERE rn <= 2 GROUP BY vec_id),
         |s AS (
         |  SELECT cluster,
         |    CASE WHEN greatest(a, b) = 0 THEN 0
         |      ELSE CAST(floor((b - a) / greatest(a, b) * 1000000.0)
         |        AS BIGINT) END AS sm
         |  FROM sel),
         |m AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
         |        SUM(sm) AS ss FROM s GROUP BY cluster)
         |SELECT cluster, n,
         |  CAST(CASE WHEN ss % n <> 0 AND ss < 0
         |    THEN ss // n - 1 ELSE ss // n END AS BIGINT)
         |    AS mean_sil_x1e6
         |FROM m ORDER BY cluster""".stripMargin
  }

  /** The trained trajectory again, ranked per cluster on the FLOORED
    * micro distance (integer — never a raw-double order key) with id
    * ties, cut at `m`. */
  private def exemplarsOracle(k: Int, iters: Int, m: Int): String = {
    val base = kmeansOracle(k, iters)
    val cut = base.lastIndexOf("SELECT vec_id, cid AS cluster")
    require(cut > 0, "kmeansOracle shape changed; update exemplarsOracle")
    base.take(cut).stripLineEnd + ",\n" +
      s"""fin AS (
         |  SELECT vec_id, cid,
         |    CAST(floor(d2 * 1000000.0) AS BIGINT) AS d2m
         |  FROM a${iters + 1} WHERE rn = 1),
         |r AS (SELECT cid AS cluster, vec_id, d2m,
         |        row_number() OVER (PARTITION BY cid
         |          ORDER BY d2m ASC, vec_id ASC) AS rk
         |      FROM fin)
         |SELECT cluster, CAST(rk AS INTEGER) AS rank, vec_id,
         |  d2m AS d2_x1e6
         |FROM r WHERE rk <= $m ORDER BY cluster, rank""".stripMargin
  }

  private lazy val cosineTopkSql: String =
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
        |sc AS (SELECT probe_id, vec_id,
        |    list_dot_product(pv, v)
        |      / (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(v, v))) AS c
        |  FROM e CROSS JOIN p WHERE vec_id != probe_id),
        |r AS (SELECT probe_id, vec_id, c,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY c DESC, vec_id ASC) AS rank FROM sc)
        |SELECT probe_id, rank, vec_id, round(c, 6) AS cos
        |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin

  /** Oracle for the exact-configuration PQ rows (m = dim ⇒ dsub = 1,
    * lloydIters = 0, sampleSize = k = 16): the codebook is the first 16
    * vectors verbatim, the reconstruction picks each dimension's nearest
    * codebook value (squared-distance argmin, ties → lowest index, the
    * engine kernel's strict-< rule == list_indexof-of-min), and the ADC
    * score reduces to cosine(probe, reconstruction) with the SAME double
    * op order the cosine oracle already matches bit-exactly. */
  private lazy val pqExactTopkSql: String =
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cb AS (SELECT list(v ORDER BY vec_id) AS cvecs
        |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        |rec AS (SELECT vec_id,
        |    list_transform(range(1, len(v) + 1), j ->
        |      cvecs[list_indexof(
        |          list_transform(cvecs, cv -> (v[j] - cv[j]) * (v[j] - cv[j])),
        |          list_min(list_transform(cvecs,
        |            cv -> (v[j] - cv[j]) * (v[j] - cv[j]))))][j]) AS r
        |  FROM e CROSS JOIN cb),
        |n AS (SELECT vec_id, r, sqrt(list_dot_product(r, r)) AS rn FROM rec),
        |p AS (SELECT vec_id AS probe_id, v AS pv,
        |        sqrt(list_dot_product(v, v)) AS pn FROM e WHERE vec_id < 5),
        |sc AS (SELECT probe_id, n.vec_id,
        |    CASE WHEN pn * rn > 0
        |      THEN list_dot_product(pv, r) / (pn * rn) ELSE 0.0 END AS c
        |  FROM n CROSS JOIN p WHERE n.vec_id != probe_id),
        |rk AS (SELECT probe_id, vec_id, c,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY c DESC, vec_id ASC) AS rank FROM sc)
        |SELECT probe_id, rank, vec_id, round(c, 6) AS pqcos
        |FROM rk WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin

  private lazy val sq8TopkSql: String =
      """WITH a AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CASE WHEN amax = 0 THEN 0.0
        |      ELSE round(127.0 * x::DOUBLE / amax) END) AS codes
        |  FROM a),
        |n AS (SELECT vec_id, codes,
        |        sqrt(list_dot_product(codes, codes)) AS cn FROM q),
        |p AS (SELECT vec_id AS probe_id, codes AS pc, cn AS pn
        |      FROM n WHERE vec_id < 5),
        |sc AS (SELECT probe_id, vec_id,
        |    CASE WHEN pn * cn > 0
        |      THEN list_dot_product(pc, codes) / (pn * cn)
        |      ELSE 0.0 END AS c
        |  FROM n CROSS JOIN p WHERE vec_id != probe_id),
        |r AS (SELECT probe_id, vec_id, c,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY c DESC, vec_id ASC) AS rank FROM sc)
        |SELECT probe_id, rank, vec_id, round(c, 6) AS qcos
        |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin
}
