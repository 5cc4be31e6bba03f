package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics for LLM training-data pipelines (north-star
  * extension; no reference implementation — anchored to
  * `/root/testdata/<sf>/documents.parquet`): vocabulary construction,
  * per-document TF-IDF keyword extraction, and unigram-language-model
  * scoring. These complement the per-row operators in [[TextOps]] — each
  * one needs a corpus pass (term totals), so the scale story is about the
  * shape of that aggregation, not per-row codegen:
  *
  *  - the term explode feeds hash aggregates keyed on high-cardinality
  *    (doc, term) / (term) keys, so partial (map-side) aggregation
  *    collapses each partition's repeats before any exchange — the
  *    shuffle carries one row per distinct key per partition, never one
  *    per token;
  *  - corpus-wide scalars (document count, token total) ride a single
  *    aggregated row through a broadcast nested-loop join — no
  *    `.collect()`, the plan stays lazy and whole;
  *  - per-document ranking windows key on the document id (maximal
  *    cardinality — the q_pack lesson: never window over a low-cardinality
  *    key at data size).
  */
object CorpusStats {

  /** One row per (id, term) occurrence of the NORMALIZED text — the shared
    * explode every operator here starts from. Empty documents contribute
    * nothing (split of "" yields one empty token; filtered). */
  private def termRows(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("_id"),
        explode(split(TextOps.normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)

  /** Vocabulary table: corpus term frequency + document frequency per
    * distinct (normalized) token, restricted to `minCount` total
    * occurrences — the vocab-construction primitive of a tokenizer
    * pipeline. Returns (term, tf, df).
    *
    * Scale: `countDistinct` plans as the standard two-phase expand — a
    * (term, doc) distinct keyed on the pair (high cardinality, no hot
    * key) then a term-keyed count. Both exchanges are map-side combined;
    * skew on stopword-class terms collapses in the partial phase. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 1L): DataFrame =
    termRows(df, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("_id")).as("df"))
      .filter(col("tf") >= minCount)

  /** Top-k corpus terms by total frequency (ties → term asc) — the "show
    * me the vocabulary head" query. orderBy+limit plans as
    * TakeOrderedAndProject: each partition forwards at most k rows, no
    * global sort materializes. */
  def vocabularyTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    vocabulary(df, idCol, textCol)
      .orderBy(col("tf").desc, col("term").asc)
      .limit(k)

  /** Per-document top-k terms by TF-IDF (Salton & Buckley's classic
    * tf · ln(N / df) with raw term counts) — the keyword-extraction /
    * topic-signal primitive. Returns (id, rank, term, tf, tfidf), rank by
    * (tfidf desc, term asc) — deterministic, and exactly reproducible by
    * any engine since every input to the score is an integer.
    *
    * Scale: tf is a (doc, term)-keyed hash aggregate; df joins back on
    * `term` (vocabulary-sized build side — Spark/AQE broadcasts it when it
    * fits, and the join stays an equi-join either way); N rides one
    * aggregated row through a broadcast cross join; the rank window keys
    * on the document id. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    // materialize tf ONCE (lazy localCheckpoint): it feeds BOTH the score
    // side and the document-frequency aggregate, and Spark's exchange
    // reuse cannot share a subplan that one branch aggregates further —
    // without this the scan + explode + (doc, term) aggregate run twice
    val tf = termRows(df, idCol, textCol)
      .groupBy(col("_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    // df counts DOCUMENTS containing the term: tf is already one row per
    // (doc, term), so a plain count per term needs no second distinct
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_id").as(idCol), col("rank"), col("term"), col("tf"),
        col("tfidf"))
  }

  /** CHI-SQUARE discriminative terms per class — supervised feature
    * selection over the corpus ([[tfidfTopTerms]] ranks terms
    * unsupervised within a doc; this asks which terms SEPARATE a
    * labeled slice from the rest — label-leakage audits, slice
    * fingerprints, classifier feature screens; the
    * [[graft.analytics.Profiler]] Cramér's V machinery specialized to
    * per-term 2×2 tables): for each (class c, term t), the 2×2
    * document-presence contingency a = df_tc, b = df_t − a,
    * c' = N_c − a, d = N − N_c − b scores
    * χ² = N·(ad − bc)² / (df_t·(N−df_t)·N_c·(N−N_c)); top-`k` terms
    * per class by (χ² desc, term asc). Returns (class, rank, term,
    * `df_in_class`, `df_total`, `chi2` rounded at 6). Terms present
    * in EVERY doc and classes covering every doc drop (a zero margin —
    * nothing to discriminate); NULL-class docs drop.
    *
    * Determinism: every contingency cell is an exact integer; χ² is
    * one pinned-order double expression (the [[graft.analytics]]
    * convention), rounded BEFORE ranking so ties break on term asc
    * identically in any engine.
    *
    * Scale: per-doc tokens de-duplicate IN-ARRAY (`array_distinct`
    * before the explode — no (doc, term) distinct shuffle), one
    * (class, term) hash aggregate, a vocab-sized term-total
    * aggregate + hash join back, and a class-count broadcast; the
    * top-k window partitions on class over the vocab-sized score
    * table. */
  def chiSquareTerms(df: DataFrame, idCol: String, classCol: String,
      textCol: String, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val labeled = df.filter(col(classCol).isNotNull)
    val dt = labeled
      .select(col(classCol).cast("string").as("_c"),
        explode(array_distinct(
          split(TextOps.normalize(col(textCol)), " "))).as("term"))
      .filter(length(col("term")) > 0)
    val a = dt.groupBy(col("_c"), col("term"))
      .agg(count(lit(1)).as("_a"))
      .localCheckpoint(eager = false) // feeds term totals AND the join
    val dfreq = a.groupBy(col("term")).agg(sum(col("_a")).as("_dft"))
    val nc = labeled.groupBy(col(classCol).cast("string").as("_c"))
      .agg(count(lit(1)).as("_nc"))
    val nn = labeled.agg(count(lit(1)).as("_n"))
    def d(c: Column) = c.cast("double")
    val e = d(col("_a")) * d(col("_n") - col("_nc") -
        (col("_dft") - col("_a"))) -
      d(col("_dft") - col("_a")) * d(col("_nc") - col("_a"))
    val chi2 = round(d(col("_n")) * e * e /
      (d(col("_dft")) * d(col("_n") - col("_dft")) *
        d(col("_nc")) * d(col("_n") - col("_nc"))), 6)
    val w = Window.partitionBy(col("_c"))
      .orderBy(col("chi2").desc, col("term").asc)
    a.join(dfreq, Seq("term"))
      .join(broadcast(nc), Seq("_c"))
      .crossJoin(broadcast(nn))
      .filter(col("_dft") < col("_n") && col("_nc") < col("_n"))
      .withColumn("chi2", chi2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_c").as(classCol), col("rank"), col("term"),
        col("_a").as("df_in_class"), col("_dft").as("df_total"),
        col("chi2"))
  }

  /** Hashing-trick term-frequency features (Weinberger et al. 2009 —
    * feature hashing; the HashingTF vectorizer): each token maps to
    * `bucket = H(term) mod numFeatures` with a ±1 sign from an
    * independent hash bit, so colliding terms cancel in expectation
    * instead of biasing the bucket upward. H = first 8 hex digits of
    * md5 and sign = parity of the 9th (the stable-split/shard hash
    * discipline: engine-portable, no seed state), so any engine
    * reproduces the exact features. Entries whose signed counts cancel
    * to 0 are dropped — sparse storage must not hold zeros. Returns one
    * row per (id, feature, weight).
    *
    * Scale: this is the vectorizer that needs NO global vocabulary
    * state — explode → (doc, bucket)-keyed hash aggregate, map-side
    * combined, per-doc output bounded by min(distinct tokens,
    * numFeatures); nothing joins, nothing broadcasts, nothing trains —
    * which is exactly why hashing features replace dictionary features
    * at corpus scale. */
  def hashingTf(df: DataFrame, idCol: String, textCol: String,
      numFeatures: Int = 1024): DataFrame = {
    require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")
    val hex = md5(col("term"))
    val bucket = conv(substring(hex, 1, 8), 16, 10).cast("long") % numFeatures
    val sign = when(
      conv(substring(hex, 9, 1), 16, 10).cast("int") % 2 === 0, 1L)
      .otherwise(-1L)
    termRows(df, idCol, textCol)
      .groupBy(col("_id"), bucket.cast("int").as("feature"))
      .agg(sum(sign).as("weight"))
      .filter(col("weight") =!= 0L)
      .select(col("_id").as(idCol), col("feature"), col("weight"))
  }

  /** DSIR importance weights (Xie et al. 2023 — Data Selection via
    * Importance Resampling): score every document by how much more likely
    * its hashed-unigram bag is under the TARGET domain's distribution than
    * under the raw corpus's, `logw = Σ_b n_b · (ln p_b − ln q_b)` with
    * add-α smoothing over `numFeatures` hash buckets. Resampling raw data
    * with weights ∝ exp(logw) shifts it toward the target domain — the
    * published recipe for "make my crawl look like Wikipedia". Buckets use
    * the [[hashingTf]] engine-portable md5 hash (no signs: DSIR models
    * counts, not signed features), so any engine reproduces the weights
    * exactly. Returns (id, n_tokens, logw); target docs score themselves
    * too (useful as a calibration band).
    *
    * Scale: this is why DSIR beats classifier-based selection at corpus
    * scale — the "model" is two B-bucket count tables. One
    * (doc, bucket)-keyed hash aggregate over the token explode, a
    * B-row aggregate from it, then a broadcast join back; nothing
    * data-sized shuffles twice, nothing trains. Decimal-cast sums keep
    * the per-doc total independent of partial-aggregate merge order. */
  def dsirLogWeights(df: DataFrame, idCol: String, textCol: String,
      target: Column, numFeatures: Int = 256, alpha: Double = 1.0)
      : DataFrame = {
    require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val hex = md5(col("term"))
    val bucket = (conv(substring(hex, 1, 8), 16, 10).cast("long")
      % numFeatures).cast("int")
    // the (doc, bucket) count frame feeds both distribution estimates and
    // the per-doc score — materialize it once (lazy localCheckpoint, the
    // unigramLogProb discipline) instead of re-exploding the corpus
    val db = df.select(col(idCol).as("_id"), target.as("_tgt"),
        explode(split(TextOps.normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("_id"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), max(col("_tgt")).as("_tgt"))
      .localCheckpoint(false)
    val bt = db.groupBy(col("bucket"))
      .agg(sum(when(col("_tgt"), col("n")).otherwise(0L)).as("ct"),
        sum(col("n")).as("cr"))
    val tot = bt.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val aB = alpha * numFeatures
    db.join(broadcast(bt), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .withColumn("_llr", col("n").cast("double") *
        (log((col("ct").cast("double") + alpha) /
            (col("tt").cast("double") + aB)) -
          log((col("cr").cast("double") + alpha) /
            (col("tr").cast("double") + aB))))
      .groupBy(col("_id"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("_llr").cast("decimal(28,12)")).cast("double").as("logw"))
      .select(col("_id").as(idCol), col("n_tokens"), col("logw"))
  }

  /** Per-document mean token log-probability under the corpus's own
    * unigram language model — the KenLM-style fluency/perplexity signal
    * scored against the corpus itself (every token has nonzero count by
    * construction, so no smoothing term). Returns
    * (id, n_tokens, logprob = Σ ln(c_t / T) / n) where c_t is the corpus
    * count of token t and T the corpus token total; exp(−logprob) is the
    * per-token perplexity. Out-of-band LMs plug in by substituting any
    * (term, c) table for the self-counts.
    *
    * Scale: the token→count join is term-keyed against the vocabulary
    * (build side ≪ corpus; broadcast when it fits), T rides one aggregated
    * row, and the per-doc mean is a doc-keyed hash aggregate — three
    * map-side-combined exchanges, none proportional to token count. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // everything derives from the (doc, term) count frame: corpus term
    // counts and the total are sums of tf, and the per-doc mean is the
    // tf-weighted mean Σ tf·ln(p) / Σ tf — so one materialized aggregate
    // (lazy localCheckpoint) replaces two passes over the token explode,
    // and the join carries |doc × distinct-term| rows instead of one per
    // token occurrence
    val tf = termRows(df, idCol, textCol)
      .groupBy(col("_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val counts = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    val total = counts.agg(sum(col("c")).as("t_total"))
    // per-row terms are cast to decimal BEFORE summing (the q_stats_agg
    // discipline): decimal sums are exact and therefore independent of the
    // partial-aggregate merge order, where a raw double sum could flip a
    // round(.,6) boundary between runs (or against the oracle's own order)
    tf.join(counts, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col("_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        (sum((col("tf").cast("double") *
            log(col("c").cast("double") / col("t_total").cast("double")))
            .cast("decimal(28,12)")).cast("double") /
          sum(col("tf")).cast("double")).as("logprob"))
      .select(col("_id").as(idCol), col("n_tokens"), col("logprob"))
  }

  /** Bigram-LM fluency scoring: per-document mean log CONDITIONAL
    * probability ln(c(wᵢ₋₁wᵢ)/c(wᵢ₋₁·)) under corpus self-counts — the
    * order-sensitive upgrade of [[unigramLogProb]] (a bag of frequent
    * words scores high there; only frequent words in their usual ORDER
    * score high here). Denominator is the bigram-PREFIX count (occurrences
    * of wᵢ₋₁ in non-final position), so probabilities condition correctly
    * and Σ p(·|w) = 1. Self-scoring needs no smoothing: every scored
    * bigram is in the counts (≥1). Docs with <2 tokens have no bigrams and
    * drop, mirroring the unigram treatment of empty docs.
    * Returns (id, n_bigrams, logprob).
    *
    * Scale: bigrams form INSIDE the row (an index-transform over the token
    * array — no posexplode+window, zero extra shuffle); from there the
    * shape is [[unigramLogProb]]'s — a (doc, bigram) count frame feeding
    * bigram-keyed joins against the two count tables (both ≪ corpus;
    * broadcast when they fit) and a doc-keyed mean. Decimal-cast sums keep
    * the result independent of partial-aggregate merge order. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = filter(split(TextOps.normalize(col(textCol)), " "),
      t => length(t) > 0)
    val tf = df.select(col(idCol).as("_id"), toks.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("_id"), explode(pairsOf(col("_t"))).as("bg"))
      .select(col("_id"), col("bg.prev").as("prev"),
        col("bg.bigram").as("bigram"))
      .groupBy(col("_id"), col("prev"), col("bigram"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val cb = tf.groupBy(col("bigram")).agg(sum(col("tf")).as("cb"))
    val cp = tf.groupBy(col("prev")).agg(sum(col("tf")).as("cp"))
    tf.join(cb, Seq("bigram")).join(cp, Seq("prev"))
      .groupBy(col("_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        (sum((col("tf").cast("double") *
            log(col("cb").cast("double") / col("cp").cast("double")))
            .cast("decimal(28,12)")).cast("double") /
          sum(col("tf")).cast("double")).as("logprob"))
      .select(col("_id").as(idCol), col("n_bigrams"), col("logprob"))
  }

  /** Adjacent (prev, "prev cur") pairs of a token array, formed in-row. */
  private def pairsOf(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => struct(element_at(toks, i).as("prev"),
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))
          .as("bigram")))

  /** COLLOCATIONS by Dunning's log-likelihood ratio G² — the
    * corpus-linguistics keyphrase extractor ([[tfidfTopTerms]] ranks
    * single terms; this finds PAIRS that co-occur far more than their
    * unigram rates predict — "new york", "machine learning" — the
    * phrase-vocabulary step before tokenizer training; Dunning 1993's
    * G² is the standard because it stays calibrated at low counts
    * where PMI explodes): per adjacent bigram (a, b) the 2×2
    * bigram-token contingency {O₁₁ = c(ab), O₁₂ = c(a·)−O₁₁,
    * O₂₁ = c(·b)−O₁₁, O₂₂ = n−c(a·)−c(·b)+O₁₁} scores
    * G² = 2·Σ O·ln(O/E) (zero cells contribute 0; their E is then
    * also 0 by the margin identity). Top-`k` bigrams with
    * c(ab) ≥ `minCount`, ties (G² desc, w1 asc, w2 asc). Returns
    * (`rank`, `w1`, `w2`, `n_ab`, `n_a`, `n_b`, `g2` rounded at 6).
    *
    * Determinism: all counts exact; G² is one pinned-order double
    * chain (left-associated cell sum, single ln per cell), rounded
    * BEFORE ranking.
    *
    * Scale: one bigram hash aggregate (data-sized input, bigram-vocab
    * output) + two vocab-sized margin aggregates joined back by
    * first/second word + a 1-row total broadcast; top-k plans as
    * TakeOrderedAndProject, then the rank window runs over ≤ k
    * rows. */
  def collocations(df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minCount: Long = 5L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val toks = filter(split(TextOps.normalize(col(textCol)), " "),
      t => length(t) > 0)
    val bg = df.select(toks.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("_t")) - 1),
        i => struct(element_at(col("_t"), i).as("w1"),
          element_at(col("_t"), i + 1).as("w2")))).as("_p"))
      .select(col("_p.w1"), col("_p.w2"))
    val cab = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(eager = false) // feeds both margins AND the join
    val ca = cab.groupBy(col("w1")).agg(sum(col("n_ab")).as("n_a"))
    val cbn = cab.groupBy(col("w2")).agg(sum(col("n_ab")).as("n_b"))
    val tot = broadcast(cab.agg(sum(col("n_ab")).as("_n")))
    def d(c: Column) = c.cast("double")
    def cell(o: Column, e: Column) =
      when(o > 0L, d(o) * log(d(o) / e)).otherwise(lit(0.0))
    val scored = cab.filter(col("n_ab") >= minCount)
      .join(ca, Seq("w1")).join(cbn, Seq("w2")).crossJoin(tot)
      .withColumn("g2", {
        val (o11, nn) = (col("n_ab"), col("_n"))
        val o12 = col("n_a") - o11
        val o21 = col("n_b") - o11
        val o22 = nn - col("n_a") - col("n_b") + o11
        val (pa, pb) = (d(col("n_a")), d(col("n_b")))
        val t11 = cell(o11, pa * pb / d(nn))
        val t12 = cell(o12, pa * (d(nn) - pb) / d(nn))
        val t21 = cell(o21, (d(nn) - pa) * pb / d(nn))
        val t22 = cell(o22, (d(nn) - pa) * (d(nn) - pb) / d(nn))
        round(lit(2.0) * (t11 + t12 + t21 + t22), 6)
      })
      .orderBy(col("g2").desc, col("w1").asc, col("w2").asc)
      .limit(k)
    // rank window over the <= k head only, never the candidate table
    val w = Window.orderBy(col("g2").desc, col("w1").asc, col("w2").asc)
    scored.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("w1"), col("w2"), col("n_ab"),
        col("n_a"), col("n_b"), col("g2"))
  }

  /** Tokenize-to-ids: encode each document as an array of integer token
    * ids under a vocabulary table — the encode step between curation and
    * packing. Ids are assigned by vocabulary rank (tf desc, term asc —
    * deterministic and engine-reproducible), 1-based; out-of-vocabulary
    * tokens map to `unkId` (0). Returns (id, token_ids, n_unk).
    *
    * @param vocab (term, id) table, e.g. [[vocabularyTopK]] ranked — any
    *   mapping works as long as ids are unique per term
    *
    * Scale: explode tokens with position → term-keyed join against the
    * vocabulary (build side ≪ corpus: broadcast when it fits) → doc-keyed
    * reassembly. The reassembly sorts each doc's (pos, id) structs INSIDE
    * the row (`array_sort` after `collect_list`) rather than relying on
    * collect order, so the result is deterministic under any shuffle
    * schedule. */
  def tokenizeIds(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, unkId: Int = 0): DataFrame = {
    val toks = df.select(col(idCol).as("_id"),
        posexplode(split(TextOps.normalize(col(textCol)), " "))
          .as(Seq("_pos", "term")))
      .filter(length(col("term")) > 0)
    val encoded = toks
      .join(broadcast(vocab.select(col("term"), col("id").as("_tid"))),
        Seq("term"), "left")
      .withColumn("_tid", coalesce(col("_tid"), lit(unkId)))
      .groupBy(col("_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("_pos"), col("_tid")))),
          s => s.getField("_tid")).as("token_ids"),
        sum(when(col("_tid") === unkId, 1L).otherwise(0L)).as("n_unk"))
    // a doc whose text normalizes to zero tokens must still come out
    // (token_ids = [], n_unk = 0) — the encode step cannot silently
    // shrink the corpus it hands to packing
    df.select(col(idCol)).join(encoded,
        df(idCol) === encoded("_id"), "left")
      .select(col(idCol),
        coalesce(col("token_ids"),
          array().cast("array<int>")).as("token_ids"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"))
  }

  /** [[vocabularyTopK]] with rank ids attached — the (term, id) shape
    * [[tokenizeIds]] consumes. Rank 1 = most frequent. */
  def rankedVocabulary(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val w = Window.orderBy(col("tf").desc, col("term").asc)
    // the window is global but runs over the top-k HEAD only (<= k rows
    // after the TakeOrderedAndProject), never the corpus
    vocabularyTopK(df, idCol, textCol, k)
      .withColumn("id", row_number().over(w))
      .select(col("term"), col("id"), col("tf"), col("df"))
  }

  /** Per-stratum corpus profile — the reporting pass a curation pipeline
    * runs before and after mixing: document count, token total, distinct
    * languages, and mean quality score per source. One stratum-keyed hash
    * aggregate (map-side combined; ~#sources output rows), with the
    * quality components evaluated once per row in the pre-aggregation
    * projection (the Curation discipline). */
  def sourceProfile(df: DataFrame, strataCol: String, textCol: String,
      langCol: String): DataFrame = {
    val txt = col(textCol)
    df.select(col(strataCol), col(langCol),
        size(TextOps.tokens(txt)).cast("long").as("_nt"),
        length(txt).cast("double").as("_nc"),
        TextOps.stopwordRatio(txt).as("_sw"),
        TextOps.punctRatio(txt).as("_punct"),
        TextOps.meanWordLen(txt).as("_mwl"))
      .withColumn("_q", TextOps.qualityFromComponents(
        col("_nc"), col("_sw"), col("_punct"), col("_mwl")))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("n_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        // decimal-cast summation: exact ⇒ merge-order-independent (the
        // q_stats_agg discipline; quality is a sum of 0.1-multiples, far
        // from any decimal(.,12) rounding boundary)
        (sum(col("_q").cast("decimal(18,12)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_quality"))
  }

  /** Logistic quality classifier: σ(w · features) over the interpretable
    * per-document signals (stopword ratio, punctuation ratio, mean word
    * length, ln chars, trigram repetition) — the fastText-style
    * quality-classifier scoring pass of a curation pipeline, with the
    * model reduced to its scoring semantics (fixed published weights; a
    * trained model swaps in the same shape). Pure column arithmetic over
    * [[TextOps]] components: narrow, codegen'd, zero corpus passes.
    *
    * @param weights (bias, wStopword, wPunct, wMeanWordLen, wLnChars,
    *                wRepetition) */
  def logisticQuality(text: Column,
      weights: (Double, Double, Double, Double, Double, Double)
        = DefaultQualityWeights): Column = {
    val (b, wSw, wPunct, wMwl, wLen, wRep) = weights
    val z = lit(b) +
      lit(wSw) * TextOps.stopwordRatio(text) +
      lit(wPunct) * TextOps.punctRatio(text) +
      lit(wMwl) * TextOps.meanWordLen(text) +
      lit(wLen) * log(length(text).cast("double")) +
      lit(wRep) * TextOps.repetitionScore(text, 3)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Hand-set weights encoding the C4/Gopher heuristics as a smooth score:
    * stopword presence and word-length sanity up, punctuation soup and
    * n-gram repetition down, mild length reward. */
  val DefaultQualityWeights: (Double, Double, Double, Double, Double, Double) =
    (-2.0, 6.0, -4.0, 0.15, 0.25, -3.0)

  /** Pairwise Jensen–Shannon divergence between the per-`strataCol`
    * unigram token distributions — the domain-similarity matrix of a
    * corpus ("how different is src2 from src0?"), the signal behind
    * mixing decisions and domain-shift monitoring. JS(a,b) ∈ [0, ln 2];
    * symmetric; 0 = identical distributions. Returns one row per
    * unordered pair (stratum_a < stratum_b, js).
    *
    * The shared-mass decomposition keeps this ONE inner self-join:
    * `JS = ½·Σ_shared [p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
    *      + ½·ln2·(onlyA + onlyB)` where onlyA = 1 − Σ_shared p — terms
    * present in only one stratum never need a row (an outer join would
    * manufacture vocabulary × strata² null rows just to read zeros).
    *
    * Scale: one (stratum, term) aggregate (map-side combined), totals
    * per stratum broadcast back, a term-keyed self-join whose fan-out is
    * ≤ #strata per term, and a #strata²-row result. Decimal-cast sums ⇒
    * merge-order-independent, engine-exact. */
  def sourceDivergence(df: DataFrame, strataCol: String,
      textCol: String): DataFrame = {
    val rows = df.select(col(strataCol).as("_s"),
        explode(split(TextOps.normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("_s"), col("term")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // feeds totals AND both join sides
    val totals = rows.groupBy(col("_s")).agg(sum(col("c")).as("t"))
    val p = rows.join(broadcast(totals), Seq("_s"))
      .select(col("_s"), col("term"),
        (col("c").cast("double") / col("t").cast("double")).as("p"))
    val a = p.select(col("_s").as("sa"), col("term"), col("p").as("pa"))
    val b = p.select(col("_s").as("sb"), col("term"), col("p").as("pb"))
    val shared = a.join(b, Seq("term")).filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(
        sum((col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb")))
          + col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))))
          .cast("decimal(28,12)")).cast("double").as("_shared"),
        sum(col("pa").cast("decimal(28,12)")).cast("double").as("_ma"),
        sum(col("pb").cast("decimal(28,12)")).cast("double").as("_mb"))
    // every unordered pair must come out — a FULLY disjoint pair has no
    // shared rows at all (JS = ln 2), so the pair list comes from the
    // tiny strata-distinct frame and the shared aggregate left-joins in
    val strata = totals.select(col("_s"))
    val pairs = strata.select(col("_s").as("sa"))
      .crossJoin(strata.select(col("_s").as("sb")))
      .filter(col("sa") < col("sb"))
    pairs.join(shared, Seq("sa", "sb"), "left")
      .select(col("sa").as("stratum_a"), col("sb").as("stratum_b"),
        (lit(0.5) * coalesce(col("_shared"), lit(0.0))
          + lit(0.5 * math.log(2.0)) *
            ((lit(1.0) - coalesce(col("_ma"), lit(0.0)))
              + (lit(1.0) - coalesce(col("_mb"), lit(0.0)))))
          .as("js"))
  }

  /** BM25 keyword search: top-`k` documents per query under the
    * Robertson–Spärck Jones BM25 ranking function — the retrieval
    * primitive of targeted-subset selection ("pull the docs about X into
    * the mix") and of quality probing. Per matched term,
    * `idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with the
    * always-positive idf `ln(1 + (N − df + 0.5)/(df + 0.5))`; the
    * document score is the sum over the query's distinct terms.
    * Out-of-vocabulary query terms contribute nothing (inner join against
    * the corpus vocabulary). N/avgdl are over documents with ≥1 token
    * (empty docs can never match and would only dilute avgdl).
    * Returns (query_id, rank, doc_id-as-`idCol`, score), rank by
    * (score desc, doc asc) — deterministic: per-term scores are pure
    * double arithmetic over integers, and the per-doc sum is decimal-cast
    * per term (exact ⇒ merge-order-independent), ranked on the DECIMAL.
    *
    * Scale: tf is the (doc, term)-keyed hash aggregate every operator
    * here shares (materialized once — it feeds dl, df, AND the match);
    * query terms broadcast (a query set is human-sized); df joins
    * term-keyed (vocabulary ≪ corpus, AQE broadcasts when it fits); dl
    * joins doc-keyed — the one corpus-sized exchange. Top-k per query
    * NEVER windows on the raw (low-cardinality!) query id: matched docs
    * first thin through a (query, shard)-keyed WindowGroupLimit (top-k
    * per 32 hash shards), then the ≤ 32·k survivors per query take the
    * final rank — the q_pack/stratified sharding lesson applied to
    * retrieval. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      shards: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val tf = termRows(df, idCol, textCol)
      .groupBy(col("_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    // dl / n_docs / avgdl are corpus-wide BY DEFINITION (document length
    // counts every token); df is only ever read for the query's terms,
    // so restrict tf by the broadcast term set FIRST — the df aggregate
    // then runs over the matched slice instead of the whole vocabulary,
    // and the df join is guaranteed-broadcastable
    val dl = tf.groupBy(col("_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val qterms = queries
      .select(col(queryIdCol).as("_qid"),
        explode(split(TextOps.normalize(col(queryTextCol)), " "))
          .as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .localCheckpoint(false) // feeds the term filter AND the qid join
    val tfQ = tf.join(broadcast(qterms.select(col("term")).distinct()),
      Seq("term"))
    val dfreq = tfQ.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfD = col("tf").cast("double")
    val termScore = idf * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = tfQ.join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("_qid"), col("_id"))
      .agg(sum(termScore.cast("decimal(28,12)")).as("_s"))
    val wShard = Window
      .partitionBy(col("_qid"), pmod(xxhash64(col("_id")), lit(shards)))
      .orderBy(col("_s").desc, col("_id").asc)
    val wFinal = Window.partitionBy(col("_qid"))
      .orderBy(col("_s").desc, col("_id").asc)
    scored
      .withColumn("_sr", row_number().over(wShard))
      .filter(col("_sr") <= k)
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("_qid").as(queryIdCol), col("rank"),
        col("_id").as(idCol), col("_s").cast("double").as("score"))
  }

  /** DISTINCT-N DIVERSITY per group — the lexical-diversity readout of
    * generated-text and corpus-mix evals (a mode-collapsed generator or
    * boilerplate-heavy source scores low): per `groupCols` stratum,
    * distinct-1 = |unique tokens|/|tokens| and distinct-2 = |unique
    * bigrams|/|bigrams| over the NORMALIZED text, as exact floored
    * micros. One row per group: (`groupCols…`, `n_tokens`,
    * `distinct_1_x1e6`, `n_bigrams`, `distinct_2_x1e6`); a group whose
    * docs are all single-token has 0 bigrams and NULL distinct-2.
    *
    * Shape: one token explode + one bigram explode (a higher-order
    * `transform` over the already-split array — no self-join), each
    * feeding a (group, term)-keyed distinct + group aggregate with
    * map-side combine; stopword-class skew collapses in the partial
    * phase (the [[vocabulary]] argument). */
  def distinctNgrams(df: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "distinctNgrams needs at least one group column")
    val gc = groupCols.map(c => col(s"`$c`"))
    val toks = df
      .select(gc :+ split(TextOps.normalize(col(s"`$textCol`")), " ")
        .as("_t"): _*)
      .withColumn("_t", expr("filter(_t, x -> length(x) > 0)"))
    val uni = toks.select(gc :+ explode(col("_t")).as("_term"): _*)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("_term")).as("_d1"))
    val bi = toks.filter(size(col("_t")) >= 2)
      .select(gc :+ explode(expr(
        "transform(sequence(0, size(_t) - 2), " +
          "i -> concat(_t[i], ' ', _t[i + 1]))")).as("_term"): _*)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("_term")).as("_d2"))
    val ldiv = graft.ops.Fixed.ldiv _
    // null-safe group equality: a plain key join would drop the
    // NULL-group row's bigram stats (the tCloseness hazard)
    val biR = groupCols.foldLeft(bi)((d, c) =>
      d.withColumnRenamed(c, s"_bi_$c"))
    val joinCond = groupCols.map(c =>
      col(s"`$c`") <=> col(s"`_bi_$c`")).reduce(_ && _)
    uni.join(biR, joinCond, "left")
      .select(gc ++ Seq(col("n_tokens"),
        ldiv(col("_d1") * lit(1000000L), col("n_tokens"))
          .as("distinct_1_x1e6"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0,
          ldiv(col("_d2") * lit(1000000L), col("n_bigrams")))
          .as("distinct_2_x1e6")): _*)
  }

  /** HEAPS' LAW vocabulary-growth fit — the corpus-scaling twin of the
    * Zipf rank fit (Zipf reads the frequency head; Heaps asks how the
    * DISTINCT vocabulary V grows with corpus size T — V ≈ K·T^β,
    * β ≈ 0.4-0.6 for natural text, near 1 for templated/ID-heavy
    * corpora, so the fitted slope is a provenance fingerprint and a
    * tokenizer-vocab capacity planner). Docs order by `idCol`; the
    * corpus splits into `checkpoints` equal-rank prefixes; each
    * checkpoint contributes (ln cumulative tokens, ln cumulative
    * distinct terms) and the output is [[Regression.olsByGroup]]'s one
    * row — `slope` IS β, `intercept` is ln K — on the 'corpus' literal
    * group. Checkpoints with zero tokens or vocabulary drop (ln
    * undefined); the ln-micro quantization is the q_zipf posture.
    *
    * Shape: one skew-safe global rank over docs
    * ([[graft.ops.Rank.groupedRank]] — a range exchange, never a
    * single-task window), a term-keyed min-doc aggregate, one
    * vocabulary-sized equi-join back to doc ranks, and ≤`checkpoints`-
    * row cumulative windows (literal-bounded — the grid argument). */
  def heapsLaw(df: DataFrame, idCol: String, textCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 3,
      s"checkpoints must be >= 3 for a meaningful fit, got $checkpoints")
    val k = checkpoints.toLong
    val norm = TextOps.normalize(col(textCol))
    val docs = df.select(col(idCol).as("_id"),
      when(norm === "", lit(0L))
        .otherwise(size(split(norm, " ")).cast("long")).as("_nt"))
    val ranked = graft.ops.Rank.groupedRank(
      docs.withColumn("_g", lit(1)), Seq("_g"), Seq(col("_id").asc),
      "_r", countCol = Some("_cd"))
    // checkpoint bucket = ceil(k·rank/D) ∈ 1..k (positive operands:
    // ceil(a/b) = (a + b − 1) div b)
    val bucketed = ranked.select(col("_id"), col("_nt"),
      graft.ops.Fixed.ldiv(
        col("_r") * lit(k) + col("_cd") - lit(1L), col("_cd")).as("_k"))
    val docCum = bucketed.groupBy(col("_k"))
      .agg(sum(col("_nt")).as("_tk"))
    val firstDoc = termRows(df, idCol, textCol)
      .groupBy(col("term")).agg(min(col("_id")).as("_id"))
      .join(bucketed.select(col("_id"), col("_k").as("_fk")), Seq("_id"))
      .groupBy(col("_fk")).agg(count(lit(1)).as("_nv"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val pts = docCum
      .join(firstDoc.withColumnRenamed("_fk", "_k"), Seq("_k"), "left")
      .select(col("_k"), sum(col("_tk")).over(w).as("_tokens"),
        sum(coalesce(col("_nv"), lit(0L))).over(w).as("_vocab"))
      .filter(col("_tokens") > 0L && col("_vocab") > 0L)
    graft.analytics.Regression.olsByGroup(
      pts.select(lit("corpus").as("corpus"),
        log(col("_tokens").cast("double")).as("ln_tokens"),
        log(col("_vocab").cast("double")).as("ln_vocab")),
      Seq("corpus"), "ln_tokens", "ln_vocab")
  }
}
