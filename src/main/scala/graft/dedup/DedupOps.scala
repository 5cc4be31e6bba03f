package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.HashExpressions
import graft.text.TextOps

/** Deduplication operators for LLM training-data pipelines: exact
  * (fingerprint groupBy), n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design (100 TB corpora):
  *  - exact dedup = ONE shuffle on a 128-bit fingerprint; the window
  *    rank-1 filter is rewritten by Spark to WindowGroupLimit, so each map
  *    partition forwards at most one row per fingerprint (partial-agg
  *    shape, skew-proof).
  *  - all-pairs Jaccard is quadratic and is NEVER run on the full corpus;
  *    the scalable path is [[minhashLsh]]: candidate generation via LSH
  *    band buckets (equi-join, linear in data + candidate count), exact
  *    re-verification only on candidates. Hot buckets (a shingle shared by
  *    every doc) are the skew risk — [[jaccardPairs]] caps per-shingle
  *    fan-out with a frequency filter, the standard positional-filtering
  *    trick from prefix-filter joins.
  *  - signatures are fixed-width arrays computed by higher-order
  *    expressions (no UDF), so signature generation is a narrow,
  *    codegen-friendly projection.
  */
object DedupOps {

  /** Word n-gram shingles of the normalized text (distinct set,
    * space-joined strings). Codegen'd
    * ([[graft.functions.HashExpressions.WordNGrams]]); output is
    * bit-identical to the `array_distinct(transform(...array_join(slice)))`
    * formulation mirrored by the DuckDB oracle. */
  def shingles(text: Column, n: Int = 3): Column =
    HashExpressions.wordNGrams(split(TextOps.normalize(text), " "), n)

  /** Materialize a derived frame ONCE per query (lazy localCheckpoint).
    *
    * Why: the shingle/signature frames below feed self-joins, so the same
    * regex-normalize + shingle pipeline appears under BOTH join branches;
    * worse, `InferFiltersFromGenerate` wraps each explode in
    * `size(e) > 0 AND isnotnull(e)` and predicate pushdown re-substitutes
    * the full expression into that filter — 3 evaluations per row per
    * branch of the most expensive projection in the query. Cutting the
    * lineage materializes the projection exactly once; every branch reads
    * the stored blocks. Unlike `persist()`, the blocks are owned by the
    * RDD (freed by the ContextCleaner when the plan is GC'd), not parked
    * forever in the session's CacheManager — safe inside a library
    * operator. At cluster scale this is the "write the working set to
    * executor storage before a multi-way self-join" pattern; the cost is
    * losing lineage-based recompute of lost blocks (rerun the job). */
  private def materialized(df: DataFrame): DataFrame =
    df.localCheckpoint(false)

  /** A5: exact dedup — keep, per fingerprint, the row with the smallest
    * `idCol`. One hash-shuffle on the fingerprint; WindowGroupLimit keeps
    * the exchange thin. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exactDedupByKey(df, TextOps.fingerprint(col(textCol)), idCol)

  /** [[exactDedup]] on an arbitrary precomputed key expression — lets a
    * composed pipeline ([[graft.llm.Curation]]) fingerprint an
    * already-normalized column instead of re-running the normalize regex. */
  def exactDedupByKey(df: DataFrame, key: Column, idCol: String): DataFrame = {
    val rn = Iterator.iterate("_fp_rn")(_ + "_")
      .dropWhile(df.columns.contains).next()
    val w = Window.partitionBy(key).orderBy(col(idCol).asc)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** All-pairs n-gram Jaccard similarity ≥ threshold — PPJoin-style
    * prefix-filtered inverted-index join (Chaudhuri et al. ICDE'06 /
    * Xiao et al. WWW'08), LOSSLESS for the given threshold:
    *
    *  1. per doc, the sorted distinct hashed shingle set `sh` (string
    *     shingles and their hashes have identical set cardinalities —
    *     the same collision-freeness every hash-based stage here relies
    *     on, validated against the string-shingle DuckDB oracle);
    *  2. index only each doc's PREFIX — its first
    *     |sh| − ⌈t·|sh|⌉ + 1 hashes under the global (ascending-hash)
    *     order. Two sets with Jaccard ≥ t MUST collide inside their
    *     prefixes, so candidate generation is exact while the inverted
    *     index (and the quadratic bucket blowup) shrinks by ~t;
    *  3. verify candidates with one codegen'd merge walk
    *     (IntersectCountSorted) over the full sets — no re-grouping of
    *     exploded rows, n_common computed directly.
    *
    * Scale: the exploded prefix index is the only wide structure; hot
    * shingles cap via `maxPrefixFreq`.
    *
    * @param maxPrefixFreq drop a shingle from the candidate index when it
    *   appears in MORE than this many document PREFIXES (not full
    *   documents — prefix entries are what drive the join fan-out, so the
    *   bound lands exactly on the quadratic term: one shingle shared by k
    *   prefixes yields k² candidate rows). This is stop-shingle removal, a
    *   deliberate approximation: capped output ⊆ exact output (property-
    *   tested), and only pairs whose ENTIRE prefix overlap is boilerplate
    *   can be lost. The finite default keeps corpus-scale runs safe from
    *   k² blowup on boilerplate (license headers, templated docs); pass
    *   `Int.MaxValue` for exact PPJoin semantics — `q_ngram_jaccard` does,
    *   and is oracle-checked against exact DuckDB Jaccard. For production
    *   near-dup at 100 TB prefer [[minhashLsh]], whose cost is bounded by
    *   design rather than by this knob.
    */
  /** Per-document N-GRAM NOVELTY against a reference corpus — the
    * memorization-risk / freshness metric: what fraction of a doc's
    * distinct word n-grams has the reference never seen? (novelty 0 =
    * fully covered, e.g. a near-copy of reference content; ≈10⁶ = all
    * new). The decontamination cousin turned into a continuous score:
    * decontamination asks "does a doc CONTAIN a benchmark", novelty
    * asks "how much of this doc is NEW relative to the last snapshot /
    * an earlier crawl / a license-risky corpus".
    *
    * Output per doc: `n_grams` (distinct shingles), `n_seen` (present
    * in the reference's shingle set), `novelty_x1e6` = exact
    * ((n_grams − n_seen)·10⁶) div n_grams.
    *
    * Scale: the doc side explodes to (doc, shingle) rows — the
    * inverted-index shape every dedup op here uses; the reference
    * collapses to its DISTINCT shingle set once; membership is one
    * shuffle-on-shingle LEFT SEMI join counted per doc. Nothing
    * quadratic, nothing driver-side; shingle normalization is the
    * shared codegen'd kernel, bit-identical to the DuckDB oracle. */
  def ngramNovelty(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val docGrams = materialized(docs.select(col(idCol).as("_id"),
      explode(shingles(col(textCol), n)).as("_g")))
    val refGrams = reference
      .select(explode(shingles(col(textCol), n)).as("_g")).distinct()
    val totals = docGrams.groupBy(col("_id"))
      .agg(count(lit(1)).as("n_grams"))
    val seen = docGrams.join(refGrams, Seq("_g"), "left_semi")
      .groupBy(col("_id")).agg(count(lit(1)).as("n_seen"))
    totals.join(seen, Seq("_id"), "left")
      .select(col("_id").as(idCol), col("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        graft.ops.Fixed.ldiv(
          (col("n_grams") - coalesce(col("n_seen"), lit(0L)))
            * lit(1000000L),
          col("n_grams")).as("novelty_x1e6"))
  }

  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.2,
      maxPrefixFreq: Int = 1000): DataFrame = {
    val sh = materialized(df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), n).as("sh")))
      .withColumn("n_sh", size(col("sh")))
    val prefixLen = (size(col("sh"))
      - ceil(lit(threshold) * size(col("sh"))).cast("int") + 1)
    val inv0 = sh.select(col("id"),
      explode(slice(col("sh"), lit(1), prefixLen)).as("shingle"))
    val inv =
      if (maxPrefixFreq == Int.MaxValue) inv0
      else {
        val hot = inv0.groupBy("shingle").count()
          .filter(col("count") > maxPrefixFreq).select("shingle")
        inv0.join(hot, Seq("shingle"), "left_anti")
      }
    val candIds = inv.select(col("id").as("id_a"), col("shingle"))
      .join(inv.select(col("id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    candIds
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("n_sh").as("n_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("n_common",
        HashExpressions.intersectCountSorted(col("sh_a"), col("sh_b"))
          .cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"), col("jaccard"))
  }

  /** Sorted distinct hashed word-n-gram set of the normalized text — the
    * set representation the minhash/verification kernels consume. Fully
    * codegen'd ([[graft.functions.HashExpressions.NGramHashes]]); the
    * string-shingle + interpreted-lambda formulation cost ~2.6 ms/doc and
    * was re-evaluated per reference by collapsed projections. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    HashExpressions.ngramHashes(split(TextOps.normalize(text), " "), n)

  /** MinHash signature: k permutation-min hashes over the hashed shingle
    * set, all codegen'd ([[graft.functions.HashExpressions.MinHashSig]]). */
  def minhashSignature(text: Column, n: Int = 3, k: Int = 32): Column =
    HashExpressions.minhashSig(shingleHashes(text, n), k)

  /** MinHash+LSH near-dup candidate pairs with exact-Jaccard
    * re-verification: signature → `bands` buckets of `rowsPerBand` hashes
    * → explode (id, bandIdx, bandHash) → self-join on the bucket →
    * distinct candidate pairs → exact Jaccard on just those pairs.
    *
    * Probability a pair with true Jaccard s becomes a candidate:
    * 1 − (1 − s^r)^b — the standard S-curve; defaults (b=8, r=4) put the
    * knee near s ≈ 0.6. At scale only the candidate set (≈ linear for a
    * sane threshold) ever materializes, never the n² pair space.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame =
    minhashLshFromShingles(
      df.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("sh")),
      "id", "sh", bands, rowsPerBand, threshold)

  /** [[minhashLsh]] over a PRECOMPUTED hashed-shingle-set column
    * ([[shingleHashes]] output). A composed pipeline that already built
    * the shingle sets for another stage (repetition scoring, capped
    * Jaccard) feeds them here and skips the normalize+shingle pass —
    * that pass is the dominant cost of the whole minhash stage. */
  def minhashLshFromShingles(df: DataFrame, idCol: String, shCol: String,
      bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val k = bands * rowsPerBand
    // hashed shingle set computed ONCE per doc; signature derives from it.
    // Banding carries only (id, band, band_hash) — no text through the
    // shuffle; candidates join back to the shingle sets by id.
    val sh = materialized(df.select(col(idCol).as("id"), col(shCol).as("sh"))
      .select(col("id"), col("sh"),
        HashExpressions.minhashSig(col("sh"), k).as("sig")))
    val banded = bandRowsFromSig(sh, bands, rowsPerBand)
    val candIds = banded.select(col("id").as("id_a"), col("band"),
      col("band_hash"))
      .join(banded.select(col("id").as("id_b"), col("band"),
        col("band_hash")), Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccard(candIds, sh.select(col("id"), col("sh")), threshold)
  }

  /** The LSH band rows (id, band, band_hash) for a frame carrying a
    * minhash `sig` column — the unit both the one-shot self-join above
    * and the PERSISTED band index of the incremental-gold suffix derive
    * candidates from: a pair is a candidate iff it shares a
    * (band, band_hash) bucket, a property of the two docs alone, so
    * candidates mined against an append-maintained index equal the ones
    * a full rebuild would mine (append ≡ rebuild, the lshAppendIndex
    * argument). The signature is computed INSIDE a materialized
    * projection by the caller: referenced from the banding lambda it
    * would otherwise be inlined by CollapseProject and re-evaluated once
    * per band (16x the k-hash sweep over the shingle set). */
  private def bandRowsFromSig(sh: DataFrame, bands: Int,
      rowsPerBand: Int, carry: Seq[String] = Nil): DataFrame =
    sh.select(col("id") +: carry.map(col) :+
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"),
          b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band", "band_hash")): _*)

  /** Public band-row derivation from a hashed-shingle frame: one row per
    * (doc, band) with the bucket hash — what the incremental-gold
    * pipeline persists per doc VERSION so signatures are computed once,
    * at ingest, never re-derived per publish. `carry` columns ride along
    * unchanged (the pipeline carries the version timestamp). */
  def minhashBandRows(df: DataFrame, idCol: String, shCol: String,
      bands: Int = 8, rowsPerBand: Int = 4,
      carry: Seq[String] = Nil): DataFrame = {
    val k = bands * rowsPerBand
    val sh = materialized(df
      .select(col(idCol).as("id") +: col(shCol).as("sh") +:
        carry.map(col): _*)
      .select(col("id") +: HashExpressions.minhashSig(col("sh"), k)
        .as("sig") +: carry.map(col): _*))
    bandRowsFromSig(sh, bands, rowsPerBand, carry)
  }

  /** Exact-Jaccard re-verification of a candidate id-pair set against the
    * docs' hashed shingle sets — the second half of [[minhashLshFromShingles]],
    * shared with the incremental-gold probe path (candidates there come
    * from the persisted band index, not a self-join). */
  def verifyJaccard(candIds: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame =
    candIds
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        HashExpressions.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Benchmark-contamination detection: containment of each PROBE
    * document's shingle set in each corpus document —
    * |sh(doc) ∩ sh(probe)| / |sh(probe)| — the decontamination primitive
    * of a training-data pipeline (drop or flag training docs that contain
    * an eval benchmark's text).
    *
    * Scale shape: benchmark suites are small (10⁴–10⁶ short probes), so
    * the probe shingle sets BROADCAST and the corpus streams through one
    * narrow pass — no shuffle of corpus bytes at all. The per-pair check
    * is the codegen'd sorted-merge intersect. For probe sets too big to
    * broadcast, fall back to the [[jaccardPairs]]-style inverted index on
    * the probe side only.
    *
    * Containment (not Jaccard) is deliberate: a 100-token benchmark
    * question buried in a 10k-token document has tiny Jaccard but
    * containment ≈ 1 — exactly the case decontamination must catch. */
  def containmentPairs(docs: DataFrame, probes: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame =
    containmentPairsImpl(docs, probes, idCol, textCol, n, threshold,
      excludeSameId = true)

  /** [[containmentPairs]] core. `excludeSameId = true` is the DETECTOR
    * form (probes are drawn from the corpus itself, e.g. q_contamination,
    * so a doc must not flag as containing itself); `false` is the
    * TRANSFORM form ([[decontaminate]]): probes are an external benchmark
    * whose ids carry no relationship to corpus ids, and an accidental id
    * collision must not mask a real contamination hit. */
  private def containmentPairsImpl(docs: DataFrame, probes: DataFrame,
      idCol: String, textCol: String, n: Int,
      threshold: Double, excludeSameId: Boolean): DataFrame =
    containmentPairsCore(
      docs.select(col(idCol).as("id_a"),
        shingleHashes(col(textCol), n).as("sh_a")),
      probes, idCol, textCol, n, threshold, excludeSameId)

  /** [[containmentPairsImpl]] with the CORPUS side's shingle sets already
    * materialized as (id_a, sh_a) — the seam [[decontaminateFromShingles]]
    * uses so an incremental pipeline never re-runs the normalize+shingle
    * text kernels over the full corpus. Probes still shingle from text:
    * they are an external benchmark (small, broadcast), not pipeline
    * output. */
  private def containmentPairsCore(d: DataFrame, probes: DataFrame,
      idCol: String, textCol: String, n: Int,
      threshold: Double, excludeSameId: Boolean): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0,1], got $threshold")
    val p = probes.select(col(idCol).as("id_b"),
      shingleHashes(col(textCol), n).as("sh_b"))
      .withColumn("n_b", size(col("sh_b")))
    val joined =
      if (excludeSameId) d.join(broadcast(p), col("id_a") =!= col("id_b"))
      else d.crossJoin(broadcast(p))
    joined
      .withColumn("n_common",
        HashExpressions.intersectCountSorted(col("sh_a"), col("sh_b"))
          .cast("long"))
      .withColumn("containment",
        col("n_common").cast("double") / col("n_b").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"), col("containment"))
  }

  /** Decontamination as a corpus transform: REMOVE every document whose
    * shingle containment of some probe (eval benchmark) meets the
    * threshold — [[containmentPairs]] composed with a left-anti join, the
    * form a pipeline actually runs (detection alone is reporting; this is
    * the curation stage). Returns the surviving rows of `docs` unchanged.
    *
    * Scale: detection broadcasts the probe shingle sets (one narrow
    * corpus pass); the anti-join keys on the id — only detected ids (≪
    * corpus) build the hash side. Unlike the detector, NO same-id guard
    * applies: probe ids carry no relationship to corpus ids here, and an
    * accidental collision must not mask a real contamination hit. */
  def decontaminate(docs: DataFrame, probes: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val contaminated = containmentPairsImpl(docs, probes, idCol, textCol, n,
      threshold, excludeSameId = false)
      .select(col("id_a").as(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** [[decontaminate]] consuming a PRE-COMPUTED hashed-shingle column
    * (`shCol`, the [[shingleHashes]] of the document text — what the
    * curation prefix persists as `_sh`): the corpus side skips the
    * normalize+shingle text kernels entirely, so a per-publish
    * decontamination pass over an incrementally-maintained prefix table
    * costs one broadcast probe join over already-hashed sets. Probes
    * shingle from `probeTextCol` as usual (external benchmark text). */
  def decontaminateFromShingles(docs: DataFrame, probes: DataFrame,
      idCol: String, shCol: String, probeTextCol: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val contaminated = containmentPairsCore(
      docs.select(col(idCol).as("id_a"), col(shCol).as("sh_a")),
      probes, idCol, probeTextCol, n, threshold, excludeSameId = false)
      .select(col("id_a").as(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** [[containmentPairs]] for probe sets too large to broadcast — the
    * PPJoin prefix trick adapted to CONTAINMENT: if |A∩B| ≥ t·|B| then A
    * must hit one of B's first ⌊(1−t)·|B|⌋+1 shingles under the global
    * ascending-hash order (missing all of them leaves fewer than t·|B|
    * matchable), so only probe PREFIXES are indexed and candidate
    * generation is an equi-join on the shingle — shuffle is
    * O(corpus postings hitting the index), never |docs|×|probes|.
    * Candidates re-verify with the exact merge-walk, so the output equals
    * [[containmentPairs]] exactly (spec-asserted). */
  def containmentPairsIndexed(docs: DataFrame, probes: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    // at threshold 0 every disjoint pair trivially qualifies but shares
    // no shingle to collide on — the prefix-filter equality with
    // containmentPairs holds only on (0,1], so enforce it
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0,1], got $threshold")
    val d = materialized(docs.select(col(idCol).as("id_a"),
      shingleHashes(col(textCol), n).as("sh_a")))
    val p = materialized(probes.select(col(idCol).as("id_b"),
      shingleHashes(col(textCol), n).as("sh_b")))
      .withColumn("n_b", size(col("sh_b")))
    val prefixLen = (size(col("sh_b"))
      - ceil(lit(threshold) * size(col("sh_b"))).cast("int") + 1)
    val probeIdx = p.select(col("id_b"),
      explode(slice(col("sh_b"), lit(1), prefixLen)).as("shingle"))
    val docPost = d.select(col("id_a"), explode(col("sh_a")).as("shingle"))
    val candIds = docPost.join(probeIdx, Seq("shingle"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    candIds
      .join(d, Seq("id_a"))
      .join(p.select(col("id_b"), col("sh_b"), col("n_b")), Seq("id_b"))
      .withColumn("n_common",
        HashExpressions.intersectCountSorted(col("sh_a"), col("sh_b"))
          .cast("long"))
      .withColumn("containment",
        col("n_common").cast("double") / col("n_b").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"), col("containment"))
  }

  /** Build a Bloom filter over a corpus's text fingerprints (keyed by
    * `xxhash64(fingerprint)` — 64-bit probes, zero-allocation
    * `mightContainLong` on the executor side). ONE pass over the history
    * with NO shuffle: Spark's sketch aggregation merges per-partition
    * filters on the driver. At 100 TB the filter is built once per corpus
    * snapshot and persisted (`BloomFilter.writeTo`/`readFrom`, ~1.2 GB at
    * 10⁹ items / 1% fpp) — pass the deserialized filter to
    * [[dedupAgainstBloom]] on every ingest batch. */
  def buildFingerprintBloom(history: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double = 0.01)
      : org.apache.spark.util.sketch.BloomFilter =
    history.select(
      xxhash64(TextOps.fingerprint(col(textCol))).as("_fph"))
      .stat.bloomFilter(col("_fph"), expectedItems, fpp)

  /** Persist a fingerprint Bloom filter (the `BloomFilter.writeTo` form
    * the build doc describes) — built once per corpus snapshot, loaded by
    * every subsequent ingest batch via [[readFingerprintBloom]]. Goes
    * through the Hadoop filesystem like every other persistence path in
    * the library, so `s3a://`/`hdfs://` snapshot locations work, not just
    * the driver's local disk. */
  def writeFingerprintBloom(bloom: org.apache.spark.util.sketch.BloomFilter,
      path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf())
    val out = fs.create(hp, true)
    try bloom.writeTo(out) finally out.close()
  }

  /** Load a [[writeFingerprintBloom]]-persisted filter. */
  def readFingerprintBloom(path: String)
      : org.apache.spark.util.sketch.BloomFilter = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf())
    val in = fs.open(hp)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
    finally in.close()
  }

  /** Incremental exact dedup of a NEW batch against a HISTORICAL corpus —
    * the operator an always-ingesting training-data pipeline actually
    * runs: "drop new documents whose (normalized) text already exists in
    * the 10⁹-document history" WITHOUT paying a batch×history shuffle.
    *
    *  1. batch rows whose fingerprint the Bloom filter rules out are
    *     emitted directly — at real ingest rates that is almost
    *     everything, and those rows NEVER shuffle;
    *  2. Bloom-positive rows (true matches + the fpp share of false
    *     positives) re-verify with an exact left-anti join against the
    *     history fingerprints, so the OUTPUT IS EXACT — the filter only
    *     prunes the join's left side, it never decides membership.
    *
    * Scale: the anti-join's left side shrinks from |batch| to
    * ≈ |true dups| + fpp·|batch|; the history side still hash-partitions
    * once, which is what bucketing the history table by fingerprint (or
    * persisting it pre-partitioned) amortizes across batches.
    *
    * Output: the batch rows that survive (original columns), exactly
    * equal to a plain anti-join on the fingerprint (spec-asserted, for
    * any fpp). In-batch duplicates are intentionally untouched — compose
    * with [[exactDedup]] for those. */
  def dedupAgainstHistory(batch: DataFrame, history: DataFrame,
      textCol: String, expectedHistoryItems: Long = 10000000L,
      fpp: Double = 0.01): DataFrame =
    dedupAgainstBloom(batch, history, textCol,
      buildFingerprintBloom(history, textCol, expectedHistoryItems, fpp))

  /** [[dedupAgainstHistory]] with a pre-built (typically persisted)
    * filter — the steady-state form at scale. */
  def dedupAgainstBloom(batch: DataFrame, history: DataFrame,
      textCol: String,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val fp = Iterator.iterate("_fp")(_ + "_")
      .dropWhile(c => batch.columns.contains(c)).next()
    val withFp = batch.withColumn(fp, TextOps.fingerprint(col(textCol)))
    val maybe = graft.functions.BloomMightContainLong(
      xxhash64(col(fp)), bloom)
    val novel = withFp.filter(!maybe)
    val hfp = history.select(TextOps.fingerprint(col(textCol)).as(fp))
    // the USING join moves the key column first — realign before the
    // positional union
    val verified = withFp.filter(maybe).join(hfp, Seq(fp), "left_anti")
      .select(withFp.columns.map(col).toIndexedSeq: _*)
    novel.union(verified).drop(fp)
  }

  /** Substring-level exact dedup (the ExactSubstr operator of
    * deduplicating-training-data practice, Lee et al. ACL'22): remove
    * every repeated ≥k-token span across (and within) documents, keeping
    * the span's FIRST occurrence in (doc id, position) order.
    *
    * Whole-document fingerprint dedup ([[exactDedup]]) misses the
    * dominant duplication mode of web corpora — boilerplate, quoted
    * passages, and templated fragments embedded in otherwise-distinct
    * documents. This removes exactly those spans:
    *
    *  1. explode each document's token k-grams with their 1-based start
    *     position, hashed (md5 — engine-portable, so the declared query is
    *     a full oracle row; same staging discipline as
    *     [[graft.text.TextOps.winnowFingerprints]]);
    *  2. one window over the gram hash keeps the first occurrence
    *     (`row_number` ordered by (id, pos)) and flags the rest. NOTE the
    *     `_rn > 1` complement filter is NOT a WindowGroupLimit rewrite
    *     (Spark only rewrites rank ≤ k), so the exchange carries every
    *     gram occurrence — O(tokens) shuffle, keyed on the gram hash
    *     (high cardinality, horizontal);
    *  3. flagged occurrences expand to their covered token positions
    *     ([pos, pos+k−1] — adjacent/overlapping repeats merge by the
    *     distinct union of intervals);
    *  4. covered tokens anti-join out; survivors rebuild the text in
    *     original order.
    *
    * Scale (100 TB): the gram table is the only wide structure — O(tokens)
    * rows keyed by a high-cardinality hash, so the dedup window shuffles
    * evenly (no hot keys beyond genuinely pandemic spans, which is the
    * data telling you the span IS boilerplate). Coverage expansion is
    * bounded by k × flagged occurrences; reconstruction groups by doc id.
    * No cartesian anywhere (PlanSpec-asserted).
    *
    * Returns one row per input row: (idCol, `dedup_text`, `n_tokens`,
    * `n_dropped`). A document whose every token is covered yields an
    * empty `dedup_text` (callers typically filter `n_dropped / n_tokens`).
    * Documents shorter than k tokens pass through untouched — they cannot
    * contain a k-token span.
    */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int = 50): DataFrame = {
    require(k >= 2, s"span length k must be >= 2, got $k")
    val base = materialized(df
      .select(col(idCol).as("id"), split(trim(col(textCol)), "\\s+").as("toks"))
      .withColumn("n", size(col("toks"))))
    // gram start positions are 1-based; md5 over the space-rejoined slice
    // matches DuckDB's md5(array_to_string(...)) byte-for-byte
    val grams = base.filter(col("n") >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), col("n") - (k - 1)),
        i => md5(concat_ws(" ", slice(col("toks"), i, lit(k))))))
        .as(Seq("gidx", "g")))
      .select(col("id"), (col("gidx") + 1).as("pos"), col("g"))
    val byGram = Window.partitionBy(col("g"))
      .orderBy(col("id").asc, col("pos").asc)
    val flagged = grams
      .withColumn("_rn", row_number().over(byGram))
      .filter(col("_rn") > 1)
      .select(col("id"), col("pos"))
    val covered = flagged
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tp"))
      .distinct()
    val tokens = base
      .select(col("id"), posexplode(col("toks")).as(Seq("tp0", "tok")))
      .select(col("id"), (col("tp0") + 1).as("tp"), col("tok"))
    val rebuilt = tokens.join(covered, Seq("id", "tp"), "left_anti")
      .groupBy("id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok")), " ").as("dedup_text"),
        count(lit(1)).as("n_kept"))
    base.select(col("id"), col("n"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"),
        col("n").cast("long").as("n_tokens"),
        (col("n") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_dropped"))
  }

  /** 64-bit SimHash over word unigrams: per bit b, sum +1/−1 by bit b of
    * each token's hash; bit b of the result = sign of the sum.
    * Near-dups = Hamming distance ≤ d on the signature ([[hammingDist]]).
    * Pure expressions (64 × |tokens| adds inside codegen).
    *
    * `tokenHash` picks the per-token hash family: `xxhash64` (default —
    * fastest, engine-internal) or [[HashExpressions.md5lo]] (DuckDB's
    * `md5_number_lower` bit-for-bit, which makes the whole signature —
    * and thus the near-dup pair set — reproducible outside this engine;
    * the declared `q_simhash_neardup` uses it so the driver can verify
    * the pairs against an exact SQL reimplementation). */
  def simhash(text: Column,
      tokenHash: Column => Column = xxhash64(_)): Column =
    HashExpressions.simhash64(
      transform(split(TextOps.normalize(text), " "), t => tokenHash(t)))

  /** Hamming distance between two 64-bit signatures. */
  def hammingDist(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. Quadratic
    * form for verification; the scale path blocks on signature bytes
    * (Manku et al., WWW'07: split 64 bits into maxDist+1 chunks — any
    * pair within distance d agrees exactly on ≥1 chunk) — same
    * explode-join shape as [[minhashLsh]]. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3,
      tokenHash: Column => Column = xxhash64(_)): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("id"),
        simhash(col(textCol), tokenHash).as("sig")),
      "id", "sig", maxDist)

  /** All (id_a < id_b) pairs of 64-bit signatures within Hamming
    * distance `maxDist` — the Manku blocking shared by SimHash text
    * near-dup and perceptual-hash image near-dup (any 64-bit
    * locality-preserving signature family): split the 64 bits into
    * maxDist+1 chunks; a pair within distance d must agree EXACTLY on
    * ≥ 1 chunk (pigeonhole), so candidates come from an equi-join on
    * (chunk, value) — the same explode-join shape as [[minhashLsh]],
    * never an all-pairs product. Candidates verify with the exact
    * popcount distance. */
  def hammingPairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 31,
      s"maxDist must be in [0, 31], got $maxDist")
    // ONE owner of the chunk layout (shared with the persisted index —
    // build/probe chunking drifting from this direct join would
    // silently lose recall): chunks = maxDist+1, width = 64/chunks,
    // width==64 masks to -1 because (1L << 64) wraps to 1
    val (chunks, width, mask) = hammingLayout(maxDist)
    val withSig = materialized(
      sigs.select(col(idCol).as("id"), col(sigCol).as("sig")))
    // blocking join + candidate dedup carry ONLY ids (minhashLsh
    // discipline): a pair colliding on several chunks would otherwise
    // ship its two 64-bit sigs once per collision through the distinct's
    // exchange; ids dedup first, sigs join back exactly once per side
    val blocked = withSig.select(col("id"),
      posexplode(hammingChunks(col("sig"), chunks, width, mask))
        .as(Seq("chunk", "chunk_val")))
    val candIds = blocked.select(col("id").as("id_a"), col("chunk"),
      col("chunk_val"))
      .join(blocked.select(col("id").as("id_b"), col("chunk"),
        col("chunk_val")), Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candIds
      .join(withSig.select(col("id").as("id_a"), col("sig").as("sig_a")),
        Seq("id_a"))
      .join(withSig.select(col("id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist(col("sig_a"), col("sig_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  // ---- persisted Hamming fingerprint index ----------------------------

  private def hammingLayout(maxDist: Int): (Int, Int, Long) = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    (chunks, width, mask)
  }

  private def hammingChunks(sig: Column, chunks: Int, width: Int,
      mask: Long): Column =
    transform(sequence(lit(0), lit(chunks - 1)),
      c => call_function("shiftright", sig, c * width).bitwiseAND(mask))

  private val HammingBuckets = 256L

  private def layoutPath(path: String) = s"$path/_hamming_layout"

  private def readHammingLayout(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(layoutPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no _hamming_layout pin at $path - not a hammingIndexBuild layout")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.trim.toInt
  }

  /** BUILD a persisted 64-bit-fingerprint near-dup index — the
    * build-once/probe-many contract the ANN family has
    * ([[graft.similarity.SimilarityOps.lshBuildIndex]]) applied to the
    * MEDIA fingerprint triad (DCT pHash images, spectral audio,
    * temporal-grid video — any Manku-banded 64-bit signature):
    * `<path>/chunks` holds ID-ONLY rows partitioned by
    * (`chunk`, `bucket` = chunk_val mod 256) so a probe batch prunes to
    * its target directories at FILE-LISTING time, and `<path>/sigs`
    * holds one (id, sig) row for the exact popcount verify. The
    * `maxDist` banding is pinned in `_hamming_layout` — probe and
    * append read it back, so a layout mismatch is impossible rather
    * than silently recall-losing. */
  def hammingIndexBuild(sigs: DataFrame, path: String, maxDist: Int,
      idCol: String = "id", sigCol: String = "sig"): Unit = {
    require(maxDist >= 0 && maxDist <= 31,
      s"maxDist must be in [0, 31], got $maxDist")
    val p = new org.apache.hadoop.fs.Path(layoutPath(path))
    val fs = p.getFileSystem(
      sigs.sparkSession.sparkContext.hadoopConfiguration)
    // REBUILD crash window: drop the old pin BEFORE overwriting data —
    // a crash mid-rebuild then leaves "no pin" (probes fail LOUD on the
    // missing layout) instead of the OLD banding silently mis-slicing
    // the NEW chunk data; the pin lands last, over complete data
    if (fs.exists(p)) fs.delete(p, false)
    hammingIndexWrite(sigs, path, maxDist, idCol, sigCol,
      org.apache.spark.sql.SaveMode.Overwrite)
    val out = fs.create(p, true)
    try out.write(maxDist.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Incrementally ADD fingerprints to a [[hammingIndexBuild]] layout:
    * chunk assignment is a pure function of the signature under the
    * pinned banding, so appended rows land exactly where a rebuild
    * would put them (append ≡ rebuild — the property that lets media
    * dedup ride a streaming ingest with no rebuild cycle).
    *
    * ADD-ONLY contract (enforced LOUD): an appended id must be NEW.
    * Appending an UPDATED signature for an existing id would leave both
    * sigs in the sig table and both chunk sets, and the probe side's
    * `dropDuplicates("id")` (which exists to collapse at-least-once
    * replays of IDENTICAL rows) would pick an arbitrary survivor —
    * nondeterministic/stale distances instead of a failure. The check
    * is one semi-join of the (small) appended batch against the sig
    * table with `limit(1)` early-exit; re-signing an id means rebuild
    * ([[hammingIndexBuild]]), the same contract the LSH/IVF persisted
    * indexes carry. The check and the append run under an index-scoped
    * [[graft.pipeline.RunLock]] (heartbeat + stale-break): without it
    * the guard is check-then-act, and two concurrent appends of the
    * same id would both pass the semi-join and land duplicate
    * signatures — exactly the nondeterministic-probe corruption the
    * guard exists to prevent. A concurrent appender fails loud
    * (ConcurrentRunException) rather than queueing. */
  def hammingIndexAppend(sigs: DataFrame, path: String,
      idCol: String = "id", sigCol: String = "sig"): Unit =
    graft.pipeline.RunLock.withLock(sigs.sparkSession, path) {
      hammingIndexAppendLocked(sigs, path, idCol, sigCol)
    }

  private def hammingIndexAppendLocked(sigs: DataFrame, path: String,
      idCol: String, sigCol: String): Unit = {
    val spark = sigs.sparkSession
    val maxDist = readHammingLayout(spark, path)
    // within-batch duplicates corrupt exactly like cross-batch ones
    // (two sigs for one id, arbitrary probe survivor) — same loud check
    val dupInBatch = sigs.groupBy(col(idCol))
      .agg(count(lit(1)).as("_c")).filter(col("_c") > 1L).limit(1)
      .collect()
    require(dupInBatch.isEmpty,
      s"hammingIndexAppend: id '${dupInBatch.headOption.map(_.get(0))
        .getOrElse("")}' appears more than once in the appended batch - " +
        "deduplicate the batch to one signature per id first")
    val collided = sigs.select(col(idCol).as("id"))
      .join(spark.read.parquet(s"$path/sigs").select(col("id")),
        Seq("id"), "left_semi")
      .limit(1).collect()
    require(collided.isEmpty,
      s"hammingIndexAppend: id '${collided.headOption.map(_.get(0))
        .getOrElse("")}' is already indexed at $path - the index is " +
        "ADD-ONLY (an appended duplicate id would make probe distances " +
        "nondeterministic); to re-sign existing ids, rebuild with " +
        "hammingIndexBuild")
    hammingIndexWrite(sigs, path, maxDist, idCol, sigCol,
      org.apache.spark.sql.SaveMode.Append)
  }

  private def hammingIndexWrite(sigs: DataFrame, path: String,
      maxDist: Int, idCol: String, sigCol: String,
      mode: org.apache.spark.sql.SaveMode): Unit = {
    val (chunks, width, mask) = hammingLayout(maxDist)
    val s = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"))
      .localCheckpoint(false) // feeds chunks AND the sig table
    s.select(col("id"),
        posexplode(hammingChunks(col("sig"), chunks, width, mask))
          .as(Seq("chunk", "chunk_val")))
      .withColumn("bucket", pmod(col("chunk_val"), lit(HammingBuckets)))
      .write.mode(mode).partitionBy("chunk", "bucket")
      .parquet(s"$path/chunks")
    s.write.mode(mode).parquet(s"$path/sigs")
  }

  /** Probe a [[hammingIndexBuild]] layout: every indexed fingerprint
    * within the PINNED maxDist of any probe — (`probe_id`, `id`,
    * `dist`), self-matches dropped. The probe batch's (chunk, bucket)
    * targets collect to the driver (≤ 32 chunks × 256 buckets rows, a
    * hard structural bound independent of probe count) and prune the
    * chunk directories at file-listing time; candidates verify with
    * the exact popcount, and duplicate candidate rows from an
    * at-least-once append collapse before rescoring (the lshTopKIndexed
    * discipline). */
  def hammingNearDupIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, probes: DataFrame, idCol: String = "id",
      sigCol: String = "sig"): DataFrame = {
    val maxDist = readHammingLayout(spark, path)
    val (chunks, width, mask) = hammingLayout(maxDist)
    val pB = probes
      .select(col(idCol).as("probe_id"), col(sigCol).as("probe_sig"))
      .select(col("probe_id"), col("probe_sig"),
        posexplode(hammingChunks(col("probe_sig"), chunks, width, mask))
          .as(Seq("chunk", "chunk_val")))
      .withColumn("bucket", pmod(col("chunk_val"), lit(HammingBuckets)))
      .localCheckpoint(false) // feeds the pruning collect AND the join
    val targets = pB.select(col("chunk"), col("bucket")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // loud, not a silent empty frame (the lshTopKIndexed discipline):
    // an empty probe batch is a caller bug, and a differently-typed
    // empty result would poison downstream unions
    require(targets.nonEmpty,
      "hammingNearDupIndexed: probe set produced no chunk targets " +
        "(empty or all-null probe signatures)")
    // isin superset prune (IO-only; the equi-join below matches exactly)
    val prune =
      col("chunk").isin(targets.map(_._1).distinct.toSeq: _*) &&
        col("bucket").isin(targets.map(_._2).distinct.toSeq: _*)
    val cB = spark.read.parquet(s"$path/chunks").filter(prune)
      .select(col("id"), col("chunk").cast("int").as("chunk"),
        col("chunk_val").cast("long").as("chunk_val"))
    val candIds = cB
      .join(pB.select(col("probe_id"), col("chunk"), col("chunk_val")),
        Seq("chunk", "chunk_val"))
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id")).distinct()
    val sigsT = spark.read.parquet(s"$path/sigs")
      .dropDuplicates("id") // at-least-once append replays exact copies
    candIds.join(sigsT, Seq("id"))
      .join(broadcast(probes.select(col(idCol).as("probe_id"),
        col(sigCol).as("probe_sig")).dropDuplicates("probe_id")),
        Seq("probe_id"))
      .select(col("probe_id"), col("id"),
        hammingDist(col("sig"), col("probe_sig")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  // ---- segment-level (line/paragraph) dedup ---------------------------

  /** Core of line/span dedup: given `(id, segs: array<string>)`, keep the
    * corpus-globally FIRST occurrence of each distinct segment (ordered by
    * (id, position)), drop every later occurrence, and reassemble each
    * document from its surviving segments in order.
    *
    * Scale: one posexplode (narrow) + ONE shuffle on the 128-bit segment
    * fingerprint; the rank-1 filter rewrites to WindowGroupLimit, so each
    * map partition forwards at most one candidate row per fingerprint
    * before the exchange. Reassembly is a second shuffle keyed by doc id —
    * both shuffles are on high-cardinality keys, skew-proof. */
  /** `(id, segs)` where segs are the fixed non-overlapping `k`-token
    * spans of `textCol` (last span may be shorter) — the segmentation
    * shared by [[fixedSpanDedup]] and [[boilerplateRemove]]; one
    * definition so span semantics cannot drift between them. */
  private def spanSegments(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col("id"), transform(
        sequence(lit(0L), ((size(col("toks")) - 1) / k).cast("long")),
        i => concat_ws(" ", slice(col("toks"), (i * k + 1).cast("int"),
          lit(k)))).as("segs"))

  /** Rebuild documents from surviving `(id, pos, seg)` rows and account
    * for drops against `base` `(id, segs)`: returns
    * `(id, <outCol>, n_segments, n_dropped)`; fully-emptied documents
    * come back as `""`, not NULL. */
  private def reassemble(base: DataFrame, kept: DataFrame, outCol: String,
      joinSep: String): DataFrame = {
    val rebuilt = kept.groupBy("id").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("seg")))),
        s => s.getField("seg")), joinSep).as(outCol),
      count(lit(1)).as("n_kept"))
    base.select(col("id"), size(col("segs")).cast("long").as("n_segments"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col(outCol), lit("")).as(outCol),
        col("n_segments"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L)))
          .cast("long").as("n_dropped"))
  }

  private def segmentKeepFirst(base0: DataFrame, joinSep: String)
      : DataFrame = {
    // base feeds both the keep-first branch and the accounting join —
    // materialize once or the segmentation (and everything upstream of
    // it) runs twice per action (the boilerplateRemove discipline)
    val base = materialized(base0)
    val segs = base
      .select(col("id"), posexplode(col("segs")).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
    val byHash = Window.partitionBy(col("h"))
      .orderBy(col("id").asc, col("pos").asc)
    val kept = segs.withColumn("_rn", row_number().over(byHash))
      .filter(col("_rn") === 1)
      .select(col("id"), col("pos"), col("seg"))
    reassemble(base, kept, "dedup_text", joinSep)
  }

  /** Line-level exact dedup across documents (the C4-style rule: a line
    * duplicated anywhere in the corpus survives only at its first
    * occurrence). Lines are `sepRegex` splits of the raw text, trimmed,
    * with whitespace-only lines discarded before matching. Returns
    * `(idCol, dedup_text, n_segments, n_dropped)`. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n+", joinSep: String = "\n"): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      filter(transform(split(col(textCol), sepRegex), s => trim(s)),
        s => length(s) > 0).as("segs"))
    segmentKeepFirst(base, joinSep)
      .withColumnRenamed("id", idCol)
  }

  /** [[lineDedup]] over fixed non-overlapping spans of `k` whitespace
    * tokens (last span of a document may be shorter). The span form exists
    * for corpora without line structure; unlike [[substringDedup]] (every
    * overlapping k-gram, span-coverage removal) this is a partition of the
    * document, so reassembly is exact and cheaper by a factor of k. */
  def fixedSpanDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16): DataFrame = {
    require(k >= 1, s"span width k must be >= 1, got $k")
    segmentKeepFirst(spanSegments(df, idCol, textCol, k), " ")
      .withColumnRenamed("id", idCol)
  }

  /** Boilerplate removal: drop EVERY occurrence (including the first) of
    * any segment that appears in at least `minDocFreq` distinct documents
    * — the nav-bar/footer rule of web-corpus curation, distinct from
    * keep-first dedup. Segments are fixed `k`-token spans (see
    * [[fixedSpanDedup]]); the doc-frequency aggregate is one shuffle on
    * the segment fingerprint with map-side partial counts. */
  def boilerplateRemove(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, minDocFreq: Int = 4): DataFrame = {
    require(k >= 1, s"span width k must be >= 1, got $k")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val base = materialized(spanSegments(df, idCol, textCol, k))
    val segs = base
      .select(col("id"), posexplode(col("segs")).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
    val boiler = segs.groupBy("h")
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDocFreq)
      .select("h")
    val kept = segs.join(boiler, Seq("h"), "left_anti")
      .select(col("id"), col("pos"), col("seg"))
    reassemble(base, kept, "clean_text", " ")
      .withColumnRenamed("id", idCol)
  }

  /** Blocked edit-distance near-duplicate pairs: (id_a < id_b, dist)
    * where dist = levenshtein(norm_a, norm_b) ≤ `maxDist`, over candidate
    * pairs sharing a block. A block is (first `prefixLen` chars of the
    * normalized text, length÷`lenBucket`), with each right-side row
    * replicated into its bucket AND both neighbors — because an edit
    * distance ≤ maxDist bounds the length difference by maxDist, any
    * qualifying pair's buckets differ by at most 1 whenever
    * `maxDist ≤ lenBucket`, so bucketing loses NO recall vs prefix-only
    * blocking (spec-asserted equivalence); it exists purely to bound
    * block size. Prefix blocking is the recall tradeoff (edits inside
    * the first `prefixLen` chars escape the block — the standard
    * sorted-neighborhood compromise; [[minhashLsh]] covers
    * prefix-divergent near-dups).
    *
    * Scale: candidate generation is an equi-join on the block key (never
    * all-pairs); the within-block quadratic is bounded by block size
    * (prefix × length-bucket keys are high-cardinality; a corpus-wide
    * hot prefix lands in many length buckets). Verification uses Spark's
    * THRESHOLDED levenshtein — banded O(len·maxDist) per pair instead of
    * O(len²), the difference between feasible and not on 10-KB docs. */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 4, prefixLen: Int = 8, lenBucket: Int = 16)
      : DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(maxDist <= lenBucket,
      s"maxDist ($maxDist) must be <= lenBucket ($lenBucket) — the " +
        "adjacent-bucket join guarantees full prefix-block recall only " +
        "when the length difference of a qualifying pair cannot span " +
        "two bucket boundaries")
    // normalize ONCE, at data-proportional parallelism (the q_curation
    // normalize-once discipline): the regex-chain normalize is the single
    // most expensive per-row step (~60% of the operator at sf1), both
    // join sides consume it, and without a materialization barrier
    // Catalyst's collapsed projections re-evaluate it per derived column
    // per side. Repartition BEFORE normalizing so the work spreads over
    // the shuffle parallelism instead of the input's file splits (a
    // one-file corpus would otherwise normalize on one core), then a
    // LAZY localCheckpoint materializes the normalized rows once for
    // both sides (the q_exact_percentile pattern). Measured at sf1:
    // 16.5 s → 3.4 s.
    val parts = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val norm = docs.select(col(idCol).as("_eid"), col(textCol).as("_rt"))
      .repartition(parts, col("_eid"))
      .select(col("_eid"), TextOps.normalize(col("_rt")).as("_t"))
      .withColumn("_pfx", substring(col("_t"), 1, prefixLen))
      .withColumn("_bkt", floor(length(col("_t")) / lenBucket))
      .localCheckpoint(false)
    val a = norm.select(col("_pfx"), col("_bkt"),
      col("_eid").as("id_a"), col("_t").as("_ta"))
    val b = norm
      .withColumn("_bkt",
        explode(array(col("_bkt") - 1, col("_bkt"), col("_bkt") + 1)))
      .select(col("_pfx"), col("_bkt"),
        col("_eid").as("id_b"), col("_t").as("_tb"))
    // SHUFFLE_HASH, not broadcast: left to itself Catalyst broadcasts a
    // side here (both sides are "small" at test scale), but side b IS the
    // corpus exploded 3× — a corpus-sized broadcast is exactly the
    // scale-killer this operator exists to avoid, and a broadcast join
    // also runs the levenshtein verify at the parallelism of the stream
    // side's FILE SPLITS (one 10 MB parquet file ⇒ one core does every
    // banded-edit-distance verify; measured 6× wall-clock at sf1).
    // Hash-partitioning both sides on the block key makes verify
    // parallelism follow the shuffle partitioning — data-proportional,
    // layout-independent — and the per-block skew bound is the blocking
    // design's own contract (finer prefixes/buckets for hotter corpora).
    a.hint("shuffle_hash").join(b, Seq("_pfx", "_bkt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("_ta"), col("_tb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Sorted-neighborhood near-dup pairs (the classic SNM blocking): sort
    * the corpus by normalized text, compare each document only to its
    * `window` successors in that order, keep pairs with
    * levenshtein ≤ `maxDist`. Complements [[editDistancePairs]]: prefix
    * blocking misses pairs whose edits fall inside the prefix; the
    * sorted order misses pairs whose edits fall at the FRONT of the text
    * (they sort far apart) — the standard practice is a multi-pass union
    * over different sort keys, each pass this operator.
    *
    * Scale: the global sort rank comes from [[graft.ops.Rank.globalRank]]
    * (one range exchange + broadcast offsets — never a single-task
    * window); neighbor candidates are an equi-join of the rank against
    * its `window` shifted copies (row-local explode, `window`× postings,
    * no quadratic block). Output: (id_lo, id_hi, dist) — id-ordered so
    * the pair orientation is engine-independent even when the text order
    * and id order disagree. */
  /** Sorted-neighborhood candidate pairs verified by JARO–WINKLER
    * similarity — the ENTITY-RESOLUTION twin of
    * [[sortedNeighborhoodPairs]]: Levenshtein distance is the right
    * verifier for near-identical documents, but name/title matching
    * wants a length-normalized, transposition-aware, prefix-weighted
    * score ([[graft.functions.StringSimilarity.jaroWinkler]], a codegen
    * expression). Same skew-safe global-rank blocking; similarity is
    * ROUNDED AT 4 before the threshold compare on both engine and
    * oracle sides, so the gate sits on a shared grid rather than a raw
    * double boundary. */
  def jaroNeighborhoodPairs(docs: DataFrame, idCol: String,
      textCol: String, window: Int = 4, minSim: Double = 0.88)
      : DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minSim >= 0.0 && minSim <= 1.0,
      s"minSim must be in [0,1], got $minSim")
    val norm = docs.select(col(idCol).as("_sid"),
      TextOps.normalize(col(textCol)).as("_t"))
    val ranked = graft.ops.Rank.globalRank(norm,
      Seq(col("_t"), col("_sid")), "_rk")
    val left = ranked.select(col("_sid").as("_ida"), col("_t").as("_ta"),
      col("_rk"))
    val right = ranked.select(col("_sid").as("_idb"), col("_t").as("_tb"),
      explode(sequence(col("_rk") - window, col("_rk") - 1)).as("_rk"))
    left.join(right, Seq("_rk"))
      .withColumn("sim", round(graft.functions.StringSimilarity
        .jaroWinkler(col("_ta"), col("_tb")), 4))
      .filter(col("sim") >= minSim)
      .select(least(col("_ida"), col("_idb")).as("id_lo"),
        greatest(col("_ida"), col("_idb")).as("id_hi"), col("sim"))
  }

  /** ENTITY RESOLUTION end-to-end: [[jaroNeighborhoodPairs]] blocking +
    * similarity, [[ConnectedComponents]] cluster closure, min-id
    * survivorship — the composed "same real-world entity" pass over a
    * record table (typo'd names, transposed characters, shared
    * prefixes). One row per INPUT record: `entity_id` (the cluster's
    * minimum id — singletons are their own entity), `cluster_size`, and
    * `is_survivor` (the cluster representative a dedup keeps).
    * Chained matches collapse transitively (A≈B≈C one entity even when
    * A≉C — the [[graft.llm.Curation]] component argument).
    *
    * Shape: the blocking self-join is window-bounded, components run
    * over the PAIR table only, and the final join back to the records
    * is id-keyed — nothing quadratic, nothing driver-sized beyond the
    * bounded union-find. */
  def resolveEntities(df: DataFrame, idCol: String, nameCol: String,
      window: Int = 4, minSim: Double = 0.88): DataFrame = {
    val pairs = jaroNeighborhoodPairs(df, idCol, nameCol, window, minSim)
    val comp = ConnectedComponents(pairs, "id_lo", "id_hi")
    val assigned = df.select(col(idCol))
      .join(comp.select(col("id").as(idCol), col("component")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
    val sizes = assigned.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, Seq("entity_id"))
      .select(col(idCol), col("entity_id"), col("cluster_size"),
        (col(idCol) === col("entity_id")).as("is_survivor"))
  }

  def sortedNeighborhoodPairs(docs: DataFrame, idCol: String,
      textCol: String, window: Int = 4, maxDist: Int = 8): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val norm = docs.select(col(idCol).as("_sid"),
      TextOps.normalize(col(textCol)).as("_t"))
    // total order (text, id) — ranks well-defined and oracle-matchable
    val ranked = graft.ops.Rank.globalRank(norm,
      Seq(col("_t"), col("_sid")), "_rk")
    val left = ranked.select(col("_sid").as("_ida"), col("_t").as("_ta"),
      col("_rk"))
    val right = ranked.select(col("_sid").as("_idb"), col("_t").as("_tb"),
      explode(sequence(col("_rk") - window, col("_rk") - 1)).as("_rk"))
    left.join(right, Seq("_rk"))
      .withColumn("dist", levenshtein(col("_ta"), col("_tb"), maxDist))
      .filter(col("dist") >= 0)
      .select(least(col("_ida"), col("_idb")).as("id_lo"),
        greatest(col("_ida"), col("_idb")).as("id_hi"), col("dist"))
  }
}
