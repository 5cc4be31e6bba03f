package graft.analytics

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.functions.CmsEstimateLong
import graft.text.TextOps

/** The mergeable-sketch toolbox: count-min frequency estimation plus the
  * PERSISTED sketch-table family — per-stratum HLL distinct sketches
  * ([[hllSketchTable]]) and KLL quantile sketches ([[kllSketchTable]]),
  * both parquet-persistable and re-aggregable without touching raw data.
  * (The remaining family members live elsewhere: GK quantile aggregate =
  * `q_approx_percentile`, Bloom membership =
  * [[graft.dedup.DedupOps.dedupAgainstHistory]].)
  *
  * The CMS 100 TB story: the exact alternative to "how frequent is this
  * token/host corpus-wide?" is a full (key, count) aggregate — at corpus
  * scale that vocabulary table holds billions of rows, too large to
  * broadcast back for per-row scoring, forcing a second giant shuffle
  * join. A CMS is a few hundred KB regardless of key cardinality, built
  * in ONE map-side-combined pass (Spark's `count_min_sketch` aggregate
  * merges per-partition sketches — counter adds are exact, so the result
  * is independent of merge order), and every later scoring pass is
  * map-only: zero shuffles, zero joins.
  *
  * Error contract (ε, δ fixed at build): estimate ≥ true count always
  * (one-sided), and ≤ true + ε·N with probability ≥ δ, N = total keys
  * added. A frequency FILTER built on it therefore never loses a truly
  * frequent key — false positives only, the right direction for
  * stopword-class or domain-cap style gates.
  *
  * Keys are hashed to 64-bit with `xxhash64` before both build and probe
  * (the [[graft.dedup.DedupOps.dedupAgainstBloom]] trick): one fixed-width
  * code path for any key type, at a 2⁻⁶⁴-class collision risk.
  */
object Sketches {

  /** Build a [[CountMinSketch]] over `key` (one sketch for the whole
    * frame) plus the exact total key count, in a single aggregation job.
    * ε/δ sizing: width = ⌈e/eps⌉ counters × depth = ⌈ln(1/(1−confidence))⌉
    * rows — eps 1e-4 / confidence 0.99 is ~1.1 MB. Driver-side collect of
    * ONE row (the sketch), mirroring `df.stat.bloomFilter`. */
  def cmsSketch(df: DataFrame, key: Column, eps: Double = 1e-4,
      confidence: Double = 0.99, seed: Int = 42): (CountMinSketch, Long) = {
    val row = df.select(
        count_min_sketch(xxhash64(key), lit(eps), lit(confidence), lit(seed))
          .as("sketch"),
        count(key).as("n"))
      .head()
    val cms = CountMinSketch.readFrom(
      new ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    (cms, row.getLong(1))
  }

  /** Estimated frequency of `key` under a sketch built by [[cmsSketch]]
    * (same xxhash64 mapping on both sides). Map-only, codegen'd. */
  def cmsEstimate(key: Column, sketch: CountMinSketch): Column =
    CmsEstimateLong(xxhash64(key), sketch)

  /** Per-stratum HLL sketch table: one row per stratum holding a MERGEABLE
    * binary distinct-count sketch (Apache DataSketches HLL via Spark's
    * `hll_sketch_agg`) plus the exact row count. This is the
    * incremental-distinct pattern for 100 TB: persist this frame as a
    * parquet "sketch table" partitioned like the data (it is KB-sized per
    * stratum regardless of key cardinality), and every later question —
    * corpus-wide distinct, per-source distinct, distinct after adding a
    * new ingest batch — is answered by unioning sketch rows
    * ([[hllUnionEstimate]]) WITHOUT rescanning raw data. A new batch
    * appends its own sketch rows; history is never touched.
    *
    * HLL register merges are idempotent max-operations, so union is
    * commutative/associative and re-unioning overlapping batches never
    * double-counts (unlike an additive count rollup).
    *
    * @param lgK log2 of register count; relative error ≈ 1.04/√2^lgK
    *            (~1.6 % at the default 12), size ≈ 2^lgK bytes. */
  def hllSketchTable(df: DataFrame, key: Column, strata: Seq[String],
      lgK: Int = 12): DataFrame =
    df.groupBy(strata.map(col): _*)
      .agg(hll_sketch_agg(key, lgK).as("hll_sketch"),
        count(key).as("n_rows"))

  /** Roll a sketch table built by [[hllSketchTable]] up to a coarser
    * stratum set (possibly empty = corpus-wide): unions the binary
    * sketches and returns the distinct estimate plus summed row counts.
    * Input is the KB-per-row sketch table, so this aggregate touches
    * megabytes where the raw-data equivalent touches terabytes. */
  def hllUnionEstimate(sketchTable: DataFrame, strata: Seq[String] = Nil)
      : DataFrame = {
    val aggs = hll_sketch_estimate(hll_union_agg(col("hll_sketch")))
      .as("distinct_est") :: sum(col("n_rows")).as("n_rows") :: Nil
    if (strata.isEmpty) sketchTable.agg(aggs.head, aggs.tail: _*)
    else sketchTable.groupBy(strata.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[hllUnionEstimate]] at every rollup level of `strata` in ONE
    * aggregate over the sketch table (finest level … grand total, the
    * grand-total row carrying NULL strata) — the full distinct-count
    * profile of a corpus from one pass over KB-sized sketch rows. */
  def hllRollupEstimate(sketchTable: DataFrame, strata: Seq[String])
      : DataFrame =
    sketchTable.rollup(strata.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll_sketch")))
          .as("distinct_est"),
        sum(col("n_rows")).as("n_rows"))

  /** Per-stratum KLL quantile sketch table — the QUANTILE member of the
    * persisted-sketch-table family ([[hllSketchTable]] is the distinct
    * member). Each row holds a mergeable DataSketches KLL sketch of
    * `value` (a few KB at k=200, normalized rank error ≈ 2.2 %) plus the
    * exact row count; persist as parquet and answer any later percentile
    * question — per-stratum, rolled up, or corpus-wide after appending new
    * batch rows — from the sketch table alone ([[kllRollupQuantiles]]).
    * NULL values are excluded (SQL aggregate semantics). Unlike HLL,
    * KLL compaction is randomized, so estimates carry a rank-error bound
    * rather than run-to-run determinism (spec-asserted). */
  def kllSketchTable(df: DataFrame, value: Column, strata: Seq[String],
      k: Int = 200): DataFrame =
    df.filter(value.isNotNull)
      .groupBy(strata.map(col): _*)
      .agg(udaf(new KllAggregator(k)).apply(value.cast("double"))
          .as("kll_sketch"),
        count(value).as("n_rows"))

  /** Quantiles at `probs` for every rollup level of `strata`, from ONE
    * aggregate over a sketch table built by [[kllSketchTable]] (grand-total
    * row carries NULL strata). Returns the strata, an array<double>
    * `quantiles` column positionally matching `probs`, and summed
    * `n_rows`. */
  def kllRollupQuantiles(sketchTable: DataFrame, strata: Seq[String],
      probs: Seq[Double], k: Int = 200): DataFrame =
    sketchTable.rollup(strata.map(col): _*)
      .agg(udaf(new KllUnionAggregator(k)).apply(col("kll_sketch"))
          .as("_sk"),
        sum(col("n_rows")).as("n_rows"))
      .withColumn("quantiles",
        graft.functions.KllQuantilesOf(col("_sk"), probs))
      .drop("_sk")

  /** [[hllSketchTable]]'s PORTABLE twin: same shape (one mergeable
    * distinct-sketch row per stratum + exact row count), registers built
    * by [[PortableHll]] over the md5 hash family instead of DataSketches
    * over engine hashing — which makes every later estimate exactly
    * reproducible outside this engine (the driver's DuckDB oracle checks
    * the ESTIMATES, not just bounds). Null keys are excluded (SQL
    * aggregate semantics). Dense 2^p-byte rows (4 KB at p=12) vs
    * DataSketches' adaptive sparse encoding — the price of portability;
    * both are KB-sized against terabyte corpora. */
  def portableHllSketchTable(df: DataFrame, key: Column, strata: Seq[String],
      p: Int = 12): DataFrame =
    df.filter(key.isNotNull)
      .groupBy(strata.map(col): _*)
      .agg(udaf(new PortableHll.HllAggregator(p))
          .apply(graft.functions.HashExpressions.md5lo(key.cast("string")))
          .as("hll_regs"),
        count(key).as("n_rows"))

  /** [[hllRollupEstimate]] over a PORTABLE sketch table: every rollup
    * level of `strata` (finest … grand total, NULL-strata marker) from
    * one aggregate over register rows — elementwise-max union, then the
    * [[PortableHll.estimate]] formula. */
  def portableHllRollupEstimate(sketchTable: DataFrame, strata: Seq[String],
      p: Int = 12): DataFrame =
    sketchTable.rollup(strata.map(col): _*)
      .agg(udaf(new PortableHll.HllUnionAggregator(p)).apply(col("hll_regs"))
          .as("_regs"),
        sum(col("n_rows")).as("n_rows"))
      .withColumn("distinct_est", PortableHll.hllEstimate(col("_regs"), p))
      .drop("_regs")

  /** Pairwise SKETCH-SET OVERLAP between strata — |A∩B| by
    * inclusion–exclusion over the mergeable HLL register rows:
    * est(A) + est(B) − est(A∪B), where the union sketch is the
    * elementwise register max (EXACT for HLL — the union estimate is
    * what a sketch of A∪B would be, unlike intersection which has no
    * mergeable form; that asymmetry is why the intersection must be
    * derived). One row per unordered stratum pair: (`key_a`, `key_b`,
    * `est_a`, `est_b`, `est_union`, `est_intersect`,
    * `jaccard_est_x1e6`). Estimates round to whole counts FIRST so the
    * derived columns are integer arithmetic an external engine replays;
    * `est_intersect` may go slightly negative when the true overlap is
    * near zero (estimator noise) — reported as-is, clamped only inside
    * the Jaccard.
    *
    * Scale: the pair table is strata-count-sized (never data-sized);
    * the pairwise union rides the existing [[PortableHll.HllUnionAggregator]]
    * via a 2-row explode per pair — no new merge kernel. Raw data was
    * already scanned once into the sketch table; overlaps never rescan. */
  def portableHllOverlap(sketchTable: DataFrame, keyCol: String,
      p: Int = 12): DataFrame = {
    val a = sketchTable.select(col(s"`$keyCol`").as("key_a"),
      col("hll_regs").as("_ra"))
    val b = sketchTable.select(col(s"`$keyCol`").as("key_b"),
      col("hll_regs").as("_rb"))
    val pairs = a.join(b, col("key_a") < col("key_b"))
    val unions = pairs.select(col("key_a"), col("key_b"),
        explode(array(col("_ra"), col("_rb"))).as("hll_regs"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(udaf(new PortableHll.HllUnionAggregator(p))
        .apply(col("hll_regs")).as("_ru"))
    def est(c: Column) =
      round(PortableHll.hllEstimate(c, p), 0).cast("long")
    pairs.join(unions, Seq("key_a", "key_b"))
      .select(col("key_a"), col("key_b"),
        est(col("_ra")).as("est_a"), est(col("_rb")).as("est_b"),
        est(col("_ru")).as("est_union"))
      .withColumn("est_intersect",
        col("est_a") + col("est_b") - col("est_union"))
      .withColumn("jaccard_est_x1e6",
        when(col("est_union") > 0L, graft.ops.Fixed.ldiv(
          greatest(col("est_intersect"), lit(0L)) * lit(1000000L),
          col("est_union"))).otherwise(lit(0L)))
  }

  /** Per-document frequent-token profile: the share of a document's tokens
    * whose estimated corpus frequency is ≥ `minCount` — the
    * stopword-saturation / boilerplate signal, scored WITHOUT joining a
    * vocabulary table. Returns (id, n_tokens, n_frequent, frequent_ratio);
    * zero-token documents are kept with ratio 0 (the tokenizeIds
    * discipline: a scoring pass cannot silently shrink the corpus).
    *
    * Scale: one explode + doc-keyed hash aggregate (map-side combined);
    * the sketch probe is a per-row expression. The exact equivalent joins
    * the token explode against the full vocabulary — a corpus-sized
    * build side at 100 TB. */
  def frequentTokenRatio(df: DataFrame, idCol: String, textCol: String,
      sketch: CountMinSketch, minCount: Long): DataFrame =
    frequentTokenRatioBy(df, idCol, textCol,
      term => cmsEstimate(term, sketch), minCount)

  /** [[frequentTokenRatio]] against a PORTABLE sketch built by
    * [[portableCmsSketch]] — same map-only scoring shape; the estimates
    * (and therefore the ratios) are exactly reproducible in the DuckDB
    * oracle. */
  def frequentTokenRatioPortable(df: DataFrame, idCol: String,
      textCol: String, counters: Array[Long], minCount: Long,
      depth: Int = 5, width: Int = 27183): DataFrame =
    frequentTokenRatioBy(df, idCol, textCol,
      term => PortableCms.cmsEstimate(
        graft.functions.HashExpressions.md5lo(term),
        graft.functions.HashExpressions.md5hi(term),
        counters, depth, width),
      minCount)

  private def frequentTokenRatioBy(df: DataFrame, idCol: String,
      textCol: String, estimateOf: Column => Column, minCount: Long)
      : DataFrame = {
    val scored = df
      .select(col(idCol).as("_id"),
        explode(split(TextOps.normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum((estimateOf(col("term")) >= minCount).cast("long"))
          .as("n_frequent"))
    df.select(col(idCol)).join(scored, df(idCol) === scored("_id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_frequent"), lit(0L)).as("n_frequent"),
        when(col("n_tokens").isNull, lit(0.0))
          .otherwise(col("n_frequent").cast("double") /
            col("n_tokens").cast("double")).as("frequent_ratio"))
  }

  /** Build a PORTABLE CMS ([[PortableCms]]) over `key` plus the exact
    * total key count, in one aggregation job — [[cmsSketch]]'s
    * oracle-reproducible twin (md5 double hashing instead of the
    * engine-internal row hashes). Driver-side collect of ONE ~1 MB row,
    * same posture as `df.stat.bloomFilter`. */
  def portableCmsSketch(df: DataFrame, key: Column, depth: Int = 5,
      width: Int = 27183): (Array[Long], Long) = {
    val keyed = key.cast("string")
    val row = df.select(
        udaf(new PortableCms.CmsAggregator(depth, width))
          .apply(graft.functions.HashExpressions.md5lo(keyed),
            graft.functions.HashExpressions.md5hi(keyed))
          .as("sketch"),
        count(key).as("n"))
      .head()
    (PortableCms.unpack(row.getAs[Array[Byte]](0)), row.getLong(1))
  }
}
