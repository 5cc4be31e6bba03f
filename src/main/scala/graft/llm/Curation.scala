package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, DedupOps}
import graft.functions.HashExpressions
import graft.text.TextOps

/** End-to-end training-corpus curation: the composed pipeline a user of
  * this library runs over a raw document table —
  *
  *   quality gate → language filter → PII scrub → repetition filter →
  *   exact dedup → MinHash-LSH near-dup removal
  *
  * Each stage is one of the library's operators; this object only wires
  * them and reports per-stage row counts. Everything stays declarative:
  * the whole pipeline is ONE DataFrame plan (narrow projections/filters +
  * the two dedup shuffles), so Catalyst pipelines the gates into the scan
  * and the 100 TB cost is: 1 scan + 1 fingerprint shuffle + the LSH
  * banding joins.
  */
object Curation {

  case class Config(
      /** When set, drop every fixed `boilerplateSpan`-token segment that
        * appears in at least this many distinct documents (nav-bar/footer
        * removal, [[DedupOps.boilerplateRemove]]) BEFORE quality scoring —
        * boilerplate inflates repetition and deflates quality, so it must
        * go first. */
      boilerplateMinDocFreq: Option[Int] = None,
      boilerplateSpan: Int = 4,
      /** When set, keep only the corpus-globally first occurrence of each
        * fixed k-token span ([[DedupOps.fixedSpanDedup]], the C4 line-
        * dedup rule) after boilerplate removal, before quality scoring. */
      lineDedupSpan: Option[Int] = None,
      minQuality: Double = 0.5,
      keepLangs: Seq[String] = Nil, // empty = keep all
      maxRepetition: Double = 0.5,
      nearDupJaccard: Double = 0.8,
      minhashBands: Int = 16,
      minhashRows: Int = 4,
      /** Near-dup cluster representative: false (default) keeps the
        * MIN-ID doc of each connected component (stable, engine-portable,
        * oracle-checkable); true keeps the HIGHEST-QUALITY doc (ties →
        * min id) — what a production corpus actually wants when the
        * duplicates differ in boilerplate or truncation. */
      keepBestQuality: Boolean = false,
      /** Shingle-containment threshold for the optional decontamination
        * stage (active only when `contaminationProbes` is passed). */
      contaminationThreshold: Double = 0.5)

  case class Report(input: Long, afterQuality: Long, afterLang: Long,
      afterRepetition: Long, afterExactDedup: Long, afterNearDup: Long)

  /** The curated frame — original columns plus `text` redacted and
    * `quality` attached. Near-dup removal resolves the pair graph into
    * CONNECTED COMPONENTS and keeps the minimum doc id of each component:
    * pairwise dropping (remove the higher id of each pair) leaves chained
    * duplicates behind (A–B and A–C pair but B–C never does ⇒ B survives
    * even though {A,B,C} is one cluster), components never do.
    *
    * The corpus stages remain one declarative plan (narrow gates fused
    * into the scan + the two dedup shuffles); the component resolution is
    * an iterate-to-fixpoint over the PAIR table only (≪ corpus), so
    * calling this triggers those jobs eagerly — see
    * [[graft.dedup.ConnectedComponents]]. */
  def curateFrame(docs: DataFrame, idCol: String, textCol: String,
      langCol: Option[String] = None,
      cfg: Config = Config(),
      contaminationProbes: Option[DataFrame] = None): DataFrame =
    stages(docs, idCol, textCol, langCol, cfg, contaminationProbes).last._2

  /** Named intermediate frames, in order (for [[curate]]'s report and for
    * debugging a stage in isolation) — the composition
    * [[prefixStages]] ++ [[suffixStages]], so the full-recompute path and
    * the incremental-prefix pipeline path share one implementation by
    * construction (twin equivalence is structural, not re-proved).
    *
    * @param contaminationProbes eval-benchmark documents (same id/text
    *   column names as the corpus, ids disjoint from it); when present, a
    *   decontamination stage ([[DedupOps.decontaminate]]) runs on the
    *   scrubbed corpus BEFORE exact dedup — removing contaminated docs
    *   after dedup could first let one win a duplicate group and then
    *   delete it, losing its clean duplicates */
  def stages(docs: DataFrame, idCol: String, textCol: String,
      langCol: Option[String], cfg: Config,
      contaminationProbes: Option[DataFrame] = None)
      : Seq[(String, DataFrame)] = {
    val pfx = prefixStages(docs, idCol, textCol, langCol, cfg)
    val prefix = pfx.last._2
    pfx.init ++ suffixStages(prefix, idCol, textCol, cfg, contaminationProbes)
  }

  /** Shingle width shared by repetition scoring, the exact-dedup
    * fingerprint path, MinHash banding, and decontamination. */
  val ShingleN = 3

  /** The ROW-LOCAL curation prefix — every stage whose per-document fate
    * and derived columns depend only on that document: quality gate,
    * language filter, PII scrub, fingerprint/shingle derivation,
    * repetition gate. This is the expensive narrow pipeline (regex + hash
    * kernels over full text), and because it is row-local it can run
    * INCREMENTALLY over just a batch of new/changed documents (the
    * pipeline's `gold_mode: "incremental"` does exactly that, persisting
    * the result); the corpus-global [[suffixStages]] then run over the
    * compact prefix output. The optional segment-cleanup stages
    * (boilerplate document frequencies, corpus-first span dedup) are
    * corpus-GLOBAL text rewrites feeding the quality gate, so they live
    * here only for the full-recompute path — incremental callers must
    * keep them disabled (the pipeline enforces it).
    *
    * Returns the named frames ending with `"prefix"`: the scrubbed
    * survivors carrying `quality`, `_fp` (the exact-dedup md5
    * fingerprint of the normalized text), and `_sh` (the hashed shingle
    * set MinHash and decontamination consume) — everything the suffix
    * needs, none of the raw normalized text. */
  def prefixStages(docs: DataFrame, idCol: String, textCol: String,
      langCol: Option[String], cfg: Config): Seq[(String, DataFrame)] = {
    // quality components as NAMED COLUMNS, not one inline qualityScore
    // expression: the composite references meanWordLen twice and the
    // pushed-down filter re-substitutes the whole thing, so the inline
    // form pays ~4 interpreted HOF passes per row; as multi-referenced
    // non-cheap aliases the ratios survive CollapseProject and evaluate
    // once, with the composite reduced to arithmetic over attributes
    // Optional SEGMENT CLEANUP before anything reads the text: corpus-
    // frequency boilerplate removal, then line(-span) keep-first dedup.
    // Both run before the quality gate because boilerplate inflates
    // repetition and deflates stopword/length ratios — scoring the
    // cleaned text is the whole point. Each rewrite is one extra
    // id-keyed join (the rewritten text back onto the row's other
    // columns); disabled (the default) they cost nothing.
    def replaceText(orig: DataFrame, rewritten: DataFrame,
        newTextCol: String): DataFrame =
      orig.drop(textCol)
        .join(rewritten.select(col(idCol),
          col(newTextCol).as(textCol)), Seq(idCol))
        .select(orig.columns.map(col): _*)
    val deboiled = cfg.boilerplateMinDocFreq match {
      case Some(minDf) => replaceText(docs,
        DedupOps.boilerplateRemove(docs, idCol, textCol,
          cfg.boilerplateSpan, minDf), "clean_text")
      case None => docs
    }
    val segCleanOn =
      cfg.boilerplateMinDocFreq.isDefined || cfg.lineDedupSpan.isDefined
    val cleaned0 = cfg.lineDedupSpan match {
      case Some(k) => replaceText(deboiled,
        DedupOps.fixedSpanDedup(deboiled, idCol, textCol, k), "dedup_text")
      case None => deboiled
    }
    // a document whose every span was boilerplate/duplicate has no
    // content left — drop it here rather than scoring an empty string
    val cleaned =
      if (segCleanOn) cleaned0.filter(length(trim(col(textCol))) > 0)
      else cleaned0
    val txt = col(textCol)
    val scored = cleaned
      .withColumn("_punct", TextOps.punctRatio(txt))
      .withColumn("_sw", TextOps.stopwordRatio(txt))
      .withColumn("_mwl", TextOps.meanWordLen(txt))
    val gated = scored
      .withColumn("quality", TextOps.qualityFromComponents(
        length(txt), col("_sw"), col("_punct"), col("_mwl")))
      .filter(col("quality") >= cfg.minQuality)
      .drop("_punct", "_sw", "_mwl")
    val langed = (langCol, cfg.keepLangs) match {
      case (Some(lc), keep) if keep.nonEmpty =>
        gated.filter(col(lc).isin(keep: _*))
      case _ => gated
    }
    // Normalize ONCE, shingle ONCE: repetition scoring, the exact-dedup
    // fingerprint, and MinHash all consume normalize(text) (and the first
    // and last consume the same hashed-shingle set). Computing them as
    // named columns here means the regex/hash kernels run one pass per
    // row; every later stage reads the column. The raw normalized text
    // itself stops here — downstream only its md5 fingerprint and the
    // shingle hashes travel (what the incremental prefix table persists).
    val scrubbed = langed
      .withColumn(textCol, TextOps.redactPii(col(textCol)))
      .withColumn("_norm", TextOps.normalize(col(textCol)))
      .withColumn("_sh", HashExpressions.ngramHashes(
        split(col("_norm"), " "), ShingleN))
      // repetitionScore(text, n) ≡ 1 − |distinct n-grams| / (|tokens| − n
      // + 1) over the normalized tokens — same expression, shared columns
      .filter(lit(1.0) - size(col("_sh")).cast("double") /
        greatest(size(split(col("_norm"), " ")) - (ShingleN - 1), lit(1))
          .cast("double") <= cfg.maxRepetition)
      .withColumn("_fp", md5(col("_norm")))
      .drop("_norm")
    (if (segCleanOn) Seq("segclean" -> cleaned) else Nil) ++
    Seq("quality" -> gated, "lang" -> langed,
      "repetition" -> scrubbed.drop("_fp", "_sh"),
      "prefix" -> scrubbed)
  }

  /** The CORPUS-GLOBAL curation suffix over a [[prefixStages]] output
    * frame (columns + `quality` + `_fp` + `_sh`): decontamination (the
    * probe set is global, current-as-of-this-run), exact dedup on the
    * fingerprint, MinHash-LSH near-dup component resolution. These stages
    * are the ones an incremental merge cannot make associative — near-dup
    * component membership and duplicate-group winners shift when ANY new
    * document arrives — so the incremental-gold pipeline runs them as a
    * full pass per publish, but over the compact prefix table (ids,
    * fingerprints, shingle hashes, scrubbed text), never re-running the
    * prefix's text kernels. */
  def suffixStages(prefix: DataFrame, idCol: String, textCol: String,
      cfg: Config, contaminationProbes: Option[DataFrame] = None)
      : Seq[(String, DataFrame)] =
    suffixCore(prefix, idCol, textCol, cfg, contaminationProbes,
      exactN => DedupOps.minhashLshFromShingles(exactN, idCol, "_sh",
        bands = cfg.minhashBands, rowsPerBand = cfg.minhashRows,
        threshold = cfg.nearDupJaccard))

  /** [[suffixStages]] with the near-dup pair MINING replaced by a
    * pre-mined edge table (id_a, id_b) — the incremental-gold suffix:
    * the pipeline maintains a persisted LSH band index and appends
    * verified edges per batch, so per publish no signature is computed
    * and no corpus self-join runs. `edges` may cover a SUPERSET of the
    * surviving docs (it is mined over all live doc versions, before
    * decontamination and exact dedup); restriction to the survivor set
    * commutes with mining because both candidate membership (shared
    * band bucket) and verification (Jaccard ≥ t) are properties of the
    * two docs alone — so the restricted edge set equals what full-mode
    * mining over the survivors produces, and component resolution
    * (which must not bridge through removed docs) sees identical
    * input. */
  def suffixStagesFromEdges(prefix: DataFrame, idCol: String,
      textCol: String, cfg: Config,
      contaminationProbes: Option[DataFrame], edges: DataFrame)
      : Seq[(String, DataFrame)] =
    suffixCore(prefix, idCol, textCol, cfg, contaminationProbes,
      exactN => {
        val ids = exactN.select(col(idCol).as("_live_id"))
        edges
          .join(ids, col("id_a") === col("_live_id"), "left_semi")
          .join(ids, col("id_b") === col("_live_id"), "left_semi")
          .select(col("id_a"), col("id_b"))
      })

  private def suffixCore(prefix: DataFrame, idCol: String, textCol: String,
      cfg: Config, contaminationProbes: Option[DataFrame],
      minePairs: DataFrame => DataFrame): Seq[(String, DataFrame)] = {
    // Optional decontamination BEFORE dedup (see stages scaladoc): the
    // probe shingle sets broadcast; the corpus side consumes the
    // prefix's persisted `_sh` — NOT the text — so this stage never
    // re-runs the normalize+shingle kernels (the incremental-gold
    // contract: the suffix is O(prefix metadata) per publish)
    val decontaminated = contaminationProbes match {
      case Some(probes) => DedupOps.decontaminateFromShingles(prefix,
        probes, idCol, "_sh", textCol, ShingleN,
        cfg.contaminationThreshold)
      case None => prefix
    }
    // Materialize the exact-dedup result once: it feeds BOTH the LSH
    // pair-generation branch and the final left_anti join, and everything
    // above it (quality + PII-scrub regexes + the fingerprint window) is
    // the most expensive narrow pipeline in the query. Same rationale as
    // DedupOps.materialized — blocks are RDD-owned, freed on GC.
    val exactN = DedupOps.exactDedupByKey(decontaminated,
        col("_fp"), idCol)
      .localCheckpoint(false)
    // near-dup pairs -> connected components over the pair graph -> keep
    // the min-id doc of each component, drop the rest (one left_anti
    // equi-join; the component iteration runs over the pair table only)
    val pairs = minePairs(exactN)
    val comp = ConnectedComponents(pairs, "id_a", "id_b")
    val losers =
      if (!cfg.keepBestQuality)
        comp.filter(col("id") =!= col("component")).select(col("id").as(idCol))
      else {
        // representative = argmax(quality) per component, tie -> min id;
        // the component table is ≪ corpus, so this window is tiny
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))
          .orderBy(col("quality").desc, col("id").asc)
        comp.join(exactN.select(col(idCol).as("id"), col("quality")), Seq("id"))
          .withColumn("_krn", row_number().over(w))
          .filter(col("_krn") > 1)
          .select(col("id").as(idCol))
      }
    val curated = exactN.join(losers, Seq(idCol), "left_anti")
    Seq("decontam" -> decontaminated.drop("_fp", "_sh"),
      "exactDedup" -> exactN.drop("_fp", "_sh"),
      "nearDup" -> curated.drop("_fp", "_sh"))
  }

  /** [[curateFrame]] plus a per-stage row-count report (one action per
    * stage — use curateFrame alone when the report isn't needed). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langCol: Option[String] = None,
      cfg: Config = Config()): (DataFrame, Report) = {
    val st = stages(docs, idCol, textCol, langCol, cfg).toMap
    val curated = st("nearDup")
    (curated, Report(docs.count(), st("quality").count(), st("lang").count(),
      st("repetition").count(), st("exactDedup").count(), curated.count()))
  }
}
