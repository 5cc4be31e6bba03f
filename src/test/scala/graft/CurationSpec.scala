package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Curation
import graft.text.TextOps

/** End-to-end corpus curation over the documents testdata plus synthetic
  * bad rows: every stage must drop exactly what it claims to drop. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curate: quality, language, repetition, exact + near dedup compose") {
    val docs = analytics.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val spam = Seq(
      (90001L, "buy gold " * 40 + "$$$$ !!!!", "en"), // repetitive spam
      (90002L, "the quick brown fox jumps over the lazy dog and then rests for a while near the river bank", "en"),
      (90003L, "the quick brown fox jumps over the lazy dog and then rests for a while near the river bank", "en"), // exact dup of 90002
      (90004L, "el zorro marron rapido salta sobre el perro perezoso y luego descansa un rato", "es"),
      (90005L, "zzz qqq xxx", "en") // short, stopword-free: quality 0.4
    ).toDF("doc_id", "text", "lang")
    val all = docs.unionByName(spam)

    val (curated, report) = Curation.curate(all, "doc_id", "text",
      langCol = Some("lang"),
      cfg = Curation.Config(minQuality = 0.5, keepLangs = Seq("en", "es"),
        maxRepetition = 0.5, nearDupJaccard = 0.8))

    assert(report.input == all.count())
    assert(report.afterQuality < report.input) // 90005 (short, no stopwords)
    assert(report.afterLang < report.afterQuality) // zh/fr/de dropped
    assert(report.afterRepetition < report.afterLang) // 90001 repetitive spam
    assert(report.afterExactDedup == report.afterRepetition - 1) // one exact dup
    assert(report.afterNearDup <= report.afterExactDedup)

    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(90005L)) // low quality dropped
    assert(!ids.contains(90001L)) // repetitive spam dropped
    assert(ids.contains(90002L) && !ids.contains(90003L)) // min-id survivor
    assert(ids.contains(90004L)) // es kept
    // testdata's planted near-dups: exactly one of each >=0.8 pair survives
    val pairs = graft.dedup.DedupOps.minhashLsh(
      curated, "doc_id", "text", threshold = 0.8, bands = 16, rowsPerBand = 4)
    assert(pairs.count() == 0, "curated corpus must contain no near-dup pair")
    // curated text is scrubbed: no raw emails/urls remain
    val pii = curated.select(
      sum(TextOps.piiCounts(col("text")).getField("emails")).as("e"))
      .as[Long].head()
    assert(pii == 0L)
  }

  test("curate is idempotent: a second pass drops nothing") {
    val docs = analytics.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val once = Curation.curateFrame(docs, "doc_id", "text")
    val twice = Curation.curateFrame(
      once.drop("quality"), "doc_id", "text")
    assert(twice.count() == once.count())
  }

  test("decontaminate: removes containing docs, keeps the rest unchanged") {
    val probe = "benchmark question alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"the filler text of the corpus runs along here $probe and then continues with more of the usual words"),
      (2L, "the clean document talks about the weather and the hills and the rivers of the region in plain terms")
    ).toDF("doc_id", "text")
    val probes = Seq((100L, probe)).toDF("doc_id", "text")
    val kept = graft.dedup.DedupOps.decontaminate(docs, probes,
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("curation decontaminates BEFORE dedup so a contaminated near-dup " +
      "winner cannot erase its clean duplicate") {
    // shared: long enough that A (shared + benchmark span) and B (shared)
    // stay >= 0.8 Jaccard near-dups; A contains the probe, B does not
    val shared = "the quick brown fox jumps over the lazy dog while the " +
      "gentle rain falls on the green hills and the warm wind blows " +
      "through the tall trees near the old stone bridge where the small " +
      "birds sing their morning songs and the slow river carries the " +
      "fallen leaves toward the quiet valley below the ancient mountains"
    val probeSpan = "benchmark question alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"$shared $probeSpan", "en"), // contaminated, min id
      (2L, shared, "en") // the clean near-dup
    ).toDF("doc_id", "text", "lang")
    val probes = Seq((100L, probeSpan)).toDF("doc_id", "text")

    // sanity: without probes the pair near-dups and the MIN id (the
    // contaminated doc!) survives
    val plain = Curation.curateFrame(docs, "doc_id", "text",
      langCol = Some("lang"))
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(1L))

    // with probes: 1 is removed for contamination FIRST, so 2 survives
    val decon = Curation.curateFrame(docs, "doc_id", "text",
      langCol = Some("lang"), contaminationProbes = Some(probes))
      .select("doc_id").as[Long].collect().toSet
    assert(decon == Set(2L))
  }

  test("segment cleanup stages: boilerplate + line dedup rewrite text " +
    "BEFORE the quality gate; disabled by default") {
    val nav = "subscribe to our newsletter now" // 5-token boilerplate
    val body1 = "the quick brown fox jumps over the lazy dog and rests " +
      "for a while near the river bank in the morning light"
    val body2 = "a completely different second document about shipping " +
      "routes and the seasonal market for fresh produce in the region"
    val docs = Seq(
      (1L, s"$nav $body1", "en"),
      (2L, s"$nav $body2", "en"),
      (3L, s"$nav $body1", "en"), // nav + exact dup body of 1
      (4L, body2 + " with an extra unique tail of plain words", "en"))
      .toDF("doc_id", "text", "lang")
    val cfg = Curation.Config(
      boilerplateMinDocFreq = Some(3), boilerplateSpan = 5,
      lineDedupSpan = Some(5),
      minQuality = 0.0, maxRepetition = 1.0, nearDupJaccard = 0.95)
    val st = Curation.stages(docs, "doc_id", "text", None, cfg).toMap
    assert(st.contains("segclean"), "segclean stage must be present")
    val cleaned = st("segclean").select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    // the nav span appears in 3 docs -> removed everywhere, including
    // its first occurrence
    assert(!cleaned.values.exists(_.contains(nav)))
    // doc 3's body spans duplicate doc 1's -> line dedup empties it,
    // and a fully-emptied doc is dropped from the corpus
    assert(cleaned(1L).nonEmpty && !cleaned.contains(3L))
    // default config has no segclean stage and identical text
    val defaults = Curation.stages(docs, "doc_id", "text", None,
      Curation.Config()).toMap
    assert(!defaults.contains("segclean"))
  }
}
