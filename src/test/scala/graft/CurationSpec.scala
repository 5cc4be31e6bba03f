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
}
