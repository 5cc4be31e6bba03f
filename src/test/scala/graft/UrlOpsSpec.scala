package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.UrlOps

/** Specs for the URL-curation operators ([[UrlOps]]): canonicalization
  * rules one by one, host/registered-domain extraction, the per-domain
  * cap, and blocklist filtering (the declared queries `q_url_normalize` /
  * `q_domain_cap` are additionally DuckDB-oracle-checked at sf0.01).
  */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(UrlOps.normalizeUrl(col("u")))
      .as[String].head()

  private def host(url: String): String =
    Seq(url).toDF("u").select(UrlOps.urlHost(col("u"))).as[String].head()

  private def domain(h: String): String =
    Seq(h).toDF("h").select(UrlOps.registeredDomain(col("h")))
      .as[String].head()

  test("normalizeUrl: scheme+host lowercased, path case preserved") {
    assert(norm("HTTP://WWW.Example.COM/Docs/A") ==
      "http://www.example.com/Docs/A")
  }

  test("normalizeUrl: fragment dropped") {
    assert(norm("https://a.com/p#section-2") == "https://a.com/p")
  }

  test("normalizeUrl: tracking params dropped in every position") {
    // leading ?utm followed by a kept param
    assert(norm("https://a.com/p?utm_source=x&q=1") == "https://a.com/p?q=1")
    // mid/trailing &utm
    assert(norm("https://a.com/p?q=1&utm_medium=y&r=2") ==
      "https://a.com/p?q=1&r=2")
    assert(norm("https://a.com/p?q=1&fbclid=z") == "https://a.com/p?q=1")
    // ONLY a tracking param -> bare path (then trailing ? is gone)
    assert(norm("https://a.com/p?gclid=abc") == "https://a.com/p")
    // non-tracking params survive untouched
    assert(norm("https://a.com/p?query=utm_source") ==
      "https://a.com/p?query=utm_source")
  }

  test("normalizeUrl: default ports dropped, explicit ports kept") {
    assert(norm("http://a.com:80/p") == "http://a.com/p")
    assert(norm("https://a.com:443") == "https://a.com")
    assert(norm("http://a.com:8080/p") == "http://a.com:8080/p")
    // https on :80 is NOT a default port
    assert(norm("https://a.com:80/p") == "https://a.com:80/p")
  }

  test("normalizeUrl: trailing slash(es) dropped, root included") {
    assert(norm("https://a.com/p/") == "https://a.com/p")
    assert(norm("https://a.com/") == "https://a.com")
    assert(norm("https://a.com/p//") == "https://a.com/p")
  }

  test("normalizeUrl: non-URL text passes through (trim only)") {
    assert(norm("  not a url  ") == "not a url")
  }

  test("urlHost: lowercases, strips userinfo and port") {
    assert(host("HTTPS://User:pw@WWW.Ex.COM:8443/p?q=1") == "www.ex.com")
    assert(host("http://a.co.uk/x") == "a.co.uk")
    assert(host("no-scheme.com/x") == "")
  }

  test("registeredDomain: eTLD+1 with PSL-lite two-part suffixes") {
    assert(domain("www.example.com") == "example.com")
    assert(domain("a.b.example.org") == "example.org")
    assert(domain("www.bbc.co.uk") == "bbc.co.uk")
    assert(domain("example.com") == "example.com")
    assert(domain("localhost") == "localhost")
  }

  test("extractUrls: all URLs in order; boundary chars end the match") {
    val out = Seq("see https://a.com/x and http://b.org/y?z=1 <https://c.net> done")
      .toDF("t").select(UrlOps.extractUrls(col("t")))
      .as[Seq[String]].head()
    assert(out == Seq("https://a.com/x", "http://b.org/y?z=1",
      "https://c.net"))
    val none = Seq("no links here").toDF("t")
      .select(UrlOps.extractUrls(col("t"))).as[Seq[String]].head()
    assert(none.isEmpty)
  }

  test("domainCap: keeps at most N per domain by the given order") {
    val df = Seq(
      ("d1", 1L, 10), ("d1", 2L, 30), ("d1", 3L, 20), ("d1", 4L, 40),
      ("d2", 5L, 5)
    ).toDF("dom", "id", "score")
    val out = UrlOps.domainCap(df, "dom", 2,
        Seq(col("score").desc, col("id").asc))
      .select("id").as[Long].collect().toSet
    assert(out == Set(4L, 2L, 5L)) // d1 keeps its top-2 scores, d2 all
  }

  test("domainCap: deterministic under score ties via the tie-break") {
    val df = Seq(("d", 1L, 7), ("d", 2L, 7), ("d", 3L, 7))
      .toDF("dom", "id", "score")
    val out = UrlOps.domainCap(df, "dom", 2,
        Seq(col("score").desc, col("id").asc))
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("hostBlocklistFilter: literal list and table forms agree, " +
      "including on NULL hosts (kept by both)") {
    val df = Seq((Option("spam.com"), 1L), (Option("ok.org"), 2L),
        (Option("bad.net"), 3L), (Option.empty[String], 4L))
      .toDF("host", "id")
    val blocked = Seq("spam.com", "bad.net")
    val viaList = UrlOps.hostBlocklistFilter(df, "host", blocked)
      .select("id").as[Long].collect().toSet
    val viaTable = UrlOps.hostBlocklistFilter(df, "host",
        blocked.toDF("bhost"), "bhost")
      .select("id").as[Long].collect().toSet
    assert(viaList == Set(2L, 4L) && viaTable == Set(2L, 4L))
  }

  test("domainCap: does not clobber a pre-existing _rn column") {
    val df = Seq(("d", 1L, 5, "keepme")).toDF("dom", "id", "score", "_rn")
    val out = UrlOps.domainCap(df, "dom", 1, Seq(col("score").desc))
    assert(out.columns.contains("_rn"))
    assert(out.select("_rn").as[String].head() == "keepme")
  }
}
