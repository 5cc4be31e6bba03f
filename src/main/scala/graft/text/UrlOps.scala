package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-level curation operators — the RefinedWeb/CCNet web-corpus family:
  * canonicalize URLs, extract hosts / registered domains, cap documents
  * per domain, filter against a host blocklist (north-star extension; no
  * reference implementation).
  *
  * Like [[TextOps]], every operator is a pure `Column => Column` (or a
  * thin DataFrame transform) built ONLY from Spark built-ins — zero UDFs,
  * whole-stage codegen throughout, narrow projections. The regex subset
  * used is valid with identical semantics in Java regex and RE2, so every
  * rule is reproducible in DuckDB for the oracle (no lookaround, no
  * backreference matching).
  *
  * 100 TB posture: normalize/host/domain are shuffle-free projections.
  * [[domainCap]] is one shuffle on the domain key with a rank-1..N filter
  * — Spark's WindowGroupLimit keeps ≤N rows per key per MAP partition, so
  * a hot domain (the wikipedia.org problem) is bounded before the
  * exchange, not after.
  */
object UrlOps {

  /** `scheme://host[:port]` prefix (group 0 of this pattern). */
  private val SchemeHost = "^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*"

  /** Tracking query parameters stripped by [[normalizeUrl]]. */
  private val Tracking = "(?:utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)"

  /** Canonicalize a URL string:
    *   1. trim;
    *   2. lowercase the `scheme://host[:port]` prefix (path/query case is
    *      significant and preserved);
    *   3. drop the `#fragment`;
    *   4. drop tracking parameters (`utm_*`, `gclid`, `fbclid`,
    *      `msclkid`) wherever they sit in the query string;
    *   5. drop explicit default ports (`http://h:80`, `https://h:443`);
    *   6. drop trailing slashes at end-of-URL.
    * Non-URL input passes through steps it can't match unchanged. */
  def normalizeUrl(url: Column): Column = {
    val t0 = trim(url)
    // lowercase scheme://host only
    val prefix = regexp_extract(t0, SchemeHost, 0)
    val t1 = concat(lower(prefix), t0.substr(length(prefix) + lit(1), length(t0)))
    val t2 = regexp_replace(t1, "#.*", "")
    // &tracking=v anywhere after the first param
    val t3 = regexp_replace(t2, "&" + Tracking + "=[^&#]*", "")
    // ?tracking=v&rest -> ?rest ; ?tracking=v$ -> (nothing)
    val t4 = regexp_replace(t3, "\\?" + Tracking + "=[^&#]*&", "?")
    val t5 = regexp_replace(t4, "\\?" + Tracking + "=[^&#]*$", "")
    // default ports; the ([/?#].*|$) alternation keeps the tail group
    // always-participating (empty-at-end), identical in Java and RE2
    val t6 = regexp_replace(t5, "^(http://[^/:?#]+):80([/?#].*|$)", "$1$2")
    val t7 = regexp_replace(t6, "^(https://[^/:?#]+):443([/?#].*|$)", "$1$2")
    regexp_replace(t7, "/+$", "")
  }

  /** Lowercased host of a URL (userinfo and port stripped); empty string
    * when the input has no `scheme://host` shape. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[a-zA-Z][a-zA-Z0-9+.\\-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Multi-part public suffixes recognized by [[registeredDomain]] — a
    * deliberately small PSL-lite set; a production deployment swaps in
    * the full Public Suffix List as a broadcast lookup. */
  private val MultiPartTld = "(?:co|com|org|net|ac|gov|edu)\\.[a-z]{2}"

  /** Registered domain (eTLD+1) of a lowercase host: the last two labels,
    * or the last three when the suffix is a known two-part TLD
    * (`co.uk`-style). Single-label hosts (e.g. `localhost`) pass through. */
  def registeredDomain(host: Column): Column = {
    val m = regexp_extract(host,
      "([^.]+\\." + MultiPartTld + "|[^.]+\\.[^.]+)$", 1)
    when(m === "", host).otherwise(m)
  }

  /** All URLs appearing in free text, in order of occurrence. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^\\s\"'<>]+"), lit(0))

  /** Keep at most `maxPerDomain` rows per domain, preferring rows first
    * by `order` (e.g. quality descending) — the per-domain cap that stops
    * one crawled site from dominating a training mix. The tie-break of
    * `order` must be total for deterministic output. One shuffle on the
    * domain key; rank ≤ N is map-side-bounded by WindowGroupLimit. */
  def domainCap(df: DataFrame, domainCol: String, maxPerDomain: Int,
      order: Seq[Column]): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be > 0, got $maxPerDomain")
    val w = Window.partitionBy(col(domainCol)).orderBy(order: _*)
    // fresh temp name (AsOfJoin/ZOrder discipline): never clobber a user
    // column that happens to be called _rn
    val rn = Iterator.iterate("_rn")(_ + "_")
      .dropWhile(df.columns.contains).next()
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= maxPerDomain)
      .drop(rn)
  }

  /** Drop rows whose `hostCol` is on a blocklist. For list-literal
    * blocklists (the common case: O(100)–O(10k) entries) this is a
    * codegen'd hash-set membership test — no join, no shuffle. NULL
    * hosts are KEPT (not blocklisted), matching the anti-join overload's
    * semantics — a bare `!isin` would silently drop them. */
  def hostBlocklistFilter(df: DataFrame, hostCol: String,
      blocked: Seq[String]): DataFrame =
    if (blocked.isEmpty) df
    else df.filter(
      coalesce(!col(hostCol).isin(blocked: _*), lit(true)))

  /** Blocklist form for large/dynamic deny lists held in a table: a
    * broadcast left-anti join on the host. */
  def hostBlocklistFilter(df: DataFrame, hostCol: String,
      blocked: DataFrame, blockedCol: String): DataFrame =
    df.join(broadcast(blocked),
      df(hostCol) === blocked(blockedCol), "left_anti")
}
