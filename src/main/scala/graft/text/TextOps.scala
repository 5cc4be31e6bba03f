package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * extension; no reference implementation — anchored to
  * `/root/testdata/<sf>/documents.parquet`).
  *
  * Every operator is a pure `Column => Column` built ONLY from Spark
  * built-ins and higher-order functions — zero UDFs, so the whole text
  * pipeline stays inside whole-stage codegen and scales linearly with
  * input bytes: narrow projections, no shuffle, no driver round-trips.
  * At 100 TB that means the text pass is bounded by parquet scan + CPU,
  * and column pruning keeps the scan to the `text` column alone.
  */
object TextOps {

  /** Canonical text form shared by dedup + fingerprinting: lowercase,
    * punctuation stripped, whitespace collapsed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** Whitespace tokens of the raw (un-normalized) text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Adjacent-token co-occurrence pairs for keyword graphs (the
    * TextRank window-2 edge generator): `array<struct<src,dst>>` of
    * consecutive pairs over the [[normalize]]d token stream FILTERED to
    * tokens of at least `minLen` chars — tokens once separated only by
    * dropped short tokens become adjacent (the standard
    * filter-then-window order) — with self-pairs (immediate
    * repetitions) removed. Empty array when fewer than 2 tokens
    * survive. Pairs stay in-array (one row per document until the
    * caller explodes — the in-array pair-mining posture); linear in
    * document length, never quadratic. */
  def adjacentTokenPairs(text: Column, minLen: Int): Column = {
    val f = filter(tokens(normalize(text)),
      tk => length(tk) >= minLen)
    val pairs = zip_with(
      slice(f, lit(1), size(f) - 1),
      slice(f, lit(2), size(f) - 1),
      (a, b) => struct(a.as("src"), b.as("dst")))
    when(size(f) >= 2,
      filter(pairs, p => p("src") =!= p("dst")))
      .otherwise(array().cast("array<struct<src:string,dst:string>>"))
  }

  /** BPE-ish subword proxy: word chunks + standalone punctuation, the
    * standard pre-tokenizer regex family. Counts matches of
    * `[A-Za-z0-9]+|[^A-Za-z0-9\s]` — a deterministic stand-in for a real
    * BPE vocab (which would need model files not present here). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    // greatest(len, 1): identical for any non-empty text; an EMPTY string
    // scores 0.0 instead of throwing DIVIDE_BY_ZERO under ANSI mode
    // (reachable since segment cleanup can dedup a document to "")
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "be", "are", "or")

  /** Fraction of tokens that are (English) stopwords — a classic quality
    * signal: natural prose has ~0.3-0.5, keyword spam ~0. Set membership
    * is the codegen'd
    * [[graft.functions.HashExpressions.InSetCount]] (one hashed lookup
    * per token; the interpreted filter+array_contains form was the
    * hottest line of the text-stats bench). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords)
      : Column = {
    val toks = tokens(lower(text))
    graft.functions.HashExpressions.inSetCount(toks, stopwords)
      .cast("double") / size(toks).cast("double")
  }

  /** Mean token length in characters. */
  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double")
  }

  /** Composite quality from PRECOMPUTED component columns — the ONE
    * source of truth for the thresholds/weights, shared by
    * [[qualityScore]], the `q_text_stats` projection, and the curation
    * pipeline (which evaluate the components once per row and feed the
    * attributes here). Deterministic double arithmetic, same expression
    * shape as the oracle SQL. */
  def qualityFromComponents(nChars: Column, swRatio: Column,
      punct: Column, mwl: Column): Column =
    when(nChars >= 50 && nChars <= 10000, 1.0).otherwise(0.0) * 0.3 +
      when(swRatio >= 0.05, 1.0).otherwise(0.0) * 0.3 +
      when(punct <= 0.2, 1.0).otherwise(0.0) * 0.2 +
      when(mwl >= 2.0 && mwl <= 12.0, 1.0).otherwise(0.0) * 0.2

  /** Composite quality score in [0,1] — the C4/Gopher-style heuristic
    * family (length band, stopword presence, punctuation sanity,
    * word-length sanity) collapsed to one comparable number. NOTE as a
    * single Column this re-evaluates each component per reference; when
    * the frame shape allows, project the components as named columns and
    * use [[qualityFromComponents]] (see Curation.stages). */
  def qualityScore(text: Column): Column =
    qualityFromComponents(length(text), stopwordRatio(text),
      punctRatio(text), meanWordLen(text))

  /** Marker stopwords per language for the n-gram-free language-ID
    * heuristic. Ordered map ⇒ deterministic argmax tie-break (first wins). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "que", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Language-ID: distinct-marker-hit count per language, argmax with
    * deterministic order (score desc, then declaration order). Returns
    * "und" (undetermined) when no marker hits at all. */
  def languageId(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val scored = LangMarkers.map { case (lang, markers) =>
      // distinct toks × distinct markers ⇒ membership count ≡ intersect size
      (lang, graft.functions.HashExpressions.inSetCount(toks, markers))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), els) =>
      when(score === best && score > 0, lit(lang)).otherwise(els)
    }
  }

  /** Document fingerprint: md5 of the normalized text — the exact-dedup
    * key. md5 is bit-identical across engines (unlike xxhash64 whose seed
    * is engine-specific), so this IS oracle-verifiable. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** FLESCH READING EASE — the classic readability screen for corpus
    * curation (too-hard / too-trivial documents): 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words). All three
    * counts are simple deterministic surrogates an external engine
    * reproduces exactly: words = whitespace tokens, sentences =
    * terminator runs `[.!?]+` (min 1 — unterminated text is one
    * sentence), syllables = vowel-group runs `[aeiouy]+` of the
    * lowercased text (min 1 per word, floored at n_words). Returns a
    * struct (n_words, n_sentences, n_syllables, flesch) with flesch
    * rounded at 6; empty/blank text yields NULL flesch. */
  def readability(text: Column): Column = {
    val nWords = when(length(trim(text)) > 0,
      size(split(trim(text), "\\s+")).cast("long")).otherwise(lit(0L))
    val nSent = greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    // vowel-group surrogate, floored at one syllable per word
    val nSyl = greatest(
      size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
        .cast("long"),
      nWords)
    val (w, s, y) =
      (nWords.cast("double"), nSent.cast("double"), nSyl.cast("double"))
    struct(
      nWords.as("n_words"), nSent.as("n_sentences"), nSyl.as("n_syllables"),
      when(nWords > 0, round(
        lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (y / w), 6))
        .as("flesch"))
  }

  /** RE2-safe PII patterns (no lookarounds ⇒ identical semantics in Java
    * regex and DuckDB's RE2) — the pre-training scrub pass. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val IpPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** HTML → text extraction — the entry stage of a web-corpus pipeline
    * (CCNet / C4 / RefinedWeb all start from crawled HTML, not text):
    * strip `<script>`/`<style>` elements WITH their contents, strip
    * comments, strip remaining tags, decode the six common character
    * entities, collapse whitespace. Every pattern is RE2-safe (no
    * lookarounds, lazy quantifiers only), so DuckDB's `regexp_replace`
    * reproduces the extraction byte-for-byte — this is oracle-verifiable,
    * unlike a DOM parser. Element bodies go first (their contents may hold
    * `<`/`>` that must not be re-parsed as tags), `&amp;` decodes LAST so
    * double-escaped entities (`&amp;lt;`) stay escaped-once, per the HTML
    * spec's single-pass decode.
    *
    * Scale: a chain of codegen'd `regexp_replace` — one narrow projection,
    * no shuffle; the pass is bounded by parquet scan + regex CPU. */
  def htmlExtract(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** Redact emails, URLs, and IPv4 literals with typed placeholders.
    * Order matters: URLs first (they can contain @ and dots), then
    * emails, then bare IPs. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      IpPattern, "<IP>")

  /** Count of PII hits by kind (for filtering thresholds/reporting). */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(UrlPattern)).cast("long").as("urls"),
    regexp_count(regexp_replace(text, UrlPattern, " "), lit(EmailPattern))
      .cast("long").as("emails"),
    regexp_count(text, lit(IpPattern)).cast("long").as("ips"))

  /** Repetition score in [0,1): fraction of word n-grams that are
    * duplicates of an earlier one (Gopher-style repetition filter;
    * templated/spammy text scores high, natural prose near 0).
    * 1 − |distinct n-grams| / (|tokens| − n + 1). */
  def repetitionScore(text: Column, n: Int = 3): Column = {
    val toks = split(normalize(text), " ")
    val total = greatest(size(toks) - (n - 1), lit(1))
    lit(1.0) -
      size(graft.functions.HashExpressions.ngramHashes(toks, n))
        .cast("double") / total.cast("double")
  }

  /** Split a document into overlapping token windows — the context-window
    * chunking primitive of a pretraining pipeline (chunk `size` tokens,
    * advance by `stride`; stride < size gives overlap). Chunk i covers
    * tokens [i·stride, i·stride + size); the count is
    * 1 + max(0, ⌈(n − size) / stride⌉), so every token lands in at least
    * one chunk and a short document yields exactly one. Pure higher-order
    * expressions: a narrow projection that scales with input bytes.
    * Downstream `posexplode` turns it into (doc, chunk_idx, chunk) rows.
    */
  def chunkTokens(text: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    require(stride <= chunkSize,
      s"stride ($stride) > chunkSize ($chunkSize) would skip the tokens " +
        "between windows, breaking the every-token-covered contract")
    val toks = tokens(text)
    val nChunks = lit(1) + greatest(lit(0),
      ceil((size(toks) - chunkSize).cast("double") / stride).cast("int"))
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * stride + 1, lit(chunkSize)), " "))
  }

  /** Winnowing-style rolling fingerprint (Schleimer et al., SIGMOD'03):
    * hash every k-gram of the normalized text, then keep the minimum hash
    * in each sliding window of w consecutive k-gram hashes. Output: the
    * distinct selected hashes, sorted — a compact, position-robust
    * signature for near-dup detection at document granularity.
    * Pure higher-order expressions; xxhash64 is Spark-only ⇒ unit-tested
    * rather than DuckDB-matched. */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    winnowFingerprintWith(text, k, w, xxhash64(_))

  /** [[winnowFingerprint]] with a caller-chosen gram hash. Passing `md5`
    * yields an ENGINE-PORTABLE fingerprint (hex strings order identically
    * everywhere) — min-of-window selection only needs a total order on
    * hashes, not a specific hash.
    *
    * SCALE WARNING: this nested-HOF form re-evaluates the inner gram
    * array once per window element when interpreted (lambda bodies see
    * no common-subexpression elimination), i.e. O(|text|²) hashing per
    * document. Fine for short strings and tests; for corpora use
    * [[winnowFingerprints]], the row-based linear form. */
  def winnowFingerprintWith(text: Column, k: Int, w: Int,
      hash: Column => Column): Column = {
    val norm = normalize(text)
    val n = length(norm)
    val grams = transform(sequence(lit(1), greatest(n - (k - 1), lit(1))),
      i => hash(substring(norm, i, lit(k))))
    val windows = transform(
      sequence(lit(0), greatest(size(grams) - w, lit(0))),
      i => array_min(slice(grams, i + 1, lit(w))))
    array_sort(array_distinct(windows))
  }

  /** Winnowing document fingerprints (Schleimer et al. SIGMOD'03) as
    * (id, fp) ROWS — the corpus-scale form, fused into ONE per-row kernel
    * ([[graft.functions.WinnowFingerprint]]): gram hashing, sliding-window
    * min, per-doc distinct and sort all happen inside a single codegen'd
    * expression, so the plan is scan → project → explode with ZERO
    * shuffles (the earlier staged form paid a per-doc window exchange plus
    * the distinct's exchange and allocated a substring + hex string per
    * gram — 5.7 s at sf0.1 vs ~1 s fused). Per-document local compute ⇒
    * scales horizontally with the corpus.
    *
    * `portable = true` uses md5 (hex strings, engine-portable — the
    * DuckDB-matched mode `q_winnow_fp` declares); the default xxhash64
    * mode is ~2× cheaper and right for Spark-only pipelines.
    *
    * A document shorter than one full window contributes exactly one
    * fingerprint: the min over all its grams (same contract as the array
    * form; property-tested equal). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, portable: Boolean = false): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.WinnowKernel.winnowFingerprint(
        normalize(col(textCol)), k, w, portable)).as("fp"))
}
