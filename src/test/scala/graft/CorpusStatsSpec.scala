package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.SimilarityOps
import graft.text.CorpusStats

/** Specs for the corpus-level text statistics ([[CorpusStats]]) and the
  * SemDeDup semantic-dedup operator — hand-computable ground truth on tiny
  * synthetic corpora (the declared queries `q_vocab_topk`, `q_tfidf_topk`,
  * `q_unigram_logprob`, `q_quality_logit`, `q_semdedup` are additionally
  * DuckDB-oracle-checked at sf0.01).
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "a dog ran")
  ).toDF("doc_id", "text")

  test("vocabulary: tf counts occurrences, df counts documents") {
    val v = CorpusStats.vocabulary(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(v("the") == (2L, 2L))
    assert(v("cat") == (2L, 2L))
    assert(v("ran") == (2L, 2L))
    assert(v("sat") == (1L, 1L))
    assert(v("a") == (1L, 1L))
    assert(v("dog") == (1L, 1L))
    assert(v.size == 6)
  }

  test("vocabulary: minCount filters, empty docs contribute nothing") {
    val withEmpty = docs.union(Seq((4L, "  ")).toDF("doc_id", "text"))
    val v = CorpusStats.vocabulary(withEmpty, "doc_id", "text", minCount = 2)
      .as[(String, Long, Long)].collect().map(_._1).toSet
    assert(v == Set("the", "cat", "ran"))
  }

  test("vocabularyTopK: ordered by tf desc then term asc, limited") {
    val top = CorpusStats.vocabularyTopK(docs, "doc_id", "text", k = 3)
      .as[(String, Long, Long)].collect().map(_._1).toSeq
    assert(top == Seq("cat", "ran", "the")) // all tf=2, term asc
  }

  test("tfidfTopTerms: corpus-wide terms score zero, rare terms rank first") {
    // "the" appears in 2/3 docs -> idf ln(1.5); "sat" in 1/3 -> ln(3)
    val out = CorpusStats.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(out(1L).head == "sat") // unique term wins doc 1
    assert(out(3L).take(2).toSet.subsetOf(Set("a", "dog"))) // both unique to doc 3
    val sat = CorpusStats.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .filter($"doc_id" === 1L && $"term" === "sat")
      .select($"tfidf").as[Double].head()
    assert(math.abs(sat - math.log(3.0)) < 1e-12)
  }

  test("unigramLogProb: hand-computed mean log token probability") {
    // corpus: the(2) cat(2) sat(1) ran(2) a(1) dog(1), T = 9
    val lp = CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .filter($"doc_id" === 1L)
      .select($"n_tokens", $"logprob").as[(Long, Double)].head()
    val expected = (math.log(2.0 / 9) + math.log(2.0 / 9) + math.log(1.0 / 9)) / 3
    assert(lp._1 == 3L)
    assert(math.abs(lp._2 - expected) < 1e-12)
  }

  test("bigramLogProb: hand-computed mean log conditional probability; " +
      "short docs drop") {
    // bigrams: d1 {the cat, cat sat}, d2 {the cat, cat ran}, d3 {a dog,
    // dog ran}; cb: the-cat=2 others=1; prefix counts: the=2 cat=2 a=1 dog=1
    val withShort = docs.union(Seq((4L, "single")).toDF("doc_id", "text"))
    val out = CorpusStats.bigramLogProb(withShort, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(4L)) // one token -> no bigrams -> drops
    // d1: (ln(2/2) + ln(1/2)) / 2
    assert(out(1L)._2 == 2L)
    assert(math.abs(out(1L)._3 - math.log(0.5) / 2) < 1e-12)
    // d3: both bigrams deterministic given their prefix -> logprob 0
    assert(out(3L)._2 == 2L && math.abs(out(3L)._3) < 1e-12)
  }

  test("bigramLogProb: order-sensitive where the unigram LM is not") {
    // same bag of words, natural vs scrambled order: unigram scores tie,
    // bigram must score the corpus-typical order higher
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat"),
      (4L, "mat the on sat cat the") // d1's bag, scrambled
    ).toDF("doc_id", "text")
    val uni = CorpusStats.unigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(uni(1L) - uni(4L)) < 1e-12)
    val bi = CorpusStats.bigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(bi(1L) > bi(4L))
  }

  test("logisticQuality: in (0,1), prose above repetitive spam") {
    val scores = Seq(
      ("good", "This is a clean sentence with the usual structure of prose and it has enough length to pass the filters easily."),
      ("spam", "buy gold buy gold buy gold buy gold buy gold buy gold buy gold buy gold")
    ).toDF("kind", "text")
      .select($"kind", CorpusStats.logisticQuality($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(scores.values.forall(s => s > 0.0 && s < 1.0))
    assert(scores("good") > scores("spam"))
  }

  test("tokenizeIds: rank ids, OOV to unk, original token order, empty " +
      "docs kept with an empty encoding") {
    // vocab k=3 over: cat(2) ran(2) the(2) sat(1) a(1) dog(1)
    // tie at tf=2 -> term asc: cat=1, ran=2, the=3; sat/a/dog OOV -> 0
    val vocab = CorpusStats.rankedVocabulary(docs, "doc_id", "text", k = 3)
    val withEmpty = docs.union(Seq((4L, "!!! ...")).toDF("doc_id", "text"))
    val out = CorpusStats.tokenizeIds(withEmpty, "doc_id", "text", vocab)
      .as[(Long, Seq[Int], Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == Seq(3, 1, 0) && out(1L)._3 == 1L) // the cat sat
    assert(out(2L)._2 == Seq(3, 1, 2) && out(2L)._3 == 0L) // the cat ran
    assert(out(3L)._2 == Seq(0, 0, 2) && out(3L)._3 == 2L) // a dog ran
    // punctuation-only text normalizes to zero tokens but must survive
    assert(out(4L)._2 == Seq.empty && out(4L)._3 == 0L)
  }

  test("sourceProfile: per-source docs, tokens, languages, mean quality") {
    val df = Seq(
      (1L, "the cat sat on the mat and the dog ran", "en", "a"),
      (2L, "the quick brown fox jumps over the lazy dog near the blue river", "en", "a"),
      (3L, "el perro es que un gato y la", "es", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val p = CorpusStats.sourceProfile(df, "source", "text", "lang")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("a")._2 == 2L && p("a")._3 == (10L + 13L) && p("a")._4 == 1L)
    assert(p("b")._2 == 1L && p("b")._3 == 8L)
    assert(p.values.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
  }

  // ---- semDedup -------------------------------------------------------------

  /** Axis-aligned toy embeddings: ids 0..2 near +x (one chained near-dup
    * group), 3 exactly +y, 4 near -x (outside every 0.9 pair). With
    * nlist=2 the centroids are vec 0 (+x-ish) and vec 1. */
  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.95f, 0.3122499f, 0.0f)), // cos(0,1) ~ 0.95
    (2L, Array(0.81f, 0.5864299f, 0.0f)), // cos(1,2) ~ 0.95, cos(0,2) ~ 0.81
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.2f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("semDedup: chained same-cell near-dups collapse to one component") {
    val out = SimilarityOps.semDedup(vecs, threshold = 0.9, nlist = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // pairs at 0.9: (0,1) and (1,2) — NOT (0,2); components must chain
    assert(out(0L) == 0L && out(1L) == 0L && out(2L) == 0L)
    assert(out(3L) == 3L && out(4L) == 4L) // singletons map to themselves
  }

  test("semDedup: one output row per input vector, cells within seed set") {
    val out = SimilarityOps.semDedup(vecs, threshold = 0.9, nlist = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_._2).forall(c => c == 0L || c == 1L)) // first 2 ids seed
  }

  test("semDedup: cross-cell pairs are out of scope by contract") {
    // two tight groups on opposite axes; nlist=2 seeds (0:+x, 1:-x) so the
    // groups land in different cells and never pair with each other
    val twoClusters = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(-1.0f, 0.05f)),
      (2L, Array(0.999f, 0.01f)), (3L, Array(-0.999f, 0.06f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.semDedup(twoClusters, threshold = 0.9, nlist = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out(2L) == 0L) // same cell as 0
    assert(out(3L) == 1L) // same cell as 1
    assert(out(0L) == 0L && out(1L) == 1L)
  }

  test("sourceDivergence: zero for identical strata, ln 2 for disjoint " +
      "vocabularies, hand-computed for a partial overlap; symmetric " +
      "output covers each unordered pair once") {
    val d = Seq(
      (1L, "sa", "x y"), (2L, "sa", "x y"),   // sa: P(x)=P(y)=.5
      (3L, "sb", "x y"),                       // sb identical dist
      (4L, "sc", "z w")                        // sc disjoint
    ).toDF("doc_id", "src", "text")
    val out = CorpusStats.sourceDivergence(d, "src", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out.keySet == Set(("sa", "sb"), ("sa", "sc"), ("sb", "sc")))
    assert(math.abs(out(("sa", "sb"))) < 1e-12, "identical dists -> 0")
    assert(math.abs(out(("sa", "sc")) - math.log(2.0)) < 1e-12,
      "disjoint vocab -> ln 2")
    // partial overlap, hand-computed: pa = {x: .5, y: .5}, pc = {x: 1.0}
    val d2 = Seq((1L, "a", "x y"), (2L, "c", "x")).toDF("doc_id", "src",
      "text")
    val js = CorpusStats.sourceDivergence(d2, "src", "text")
      .as[(String, String, Double)].head()._3
    val expect = 0.5 * (0.5 * math.log(2 * 0.5 / 1.5) +
      1.0 * math.log(2 * 1.0 / 1.5)) + 0.5 * math.log(2.0) * (0.5 + 0.0)
    assert(math.abs(js - expect) < 1e-12, s"$js vs $expect")
  }

  test("bm25TopK: hand-computed score; non-matching docs absent; ties " +
      "break on doc id; OOV query terms contribute nothing") {
    val q1 = Seq(("q1", "cat")).toDF("qid", "qtext")
    val got = CorpusStats
      .bm25TopK(docs, "doc_id", "text", q1, "qid", "qtext", k = 10)
      .as[(String, Int, Long, Double)].collect().sortBy(_._2)
    // N = 3, avgdl = 3, df(cat) = 2, tf = 1, dl = 3:
    // idf = ln(1 + 1.5/2.5); tfpart = 2.2 / (1 + 1.2·(0.25+0.75)) = 1
    val expected = math.log(1.0 + 1.5 / 2.5)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("q1", 1, 1L), ("q1", 2, 2L)), s"got: ${got.toSeq}")
    got.foreach(r => assert(math.abs(r._4 - expected) < 1e-9))
    val withOov = Seq(("q1", "cat zzznotaword")).toDF("qid", "qtext")
    val oov = CorpusStats
      .bm25TopK(docs, "doc_id", "text", withOov, "qid", "qtext", k = 10)
      .as[(String, Int, Long, Double)].collect().sortBy(_._2)
    assert(oov.toSeq == got.toSeq, "OOV term must not change results")
  }

  test("bm25TopK: equals the naive low-card-window form on real data; " +
      "k bounds each query's rows") {
    import org.apache.spark.sql.expressions.Window
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val probes = Seq(("a", "hash join merge"), ("b", "customer order"))
      .toDF("qid", "qtext")
    val got = CorpusStats
      .bm25TopK(corpus, "doc_id", "text", probes, "qid", "qtext", k = 7)
      .as[(String, Int, Long, Double)].collect().sorted.toSeq
    assert(got.count(_._1 == "a") == 7 && got.count(_._1 == "b") == 7)
    // naive: same per-(query, doc) decimal score, ONE window on the raw
    // query id (fine on a spec corpus; the operator's sharded selection
    // must reproduce it exactly)
    val tf = corpus.select(col("doc_id"),
        explode(split(graft.text.TextOps.normalize(col("text")), " "))
          .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val st = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val qt = probes.select(col("qid"),
        explode(split(graft.text.TextOps.normalize(col("qtext")), " "))
          .as("term")).distinct()
    val term = log(lit(1.0) + (col("n_docs").cast("double") -
        col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))) *
      (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
        lit(0.75) * col("dl").cast("double") / col("avgdl")))
    val naive = tf.join(qt, Seq("term")).join(dfreq, Seq("term"))
      .join(dl, Seq("doc_id")).crossJoin(st)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(term.cast("decimal(28,12)")).as("s"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("s").desc, col("doc_id").asc)))
      .filter(col("rank") <= 7)
      .select(col("qid"), col("rank"), col("doc_id"),
        col("s").cast("double").as("score"))
      .as[(String, Int, Long, Double)].collect().sorted.toSeq
    assert(got == naive)
  }

  test("hashingTf: bucket/sign from md5 match a reference computation; " +
      "cancelled buckets are dropped; deterministic") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(term: String, n: Int): Int =
      (java.lang.Long.parseLong(md5hex(term).take(8), 16) % n).toInt
    def sign(term: String): Long =
      if (Integer.parseInt(md5hex(term).substring(8, 9), 16) % 2 == 0) 1L
      else -1L
    val n = 16
    val expected = Seq(
      (1L, Seq("the", "cat", "sat", "the")),
      (2L, Seq("dog", "ran"))
    ).flatMap { case (id, toks) =>
      toks.groupBy(t => bucket(t, n)).toSeq.map { case (b, ts) =>
        (id, b, ts.map(sign).sum) }
    }.filter(_._3 != 0L).sorted
    val df = Seq((1L, "The cat SAT the!"), (2L, "dog ran"))
      .toDF("doc_id", "text")
    val got = CorpusStats.hashingTf(df, "doc_id", "text", numFeatures = n)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(got == expected)
    // deterministic across runs
    val again = CorpusStats.hashingTf(df, "doc_id", "text", numFeatures = n)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(again == got)
    // a +1 and a -1 term forced into the SAME bucket (numFeatures = 1)
    // with equal counts cancels to zero and the row is DROPPED
    val plus = Seq("aa", "ab", "ac", "ad").find(sign(_) == 1L).get
    val minus = Seq("aa", "ab", "ac", "ad", "ae", "af").find(sign(_) == -1L).get
    val cancelled = CorpusStats.hashingTf(
      Seq((9L, s"$plus $minus")).toDF("doc_id", "text"),
      "doc_id", "text", numFeatures = 1)
    assert(cancelled.count() == 0)
    // weight bound: |weight| <= token occurrences per bucket
    assert(got.forall { case (_, _, w) => math.abs(w) <= 2 })
    assertThrows[IllegalArgumentException](
      CorpusStats.hashingTf(df, "doc_id", "text", numFeatures = 0))
  }

  test("dsirLogWeights: hand-computed likelihood ratios; target words " +
    "score positive, off-target negative; decimal sums deterministic") {
    // md5 buckets mod 4: alpha -> 3, beta -> 0 (distinct, so the hand
    // math below sees no collision). Target = docs 1,2 (all-alpha);
    // raw adds doc 3 (all-beta).
    //   ct: alpha 3, beta 0;  cr: alpha 3, beta 3;  Tt = 3, Tr = 6
    //   lr(alpha) = ln((3+1)/(3+4)) - ln((3+1)/(6+4)) = ln(40/28)
    //   lr(beta)  = ln((0+1)/(3+4)) - ln((3+1)/(6+4)) = ln(10/28)
    val df = Seq(
      (1L, "alpha alpha"), (2L, "alpha"), (3L, "beta beta beta")
    ).toDF("doc_id", "text")
    val out = CorpusStats.dsirLogWeights(df, "doc_id", "text",
        target = $"doc_id" <= 2L, numFeatures = 4)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val lrA = math.log(40.0 / 28.0)
    val lrB = math.log(10.0 / 28.0)
    assert(out(1L)._1 == 2L && math.abs(out(1L)._2 - 2 * lrA) < 1e-9)
    assert(out(2L)._1 == 1L && math.abs(out(2L)._2 - lrA) < 1e-9)
    assert(out(3L)._1 == 3L && math.abs(out(3L)._2 - 3 * lrB) < 1e-9)
    // the selection property DSIR exists for: target-like docs weigh
    // above off-target docs
    assert(out(1L)._2 > 0 && out(2L)._2 > 0 && out(3L)._2 < 0)
    // deterministic across runs (decimal-cast sum ⇒ merge-order-free)
    val again = CorpusStats.dsirLogWeights(df, "doc_id", "text",
        target = $"doc_id" <= 2L, numFeatures = 4)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(again == out)
    assertThrows[IllegalArgumentException](CorpusStats.dsirLogWeights(
      df, "doc_id", "text", target = lit(true), numFeatures = 0))
    assertThrows[IllegalArgumentException](CorpusStats.dsirLogWeights(
      df, "doc_id", "text", target = lit(true), alpha = 0.0))
  }

  test("distinctNgrams: hand-counted token/bigram ratios, normalization, " +
      "single-token group has no bigrams, empty docs contribute nothing") {
    // g1: "a b a" + "b c" → 5 tokens {a,b,c} ⇒ 600000;
    //     bigrams {a b, b a, b c} all distinct ⇒ 1e6
    // g2: "x" only ⇒ distinct-1 1e6, zero bigrams ⇒ NULL distinct-2
    val df = Seq(
      ("g1", "a b a"), ("g1", "B, c!"), // normalization folds case/punct
      ("g2", "x"), ("g2", ""))
      .toDF("src", "text")
    val out = CorpusStats.distinctNgrams(df, "text", Seq("src"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert((g1.getLong(1), g1.getLong(2), g1.getLong(3), g1.getLong(4))
      == (5L, 600000L, 3L, 1000000L))
    val g2 = out("g2")
    assert((g2.getLong(1), g2.getLong(2), g2.getLong(3))
      == (1L, 1000000L, 0L))
    assert(g2.isNullAt(4))
    // a repetition-collapsed group scores low on distinct-2
    val rep = Seq(("r", "spam spam spam spam spam")).toDF("src", "text")
    val rr = CorpusStats.distinctNgrams(rep, "text", Seq("src"))
      .collect().head
    // 5 tokens 1 distinct ⇒ 200000; 4 bigrams 1 distinct ⇒ 250000
    assert((rr.getLong(1), rr.getLong(2), rr.getLong(3), rr.getLong(4))
      == (5L, 200000L, 4L, 250000L))
    assertThrows[IllegalArgumentException](
      CorpusStats.distinctNgrams(df, "text", Seq.empty))
    // a NULL group key keeps its bigram stats (null-safe group join —
    // a plain key join would report 0 bigrams for the null source)
    val nullGrp = Seq((Option.empty[String], "a b c")).toDF("src", "text")
    val rg = CorpusStats.distinctNgrams(nullGrp, "text", Seq("src"))
      .collect().head
    assert(rg.isNullAt(0) && rg.getLong(3) == 2L &&
      rg.getLong(4) == 1000000L)
  }

  test("collocations: hand-computed Dunning G2 over a 12-bigram " +
      "corpus, min-count filter, deterministic rank order") {
    // bigram counts (a,b)=5 (a,c)=1 (d,b)=1 (d,e)=2 (f,c)=3, n=12:
    // G2 = fc 8.997362 > de 6.994384 > ab 5.822063 > ac 1.551839 >
    // db 0.451139 (each from the 2x2 margin table by hand)
    val docs = (Seq.fill(5)("a b") ++ Seq("a c", "d b") ++
      Seq.fill(2)("d e") ++ Seq.fill(3)("f c")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    def top(k: Int, mc: Long) =
      CorpusStats.collocations(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, mc)
        .as[(Int, String, String, Long, Long, Long, Double)]
        .collect().toSeq
    assert(top(3, 1L) == Seq(
      (1, "f", "c", 3L, 3L, 4L, 8.997362),
      (2, "d", "e", 2L, 3L, 2L, 6.994384),
      (3, "a", "b", 5L, 6L, 6L, 5.822063)))
    // min-count 3 drops the rare pairs; ranks close up
    assert(top(5, 3L).map(r => (r._1, r._2, r._3)) ==
      Seq((1, "f", "c"), (2, "a", "b")))
  }

  test("zipf fit composition: an exactly-Zipfian vocabulary regresses " +
      "to slope -1 with r2 ~ 1 on the ranked head") {
    // tf = 24/rank exactly: {a:24, b:12, c:8, d:6} ⇒ ln tf =
    // ln 24 − ln rank — a perfect line of slope −1
    val text = (Seq.fill(24)("a") ++ Seq.fill(12)("b") ++
      Seq.fill(8)("c") ++ Seq.fill(6)("d")).mkString(" ")
    val rv = CorpusStats.rankedVocabulary(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", k = 10)
    assert(rv.orderBy(col("id")).as[(String, Int, Long, Long)]
      .collect().toSeq.map(r => (r._1, r._3)) ==
      Seq(("a", 24L), ("b", 12L), ("c", 8L), ("d", 6L)))
    val fit = graft.analytics.Regression.olsByGroup(
        rv.select(lit("corpus").as("g"),
          log(col("id").cast("double")).as("x"),
          log(col("tf").cast("double")).as("y")),
        Seq("g"), "x", "y").head
    assert(fit.getLong(1) == 4L)
    assert(math.abs(fit.getDouble(2) + 1.0) < 1e-5) // slope ≈ −1
    assert(fit.getDouble(4) > 0.999999)             // r2 ≈ 1
  }

  test("chiSquareTerms: hand-computed 2x2 chi-squares, tie break on " +
      "term, zero-margin drops, in-doc repeats count once") {
    def chi(rows: Seq[(Long, String, String)], k: Int = 5) =
      CorpusStats.chiSquareTerms(rows.toDF("id", "lang", "text"),
          "id", "lang", "text", k)
        .orderBy(col("lang"), col("rank"))
        .as[(String, Int, String, Long, Long, Double)].collect().toSeq
    // en {alpha beta, alpha}, fr {beta, beta gamma}; N=4, N_c=2 each:
    // (en,alpha) a=2,b=0,c=0,d=2 ⇒ χ² = 4·16/16 = 4; every other
    // present pair is the a=1/a=2 margin ⇒ 16/12 = 1.333333, and the
    // fr tie beta/gamma breaks on term asc
    val rows = Seq((1L, "en", "alpha beta"), (2L, "en", "alpha"),
      (3L, "fr", "beta"), (4L, "fr", "beta gamma"))
    assert(chi(rows) == Seq(
      ("en", 1, "alpha", 2L, 2L, 4.0),
      ("en", 2, "beta", 1L, 3L, 1.333333),
      ("fr", 1, "beta", 2L, 3L, 1.333333),
      ("fr", 2, "gamma", 1L, 1L, 1.333333)))
    // a term in EVERY doc has a zero margin — dropped, ranks close up
    val withZeta = rows.map { case (i, l, t) => (i, l, t + " zeta") }
    assert(chi(withZeta).map(_._3) ==
      Seq("alpha", "beta", "beta", "gamma"))
    // repeated tokens inside one doc count presence once
    val rep = Seq((1L, "en", "alpha alpha"), (2L, "fr", "beta"))
    assert(chi(rep).map(r => (r._1, r._3, r._4)) ==
      Seq(("en", "alpha", 1L), ("fr", "beta", 1L)))
    // a single-class corpus has nothing to discriminate
    assert(chi(Seq((1L, "en", "alpha"), (2L, "en", "beta"))) ==
      Seq.empty)
  }

  test("heapsLaw: every-token-new corpus fits slope exactly 1 with " +
      "intercept 0 and r2 1; constant vocabulary fits slope 0 with " +
      "undefined r2") {
    import spark.implicits._
    import graft.text.CorpusStats
    // 8 docs x 3 globally-unique tokens: V_k == T_k at every
    // checkpoint, so xm == ym per point and the closed form is exact
    val fresh = (1 to 8).map(i =>
      (i.toLong, s"a${i}x a${i}y a${i}z")).toDF("doc_id", "text")
    val f = CorpusStats.heapsLaw(fresh, "doc_id", "text",
        checkpoints = 4)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(f == (("corpus", 4L, Some(1.0), Some(0.0), Some(1.0))))
    // identical docs: vocabulary saturates at 2 after checkpoint 1 —
    // slope exactly 0, intercept ln 2 (olsByGroup's r2 convention for
    // variance-free y is 0.0)
    val const = (1 to 8).map(i => (i.toLong, "alpha beta"))
      .toDF("doc_id", "text")
    val c = CorpusStats.heapsLaw(const, "doc_id", "text",
        checkpoints = 4)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(c == (("corpus", 4L, Some(0.0), Some(0.693147), Some(0.0))),
      s"constant vocabulary should fit flat: $c")
  }
}
