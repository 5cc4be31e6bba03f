package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

/** BPE trainer/encoder: classic hand-checkable merge sequence,
  * training-segmentation reproduction at encode time, round-trip
  * decodability, determinism under repartitioning, and the word-table
  * truncation contract. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("train: the Sennrich example merges in frequency order with " +
      "deterministic ties") {
    // corpus: low x5, lowest x2 — "lo" and "ow" dominate
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 4)
    // pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2 ... —
    // tie between (l,o) and (o,w) breaks lexicographically to (l,o)
    assert(model.merges(0) == ("l", "o"))
    // after merging "lo": (lo,w)=7 is the unique max
    assert(model.merges(1) == ("lo", "w"))
    // then "low</w>" (5) beats (low,e)=2
    assert(model.merges(2) == ("low", Bpe.EndOfWord))
    // 4-way tie at count 2 — (e,s) is the lexicographic minimum
    assert(model.merges(3) == ("e", "s"))
  }

  test("encode reproduces training segmentation; unseen words fall back " +
      "to finer pieces; round-trip concatenation restores the word") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 6)
    assert(Bpe.encodeWord("low", model).toSeq == Seq("low" + Bpe.EndOfWord))
    // unseen word shares learned stems where applicable
    val lower = Bpe.encodeWord("lower", model).toSeq
    assert(lower.head.startsWith("low"))
    for (w <- Seq("low", "lowest", "lower", "slow", "zzz")) {
      val pieces = Bpe.encodeWord(w, model)
      assert(pieces.mkString.replace(Bpe.EndOfWord, "") == w,
        s"round-trip failed for $w: ${pieces.toSeq}")
      assert(pieces.last.endsWith(Bpe.EndOfWord))
    }
  }

  test("train is invariant to partitioning; encode is a narrow map with " +
      "matching piece counts on real data") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = Bpe.train(docs.repartition(1), "text", numMerges = 50)
    val m32 = Bpe.train(docs.repartition(32), "text", numMerges = 50)
    assert(m1.merges == m32.merges)
    assert(m1.merges.size == 50)
    val enc = Bpe.encode(docs, "text", m1)
    assert(enc.filter(col("pieces_n") === 0 &&
      length(trim(col("text"))) > 0).count() == 0)
    // pieces never exceed characters+1 per word and compress as merges
    // apply: total pieces < total chars for natural text
    val stats = enc.select(
      sum(col("pieces_n")).cast("long"),
      sum(length(col("text"))).cast("long")).as[(Long, Long)].head()
    assert(stats._1 < stats._2)
    // no shuffle in the encode plan
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be narrow:\n$plan")
  }

  test("maxWords truncates the word table deterministically (count desc, " +
      "word asc) and numMerges=0 yields the identity model") {
    val docs = Seq("aa bb aa", "bb aa cc").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // with maxWords=1 only "aa" (count 3) trains: merges never mention b/c
    val m = Bpe.train(docs, "text", numMerges = 10, maxWords = 1)
    assert(m.merges.nonEmpty)
    assert(m.merges.forall { case (a, b) =>
      !(a + b).contains("b") && !(a + b).contains("c") })
    val empty = Bpe.train(docs, "text", numMerges = 0)
    assert(empty.merges.isEmpty)
    assert(Bpe.encodeWord("aa", empty).toSeq ==
      Seq("a", "a", Bpe.EndOfWord))
  }
}
