package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` registration exposing this library's codegen'd
  * expressions to SQL text, so config-driven pipelines (whose expectation
  * predicates and derived columns are SQL strings — reference
  * `02_silver_processing.py:94-95`) can call them:
  *
  * {{{
  * spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * Wire up with either
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  * Column-API users don't need this — `VectorExpressions`/
  * `HashExpressions` build the same expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  private def arity(name: String, n: Int, build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name),
      (args: Seq[Expression]) => {
        require(args.length == n,
          s"$name expects $n arguments, got ${args.length}")
        build(args)
      })

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples — consumed by both the
    * build-time extension path and [[register]]. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    arity("graft_float_dot", 2, a => VectorExpressions.FloatDot(a(0), a(1))),
    arity("graft_float_norm", 1, a => VectorExpressions.FloatNorm(a(0))),
    arity("graft_cosine", 2, a =>
      org.apache.spark.sql.catalyst.expressions.Divide(
        VectorExpressions.FloatDot(a(0), a(1)),
        org.apache.spark.sql.catalyst.expressions.Multiply(
          VectorExpressions.FloatNorm(a(0)),
          VectorExpressions.FloatNorm(a(1))))),
    arity("graft_lsh_buckets", 3, a => VectorExpressions.LshBuckets(a(0),
      intLit(a(1), "planes"), intLit(a(2), "tables"))),
    arity("graft_lsh_buckets_multiprobe", 4, a =>
      VectorExpressions.LshBucketsMultiProbe(a(0), intLit(a(1), "planes"),
        intLit(a(2), "tables"), intLit(a(3), "probes"))),
    // portable=true -> md5 hex strings (engine-portable); false -> xxhash64
    arity("graft_winnow_fingerprint", 4, a =>
      WinnowFingerprint(a(0), intLit(a(1), "k"), intLit(a(2), "w"),
        a(3) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"portable must be a boolean literal, got $other")
        })),
    arity("graft_simhash", 1, a => HashExpressions.SimHash64(a(0))),
    arity("graft_minhash_sig", 2,
      a => HashExpressions.MinHashSig(a(0), intLit(a(1), "k"))),
    arity("graft_ngram_hashes", 2,
      a => HashExpressions.NGramHashes(a(0), intLit(a(1), "n"))),
    arity("graft_word_ngrams", 2,
      a => HashExpressions.WordNGrams(a(0), intLit(a(1), "n"))),
    arity("graft_jaccard_sorted", 2,
      a => HashExpressions.JaccardSorted(a(0), a(1))),
    arity("graft_intersect_count_sorted", 2,
      a => HashExpressions.IntersectCountSorted(a(0), a(1))),
    arity("graft_deflate_ratio", 1,
      a => CompressExpression.DeflateRatio(a(0))),
    arity("graft_unicode_normalize", 2, a =>
      UnicodeExpression.UnicodeNormalize(a(0), a(1) match {
        case org.apache.spark.sql.catalyst.expressions
          .Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"form must be a string literal (NFC/NFD/NFKC/NFKD), got $other")
      })),
    arity("graft_sq8_encode", 1, a => VectorExpressions.Sq8Encode(a(0))),
    arity("graft_int8_dot", 2, a => VectorExpressions.Int8Dot(a(0), a(1))),
    arity("graft_float_abs_max", 1,
      a => VectorExpressions.FloatAbsMax(a(0))))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, i, builder) =>
      org.apache.spark.sql.graft.ColumnBridge
        .registerFunction(spark, ident, i, builder)
    }
}
