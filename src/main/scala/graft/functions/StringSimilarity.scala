package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side Jaro/Jaro–Winkler kernel. TOP-LEVEL object so the generated
  * Java of [[StringSimilarity.JaroWinklerSim]] calls it statically (the
  * [[UnicodeKernel]] discipline). */
object JaroKernel {

  /** Standard Jaro–Winkler similarity over Unicode code points —
    * matching-window `max(|a|,|b|)/2 − 1`, greedy left-to-right match,
    * transpositions = half the out-of-order matched positions, Winkler
    * prefix boost `l·0.1·(1−jaro)` with `l ≤ 4` applied only when
    * jaro > 0.7. Either side empty yields 0.0 (the DuckDB
    * `jaro_winkler_similarity` convention — similarity of nothing is
    * undefined, not perfect). The double arithmetic is the fixed
    * textbook sequence `(m/|a| + m/|b| + (m−t)/m)/3` then the boost —
    * the same closed form external engines evaluate, so oracle rows
    * compare after a 4-decimal round (the discrete inputs m/t/l are
    * integer-exact; only the final two-op association could differ in
    * the last ulp). */
  def jaroWinkler(aS: UTF8String, bS: UTF8String): Double = {
    val a = aS.toString
    val b = bS.toString
    val la = a.codePointCount(0, a.length)
    val lb = b.codePointCount(0, b.length)
    if (la == 0 || lb == 0) return 0.0
    val ac = a.codePoints().toArray
    val bc = b.codePoints().toArray
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && ac(i) == bc(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var trans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (ac(i) != bc(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val t = trans / 2.0
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(la, lb)) && ac(l) == bc(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Jaro–Winkler string similarity — the entity-resolution edit metric
  * (typo'd names, transposed characters) that complements Levenshtein:
  * insensitive to length, transposition-aware, prefix-weighted (names
  * differ at the tail more often than the head). */
object StringSimilarity {

  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, string), got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      JaroKernel.jaroWinkler(a.asInstanceOf[UTF8String],
        b.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.JaroKernel.jaroWinkler($a, $b);")

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): JaroWinklerSim =
      copy(left = newLeft, right = newRight)
  }

  /** Column wrapper: `jaroWinkler(col("a"), col("b"))` ∈ [0, 1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinklerSim(expression(a), expression(b)))
}
