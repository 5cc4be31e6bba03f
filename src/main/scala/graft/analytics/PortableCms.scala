package graft.analytics

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** PORTABLE count-min sketch (Cormode–Muthukrishnan): `depth` counter
  * rows × `width` counters, row i's bucket for a key =
  * `(h1 mod w + i·(h2 mod w)) mod w` (Kirsch–Mitzenmacher double
  * hashing) with h1/h2 = the PORTABLE md5 halves
  * ([[graft.functions.HashExpressions.md5lo]]/`md5hi` ≡ DuckDB
  * `md5_number_lower`/`_upper`). Counter updates are exact integer adds
  * (merge-order independent), the bucket map is integer arithmetic on a
  * portable hash — so unlike Spark's built-in `count_min_sketch`
  * (engine-internal row hashing), every ESTIMATE is bit-reproducible in
  * plain SQL and the driver's oracle verifies the scoring outputs
  * exactly.
  *
  * Error contract (unchanged from any CMS): estimate ≥ true count
  * always; ≤ true + (e/width)·N with prob ≥ 1 − e^−depth. Defaults
  * (5 × 27183 ≈ ε 1e-4, δ 0.01) match the built-in path's sizing,
  * ~1 MB of counters regardless of key cardinality.
  *
  * 100 TB posture: identical to [[Sketches.cmsSketch]] — ONE
  * map-side-combined aggregate builds the counters; scoring passes are
  * map-only expressions over the broadcast MB-sized array; no
  * vocabulary join at any scale.
  */
object PortableCms {

  /** Flat `depth × width` counter array for grouped (h1, h2) hash pairs;
    * the finished sketch is the counters packed big-endian
    * ([[unpack]] reverses). */
  final class CmsAggregator(depth: Int, width: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Byte]] {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 1, s"width must be >= 1: $width")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(c: Array[Long], h: (Long, Long)): Array[Long] = {
      val h1m = java.lang.Long.remainderUnsigned(h._1, width)
      val h2m = java.lang.Long.remainderUnsigned(h._2, width)
      var i = 0
      while (i < depth) {
        c(i * width + ((h1m + i * h2m) % width).toInt) += 1L
        i += 1
      }
      c
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(c: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(c.length * 8)
      bb.asLongBuffer().put(c)
      bb.array()
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.javaSerialization[Array[Long]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Reverse [[CmsAggregator.finish]]'s packing. */
  def unpack(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  /** Point-frequency estimate: min over rows i of
    * `counters(i·width + bucket_i(h1, h2))`. The counter array rides the
    * expression (broadcast with the plan, [[CmsEstimateLong]] style), so
    * scoring is map-only. */
  case class CmsEstimate(left: Expression, right: Expression,
      counters: Array[Long], depth: Int, width: Int)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, bigint), got $other")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "portable_cms_estimate"

    override def nullSafeEval(h1: Any, h2: Any): Any =
      PortableCms.estimate(counters, depth, width,
        h1.asInstanceOf[Long], h2.asInstanceOf[Long])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmsCounters", counters, "long[]")
      nullSafeCodeGen(ctx, ev, (h1, h2) =>
        s"""${ev.value} = graft.analytics.PortableCms.estimate(
           |  $ref, $depth, $width, $h1, $h2);""".stripMargin)
    }

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): CmsEstimate =
      copy(left = newLeft, right = newRight)
  }

  /** Shared by interpreted eval and generated code. */
  def estimate(counters: Array[Long], depth: Int, width: Int,
      h1: Long, h2: Long): Long = {
    val h1m = java.lang.Long.remainderUnsigned(h1, width)
    val h2m = java.lang.Long.remainderUnsigned(h2, width)
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters(i * width + ((h1m + i * h2m) % width).toInt)
      if (c < min) min = c
      i += 1
    }
    min
  }

  def cmsEstimate(h1: Column, h2: Column, counters: Array[Long],
      depth: Int, width: Int): Column =
    column(CmsEstimate(expression(h1), expression(h2), counters, depth,
      width))
}
