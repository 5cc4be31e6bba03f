package graft.analytics

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** PORTABLE dense HyperLogLog (Flajolet et al. 2007, with the standard
  * small-range linear-counting correction): 2^p byte registers, input is
  * a 64-bit PORTABLE hash ([[graft.functions.HashExpressions.md5lo]] ≡
  * DuckDB `md5_number_lower`), bucket = top p hash bits, register =
  * max(#leading zeros of the remaining 64−p bits + 1).
  *
  * Everything up to the final estimate is INTEGER arithmetic on a
  * deterministic hash, and the estimate itself is a fixed-association
  * float formula over one exact integer sum — so the whole operator is
  * bit-reproducible in any engine with md5 and 64-bit integers, and the
  * driver's DuckDB oracle verifies the ESTIMATES exactly (not just a
  * bound). That is the difference from the DataSketches-backed
  * [[Sketches.hllSketchTable]] (engine-internal sparse/dense encodings,
  * rows-only verifiable): same mergeability story — registers union by
  * elementwise max, so re-unioning overlapping batches never
  * double-counts — at dense-only memory (2^p bytes per stratum, 4 KB at
  * the default p=12, relative error ≈ 1.04/√m ≈ 1.6 %).
  *
  * 100 TB posture: identical to any HLL — one map-side-combined
  * aggregate, KB-sized partials, KB-sized persisted sketch rows.
  */
object PortableHll {

  /** Register blob for `hashes` grouped rows: `array[bucket] = max rho`.
    * Buffer and result are the raw 2^p register bytes. */
  final class HllAggregator(p: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 18, s"p must be in [4, 18], got $p")
    private val m = 1 << p
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(regs: Array[Byte], h: Long): Array[Byte] = {
      val bucket = (h >>> (64 - p)).toInt
      val w = h << p
      val rho = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > regs(bucket)) regs(bucket) = rho.toByte
      regs
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(regs: Array[Byte]): Array[Byte] = regs
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union register blobs (elementwise max) — the rollup side of the
    * portable sketch-table family. */
  final class HllUnionAggregator(p: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private val m = 1 << p
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(a: Array[Byte], b: Array[Byte]): Array[Byte] = merge(a, b)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(regs: Array[Byte]): Array[Byte] = regs
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Distinct estimate from a register blob. The harmonic sum is kept
    * EXACT: Σ 2^−reg = (Σ 2^(K−reg)) / 2^K with K = 64−p+1 (registers
    * range over [0, 64−p+1], so every shift is ≥ 0) — an integer sum
    * (BigInt here, HUGEINT in the oracle), so the only float steps are
    * one fixed-association multiply chain and one divide — plus m·ln(m/V)
    * in the small-range linear-counting branch. The oracle mirrors the
    * exact association; outputs are rounded before comparison so a
    * last-ulp `ln` difference cannot flip the match. */
  def estimate(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    val k = 64 - p + 1
    var s = BigInt(0)
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      if (r == 0) zeros += 1
      s += BigInt(1) << (k - r)
      i += 1
    }
    val mD = m.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / mD)
    // Σ 2^−reg = s / 2^k ⇒ E = α·m² / Σ = α·m²·2^k / s
    val raw = alpha * (mD * mD) * math.pow(2.0, k) / s.toDouble
    if (raw <= 2.5 * mD && zeros > 0) mD * math.log(mD / zeros)
    else raw
  }

  /** [[estimate]] as a codegen'd expression over a binary register
    * column (sketch-table read side; rows here are KB-sized strata). */
  case class HllEstimate(child: Expression, p: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "portable_hll_estimate"
    override def nullSafeEval(v: Any): Any =
      estimate(v.asInstanceOf[Array[Byte]], p)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.analytics.PortableHll.estimate($v, $p);")
    override protected def withNewChildInternal(newChild: Expression)
        : HllEstimate = copy(child = newChild)
  }

  def hllEstimate(regs: Column, p: Int): Column =
    column(HllEstimate(expression(regs), p))
}
