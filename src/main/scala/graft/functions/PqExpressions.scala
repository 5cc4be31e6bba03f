package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Codegen'd product-quantization kernels (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
  * literature): split a d-dim vector into `m` contiguous `dsub`-dim
  * subvectors, quantize each against its own `k`-centroid codebook, and
  * score probes against codes via Asymmetric Distance Computation — a
  * per-probe lookup table of subspace dot products, so each candidate
  * costs `m` byte-indexed table reads instead of `d` float multiplies.
  *
  * Codebooks ride into generated code as reference objects (the
  * [[VectorExpressions.LshBuckets]] `planeSeeds` discipline); every loop
  * lives in the TOP-LEVEL [[PqKernel]] so interpreted eval and Janino-
  * compiled code share ONE implementation (the [[Sq8Kernel]]/[[LshKernel]]
  * parity rule).
  */
object PqExpressions {

  /** Codes of a vector: per subspace, the index of the nearest codebook
    * centroid (L2, ties → lowest index). `centroids` layout:
    * `((j*k + c)*dsub + t)`. */
  case class PqEncode(child: Expression, m: Int, k: Int, dsub: Int,
      centroids: Array[Float]) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got $other")
      }
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def prettyName: String = "pq_encode"

    override def nullSafeEval(a: Any): Any =
      PqKernel.encode(a.asInstanceOf[ArrayData], m, k, dsub, centroids)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cents = ctx.addReferenceObj("pqCents", centroids, "float[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.PqKernel.encode($a, $m, $k, $dsub, $cents);")
    }
    override protected def withNewChildInternal(newChild: Expression)
        : PqEncode = copy(child = newChild)
  }

  /** Per-probe ADC lookup table: `lut[j*k + c] = ⟨probe_sub_j, cent_jc⟩`
    * in double. Computed once per probe row, broadcast with it. */
  case class PqLut(child: Expression, m: Int, k: Int, dsub: Int,
      centroids: Array[Float]) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got $other")
      }
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_lut"

    override def nullSafeEval(a: Any): Any =
      PqKernel.lut(a.asInstanceOf[ArrayData], m, k, dsub, centroids)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cents = ctx.addReferenceObj("pqCents", centroids, "float[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.PqKernel.lut($a, $m, $k, $dsub, $cents);")
    }
    override protected def withNewChildInternal(newChild: Expression)
        : PqLut = copy(child = newChild)
  }

  /** ADC inner product: `Σ_j lut[j*k + codes[j]]` — the hot-path scoring
    * kernel (m table reads per candidate). */
  case class AdcDot(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double> lut, array<tinyint> codes), got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "adc_dot"

    override def nullSafeEval(a: Any, b: Any): Any =
      PqKernel.adcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.PqKernel.adcDot($a, $b, $k);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcDot =
      copy(left = newLeft, right = newRight)
  }

  /** Norm of the PQ reconstruction: subspaces are orthogonal coordinate
    * blocks, so `|r|² = Σ_j |cent_{j,codes_j}|²` — one table read per
    * subspace against the precomputed squared-norm table (layout
    * `j*k + c`). */
  case class PqReconNorm(child: Expression, k: Int,
      normSq: Array[Double]) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<tinyint>, got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_recon_norm"

    override def nullSafeEval(a: Any): Any =
      PqKernel.reconNorm(a.asInstanceOf[ArrayData], k, normSq)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ns = ctx.addReferenceObj("pqNormSq", normSq, "double[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.PqKernel.reconNorm($a, $k, $ns);")
    }
    override protected def withNewChildInternal(newChild: Expression)
        : PqReconNorm = copy(child = newChild)
  }

  def pqEncode(vec: Column, m: Int, k: Int, dsub: Int,
      centroids: Array[Float]): Column =
    column(PqEncode(expression(vec), m, k, dsub, centroids))

  def pqLut(vec: Column, m: Int, k: Int, dsub: Int,
      centroids: Array[Float]): Column =
    column(PqLut(expression(vec), m, k, dsub, centroids))

  def adcDot(lut: Column, codes: Column, k: Int): Column =
    column(AdcDot(expression(lut), expression(codes), k))

  def pqReconNorm(codes: Column, k: Int, normSq: Array[Double]): Column =
    column(PqReconNorm(expression(codes), k, normSq))
}

/** PQ loops shared by interpreted eval and generated code — TOP-LEVEL so
  * Janino-compiled code calls plain Java statics; ONE implementation so
  * the paths cannot drift (KernelSpec parity). */
object PqKernel {

  def encode(x: ArrayData, m: Int, k: Int, dsub: Int,
      cents: Array[Float]): ArrayData = {
    val n = x.numElements()
    if (n != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: expected ${m * dsub}-dim vector, got $n")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d2 = 0.0d
        var t = 0
        while (t < dsub) {
          val i = j * dsub + t
          if (x.isNullAt(i))
            throw new IllegalArgumentException(
              s"pq_encode: null element at $i")
          val diff = x.getFloat(i).toDouble -
            cents((j * k + c) * dsub + t).toDouble
          d2 += diff * diff
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = c } // strict < : ties → lowest c
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def lut(x: ArrayData, m: Int, k: Int, dsub: Int,
      cents: Array[Float]): ArrayData = {
    val n = x.numElements()
    if (n != m * dsub)
      throw new IllegalArgumentException(
        s"pq_lut: expected ${m * dsub}-dim vector, got $n")
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var acc = 0.0d
        var t = 0
        while (t < dsub) {
          val i = j * dsub + t
          if (x.isNullAt(i))
            throw new IllegalArgumentException(s"pq_lut: null element at $i")
          acc += x.getFloat(i).toDouble *
            cents((j * k + c) * dsub + t).toDouble
          t += 1
        }
        out(j * k + c) = acc
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def adcDot(lut: ArrayData, codes: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * k)
      throw new IllegalArgumentException(
        s"adc_dot: lut length ${lut.numElements()} != m*k = ${m * k}")
    var acc = 0.0d
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j))
        throw new IllegalArgumentException(s"adc_dot: null code at $j")
      acc += lut.getDouble(j * k + codes.getByte(j))
      j += 1
    }
    acc
  }

  def reconNorm(codes: ArrayData, k: Int, normSq: Array[Double]): Double = {
    val m = codes.numElements()
    if (normSq.length != m * k)
      throw new IllegalArgumentException(
        s"pq_recon_norm: table length ${normSq.length} != m*k = ${m * k}")
    var acc = 0.0d
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j))
        throw new IllegalArgumentException(
          s"pq_recon_norm: null code at $j")
      acc += normSq(j * k + codes.getByte(j))
      j += 1
    }
    math.sqrt(acc)
  }
}
