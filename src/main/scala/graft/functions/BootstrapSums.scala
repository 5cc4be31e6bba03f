package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** FUSED BOOTSTRAP REPLICATE SUMS — per input row, derive all R
  * hash-seeded resample weights and accumulate (Σwᵣ·v, Σwᵣ) per
  * replica, in ONE tight JVM loop per row.
  *
  * The weight of replica r is the inverse-CDF bucket of the affine
  * replicate hash
  *   u_r = (a_r·h₁ + b_r·h₂ + c_r) mod `modulus`,
  *   w_r = |{k : u_r ≥ thresholds(k)}|,
  * where (h₁, h₂) are the row's hash slices and (a, b, c) are
  * per-replica coefficient vectors — every input an exact integer the
  * caller derives portably (md5 slices), so an external engine replays
  * the identical weights.
  *
  * Why an imperative aggregate instead of `transform` + a vector-sum:
  * higher-order functions don't participate in whole-stage codegen —
  * each element evaluation walks an interpreted expression tree
  * through a `NamedLambdaVariable` (an AtomicReference set per
  * element), and the R-length arrays are allocated per row per
  * consumer. Measured at sf0.1 / R = 200: ~6 s per query in HOF form
  * vs well under a second here — the arithmetic was never the bill,
  * the per-element interpreter machinery was. This loop is plain long
  * ops on primitive arrays: no allocation per row, no boxing, and
  * `Math.addExact` keeps the exact-or-LOUD overflow posture.
  *
  * Inputs: three LongType children (h₁, h₂, v in exact fixed-point
  * micros). A NULL in ANY child skips the row — `when(cond, vm)`
  * masking makes per-stratum sums (the uplift call site). Output:
  * struct<swv: array<long>, sw: array<long>> (length R each), NULL on
  * empty input.
  *
  * Scale: the buffer is 2R+1 longs (R a bounded knob), update is O(R)
  * primitive arithmetic, merge is O(R) adds, and partial aggregation
  * works normally — each partition collapses to one 2R-vector before
  * the exchange. */
case class BootstrapSums(
    first: Expression,
    second: Expression,
    third: Expression,
    coeffA: Seq[Long],
    coeffB: Seq[Long],
    coeffC: Seq[Long],
    modulus: Long,
    thresholds: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with TernaryLike[Expression] {

  require(coeffA.length == coeffB.length &&
    coeffB.length == coeffC.length && coeffA.nonEmpty,
    "coefficient vectors must share one positive length")
  // overflow contract, enforced (exact-or-LOUD): coefficients in
  // [0, modulus) and hash slices in [0, 2^40) keep the affine form
  // a*h1 + b*h2 + c under 2*modulus*2^40 + modulus, which stays in
  // long range iff modulus <= 2^22 — out-of-contract inputs would
  // otherwise wrap Long, make u negative, and silently zero every
  // weight
  require(modulus > 0 && modulus <= (1L << 22),
    s"modulus must be in (0, 2^22], got $modulus (larger moduli can " +
      "wrap the affine form in long arithmetic)")
  require(Seq(coeffA, coeffB, coeffC).forall(
      _.forall(v => v >= 0 && v < modulus)),
    s"coefficients must all be in [0, modulus=$modulus)")
  require(thresholds.nonEmpty && thresholds == thresholds.sorted,
    "thresholds must be non-empty ascending")

  /** Hash slices must be 40-bit (the overflow contract above). */
  private val MaxHash = (1L << 40) - 1L

  private def replicas: Int = coeffA.length

  // primitive copies for the hot loop (Seq keeps case-class equality
  // structural for Catalyst; these are the loop-facing views)
  @transient private lazy val aArr = coeffA.toArray
  @transient private lazy val bArr = coeffB.toArray
  @transient private lazy val cArr = coeffC.toArray
  @transient private lazy val tArr = thresholds.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "BootstrapSums inputs (h1, h2, vm) must all be LongType")

  override def dataType: DataType = StructType(Seq(
    StructField("swv", ArrayType(LongType, containsNull = false)),
    StructField("sw", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = true

  // layout: [swv(0..R-1), sw(0..R-1), nRows]
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * replicas + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h1v = first.eval(input)
    val h2v = second.eval(input)
    val vv = third.eval(input)
    if (h1v != null && h2v != null && vv != null) {
      val h1 = h1v.asInstanceOf[Long]
      val h2 = h2v.asInstanceOf[Long]
      if (h1 < 0L || h1 > MaxHash || h2 < 0L || h2 > MaxHash)
        throw new IllegalArgumentException(
          s"BootstrapSums: hash slice out of [0, 2^40) (h1=$h1, " +
            s"h2=$h2) - feed 40-bit digest slices, or the affine form " +
            "wraps long arithmetic")
      val v = vv.asInstanceOf[Long]
      val r = replicas
      var i = 0
      while (i < r) {
        val u = (aArr(i) * h1 + bArr(i) * h2 + cArr(i)) % modulus
        var w = 0L
        var k = 0
        while (k < tArr.length && u >= tArr(k)) { w += 1L; k += 1 }
        if (w > 0L) {
          // multiplyExact too: |v| can approach long range (any finite
          // metric quantizes), and a silent w·v wrap would corrupt the
          // CI while the HUGEINT oracle stays exact
          buf(i) = Math.addExact(buf(i), Math.multiplyExact(w, v))
          buf(r + i) = Math.addExact(buf(r + i), w)
        }
        i += 1
      }
      buf(2 * r) += 1L
    }
    buf
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 2 * replicas) {
      b(i) = Math.addExact(b(i), o(i))
      i += 1
    }
    b(2 * replicas) += o(2 * replicas)
    b
  }

  override def eval(b: Array[Long]): Any =
    if (b(2 * replicas) == 0L) null
    else InternalRow(
      new GenericArrayData(java.util.Arrays.copyOfRange(b, 0, replicas)),
      new GenericArrayData(
        java.util.Arrays.copyOfRange(b, replicas, 2 * replicas)))

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.length)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BootstrapSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BootstrapSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): BootstrapSums =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "bootstrap_sums"
}

object BootstrapSums {
  /** Per-replica (Σw·v, Σw) as one fused aggregate Column. */
  def bootstrapSums(h1: Column, h2: Column, vm: Column,
      coeffA: Seq[Long], coeffB: Seq[Long], coeffC: Seq[Long],
      modulus: Long, thresholds: Seq[Long]): Column =
    ColumnBridge.column(BootstrapSums(
      ColumnBridge.expression(h1), ColumnBridge.expression(h2),
      ColumnBridge.expression(vm), coeffA, coeffB, coeffC,
      modulus, thresholds).toAggregateExpression())
}
