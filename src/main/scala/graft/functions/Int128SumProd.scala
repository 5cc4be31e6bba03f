package graft.functions

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** EXACT 128-bit SUM of PRODUCTS Σ a·b — the second-moment companion to
  * [[Int128Sum]], closing the quantization-consistency gap in power-sum
  * statistics (variance, covariance, OLS, Welch t): quantize each value
  * ONCE to long micro-units, then accumulate the exact 128-bit per-row
  * product `a·b` (via `Math.multiplyHigh` — never overflows, for ANY two
  * longs) into the same two-limb int128 buffer.
  *
  * Why it exists: quantizing `y` and `y·y` independently
  * (`floor(y*1e6)` and `floor(y*y*1e6)`) makes the first and second
  * moments mutually inconsistent — near-constant data can yield a
  * slightly NEGATIVE sample variance from exact sums, and any oracle
  * that squares the quantized value diverges. Deriving the square from
  * the quantized value itself (Σ ym·ym at 1e-12 scale) restores the
  * Cauchy–Schwarz guarantee n·Σy² ≥ (Σy)² BY CONSTRUCTION, and the
  * DuckDB twin `SUM(CAST(ym AS HUGEINT) * ym)` is exactly this
  * aggregate. It also removes the old |x·y| ≤ 9.2e12 caller range bound:
  * the per-row product is exact int128, so only the per-VALUE micro
  * quantization bound remains.
  *
  * Input: two nullable LongType columns (exact fixed-point micro-units);
  * a row with EITHER side NULL is skipped (SQL `SUM(a*b)` semantics).
  * Output: `decimal(38,0)`, NULL on empty input. The int128 accumulator
  * overflows only past ~1e14 rows of 1e12-scale products — the same
  * unreachable-in-practice posture as [[Int128Sum]].
  *
  * Scale: 24-byte buffer, O(1) update/merge (two MULs + carry-aware
  * adds), full map-side partial aggregation — as cheap as a builtin
  * `sum(long)` at 100 TB.
  */
case class Int128SumProd(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"Int128SumProd inputs must both be LongType, got " +
        s"(${left.dataType}, ${right.dataType}); quantize to exact " +
        "fixed-point first (e.g. floor(x*1e6))")

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true

  // buffer layout: [hi, lo, count]; (hi, lo) is a two's-complement
  // int128 with lo interpreted unsigned (the Int128Sum layout)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](3)

  private def add128(b: Array[Long], hi: Long, lo: Long): Unit = {
    val oldLo = b(1)
    val newLo = oldLo + lo
    val carry = ((oldLo & lo) | ((oldLo | lo) & ~newLo)) >>> 63
    b(1) = newLo
    b(0) = b(0) + hi + carry
  }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val a = left.eval(input)
    if (a != null) {
      val c = right.eval(input)
      if (c != null) {
        val x = a.asInstanceOf[Long]
        val y = c.asInstanceOf[Long]
        // exact signed 128-bit product: (multiplyHigh, low 64 bits)
        add128(b, Math.multiplyHigh(x, y), x * y)
        b(2) += 1L
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    add128(b, o(0), o(1))
    b(2) += o(2)
    b
  }

  override def eval(b: Array[Long]): Any = {
    if (b(2) == 0L) null
    else {
      val loBytes = ByteBuffer.allocate(8).putLong(b(1)).array()
      val v = BigInteger.valueOf(b(0)).shiftLeft(64)
        .add(new BigInteger(1, loBytes))
      Decimal(scala.math.BigDecimal(v), 38, 0)
    }
  }

  override def serialize(b: Array[Long]): Array[Byte] =
    ByteBuffer.allocate(24).putLong(b(0)).putLong(b(1)).putLong(b(2)).array()

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array(bb.getLong, bb.getLong, bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): Int128SumProd =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Int128SumProd =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Int128SumProd =
    copy(left = l, right = r)
  override def prettyName: String = "int128_sum_prod"
}

object Int128SumProd {
  /** Exact int128 SUM of per-row products of two LongType columns. */
  def int128SumProd(a: Column, b: Column): Column =
    ColumnBridge.column(
      Int128SumProd(ColumnBridge.expression(a),
        ColumnBridge.expression(b)).toAggregateExpression())
}
