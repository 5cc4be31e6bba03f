package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprint (Schleimer et al. SIGMOD'03) as ONE
  * per-row kernel: hash every char-k-gram of the (pre-normalized) input,
  * take the min of each w-gram sliding window, return the distinct
  * selected hashes sorted ascending — all inside a single expression
  * evaluation, so the whole operator is a narrow projection + explode
  * with ZERO shuffles (the staged row-based form paid a per-doc window
  * exchange plus the distinct's exchange, and allocated one substring +
  * one 32-char hex string per gram; at sf0.1 that was 5.7 s — 21% of the
  * whole bench — for ~1.5M grams).
  *
  * Two hash modes, bit-compatible with the staged forms they replace:
  *  - `portable = true`: md5 hex strings (array<string>), ordering by hex
  *    == unsigned byte order of the 128-bit digest, so min/sort happen on
  *    two longs per gram and only the SELECTED mins are hex-encoded.
  *    Engine-portable — DuckDB's md5 produces identical strings, which is
  *    what makes `q_winnow_fp` a full oracle row.
  *  - `portable = false`: xxhash64(seed 42) longs (array<long>), identical
  *    to Spark's `xxhash64(substring(norm, i, k))` on the same input.
  *
  * Contract (same as the staged forms, property-tested equal): gram i ∈
  * [1, max(|s|−k+1, 1)] is substring(s, i, k) — a document shorter than
  * one gram contributes its whole text as the single gram; a document
  * with fewer than w grams contributes exactly one fingerprint, the min
  * over all its grams. NULL input yields NULL (the row vanishes under
  * explode) rather than a null fingerprint row.
  *
  * Scale: per-document local compute, embarrassingly parallel — the 100 TB
  * plan is scan → project → generate, no exchange at all.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int,
    portable: Boolean) extends UnaryExpression {
  require(k >= 1, s"gram size k must be >= 1, got $k")
  require(w >= 1, s"window size w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
    }

  override def dataType: DataType =
    if (portable) ArrayType(StringType, containsNull = false)
    else ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    if (portable) WinnowKernel.winnowMd5(str, k, w)
    else WinnowKernel.winnowXx(str, k, w)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "winnowMd5" else "winnowXx"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernel.$fn($c, $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowFingerprint = copy(child = newChild)
}

/** The per-row winnowing loops, as static methods so generated code makes
  * one monomorphic call per row (the loop bodies are plain JIT-compiled
  * bytecode — nothing here re-enters interpreted Catalyst). */
object WinnowKernel {

  /** MessageDigest is stateful and NOT thread-safe; referenced objects in
    * generated code are shared across an executor's task threads. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** md5 mode: distinct window-min digests as lowercase hex strings,
    * sorted ascending (hex order == unsigned digest-byte order, so all
    * comparisons run on two longs per gram). */
  def winnowMd5(s: UTF8String, k: Int, w: Int): ArrayData = {
    val md = md5Local.get()
    val nChars = s.numChars()
    val bytes = s.getBytes
    val ascii = bytes.length == nChars
    val g = math.max(nChars - k + 1, 1)
    // big-endian (hi, lo) halves of each gram's digest
    val hi = new Array[Long](g)
    val lo = new Array[Long](g)
    val buf = new Array[Byte](16)
    var i = 0
    while (i < g) {
      md.reset()
      if (ascii) {
        val len = math.min(k, nChars - i)
        if (len > 0) md.update(bytes, i, len)
      } else {
        val sub = s.substringSQL(i + 1, k)
        md.update(sub.getBytes)
      }
      md.digest(buf, 0, 16)
      var h = 0L; var l = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (buf(b) & 0xffL); b += 1 }
      while (b < 16) { l = (l << 8) | (buf(b) & 0xffL); b += 1 }
      hi(i) = h; lo(i) = l
      i += 1
    }
    // window mins, distinct, ordered — digests compare unsigned
    val cmp = new java.util.Comparator[Array[Long]] {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compareUnsigned(a(0), b(0))
        if (c != 0) c else java.lang.Long.compareUnsigned(a(1), b(1))
      }
    }
    val sel = new java.util.TreeSet[Array[Long]](cmp)
    val nWin = if (g >= w) g - w + 1 else 1
    var j = 0
    while (j < nWin) {
      var mi = j
      val end = math.min(j + w, g)
      var x = j + 1
      while (x < end) {
        val c = java.lang.Long.compareUnsigned(hi(x), hi(mi))
        if (c < 0 || (c == 0 &&
            java.lang.Long.compareUnsigned(lo(x), lo(mi)) < 0)) mi = x
        x += 1
      }
      sel.add(Array(hi(mi), lo(mi)))
      j += 1
    }
    val out = new Array[Any](sel.size())
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) {
      val d = it.next()
      val cs = new Array[Byte](32)
      var b = 0
      while (b < 8) {
        val v = ((d(0) >>> ((7 - b) * 8)) & 0xffL).toInt
        cs(2 * b) = hexDigits(v >>> 4).toByte
        cs(2 * b + 1) = hexDigits(v & 0xf).toByte
        b += 1
      }
      while (b < 16) {
        val v = ((d(1) >>> ((15 - b) * 8)) & 0xffL).toInt
        cs(2 * b) = hexDigits(v >>> 4).toByte
        cs(2 * b + 1) = hexDigits(v & 0xf).toByte
        b += 1
      }
      out(o) = UTF8String.fromBytes(cs)
      o += 1
    }
    new GenericArrayData(out)
  }

  /** xxhash64 mode: distinct window-min gram hashes (seed 42, matching
    * Spark's xxhash64), sorted ascending as signed longs (array_sort
    * order, matching the staged forms). */
  def winnowXx(s: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = s.numChars()
    val bytes = s.getBytes
    val ascii = bytes.length == nChars
    val g = math.max(nChars - k + 1, 1)
    val grams = new Array[Long](g)
    var i = 0
    while (i < g) {
      grams(i) =
        if (ascii) {
          val len = math.min(k, nChars - i)
          XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, len, 42L)
        } else {
          val sub = s.substringSQL(i + 1, k)
          val sb = sub.getBytes
          XXH64.hashUnsafeBytes(sb, Platform.BYTE_ARRAY_OFFSET, sb.length, 42L)
        }
      i += 1
    }
    val nWin = if (g >= w) g - w + 1 else 1
    val mins = new Array[Long](nWin)
    var j = 0
    while (j < nWin) {
      var m = grams(j)
      val end = math.min(j + w, g)
      var x = j + 1
      while (x < end) { if (grams(x) < m) m = grams(x); x += 1 }
      mins(j) = m
      j += 1
    }
    java.util.Arrays.sort(mins)
    var uniq = 0
    j = 0
    while (j < nWin) {
      if (j == 0 || mins(j) != mins(j - 1)) { mins(uniq) = mins(j); uniq += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(mins, uniq))
  }

  def winnowFingerprint(text: Column, k: Int, w: Int,
      portable: Boolean): Column =
    column(WinnowFingerprint(expression(text), k, w, portable))
}
