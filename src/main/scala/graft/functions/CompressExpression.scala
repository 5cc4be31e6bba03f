package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side deflate kernel. TOP-LEVEL object: Scala emits a static
  * forwarder (`CompressKernel.ratio`) only for top-level objects, and the
  * generated Java of [[CompressExpression.DeflateRatio]] calls it
  * statically. */
object CompressKernel {
  // one native zlib state per executor thread, reset() between rows —
  // constructing a Deflater allocates ~256 KB of native state, which at
  // one-per-row turns a corpus pass into native alloc/free churn.
  // Threads are long-lived executor workers, so the per-thread state is
  // bounded (threads × 256 KB) and reused for the life of the executor.
  private val deflaters =
    java.lang.ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true))

  /** deflate(bytes).length / max(bytes.length, 1) — empty input maps to
    * 0.0 (nothing to compress), not a division error. */
  def ratio(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 0.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length.toDouble
  }
}

/** Deflate-based compression ratio — the low-entropy/repetition signal of
  * web-corpus curation (a document whose UTF-8 bytes compress far below
  * the corpus norm is boilerplate, keyboard mash, or template spam; one
  * far above is already-compressed noise). Computed per row on executors
  * by a zlib [[java.util.zip.Deflater]] in raw mode at the default level —
  * deterministic for a given input on a given JVM (spec-pinned), but NOT
  * engine-portable, so queries over it are rows-only (no DuckDB oracle).
  */
object CompressExpression {

  /** deflate-compression ratio of the UTF-8 bytes of a string column. */
  case class DeflateRatio(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "deflate_ratio"

    override def nullSafeEval(a: Any): Any =
      CompressKernel.ratio(a.asInstanceOf[UTF8String].getBytes)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        // stays inside WholeStageCodegen; the deflate call is a static
        // JVM method on the row's bytes (no boxing, no UDF serialization)
        s"${ev.value} = graft.functions.CompressKernel.ratio($a.getBytes());"
      })

    override protected def withNewChildInternal(newChild: Expression)
        : DeflateRatio = copy(child = newChild)
  }

  /** Column wrapper: `deflateRatio(col("text"))`. */
  def deflateRatio(text: Column): Column = column(DeflateRatio(expression(text)))
}
