package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** JVM-side KLL probe kernel. TOP-LEVEL object so Scala emits a static
  * forwarder callable from the generated Java of [[KllQuantilesOf]]. */
object KllKernel {

  /** Quantiles at `probs` of a serialized [[KllDoublesSketch]] (INCLUSIVE
    * search criteria — the rank of q includes q itself, matching SQL
    * `percentile_disc` style). Empty sketch → empty array. */
  def quantiles(bytes: Array[Byte], probs: Array[Double]): ArrayData = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) new GenericArrayData(Array.emptyDoubleArray)
    else new GenericArrayData(
      sk.getQuantiles(probs, QuantileSearchCriteria.INCLUSIVE))
  }
}

/** Quantile probe over a serialized KLL sketch column — the read side of
  * the persisted quantile-sketch tables in [[graft.analytics.Sketches]].
  * Rows here are sketch-table rows (one per stratum, KB-sized), so the
  * per-row heapify is over megabytes total even when the sketched corpus
  * is terabytes.
  */
case class KllQuantilesOf(child: Expression, probs: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  @transient private lazy val probsArr: Array[Double] = probs.toArray

  override def nullSafeEval(v: Any): Any =
    KllKernel.quantiles(v.asInstanceOf[Array[Byte]], probsArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val probsRef = ctx.addReferenceObj("kllProbs", probsArr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.KllKernel.quantiles($v, $probsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : KllQuantilesOf = copy(child = newChild)
}

object KllQuantilesOf {
  def apply(sketch: Column, probs: Seq[Double]): Column =
    column(new KllQuantilesOf(expression(sketch), probs))
}
