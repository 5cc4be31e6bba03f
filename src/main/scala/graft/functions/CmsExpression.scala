package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate against a pre-built [[CountMinSketch]] over
  * 64-bit keys — the executor side of sketch-based frequency scoring
  * ([[graft.analytics.Sketches]]). Same shape as [[BloomMightContainLong]]:
  * the sketch rides into generated code as a reference object (broadcast
  * with the serialized plan), so the probe is one `estimateCount` call per
  * row — d array reads, no shuffle, inside whole-stage codegen.
  *
  * CMS guarantees are one-sided: the estimate is NEVER below the true
  * count, and exceeds it by more than ε·N only with probability 1−δ
  * (ε/δ fixed at build time). With a fixed seed the estimate is a pure
  * deterministic function of the multiset of added keys — counter updates
  * are exact integer adds, so partial-aggregate merge order cannot change
  * the result.
  */
case class CmsEstimateLong(child: Expression, sketch: CountMinSketch)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate_long"

  override def nullSafeEval(v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    // estimateCount takes Object; the (Object) cast auto-boxes the long
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.estimateCount((Object) $v);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CmsEstimateLong = copy(child = newChild)
}

object CmsEstimateLong {
  def apply(col64: Column, sketch: CountMinSketch): Column =
    column(new CmsEstimateLong(expression(col64), sketch))
}
