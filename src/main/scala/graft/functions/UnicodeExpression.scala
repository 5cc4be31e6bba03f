package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side Unicode-normalization kernel. TOP-LEVEL object: Scala emits a
  * static forwarder only for top-level objects, and the generated Java of
  * [[UnicodeExpression.UnicodeNormalize]] calls it statically. */
object UnicodeKernel {
  /** Normalize to `form`; returns the INPUT UTF8String unchanged (no
    * copy, no String round-trip allocation beyond the check) when the
    * text is already normalized — the overwhelmingly common case in a
    * mostly-clean corpus. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** Unicode normalization — the canonical first step of web-corpus text
  * cleanup (CCNet/Dolma-style pipelines normalize before tokenization so
  * that `é` composed and `e`+U+0301 decomposed, full-width digits,
  * ligatures, and compatibility forms dedup/tokenize identically).
  * NFC/NFD are canonical (reversible) forms; NFKC/NFKD additionally fold
  * compatibility characters (ﬁ → fi, ① → 1) — the form used before
  * tokenizer training. Implemented over the JDK's [[java.text.Normalizer]]
  * (UAX #15; normalization is stabilized across Unicode versions, so JDK
  * and utf8proc/ICU engines agree — NFC output is DuckDB-oracle-portable
  * via `nfc_normalize`). */
object UnicodeExpression {

  /** `normalize(text, form)` as a codegen'd expression; `form` must be a
    * literal NFC/NFD/NFKC/NFKD (validated at plan time — a typo'd form
    * must fail analysis, not every row). */
  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {
    // resolves (and validates) once at construction; Form is a
    // serializable enum so the expression ships to executors intact
    private val resolvedForm: Normalizer.Form =
      try Normalizer.Form.valueOf(form.toUpperCase)
      catch { case _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"unicode_normalize form must be one of " +
            s"${Normalizer.Form.values.mkString("/")}, got '$form'")
      }

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"

    override def nullSafeEval(a: Any): Any =
      UnicodeKernel.normalize(a.asInstanceOf[UTF8String], resolvedForm)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        // stays inside WholeStageCodegen; the form is an enum constant
        // reference in the generated Java, not a per-row lookup
        s"${ev.value} = graft.functions.UnicodeKernel.normalize($a, " +
          s"java.text.Normalizer.Form.${resolvedForm.name});"
      })

    override protected def withNewChildInternal(newChild: Expression)
        : UnicodeNormalize = copy(child = newChild)
  }

  /** Column wrapper: `normalizeUnicode(col("text"), "NFKC")`. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    column(UnicodeNormalize(expression(text), form))
}
