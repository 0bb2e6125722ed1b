package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String shim for the bounded HTML walk (sources/Html.scala):
  * one static call per row so the codegen'd expression stays inside
  * the enclosing WholeStageCodegen span (the RunStatsKernel pattern).
  * The kernel and the typed/UDF fallback call the SAME Scala
  * function, so the two paths are bit-identical by construction —
  * KernelParitySpec pins it anyway. */
object HtmlTextKernel {
  def extract(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.sources.Html.extractText(s.toString))
}

/** Native Catalyst expression `graft_html_text(html)`: visible-text
  * extraction of an HTML string per sources/Html.scala's bounded
  * single-pass rules (tag strip, script/style/comment drop, entity
  * decode, ASCII whitespace collapse). This is the COLUMN-level API
  * the crawl chain composes through — WARC entity body → html text →
  * quality/chunk/dedup — without a ScalaUDF breaking codegen: at
  * 100 TB this runs once per crawl document inside the scan
  * projection, so it must stay inside WholeStageCodegen like every
  * other per-row text kernel. */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HtmlTextKernel.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.HtmlTextKernel.extract($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
