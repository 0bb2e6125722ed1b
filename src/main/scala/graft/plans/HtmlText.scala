package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

  /** Raw outlink candidates (href/src values) of one page, as
    * columnar ArrayData — the discover step's per-row walk. */
  def links(s: UTF8String): ArrayData = {
    val ls = graft.sources.Html.extractLinks(s.toString)
    val out = new Array[AnyRef](ls.length)
    var i = 0
    while (i < ls.length) { out(i) = UTF8String.fromString(ls(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** `(href \t anchor_text)` rows of one page — the link-context
    * walk (sources/Html.extractAnchors). */
  def anchors(s: UTF8String): ArrayData = {
    val as = graft.sources.Html.extractAnchors(s.toString)
    val out = new Array[AnyRef](as.length)
    var i = 0
    while (i < as.length) {
      out(i) = UTF8String.fromString(as(i)._1 + "\t" + as(i)._2); i += 1
    }
    new GenericArrayData(out)
  }
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

/** Native Catalyst expression `graft_html_links(html)`: the raw
  * `href`/`src` outlink candidates of a page as `array<string>`, per
  * sources/Html.scala's bounded quote-aware walk — the discover step
  * of the crawl loop (fetch → extract → discover → frontier) as one
  * static call inside WholeStageCodegen, feeding `explode` +
  * `graft_url_resolve` + `graft_url_canon` without any ScalaUDF
  * boundary in a scan that runs once per crawl page at 100 TB. */
case class HtmlLinks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_links"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HtmlTextKernel.links(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.HtmlTextKernel.links($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression `graft_link_anchors(html)`: the page's
  * `(href \t anchor_text)` pairs as `array<string>`, per
  * sources/Html.scala's bounded anchor walk — link-context features
  * (what the web CALLS a target) as one static call inside
  * WholeStageCodegen, feeding `explode` + `graft_url_resolve` +
  * `graft_url_canon` like the plain link kernel. */
case class LinkAnchors(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_link_anchors"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HtmlTextKernel.anchors(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.HtmlTextKernel.anchors($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
