package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String shim for the Cavnar–Trenkle scorer
  * (operators/LangId.scala). The profiles it scores against are a
  * static lazy val derived from the embedded seed corpus at class
  * load — identical on every executor, no broadcast, no model file
  * (the SrpBuckets plane-weights pattern). */
object LangIdKernel {
  def classify(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.operators.LangId.classify(s.toString))
}

/** Native Catalyst expression `graft_lang_id(text)`: per-document
  * language prediction by character-n-gram rank profiles (Cavnar–
  * Trenkle 1994) as a COLUMN — language ID of a 100 TB corpus is one
  * map-only codegen'd scan, per-row cost hard-bounded by the
  * scorer's `MaxChars` read cap. Fallback (kernels off): a ScalaUDF
  * over the SAME `LangId.classify` — bit-identical, pinned by
  * KernelParitySpec. */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LangIdKernel.classify(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.LangIdKernel.classify($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
