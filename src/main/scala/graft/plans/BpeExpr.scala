package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String shim for the seed-model BPE tokenizer
  * (operators/Bpe.scala). The merge table it encodes against is a
  * static lazy val trained from the embedded seed corpus at class
  * load — identical on every executor, no broadcast, no model file
  * (the LangId/SrpBuckets pattern). */
object BpeKernel {
  def tokens(s: UTF8String): ArrayData =
    new GenericArrayData(
      graft.operators.Bpe.encodeSeed(s.toString)
        .map(t => UTF8String.fromString(t).asInstanceOf[Any]))
}

/** Native Catalyst expression `graft_bpe_tokens(text)`: seed-model
  * byte-pair-encoding subword tokens as a COLUMN (leading-space
  * spelling, so `array_join(toks, '')` decodes) — subword
  * tokenization of a 100 TB corpus is one map-only codegen'd scan,
  * per-row cost bounded by `Bpe.MaxWordLen` segmenting and the
  * per-thread word LRU. Fallback (kernels off): a ScalaUDF over the
  * SAME `Bpe.encodeSeed` — bit-identical, pinned by
  * KernelParitySpec. */
case class BpeTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.BpeKernel.tokens($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
