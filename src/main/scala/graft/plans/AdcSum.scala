package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: the PQ asymmetric-distance (ADC)
  * table-lookup sum in one fused pass — `graft_adc(ptab, code, ks)`
  * computes `Σ_j ptab[j·ks + code_j]` over a vector's `m` packed
  * byte codes (`code` is `binary`, one unsigned byte per subspace;
  * `ptab` is the probe's flat m×ks inner-product table).
  *
  * This closes the round-14 verdict's last interpreted
  * higher-order fold in a hot scan: the ADC stage of `llm_ann_pq` /
  * `llm_ann_ivfpq` / the streaming `annSuspects` leg was
  * `aggregate(transform(sequence(0, m−1), …element_at…))` per
  * (vector × probe) row — m interpreted lambda frames plus a
  * materialized index array per candidate, in the per-candidate
  * inner loop of the flagship 100 TB ANN path (the bench's largest
  * CPU block at round 14). Like its neighbors (DequantDot,
  * CosineSimilarity) this reads the columnar table in place, indexes
  * the packed code bytes directly, and generates one primitive loop
  * inside the enclosing WholeStageCodegen span — the scan stays at
  * the memory bandwidth of the m-byte codes, which is the whole
  * point of PQ.
  *
  * Bit parity with the fallback (KernelParitySpec pins both the
  * expression and the whole queries): plain left-to-right double
  * accumulation from 0.0, identical to the HOF formulation's
  * `aggregate(…, (a, x) -> a + x)` fold order.
  *
  * `ks` is a literal at every call site; codes are `< ks` by
  * construction (the encoder writes `nearestSub` indices), so
  * `j·ks + code_j` always lands inside the m×ks table.
  */
case class AdcSum(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with TernaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType, IntegerType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, binary, int), got " +
        s"${Seq(first, second, third).map(_.dataType.catalogString).mkString(", ")}")
  }

  override def nullSafeEval(ptabAny: Any, codeAny: Any, ksAny: Any): Any = {
    val ptab = ptabAny.asInstanceOf[ArrayData]
    val code = codeAny.asInstanceOf[Array[Byte]]
    val ks = ksAny.asInstanceOf[Int]
    var acc = 0.0
    var j = 0
    while (j < code.length) {
      acc = acc + ptab.getDouble(j * ks + (code(j) & 0xFF))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ptab, code, ks) => {
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |for (int $j = 0; $j < $code.length; $j++) {
         |  $acc = $acc + $ptab.getDouble($j * $ks + ($code[$j] & 0xFF));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
