package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: SQ8 dequantize-and-dot in one fused
  * pass — `graft_dequant_dot(code, pv, mn, mx)` computes
  * `Σ_i (mn + (code_i + 0.5) · (mx − mn) / 255) · pv_i`, i.e. the
  * dot product of a scalar-quantized int8 vector (decoded at bucket
  * midpoints from its per-vector [mn, mx] range) against a
  * full-precision probe.
  *
  * This closes the round-9 verdict's last interpreted higher-order
  * fold in a declared query: `knnQuantized`'s approximate-similarity
  * pass was `aggregate(zip_with(code, pv, …))` per (vector × probe)
  * row — a zipped array allocation plus two interpreted lambda chains
  * per candidate. Like its neighbors (CosineSimilarity,
  * NearestCentroid) this reads columnar ArrayData in place and
  * generates one primitive loop inside the enclosing
  * WholeStageCodegen span, so the quantized scan — whose whole point
  * is to be the 4×-cheaper first stage at 100 TB — stays at memory
  * bandwidth.
  *
  * Bit parity with the fallback (pinned in KernelParitySpec): the
  * per-element arithmetic keeps the HOF formulation's exact
  * association order, `(mn + ((c + 0.5) * (mx − mn)) / 255.0) * y`,
  * accumulated left-to-right from 0.0 — no factoring of the scale
  * term out of the loop, which would change the last float digit.
  */
case class DequantDot(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends QuaternaryExpression with QuaternaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dequant_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), DoubleType, DoubleType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>, double, double), got " +
        s"${Seq(first, second, third, fourth).map(_.dataType.catalogString).mkString(", ")}")
  }

  override def nullSafeEval(codeAny: Any, pvAny: Any, mnAny: Any, mxAny: Any): Any = {
    val code = codeAny.asInstanceOf[ArrayData]
    val pv = pvAny.asInstanceOf[ArrayData]
    val mn = mnAny.asInstanceOf[Double]
    val mx = mxAny.asInstanceOf[Double]
    val n = math.min(code.numElements(), pv.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = acc + (mn + ((code.getInt(i) + 0.5) * (mx - mn)) / 255.0) * pv.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, pv, mn, mx) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($code.numElements(), $pv.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $acc + ($mn + (($code.getInt($i) + 0.5d) * ($mx - $mn)) / 255.0d) * $pv.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
