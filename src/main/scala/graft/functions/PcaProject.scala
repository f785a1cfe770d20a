package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd PCA projection: `Σ_j ((double) qv[j] − mean[j]) · axis[j]`
  * over a micro-quantized `array<long>` vector, with the mean and axis
  * embedded as constants.
  *
  * Why a native Expression (same rule as [[DotProductF32]]): the
  * higher-order-function formulation
  * `aggregate(zip_with(zip_with(qd, mean, -), axis, *), 0D, +)`
  * allocates two intermediate arrays and interprets three lambdas per
  * element outside whole-stage codegen — it benched exactly LINEAR at
  * the sf1→sf10 anchor (the projection dominating e108's row-scaled
  * cost). This compiles to one fused primitive loop.
  *
  * Semantics are BIT-IDENTICAL to the HOF chain and the DuckDB oracle:
  * per element one long→double widen (exact), one subtract, one
  * multiply, accumulated left-to-right in f64 — the LIST_SUM parity
  * contract. Null array input yields null; elements are assumed
  * non-null (quantized vectors). */
case class PcaProjectExpr(child: Expression, mean: Array[Double],
    axis: Array[Double]) extends UnaryExpression {

  require(mean.length == axis.length && mean.length > 0,
    s"pca project geometry: |mean|=${mean.length} != |axis|=${axis.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pca_project"

  override def nullSafeEval(input: Any): Any =
    PcaProjectExpr.compute(input.asInstanceOf[ArrayData], mean, axis)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("graftPcaMean", mean, "double[]")
    val axisRef = ctx.addReferenceObj("graftPcaAxis", axis, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PcaProjectExpr.compute(" +
        s"$c, $meanRef, $axisRef); // graft_pca_project")
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProjectExpr =
    copy(child = newChild)
}

object PcaProjectExpr {
  def compute(qv: ArrayData, mean: Array[Double], axis: Array[Double]): Double = {
    val n = qv.numElements()
    // exact-dim contract (same as the Scala-side GramAggregator): a
    // short/malformed vector must fail loudly, not yield a silently
    // truncated partial projection score
    if (n != mean.length)
      throw new IllegalArgumentException(
        s"graft_pca_project: vector length $n != model dim ${mean.length}")
    var s = 0.0
    var j = 0
    while (j < n) {
      s += (qv.getLong(j).toDouble - mean(j)) * axis(j)
      j += 1
    }
    s
  }
}
