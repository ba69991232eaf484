package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Right-tail chi-square probability: p = 1 − CDF_χ²(x; dof).
  *
  * The FDistCdf pattern applied to the independence test: the p-value of
  * `m11_chi_square` stays INSIDE the plan (one lazy DataFrame, no
  * driver-side scipy-style post-step — reference
  * analyze_visual_cycles.py uses scipy.stats for its test statistics).
  * commons-math3 supplies the regularized-gamma CDF; CodegenFallback is
  * deliberate because the expression evaluates on one aggregated row per
  * test, never in a hot loop.
  *
  * Null semantics: null if any input is null; non-positive degrees of
  * freedom yield null rather than throwing (a 1×k contingency).
  */
case class ChiSquareCdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chi2_pvalue expects two DOUBLE args, got " +
          children.map(_.dataType.simpleString).mkString(", "))

  override def nullable: Boolean = true

  override def nullSafeEval(x: Any, dof: Any): Any = {
    val k = dof.asInstanceOf[Double]
    if (k <= 0.0) null
    else {
      val dist =
        new org.apache.commons.math3.distribution.ChiSquaredDistribution(k)
      1.0 - dist.cumulativeProbability(x.asInstanceOf[Double])
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ChiSquareCdf = copy(newLeft, newRight)
}

object ChiSquareCdf {
  /** Column-level entry point: `chi2_pvalue(chi2, dof)`. */
  def chi2PValue(chi2: Column, dof: Column): Column =
    ColumnBridge.column(ChiSquareCdf(
      ColumnBridge.expression(chi2.cast("double")),
      ColumnBridge.expression(dof.cast("double"))))
}
