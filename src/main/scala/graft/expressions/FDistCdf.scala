package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Right-tail F-distribution probability: p = 1 - CDF_F(f; d1, d2).
  *
  * Surfaces the ANOVA p-value (reference analyze_visual_cycles.py:162-231,
  * scipy.stats.f_oneway) INSIDE the plan, so the catalog query stays one
  * lazy DataFrame instead of a driver-side post-step. The CDF comes from
  * commons-math3 (already on Spark's classpath — Spark's own ML stack
  * depends on it). CodegenFallback is deliberate: the expression runs on
  * one aggregated row per group, never in a hot loop, so interpreted
  * evaluation costs nothing and keeps the special function out of
  * generated Java.
  *
  * Null semantics: null if any input is null; non-positive degrees of
  * freedom yield null rather than throwing (the k=1 degenerate group).
  */
case class FDistCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"f_pvalue expects three DOUBLE args, got " +
          children.map(_.dataType.simpleString).mkString(", "))

  override def nullable: Boolean = true

  override def nullSafeEval(f: Any, d1: Any, d2: Any): Any = {
    val df1 = d1.asInstanceOf[Double]
    val df2 = d2.asInstanceOf[Double]
    if (df1 <= 0.0 || df2 <= 0.0) null
    else {
      val dist =
        new org.apache.commons.math3.distribution.FDistribution(df1, df2)
      1.0 - dist.cumulativeProbability(f.asInstanceOf[Double])
    }
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): FDistCdf =
    copy(newFirst, newSecond, newThird)
}

object FDistCdf {
  /** Column-level entry point: `f_pvalue(fStat, dfBetween, dfWithin)`. */
  def fPValue(fStat: Column, dfBetween: Column, dfWithin: Column): Column =
    ColumnBridge.column(FDistCdf(
      ColumnBridge.expression(fStat.cast("double")),
      ColumnBridge.expression(dfBetween.cast("double")),
      ColumnBridge.expression(dfWithin.cast("double"))))
}
