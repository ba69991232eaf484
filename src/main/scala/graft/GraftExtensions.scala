package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{DotProduct, KmvAgg, KmvMergeAgg, UnicodeNormalize}

/** SparkSessionExtensions entry point — lets a deployment enable the
  * library's custom expressions cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions` (no per-session
  * registration call needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        "unicode_normalize"),
      (children: Seq[Expression]) => UnicodeNormalize.fromSql(children)))
    // the analyzer wraps a bare AggregateFunction returned from the
    // registry in its AggregateExpression — same contract as builtins
    ext.injectFunction((
      FunctionIdentifier("kmv_agg"),
      new ExpressionInfo(classOf[KmvAgg].getName, "kmv_agg"),
      (children: Seq[Expression]) =>
        new KmvAgg(children(0), litK(children, "kmv_agg"))))
    ext.injectFunction((
      FunctionIdentifier("kmv_merge_agg"),
      new ExpressionInfo(classOf[KmvMergeAgg].getName, "kmv_merge_agg"),
      (children: Seq[Expression]) =>
        new KmvMergeAgg(children(0), litK(children, "kmv_merge_agg"))))
  }

  private def litK(children: Seq[Expression], fn: String): Int =
    children match {
      case Seq(_, Literal(k: Int, IntegerType)) => k
      case _ => throw new IllegalArgumentException(
        s"$fn(col, k) needs a literal INT k, got: ${children.drop(1)}")
    }
}
