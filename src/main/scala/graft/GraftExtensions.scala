package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, UnicodeNormalize}

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
  }
}
