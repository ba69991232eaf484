package graft

import org.apache.spark.sql.SparkSession

import graft.expressions.{DotProduct, UnicodeNormalize}

/** SQL-side registration of the library's custom expressions, so every
  * capability is reachable from `spark.sql(...)` as well as the Column
  * API (SURVEY §7.0: each table is also a temp view).
  */
object SqlFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize",
      exprs => UnicodeNormalize.fromSql(exprs),
      "scala_udf")
  }
}
