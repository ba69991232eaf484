package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual catalog lives in [[Queries]]; each entry pairs a Spark plan
  * with a DuckDB oracle SQL statement over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Daily event stats — the reference's core daily_collection_stats shape
    * (SURVEY §2.7 A1/A12).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.a1.fn(spark, "/root/testdata/sf0.001")

  /** The full catalog across all parts. */
  def catalog: Seq[QueryDef.Q] =
    Queries.all ++ QueriesB.all ++ QueriesC.all ++ QueriesD.all ++
      QueriesE.all ++ QueriesF.all ++ QueriesG.all ++ QueriesH.all ++
      QueriesI.all ++ QueriesJ.all ++ QueriesK.all ++ QueriesL.all ++
      QueriesM.all ++ QueriesN.all ++ QueriesO.all ++ QueriesP.all ++
      QueriesQ.all ++ QueriesR.all ++ QueriesS.all ++ QueriesT.all ++
      QueriesU.all ++ QueriesV.all ++ QueriesW.all ++ QueriesX.all ++
      QueriesY.all ++ QueriesZ.all ++ QueriesAA.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** For audit-shaped queries (recall/approximation gates), the
    * PRODUCTION side alone — no exact brute-force twin in the plan.
    * Bench times these separately so audit cost isn't read as the
    * operator's cost. See [[QueryDef.Q.product]].
    */
  def productQueries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.flatMap(q => q.product.map(p => q.name -> p)).toMap
}
