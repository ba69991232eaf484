package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The catalog entry type, in its own dependency-free file (round 15):
  * every catalog part references `Q`, so while it lived inside
  * [[Queries]] (which also hosts ~70 part-A queries and their operator
  * imports) the [[CodeDeps]] closure of EVERY query transitively
  * included part A's whole operator surface — collapsing the per-query
  * bench-record fingerprints back to ~whole-tree grain. Here the shared
  * edge is this leaf file, which changes only when the catalog
  * CONTRACT changes — exactly when every record should retire.
  */
object QueryDef {

  /** @param product for audit-shaped queries (recall/approximation gates
    *   whose plan is dominated by an exact brute-force ground-truth side),
    *   the PRODUCTION side alone — the plan a deployment would run, with
    *   no exact twin anywhere in it. Bench times it separately so the
    *   reported cost of the audit doesn't masquerade as the cost of the
    *   operator.
    */
  case class Q(name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      headline: Boolean = false,
      product: Option[(SparkSession, String) => DataFrame] = None)
}
