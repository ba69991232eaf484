package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over entity-relation edge lists.
  *
  * The reference has no graph analytics (its closest relative is the
  * transitive duplicate closure, see [[Dedup.connectedComponents]]); this
  * is a §2.12 training-data extension: influence / importance scoring over
  * interaction graphs (wallet↔collection, customer↔supplier) feeds both
  * sampling weights and quality priors for corpus curation.
  */
object Graph {

  /** Fixed-iteration PageRank with dangling-mass redistribution:
    *
    *   rank_{i+1}(v) = (1−d)/N + d · ( Σ_{u→v} rank_i(u)/out(u) + D_i/N )
    *
    * where `D_i` is the total rank mass sitting on dangling nodes (no
    * out-edges) at iteration i — redistributed uniformly, the standard
    * power-method formulation, so Σ rank = 1 is preserved exactly.
    *
    * Plan shape (the Pregel loop expressed as one shuffle per round):
    * - `edges` (made distinct) and the out-degree frame are computed once
    *   and `localCheckpoint`ed — the same once-not-per-round rule as
    *   [[Dedup.connectedComponents]].
    * - N is an in-plan broadcast 1-row aggregate crossJoined in, never a
    *   driver-side `.count()` (no plan-time job).
    * - Each iteration is exactly one shuffle (the `groupBy(dst)` contrib
    *   sum; the edges⋈ranks join co-partitions on src) plus one broadcast
    *   1-row dangling aggregate. Ranks are `localCheckpoint`ed per round
    *   so the plan depth stays O(1) instead of O(3^iters).
    * At 100 TB: edges partition by src once and every round reuses that
    *   partitioning; ranks are |V| rows (thin), the only per-round state.
    */
  def pageRank(
      nodes: DataFrame, idCol: String,
      edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val edges = edges0
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
      .localCheckpoint(true)
    val outdeg = edges.groupBy(col("__src"))
      .agg(count(lit(1)).as("__od"))
      .localCheckpoint(true)
    val ids = nodes.select(col(idCol).as("__id")).distinct()
      .localCheckpoint(true)
    val nTot = broadcast(ids.agg(count(lit(1)).cast("double").as("__n")))

    var ranks = ids.crossJoin(nTot)
      .select(col("__id"), (lit(1.0) / col("__n")).as("__r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val dangling = broadcast(
        ranks.join(outdeg, ranks("__id") === outdeg("__src"), "left_anti")
          .agg(coalesce(sum(col("__r")), lit(0.0)).as("__dm")))
      val contrib = edges
        .join(ranks.withColumnRenamed("__id", "__src"), "__src")
        .join(outdeg, "__src")
        .groupBy(col("__dst").as("__id"))
        .agg(sum(col("__r") / col("__od")).as("__c"))
      val next = ids.join(contrib, Seq("__id"), "left")
        .crossJoin(dangling).crossJoin(nTot)
        .select(col("__id"),
          (lit(1.0 - damping) / col("__n") + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) + col("__dm") / col("__n")))
            .as("__r"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
    }
    ranks.select(col("__id").as(idCol), col("__r").as("pagerank"))
  }
}
