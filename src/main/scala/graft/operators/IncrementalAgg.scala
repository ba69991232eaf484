package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (mergeable-state) aggregation: the 100 TB pattern where a
  * nightly ingest must update standing aggregates WITHOUT rescanning
  * history. The state is an algebraic partial aggregate per key —
  * (count, sum, min, max) — which is closed under merge:
  *
  *   state(A ∪ B) = merge(state(A), state(B))
  *
  * so each new partition is aggregated alone (one scan of the delta
  * only) and folded into the standing state with a key-wise groupBy.
  * Derived measures that are NOT algebraic (avg here; any ratio) are
  * computed at read time in `finish` — never stored, or merging would
  * be wrong. The same decomposition is what Spark itself does map-side
  * (partial_sum/partial_count); this operator persists that idea across
  * pipeline RUNS instead of across tasks.
  *
  * State size = O(distinct keys), independent of history length; merge
  * cost = one shuffle of |state| + |delta-state| rows, independent of
  * the fact-table size.
  */
object IncrementalAgg {

  /** Build partial-aggregate state from a batch of rows. `sumsq` makes
    * second moments mergeable by plain addition — (cnt, sum, sumsq) is
    * the algebraic decomposition of variance. Numerically this is the
    * textbook closed form, exact for data whose mean/σ ratio is modest
    * (here ~10); for ill-conditioned data (mean/σ ≳ 10⁷ eats half the
    * mantissa in the cancellation) switch the state to per-partition
    * Welford/Chan (cnt, mean, M2) — same merge shape, stabler arithmetic.
    */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("cnt"),
        sum(col(valueCol)).as("sum"),
        sum(col(valueCol) * col(valueCol)).as("sumsq"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max"))

  /** Fold any number of states into one: algebraic merge per key. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"),
        sum(col("sumsq")).as("sumsq"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))

  /** Read-time finalization: derive the non-algebraic measures (never
    * stored — merging a stored avg or variance would be wrong).
    */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("avg", col("sum") / col("cnt"))
      .withColumn("variance",
        when(col("cnt") > 1,
          (col("sumsq") - col("sum") * col("sum") / col("cnt"))
            / (col("cnt") - 1)))
      .withColumn("stddev", sqrt(col("variance")))
}
