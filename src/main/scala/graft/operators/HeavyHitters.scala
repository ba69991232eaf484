package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitter sketch, the mergeable-summaries form
  * (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
  * PODS 2012): each partition maintains at most `k` counters over its
  * item stream (the classic decrement-all step when a new item arrives
  * at a full table), the per-partition summaries are merged by a plain
  * sum-per-item aggregate, and the merged table is pruned back to `k`
  * entries by subtracting the (k+1)-th largest summed count from every
  * counter and dropping the non-positive remainder.
  *
  * Guarantees (independent of Spark's partitioning, which is what makes
  * the result auditable even though intermediate counters are
  * partition-order-dependent):
  *   - `est(x) <= freq(x)` — MG never overestimates, and neither do sum
  *     or subtract-and-drop;
  *   - `freq(x) - est(x) <= 2n/(k+1)` — each partition's decrements
  *     remove at most n_p/(k+1) occurrences of x (every decrement event
  *     destroys k+1 counts), totalling n/(k+1) across partitions, and
  *     the single merge-prune subtracts the (k+1)-th largest summed
  *     count, itself at most n/(k+1) because the k+1 largest sums are
  *     disjoint counts bounded by n;
  *   - therefore every item with `freq(x) > 2n/(k+1)` survives into the
  *     final summary.
  *
  * When the stream's distinct cardinality is <= k no decrement or prune
  * ever fires and `est == freq` exactly — the regime the oracle-gated
  * catalog query (`m43`) pins; the approximation regime (cardinality
  * >> k, forced decrements) is spec-bounded in `HeavyHittersSpec`, the
  * same oracle/spec split the HLL sketches (a30) use.
  *
  * At 100 TB this is the point of the operator: the groupBy-exact
  * alternative shuffles every distinct key; MG ships at most `k` rows
  * per input partition into one tiny aggregate, so the shuffle volume
  * is `partitions × k`, independent of the key cardinality.
  */
object HeavyHitters {

  /** Per-partition bounded state — genuine sequential per-partition
    * logic (the one place SURVEY §7's preference order reaches
    * mapPartitions): the decrement-all step is inherently
    * order-dependent, so no declarative aggregate expresses it with a
    * k-bounded memory footprint.
    */
  private def partitionSummaries(items: Dataset[String], k: Int)
      : Dataset[(String, Long)] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // decrement-all: the arriving item and one count of every
            // tracked item annihilate (k+1 counts per decrement event)
            val dead = List.newBuilder[String]
            counters.foreach { case (t, c) =>
              if (c == 1L) dead += t else counters.update(t, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.iterator
    }
  }

  /** The merged, pruned summary: `(item, est)` with at most `k` rows,
    * `est <= freq` and `freq - est <= 2n/(k+1)`.
    */
  def misraGries(items: Dataset[String], k: Int): DataFrame = {
    val partials = partitionSummaries(items, k).toDF("item", "c")
    val summed = partials.groupBy(col("item")).agg(sum(col("c")).as("c"))
    // prune offset = (k+1)-th largest summed count, 0 when <= k entries
    // survive the merge — a TakeOrdered + one-row aggregate, no global
    // window, no driver collect
    val offset = summed.orderBy(col("c").desc, col("item").asc).limit(k + 1)
      .agg(when(count(lit(1)) === k + 1, min(col("c"))).otherwise(lit(0L))
        .as("__off"))
    summed.crossJoin(offset)
      .where(col("c") > col("__off"))
      .select(col("item"), (col("c") - col("__off")).as("est"))
  }
}
