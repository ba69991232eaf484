package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization, batch form — the same session semantics as
  * `streaming.Streaming.sessionize` (a new session starts when the gap
  * since the user's previous event exceeds `gapMinutes`), expressed as
  * window functions so it runs as ordinary partitioned sort + aggregate
  * over any history size: lag → new-session flag → running sum as the
  * session index → per-session aggregate. The window sorts each user's
  * history inside its hash partition; the follow-up groupBy keys on
  * (user, session) so no session ever crosses partitions. The streaming
  * form holds only one open session per user in state; this form is the
  * backfill/batch path over the full corpus — `SessionizeSpec` asserts
  * both produce identical sessions on the same input.
  */
object Sessionize {

  def batchSessions(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapMinutes: Int): DataFrame = {
    val gapMs = gapMinutes * 60 * 1000L
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val ms = unix_millis(col(tsCol))
    val prevMs = lag(ms, 1).over(w)
    events
      // A null timestamp can't belong to any gap-defined session: without
      // this filter, nulls-first ordering makes every consecutive null-ts
      // row its own degenerate one-row session with null start/end —
      // matching the streaming form, which never sees such rows (the
      // watermark column can't be null). Cleaned ETL output deliberately
      // KEEPS null-ts rows, so a batch backfill over it must drop them
      // here rather than rely on the caller.
      .where(col(tsCol).isNotNull)
      .withColumn("__new_session",
        when(prevMs.isNull || ms - prevMs > gapMs, 1L).otherwise(0L))
      .withColumn("__session_idx",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__session_idx"))
      .agg(
        min(ms).as("session_start_ms"),
        max(ms).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .drop("__session_idx")
  }

  /** First-order Markov transition matrix over per-user event streams —
    * the behavioral-analytics chain (what follows a view? does error →
    * abandonment?) and the generative model a path simulator samples.
    * Transitions come from one lead() window per user (partitioned —
    * never a global sort; ties broken by the id column so the chain is
    * deterministic), then ONE (from, to) count shuffle; the full
    * K×K grid (K = observed states, a handful) is built from two tiny
    * distinct frames and Laplace-smoothed with `alpha`:
    * p(to|from) = (n + α) / (n_from + α·K), so unseen transitions get
    * mass and from-states with no outgoing observations degrade to the
    * uniform row. Everything after the count shuffle is K²-row
    * driver-scale algebra. Returns (from_type, to_type, n_transitions,
    * prob).
    */
  def markovTransitions(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      alpha: Double = 1.0): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("__from"))
      .withColumn("__to", lead(col("__from"), 1).over(w))
      .where(col("__to").isNotNull)
      .groupBy(col("__from"), col("__to"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // K²-bounded; feeds states, totals, grid
    val states = pairs.select(col("__from").as("__s"))
      .unionAll(pairs.select(col("__to").as("__s"))).distinct()
    val k = states.agg(count(lit(1)).as("__k"))
    val tot = pairs.groupBy(col("__from").as("from_type"))
      .agg(sum(col("__n")).as("__tot"))
    states.select(col("__s").as("from_type"))
      .crossJoin(states.select(col("__s").as("to_type"))) // K×K tiny grid
      .join(pairs.select(col("__from").as("from_type"),
        col("__to").as("to_type"), col("__n")),
        Seq("from_type", "to_type"), "left")
      .join(tot, Seq("from_type"), "left")
      .crossJoin(broadcast(k)) // 1-row scalar attach
      .select(col("from_type"), col("to_type"),
        coalesce(col("__n"), lit(0L)).as("n_transitions"),
        round((coalesce(col("__n"), lit(0L)) + lit(alpha))
          / (coalesce(col("__tot"), lit(0L)) + lit(alpha) * col("__k"))
          + lit(1e-9), 6).as("prob"))
  }
}
