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
}
