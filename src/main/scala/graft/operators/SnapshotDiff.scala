package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff between two versions of a dataset — the reconciliation
  * primitive behind incremental pipelines built on versioned directory
  * sinks (`Writers.versionedDir`, reference run-versioning at
  * `opensea_pipeline/run.py:52-165`): after a re-run, which keys
  * appeared, which disappeared, and which changed state?
  *
  * One full-outer shuffle join on the key; state comparison is null-safe
  * column equality (`<=>`) so a null-vs-value change counts as changed,
  * not unchanged. At 100 TB both versions come off the same bucketed
  * layout (`Writers.writeBucketed`), making the join shuffle-free; the
  * per-status aggregate is a 4-row reduction.
  */
object SnapshotDiff {

  /** Per-key diff: every key in either version, tagged
    * `added | removed | changed | unchanged`. `stateCols` must exist in
    * both frames; old-side state is carried as `old_<col>`, new-side as
    * `new_<col>` (null on the absent side).
    */
  def diff(oldV: DataFrame, newV: DataFrame, keyCols: Seq[String],
      stateCols: Seq[String]): DataFrame = {
    val o = oldV.select(
      keyCols.map(col) ++
        (stateCols.map(c => col(c).as(s"old_$c")) :+
          lit(1).as("__in_old")): _*)
    val n = newV.select(
      keyCols.map(col) ++
        (stateCols.map(c => col(c).as(s"new_$c")) :+
          lit(1).as("__in_new")): _*)
    val same = stateCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("__in_old", "__in_new")
  }

  /** The summary form: status -> key count. */
  def diffCounts(oldV: DataFrame, newV: DataFrame, keyCols: Seq[String],
      stateCols: Seq[String]): DataFrame =
    diff(oldV, newV, keyCols, stateCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n_keys"))
}
