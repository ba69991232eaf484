package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Rolling-window / time-series operators (SURVEY §2.8 W1-W6, §2.10 M5).
  *
  * All are window functions over (partition, order) — the row-at-a-time
  * pandas `rolling`/`shift` loops of the reference become single-pass
  * sorted-window evaluation. Each partition column keeps the sort local to
  * its hash partition; an unpartitioned window (global series) is fine when
  * the series is an already-aggregated daily/monthly frame (thousands of
  * rows), never over the raw fact table.
  */
object TimeSeries {

  /** Strict n-row rolling mean: null until the frame holds n rows — the
    * reference's `rolling_mean(window_size=n)` without min_periods
    * (aggregate.py:277-309, SURVEY W2).
    */
  def rollingMeanStrict(df: DataFrame, orderCol: String, valueCol: String,
      n: Int, partitionCols: Seq[String] = Nil): DataFrame = {
    val w = windowFor(partitionCols, orderCol).rowsBetween(-(n - 1), 0)
    df.withColumn(s"rolling_avg_$n",
      when(count(lit(1)).over(w) === n, avg(col(valueCol)).over(w)))
  }

  /** Rolling mean + stddev with min_periods=1 (pandas default path, W3). */
  def rollingStats(df: DataFrame, orderCol: String, valueCol: String,
      n: Int, partitionCols: Seq[String] = Nil): DataFrame = {
    val w = windowFor(partitionCols, orderCol).rowsBetween(-(n - 1), 0)
    df.withColumn(s"rolling_avg_$n", avg(col(valueCol)).over(w))
      .withColumn(s"rolling_std_$n", stddev_samp(col(valueCol)).over(w))
  }

  /** pct_change: (x - lag(x)) / lag(x) (W4). Null for the first row. */
  def pctChange(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, partitionCols: Seq[String] = Nil): DataFrame = {
    val w = windowFor(partitionCols, orderCol)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn(outCol, (col(valueCol) - prev) / prev)
  }

  /** Per-group cumulative sum (W5). */
  def cumSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, partitionCols: Seq[String] = Nil): DataFrame =
    df.withColumn(outCol, sum(col(valueCol)).over(
      windowFor(partitionCols, orderCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Cumulative product of (1 + r) via exp∘sum∘log1p (W6) — the only
    * shuffle-free way to express cumprod as a window aggregate. Requires
    * r > -1 (equity-curve domain).
    */
  def cumProd1p(df: DataFrame, orderCol: String, returnCol: String,
      outCol: String, partitionCols: Seq[String] = Nil): DataFrame =
    df.withColumn(outCol, exp(sum(log(lit(1.0) + col(returnCol))).over(
      windowFor(partitionCols, orderCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))))

  /** Z-score anomaly detection on a series (M5): |z| computed against the
    * global mean/stddev of the (small, pre-aggregated) series.
    */
  def zScores(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val stats = df.agg(
      avg(col(valueCol)).as("__mu"), stddev_samp(col(valueCol)).as("__sigma"))
    df.crossJoin(broadcast(stats))
      .withColumn(outCol, (col(valueCol) - col("__mu")) / col("__sigma"))
      .drop("__mu", "__sigma")
  }

  /** lead() of the order column itself → gap to next event in fractional
    * days (W1 / D7: days_to_next_sale). Microsecond-exact arithmetic.
    */
  def daysToNext(df: DataFrame, partitionCols: Seq[String], tsCol: String,
      tieBreak: Column, outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(tsCol), tieBreak)
    df.withColumn(outCol,
      (unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)))
        / lit(86400e6))
  }

  /** Forward-fill: replace each null with the most recent non-null value
    * within the partition, in (orderCol, tieBreak) order — the gap-repair
    * primitive for sensor/price series (Polars `fill_null(strategy=
    * "forward")`, not used by the reference but table stakes for a
    * time-series engine). `last(ignoreNulls).over(running frame)` is a
    * running window aggregate: one shuffle on the partition keys, no
    * self-join, no driver involvement. The tie-break makes the order
    * total, so results are deterministic under any physical layout.
    */
  def forwardFill(df: DataFrame, partitionCols: Seq[String], orderCol: String,
      tieBreak: Column, valueCol: String, outCol: String): DataFrame = {
    val w = (if (partitionCols.isEmpty) Window.orderBy(col(orderCol), tieBreak)
      else Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(col(orderCol), tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  private def windowFor(partitionCols: Seq[String], orderCol: String): WindowSpec =
    if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
    else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
}
