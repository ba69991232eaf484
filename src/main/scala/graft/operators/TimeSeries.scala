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
  * rows), never over the raw fact table. When the order key is continuous
  * (distinct count ≈ N) so no pre-aggregation bounds the frame, use
  * [[Stats.rangePrefixSum]] — the range-partitioned two-pass form of the
  * same running sum.
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

  /** Exponentially-weighted moving average (the recursive
    * y_t = α·x_t + (1−α)·y_{t−1}, y_0 = x_0) WITHOUT a sequential pass:
    * the recurrence unrolls to y_t = (1−α)^t · Σ_{j≤t} w_j·x_j with
    * w_0 = 1, w_j = α·(1−α)^{−j} — a per-row weight, one running-window
    * sum, one final scale. Same shuffle shape as any windowed aggregate;
    * no mapPartitions, no driver loop.
    *
    * Dynamic-range bound: (1−α)^{−j} grows with the per-key row index j,
    * overflowing double near j ≈ 700/−log10(1−α) (α=0.1 → ~6,700 rows
    * per key; α=0.5 → ~1,000). Fine for per-entity event series at any
    * corpus scale; for longer single-key series, rebase in blocks (the
    * within-block closed form + an O(#blocks) carry) before reaching for
    * an imperative pass.
    */
  def ewma(df: DataFrame, partitionCols: Seq[String], orderCol: String,
      tieBreak: Column, valueCol: String, alpha: Double,
      outCol: String): DataFrame = {
    val ord = (if (partitionCols.isEmpty) Window.orderBy(col(orderCol), tieBreak)
      else Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(col(orderCol), tieBreak))
    val running = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val j = row_number().over(ord) - 1
    val weight = when(j === 0, lit(1.0))
      .otherwise(lit(alpha) * pow(lit(1.0 - alpha), -j.cast("double")))
    df.withColumn("__w_x", weight * col(valueCol))
      .withColumn(outCol,
        pow(lit(1.0 - alpha), j.cast("double")) * sum(col("__w_x")).over(running))
      .drop("__w_x")
  }

  /** Time-weighted linear interpolation of nulls (pandas
    * `interpolate(method="time")` semantics): an interior null becomes
    * prev + (next − prev)·(t − t_prev)/(t_next − t_prev) over the
    * nearest non-null neighbors in time; trailing nulls forward-fill
    * from the last value; leading nulls (no prior value) stay null.
    * Two running windows (ascending for the previous neighbor,
    * descending for the next) — one shuffle on the keys, one sort each
    * direction, no self-join.
    */
  def interpolateTime(df: DataFrame, partitionCols: Seq[String],
      tsCol: String, tieBreak: Column, valueCol: String,
      outCol: String): DataFrame = {
    def running(o: Seq[Column]) =
      (if (partitionCols.isEmpty) Window.orderBy(o: _*)
       else Window.partitionBy(partitionCols.map(col): _*).orderBy(o: _*))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asc = running(Seq(col(tsCol), tieBreak))
    val desc = running(Seq(col(tsCol).desc, tieBreak.desc))
    val v = col(valueCol)
    val t = unix_micros(col(tsCol)).cast("double")
    val vT = when(v.isNotNull, t)
    val prevV = last(v, ignoreNulls = true).over(asc)
    val prevT = last(vT, ignoreNulls = true).over(asc)
    val nextV = last(v, ignoreNulls = true).over(desc)
    val nextT = last(vT, ignoreNulls = true).over(desc)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(prevV.isNull, lit(null).cast("double"))
        .when(nextV.isNull, prevV)
        // equal-timestamp neighbors (possible with duplicate ts) would
        // divide by zero — degenerate to the previous value
        .when(nextT === prevT, prevV)
        .otherwise(prevV + (nextV - prevV) * (t - prevT) / (nextT - prevT)))
  }

  private def windowFor(partitionCols: Seq[String], orderCol: String): WindowSpec =
    if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
    else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
}
