package graft.analysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Schemas

/** Market-cycle / regime labeling (SURVEY §2.4 D9, §2.6 J8, §2.10 M8;
  * reference prepare_visual_market_data.py:197-277).
  *
  * The reference labels rows with Python dict-lookup UDFs; here the label
  * source is a tiny dimension table broadcast-joined on a date-range
  * predicate — Catalyst broadcasts the 5-row dim, so labeling is a
  * map-side operation with no shuffle of the fact table.
  */
object CycleLabeler {

  /** The expert regime ranges as a DataFrame dimension. */
  def regimeDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Schemas.marketRegimes.map(r => (r.label, r.start, r.end))
      .toDF("regime", "start_date", "end_date")
      .select(col("regime"), col("start_date").cast("date").as("start_date"),
        col("end_date").cast("date").as("end_date"))
  }

  /** Label rows by joining a (label, start, end) dim on
    * start <= date <= end. Non-matching rows keep a null label.
    */
  def labelByDateRanges(df: DataFrame, dateCol: String, dim: DataFrame,
      labelCol: String = "regime"): DataFrame =
    df.join(broadcast(dim),
      col(dateCol).between(col("start_date"), col("end_date")), "left")
      .drop("start_date", "end_date")

  /** M8 — algorithmic quantile labels: bucket a measure by its p25/p50/p75
    * thresholds (computed exactly, broadcast back).
    */
  def quantileLabels(df: DataFrame, valueCol: String,
      outCol: String = "bucket"): DataFrame = {
    val th = df.agg(
      percentile(col(valueCol), lit(0.25)).as("__q1"),
      percentile(col(valueCol), lit(0.5)).as("__q2"),
      percentile(col(valueCol), lit(0.75)).as("__q3"))
    df.crossJoin(broadcast(th))
      .withColumn(outCol,
        when(col(valueCol) < col("__q1"), "Q1")
          .when(col(valueCol) < col("__q2"), "Q2")
          .when(col(valueCol) < col("__q3"), "Q3")
          .otherwise("Q4"))
      .drop("__q1", "__q2", "__q3")
  }
}
