package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Stats, TimeSeries}

/** The E2/E4 analysis lifecycle (SURVEY §3: prepare_visual_market_data +
  * analyze_visual_cycles) as one composition: embeddings → KMeans visual
  * clusters; transactions → monthly momentum → quantile cycle labels;
  * both broadcast-joined back onto the fact table; then cluster×cycle
  * performance and per-cluster ANOVA across cycles.
  *
  * The reference crosses engines four times with full materialization at
  * each hop (Polars→pandas→sklearn→Polars); here only the KMeans fit is
  * an action — everything else is one lazy lineage.
  */
object VisualMarketPipeline {

  case class Result(
      labeled: DataFrame,       // fact rows + visual_cluster + cycle
      clusterCycle: DataFrame,  // A14 performance grid
      anovaByCluster: DataFrame) // M4 F-stats per cluster

  /** @param events     fact table with (entityCol, tsCol, valueCol)
    * @param embeddings (idCol, vecCol) — entity embeddings; entity ids
    *                   must align with `entityCol`
    */
  def run(spark: SparkSession, events: DataFrame, entityCol: String,
      tsCol: String, valueCol: String, embeddings: DataFrame, idCol: String,
      vecCol: String, k: Int, seed: Long): Result = {

    // M6 — visual clusters (spark.ml), broadcast back (J9)
    val clusters = graft.ml.Clustering.kmeansAssign(
        embeddings, idCol, vecCol, k, seed)
      .select(col(idCol).cast("long").as(entityCol),
        col("cluster").as("visual_cluster"))

    // A13 + W4 + M8 — monthly momentum → quantile cycle labels (J8)
    val monthly = events
      .groupBy(date_trunc("month", col(tsCol)).cast("date").as("month"))
      .agg(avg(col(valueCol)).as("avg_value"))
    val momentum = TimeSeries.pctChange(monthly, "month", "avg_value",
      "momentum").where(col("momentum").isNotNull)
    val cycles = CycleLabeler.quantileLabels(momentum, "momentum", "cycle")
      .select(col("month"), col("cycle"))

    val labeled = events
      .join(broadcast(clusters), Seq(entityCol), "left")
      .withColumn("month", date_trunc("month", col(tsCol)).cast("date"))
      .join(broadcast(cycles), Seq("month"), "left")

    // A14 — cluster × cycle performance grid
    val grid = labeled
      .where(col("visual_cluster").isNotNull && col("cycle").isNotNull)
      .groupBy(col("visual_cluster"), col("cycle"))
      .agg(count(lit(1)).as("n"),
        avg(col(valueCol)).as("avg_value"),
        percentile(col(valueCol), lit(0.5)).as("median_value"),
        stddev_samp(col(valueCol)).as("std_value"))

    // M4 — per-cluster one-way ANOVA of value across cycles
    val anova = labeled
      .where(col("visual_cluster").isNotNull && col("cycle").isNotNull)
      .groupBy(col("visual_cluster"), col("cycle"))
      .agg(count(lit(1)).cast("double").as("n_g"),
        avg(col(valueCol)).as("mean_g"),
        var_samp(col(valueCol)).as("var_g"))
      .groupBy(col("visual_cluster"))
      .agg(
        sum(col("n_g")).as("n"),
        count(lit(1)).cast("double").as("k"),
        (sum(col("n_g") * col("mean_g")) / sum(col("n_g"))).as("grand_mean"),
        sum(col("n_g") * col("mean_g") * col("mean_g")).as("sum_n_mean2"),
        sum((col("n_g") - 1) * col("var_g")).as("ssw"))
      .withColumn("ssb",
        col("sum_n_mean2") - col("n") * col("grand_mean") * col("grand_mean"))
      .withColumn("f_stat",
        (col("ssb") / (col("k") - 1)) / (col("ssw") / (col("n") - col("k"))))
      .withColumn("eta_squared", col("ssb") / (col("ssb") + col("ssw")))
      .select("visual_cluster", "n", "k", "f_stat", "eta_squared")

    Result(labeled, grid, anova)
  }
}
