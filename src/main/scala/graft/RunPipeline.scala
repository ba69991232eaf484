package graft

import org.apache.spark.sql.SparkSession

import graft.etl.OpenSeaPipeline

/** CLI entry point for the full ETL (the reference's `python run.py`):
  * runMain graft.RunPipeline <rawCsvDir> <cleanBaseDir> [--wallet-dim]
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunPipeline <rawCsvDir> <cleanBaseDir> [--wallet-dim]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("opensea-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = OpenSeaPipeline.run(spark, OpenSeaPipeline.Config(
      rawDataDir = args(0),
      cleanBaseDir = args(1),
      createWalletDim = args.contains("--wallet-dim")))
    println(s"outputs: ${result.outputDir}")
    println(result.report.render)
    spark.stop()
  }
}
