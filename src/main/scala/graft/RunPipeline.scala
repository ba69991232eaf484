package graft

import org.apache.spark.sql.SparkSession

import graft.etl.OpenSeaPipeline

/** CLI entry point for the full ETL (the reference's `python run.py`):
  * runMain graft.RunPipeline <rawCsvDir> <cleanBaseDir> [--wallet-dim]
  * [--repeat] — runs the pipeline twice in the same JVM; the second run
  * shows the warm steady-state cost with one-time JIT/codegen excluded
  * (the long-running-cluster number).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunPipeline <rawCsvDir> <cleanBaseDir> [--wallet-dim] [--repeat]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("opensea-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.scheduler.mode", "FAIR")
      // AQE default-off for this single-node CLI: at the 1.5M-row anchor
      // its per-stage re-plan round-trips on the driver cost ~5 s across
      // the 7-job fan-out and buy nothing (32 fixed partitions, no skew).
      // Cluster deployments at real scale should run with AQE on (skew
      // joins, partition coalescing) — the plans themselves don't care.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val config = OpenSeaPipeline.Config(
      rawDataDir = args(0),
      cleanBaseDir = args(1),
      createWalletDim = args.contains("--wallet-dim"))
    val result = OpenSeaPipeline.run(spark, config)
    println(s"outputs: ${result.outputDir}")
    println(result.report.render)
    // --repeat [N]: N warm reruns in the same JVM (default 1) — the
    // steady-state numbers with one-time JIT/codegen excluded; medians
    // over N>=3 are what to quote (single warm runs carry ±20% noise
    // from GC timing and background load).
    if (args.contains("--repeat")) {
      val n = args.sliding(2).collectFirst {
        case Array("--repeat", v) if v.forall(_.isDigit) => v.toInt
      }.getOrElse(1)
      val times = (1 to n).map { i =>
        // ContextCleaner frees shuffle files / broadcast blocks via weak
        // references, i.e. only after a GC — back-to-back runs in one
        // JVM otherwise accumulate dead shuffle state (measured: reruns
        // degrading 16 s -> 41 s by rep 4). A real long-running cluster
        // GCs naturally between jobs; do the same here.
        System.gc()
        val t0 = System.nanoTime()
        val again = OpenSeaPipeline.run(spark, config)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"warm rerun $i: $dt%.2f s -> ${again.outputDir}")
        dt
      }
      println(f"warm median of $n: ${times.sorted.apply(n / 2)}%.2f s")
    }
    spark.stop()
  }
}
