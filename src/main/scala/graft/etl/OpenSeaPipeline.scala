package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.sources.{Readers, Writers}

/** End-to-end ETL orchestration (SURVEY §3 E1; reference
  * opensea_pipeline/run.py:52-165): load raw CSVs → validation report →
  * 8-step clean → star-schema aggregates → versioned parquet outputs +
  * metrics.json + run log.
  *
  * Execution shape: steps 1-3 build ONE lazy lineage; the clean frame is
  * cached once and fanned out to the independent aggregate plans; the
  * only actions are the writes and the validation/metrics collects.
  */
object OpenSeaPipeline {

  case class Config(
      rawDataDir: String,
      cleanBaseDir: String,
      createWalletDim: Boolean = false,
      minWalletTransactions: Long = 1,
      compression: String = "zstd")

  case class RunResult(
      outputDir: String,
      report: DataValidator.ValidationReport,
      metrics: Map[String, Any])

  def run(spark: SparkSession, config: Config): RunResult = {
    val t0 = System.nanoTime()

    // 1. load — per-file tolerant CSV + union-by-name (S1)
    val rawPaths = listCsvs(config.rawDataDir)
    val raw = Readers.readCsvUnionByName(spark, rawPaths)

    // 2. validation report (aggregate queries → driver-rendered report)
    val report = DataValidator.report(raw)

    // 3. clean — one lazy plan, cached for the aggregate fan-out
    val clean = EventCleaner.clean(raw)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 4. aggregates over the shared cached frame
    val daily = EventAggregator.dailyCollectionStats(clean)
    val tokens = EventAggregator.tokenStats(clean)
    val collectionDim = EventAggregator.collectionDimension(clean)
    val summary = EventAggregator.collectionSummary(clean)

    // 5. versioned writes
    val outDir = Writers.versionedDir(config.cleanBaseDir)
    Writers.writeParquet(clean, s"$outDir/minimal_events.parquet",
      config.compression)
    Writers.writeParquet(daily, s"$outDir/daily_collection_stats.parquet",
      config.compression)
    Writers.writeParquet(tokens, s"$outDir/token_stats.parquet",
      config.compression)
    Writers.writeParquet(collectionDim, s"$outDir/collection_dimension.parquet",
      config.compression)
    Writers.writeParquet(summary, s"$outDir/collection_summary.parquet",
      config.compression)
    if (config.createWalletDim)
      Writers.writeParquet(
        EventAggregator.walletDimension(clean, config.minWalletTransactions),
        s"$outDir/wallet_dimension.parquet", config.compression)

    // 6. metrics + run log
    val metrics = DataValidator.qualityMetrics(clean)
    Writers.writeMetricsJson(metrics, s"$outDir/metrics.json")
    val elapsed = (System.nanoTime() - t0) / 1e9
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/_run.log"),
      s"${report.render}\nelapsed_sec: $elapsed\n")

    clean.unpersist()
    RunResult(outDir, report, metrics)
  }

  private def listCsvs(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"raw data dir not found: $dir")
    d.listFiles().filter(_.getName.endsWith(".csv")).map(_.getPath)
      .sorted.toSeq
  }
}
