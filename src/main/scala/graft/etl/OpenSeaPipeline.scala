package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global

    val t0 = System.nanoTime()
    val phaseLog = new StringBuilder
    def phase[A](name: String)(f: => A): A = {
      val p0 = System.nanoTime()
      val r = f
      phaseLog.synchronized {
        phaseLog.append(
          f"phase $name: ${(System.nanoTime() - p0) / 1e9}%.2f s " +
            f"(t=${(p0 - t0) / 1e9}%.2f..${(System.nanoTime() - t0) / 1e9}%.2f)\n")
      }
      r
    }

    // Run each concurrent phase in its own FAIR-scheduler pool (created
    // on demand; RunPipeline sets spark.scheduler.mode=FAIR) so a long
    // job shares task slots with short ones instead of queueing them —
    // pool assignment is thread-local, hence set inside the Future.
    def inPool[A](pool: String)(f: => A): A = {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
      try f
      finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    }

    // 1. load — per-file tolerant CSV + union-by-name (S1). NOT cached:
    // columnar in-memory caching of 17 string columns costs more than the
    // pruned re-scans do (measured 22s vs ~3s/pass at the 1.5M anchor).
    val rawPaths = listCsvs(config.rawDataDir)
    val raw = Readers.readCsvUnionByName(spark, rawPaths)

    // 3+5a. clean — one lazy plan, written straight to the versioned
    // parquet output; the parquet file then serves as the materialized
    // form for the aggregate fan-out (columnar, compressed, pruned reads
    // — cheaper than an in-memory cache it would only use five times).
    // The observation point sits on raw rows BEFORE any cleaning filter,
    // so the audit sees exactly what DataValidator.report(raw) would.
    val audit = org.apache.spark.sql.Observation("raw_audit")
    val auditExprs = DataValidator.rowLocalAuditExprs(raw)
    val rawObserved = raw.observe(audit, auditExprs.head, auditExprs.tail: _*)
    val outDir = Writers.versionedDir(config.cleanBaseDir)

    // 2a. the two audits that need their own shuffle run concurrently
    // with clean+write, over ONE shared cached projection of just the
    // key + event_type columns: together they re-parse the CSV once, not
    // twice (text tokenization dominates; at 100 TB each avoided pass is
    // a full corpus read). When the audits were two full passes they
    // measurably stretched the clean phase; a single pruned pass under
    // FAIR pools overlaps cleanly. Sequential within one future: the
    // first audit populates the cache, the second rides it for pennies.
    val auditCols = (Schemas.dedupKey :+ "event_type").distinct
      .filter(raw.columns.contains)
    val rawKeys = raw.select(auditCols.map(
      org.apache.spark.sql.functions.col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val auditsF = Future(inPool("audit") {
      val dup = phase("audit dup-keys")(
        DataValidator.duplicateKeyCount(rawKeys))
      val evt = phase("audit event-types")(
        DataValidator.invalidEventTypes(rawKeys))
      rawKeys.unpersist(blocking = false)
      (dup, evt)
    })

    phase("clean+write")(inPool("clean")(Writers.writeParquet(
      EventCleaner.clean(rawObserved),
      s"$outDir/minimal_events.parquet", config.compression)))
    val auditMetrics = audit.get
    // The aggregate fan-out below reads the fact table nine times (daily
    // main+median, tokens, dim, summary main+quartiles, metrics ×3).
    // Cache the pruned union of the columns those consumers actually
    // touch — typed, dictionary-friendly, ~an order of magnitude smaller
    // than the raw strings whose caching was measured a net loss — so
    // parquet is decoded ONCE and the nine plans read columnar memory.
    // Concurrent first readers don't duplicate work: BlockManager's
    // per-partition getOrElseUpdate makes one job compute a block while
    // the others wait on it.
    val written = spark.read.parquet(s"$outDir/minimal_events.parquet")
    val factCols = Seq("collection", "event_date", "event_type", "buyer",
      "seller", "token_id", "price_total_eth", "price_each_eth",
      "contract_address", "to_address", "event_timestamp", "rarity_rank",
      "rarity_score").filter(written.columns.contains)
    val clean = written.select(factCols.map(
      org.apache.spark.sql.functions.col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // No explicit materialization pass: letting the fan-out's first
    // touchers build the cache concurrently measured FASTER than a
    // serial count() + warm-cache fan-out (BlockManager's per-partition
    // getOrElseUpdate keeps duplicate work out either way, and the
    // serial pass just adds its own wall-clock).

    // 2b. the row-local audit (nulls, addresses, prices, timestamp
    // range) was observed on the clean+write scan above, so it cost NO
    // extra pass over the raw CSV.

    // 4. the aggregates are mutually independent reads of the written
    // fact table — submitted concurrently, same rationale as validation.
    // Each output is coalesce(1)'d: the grains are aggregate-bound
    // (collections × days, tokens), not data-bound — they stay small at
    // any input scale — and one file per output replaces a 32-task final
    // wave plus 32 per-task commits with one of each (the partial
    // aggregation upstream still runs fully parallel; only the trivial
    // final merge + write collapses).
    val aggWrites = Seq(
      "daily" -> (() => Writers.writeParquet(
        EventAggregator.dailyCollectionStats(clean).coalesce(1),
        s"$outDir/daily_collection_stats.parquet", config.compression)),
      "tokens" -> (() => Writers.writeParquet(
        EventAggregator.tokenStats(clean).coalesce(1),
        s"$outDir/token_stats.parquet", config.compression)),
      "collection_dim" -> (() => Writers.writeParquet(
        EventAggregator.collectionDimension(clean).coalesce(1),
        s"$outDir/collection_dimension.parquet", config.compression)),
      "summary" -> (() => Writers.writeParquet(
        EventAggregator.collectionSummary(clean).coalesce(1),
        s"$outDir/collection_summary.parquet", config.compression))) ++
      (if (config.createWalletDim)
        Seq("wallet_dim" -> (() => Writers.writeParquet(
          EventAggregator.walletDimension(clean,
            config.minWalletTransactions).coalesce(1),
          s"$outDir/wallet_dimension.parquet", config.compression)))
      else Nil)
    val aggFutures = aggWrites.map { case (name, write) =>
      Future(inPool(s"agg_$name")(phase(s"agg $name")(write())))
    }
    val metricsF = Future(inPool("metrics")(phase("metrics")(
      DataValidator.qualityMetrics(clean))))

    // 6. join everything + run log
    val (dupKeys, invalidTypes) = Await.result(auditsF, Duration.Inf)
    val report = DataValidator.reportFrom(raw,
      name => auditMetrics(name).asInstanceOf[Long], dupKeys, invalidTypes)
    aggFutures.foreach(Await.result(_, Duration.Inf))
    val metrics = Await.result(metricsF, Duration.Inf)
    clean.unpersist(blocking = false)
    Writers.writeMetricsJson(metrics, s"$outDir/metrics.json")
    val elapsed = (System.nanoTime() - t0) / 1e9
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/_run.log"),
      s"${report.render}\n${phaseLog.toString}elapsed_sec: $elapsed\n")

    RunResult(outDir, report, metrics)
  }

  private def listCsvs(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"raw data dir not found: $dir")
    d.listFiles().filter(_.getName.endsWith(".csv")).map(_.getPath)
      .sorted.toSeq
  }
}
