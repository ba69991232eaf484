package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase

/** End-to-end golden run (SURVEY §5.2 item 3): raw CSVs → versioned
  * star-schema outputs + metrics + run log.
  */
class PipelineSpec extends SparkSpecBase {

  test("pipeline produces the five outputs, metrics and run log") {
    val dir = Files.createTempDirectory("graft_pipeline").toString
    val rawDir = s"$dir/raw"
    Files.createDirectories(Paths.get(rawDir))
    val rows = (0 until 50).map { i =>
      val coll = if (i % 2 == 0) "bayc" else "azuki"
      val et = Seq("sale", "mint", "transfer")(i % 3)
      val ts = 1682935200L + i * 3600
      s"ethereum,$coll,$i,$et,2023-05-0${1 + i % 5}T10:00:00+00:00,$ts,0xT$i," +
        s"0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34," +
        s"0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34," +
        s"1,${i % 10}.5,ETH,0xC1,${i % 20},"
    }
    val header = "chain,collection,identifier,event_type,time_utc,timestamp,tx,seller,buyer,from_address,to_address,quantity,price_total,currency_symbol,contract,token_id,price_each"
    Files.writeString(Paths.get(s"$rawDir/events.csv"),
      (header +: rows).mkString("\n"))

    val result = OpenSeaPipeline.run(spark, OpenSeaPipeline.Config(
      rawDataDir = rawDir,
      cleanBaseDir = s"$dir/clean",
      createWalletDim = true))

    val out = result.outputDir
    for (f <- Seq("minimal_events.parquet", "daily_collection_stats.parquet",
        "token_stats.parquet", "collection_dimension.parquet",
        "collection_summary.parquet", "wallet_dimension.parquet",
        "metrics.json", "_run.log"))
      assert(Files.exists(Paths.get(s"$out/$f")), s"missing $f")

    assert(result.report.totalRows === 50)
    assert(result.metrics("total_rows") === 50L)
    assert(result.metrics("total_collections") === 2L)

    val clean = spark.read.parquet(s"$out/minimal_events.parquet")
    assert(clean.count() === 50)
    assert(clean.schema.fieldNames.toSeq ===
      Schemas.minimalEventSchema.fieldNames.toSeq)
    val dims = spark.read.parquet(s"$out/collection_dimension.parquet")
    assert(dims.count() === 2)

    // latest-version resolution finds the run we just wrote
    assert(graft.sources.Writers.latestVersion(s"$dir/clean")
      .contains(out))
  }
}
