package graft.sources

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{Multimodal, TextAnalysis}

class WritersSpec extends SparkSpecBase {

  import spark.implicits._

  test("versioned dirs resolve lexicographically to the latest run") {
    val base = Files.createTempDirectory("graft_versions").toString
    val d1 = Writers.versionedDir(base, LocalDateTime.of(2026, 1, 2, 3, 4, 5))
    val d2 = Writers.versionedDir(base, LocalDateTime.of(2026, 1, 2, 4, 0, 0))
    assert(d1.endsWith("2026-01-02_03-04-05"))
    assert(Writers.latestVersion(base).contains(d2))
  }

  test("metrics JSON renders nested maps and escapes strings") {
    val p = Files.createTempDirectory("graft_metrics").toString + "/m.json"
    Writers.writeMetricsJson(Map(
      "total_rows" -> 5L,
      "label" -> "a \"quoted\" name",
      "mix" -> Map("sale" -> 3L, "mint" -> 2L)), p)
    val txt = Files.readString(Paths.get(p))
    assert(txt.contains("\"total_rows\": 5"))
    assert(txt.contains("\\\"quoted\\\""))
    assert(txt.contains("\"mix\": {"))
  }

  test("writeRangeClustered: files cover disjoint sorted key ranges and " +
      "preserve the row multiset") {
    val path = Files.createTempDirectory("graft_rangelayout").toString + "/t"
    val df = graft.Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "value")
    Writers.writeRangeClustered(df, path, Seq("event_id"), numFiles = 8)

    val back = spark.read.parquet(path)
    assert(back.count() === df.count())
    assert(back.select(sum(col("event_id"))).as[Long].head() ===
      df.select(sum(col("event_id"))).as[Long].head())

    // per-file key ranges must not overlap: that disjointness is exactly
    // what lets footer min/max stats prune range scans
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .orderBy("lo")
      .select("lo", "hi").as[(Long, Long)].collect()
    assert(ranges.length >= 2) // repartitionByRange produced real spread
    ranges.sliding(2).foreach {
      case Array((_, hiPrev), (loNext, _)) =>
        assert(loNext > hiPrev,
          s"overlapping file ranges: hi=$hiPrev lo=$loNext")
      case _ => ()
    }
  }

  test("partitioned parquet roundtrip prunes partitions") {
    val dir = Files.createTempDirectory("graft_part").toString + "/t"
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    Writers.writePartitioned(df, dir, Seq("k"))
    assert(Files.exists(Paths.get(s"$dir/k=a")))
    val back = Readers.readPartitioned(spark, dir).where(col("k") === "a")
    assert(back.count() === 2)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(k"), scan)
  }

  test("fingerprints: whitespace-insensitive md5, order-sensitive rolling hash") {
    val df = Seq(
      (0L, "hello   world"), (1L, "hello world"), (2L, "world hello"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.rollingHash(col("text")).as("rh"))
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(df(0L)._1 === df(1L)._1) // normalized whitespace
    assert(df(0L)._2 === df(1L)._2)
    assert(df(1L)._1 !== df(2L)._1) // different content hash
    assert(df(1L)._2 !== df(2L)._2) // permutation changes rolling hash
  }

  test("multimodal assets carry payload metadata and patch plumbing") {
    val docs = Seq((1L, "some payload text")).toDF("doc_id", "text")
    val assets = Multimodal.withFakeDecodedFeatures(
      Multimodal.toAssets(docs, "doc_id", "text", "text/plain"))
    val r = assets.head()
    assert(r.getAs[Long]("byte_len") === 17L)
    assert(r.getAs[String]("payload_md5").length === 32)
    assert(r.getAs[Int]("width") === 18) // 17 % 640 + 1
    val patches = Multimodal.samplePatches(
      Multimodal.toAssets(docs, "doc_id", "text", "text/plain"), 4)
    assert(patches.count() === 4)
    assert(patches.select("patch_sig").distinct().count() === 4)
  }

  test("batched decode matches the column-stub features and batches by size") {
    val docs = (1L to 200L).map(i => (i, "x" * (i.toInt % 50 + 1)))
      .toDF("doc_id", "text")
    val assets = Multimodal.toAssets(docs, "doc_id", "text", "text/plain")
    val viaColumns = Multimodal.withFakeDecodedFeatures(assets)
      .select("asset_id", "width", "height").as[(Long, Int, Int)]
      .collect().toSet
    // small row cap forces many batches; results must not depend on batching
    val viaBatches = Multimodal.decodeBatched(assets, maxBatchRows = 7)()
      .select("asset_id", "width", "height")
      .as[(Long, Int, Int)].collect().toSet
    assert(viaBatches === viaColumns)
    // byte cap: with a 60-byte budget every batch holds >= 1 row and the
    // decoder still sees every asset exactly once
    val tiny = Multimodal.decodeBatched(assets, maxBatchRows = 1000,
      maxBatchBytes = 60L)()
    assert(tiny.count() === 200)
  }

  test("real PNG codec roundtrips through decodeBatched independent of " +
      "batching") {
    // 60 deterministic two-band PNGs; imageIoDecode reads actual pixels
    val spec = (1L to 60L).map(i =>
        (i, (i % 48 + 16).toInt, ((i * 7) % 32 + 16).toInt,
          (i % 256).toInt, ((i * 31) % 256).toInt))
      .toDF("asset_id", "width", "height", "luma_top", "luma_bottom")
    val pngs = Multimodal.renderPngAssets(spec)
    def decode(rows: Int) =
      Multimodal.decodeBatched(pngs, maxBatchRows = rows)(
          Multimodal.imageIoDecode)
        .as[(Long, Int, Int, Double)].collect().toSet
    val small = decode(7)
    assert(small === decode(1000)) // batching-invariant
    // decoded dims + mean equal the closed form the PNGs were built from
    val expected = (1L to 60L).map { i =>
      val (w, h) = ((i % 48 + 16).toInt, ((i * 7) % 32 + 16).toInt)
      val (lt, lb) = ((i % 256).toInt, ((i * 31) % 256).toInt)
      val top = h / 2
      (i, w, h, (top.toLong * lt + (h - top).toLong * lb).toDouble / h)
    }.toSet
    assert(small === expected)
  }

  test("overwritePartitions replaces only the partitions present in the " +
      "incremental frame") {
    val dir = Files.createTempDirectory("graft_incr").toString
    def day(d: String, v: Double) = Seq((d, 1L, v), (d, 2L, v))
      .toDF("event_date", "id", "value")
    // base load: days 1-3
    Writers.writePartitioned(
      day("2024-01-01", 1.0).union(day("2024-01-02", 2.0))
        .union(day("2024-01-03", 3.0)),
      dir, Seq("event_date"))
    def fileOf(d: String) = new java.io.File(s"$dir/event_date=$d")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(f =>
        f.getName -> f.lastModified()).toSeq.sorted
    val d1Before = fileOf("2024-01-01")
    val d3Before = fileOf("2024-01-03")
    // incremental: re-ingest day 2 (corrected values) + brand-new day 4
    Writers.overwritePartitions(
      day("2024-01-02", 20.0).union(day("2024-01-04", 4.0)),
      dir, Seq("event_date"))
    // untouched partitions keep their exact files (no rewrite)
    assert(fileOf("2024-01-01") === d1Before)
    assert(fileOf("2024-01-03") === d3Before)
    // day 2 replaced, day 4 added, days 1/3 intact
    val back = spark.read.parquet(dir)
      .groupBy(col("event_date")).agg(sum(col("value")).as("s"))
      .as[(String, Double)].collect().toMap
    assert(back === Map("2024-01-01" -> 2.0, "2024-01-02" -> 40.0,
      "2024-01-03" -> 6.0, "2024-01-04" -> 8.0))
  }

  test("compact: collapses a many-small-file dir, content identical") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 4000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    // 64 tiny files, as a micro-batch sink would leave behind.
    df.repartition(64).write.parquet(dir)
    def parquetFiles = Files.list(Paths.get(dir)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(parquetFiles == 64)
    Writers.compact(spark, dir, targetRowsPerFile = 2000)
    assert(parquetFiles == 2)
    val back = spark.read.parquet(dir).as[(Long, String)].collect()
    assert(back.length == 4000)
    assert(back.map(_._1).toSet == (1 to 4000).map(_.toLong).toSet)
  }

  test("compact: refuses a hive-partitioned directory outright") {
    val dir = Files.createTempDirectory("compactpart").toString + "/t"
    val df = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "s", "p")
    df.write.partitionBy("p").parquet(dir)
    val err = intercept[IllegalArgumentException] {
      Writers.compact(spark, dir, targetRowsPerFile = 1000)
    }
    assert(err.getMessage.contains("hive-partitioned"))
    // and the refusal left the data completely untouched
    assert(spark.read.parquet(dir).count() == 2)
  }
}
