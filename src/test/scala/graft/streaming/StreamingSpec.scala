package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class StreamingSpec extends SparkSpecBase {

  test("AvailableNow daily stats equal the batch equivalent") {
    val out = Streaming.runAvailableNow(spark,
      s2 => Streaming.dailyStats(Streaming.readEventsStream(s2, sf("sf0.001"))),
      "st_spec_daily")

    val batch = graft.Tables.events(spark, sf("sf0.001"))
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n_events"))

    val got = out.select("event_date", "n_events").orderBy("event_date")
      .collect().toSeq
    val want = batch.orderBy("event_date").collect().toSeq
    assert(got === want)
  }

  test("IncrementalAgg.state is streaming-compatible unchanged: the " +
      "stream-built state equals the batch state equals a 2-way merge") {
    import graft.operators.IncrementalAgg
    import spark.implicits._
    val streamed = Streaming.runAvailableNow(spark,
      s2 => IncrementalAgg.state(
        Streaming.readEventsStream(s2, sf("sf0.001")),
        Seq("event_type"), "value"),
      "st_spec_incr")
      .select("event_type", "cnt", "sum", "min", "max")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    val events = graft.Tables.events(spark, sf("sf0.001"))
    val batch = IncrementalAgg.state(events, Seq("event_type"), "value")
      .select("event_type", "cnt", "sum", "min", "max")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val cut = col("event_id") % 2 === 0
    val merged = IncrementalAgg.merge(Seq(
        IncrementalAgg.state(events.where(cut), Seq("event_type"), "value"),
        IncrementalAgg.state(events.where(!cut), Seq("event_type"), "value")),
        Seq("event_type"))
      .select("event_type", "cnt", "sum", "min", "max")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    assert(streamed.keySet === batch.keySet)
    assert(merged.keySet === batch.keySet)
    batch.foreach { case (k, (_, cnt, s, mn, mx)) =>
      val (_, cntS, sS, mnS, mxS) = streamed(k)
      val (_, cntM, sM, mnM, mxM) = merged(k)
      assert(cntS === cnt && cntM === cnt, s"cnt mismatch k=$k")
      assert(math.abs(sS - s) <= 1e-6 && math.abs(sM - s) <= 1e-6)
      assert(mnS === mn && mxS === mx && mnM === mn && mxM === mx)
    }
  }

  test("CountMin.sketch is streaming-compatible unchanged: AvailableNow " +
      "cells equal the batch cells") {
    import graft.operators.CountMin
    def items(df: org.apache.spark.sql.DataFrame) = df
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(concat(col("event_type"), lit(":"),
        pmod(col("user_id"), lit(50))).as("item"))
    val streamed = Streaming.runAvailableNow(spark,
      s2 => CountMin.sketch(
        items(Streaming.readEventsStream(s2, sf("sf0.001"))),
        "item", depth = 4, width = 128),
      "st_spec_cms")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val batch = CountMin.sketch(
      items(graft.Tables.events(spark, sf("sf0.001"))),
      "item", depth = 4, width = 128)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed === batch)
  }

  test("windowed aggregation with watermark runs to completion") {
    val out = Streaming.runAvailableNow(spark,
      s2 => Streaming.windowedStats(
        Streaming.readEventsStream(s2, sf("sf0.001")),
        "1 day", "1 day", "1 hour"),
      "st_spec_windowed")
    // complete-mode windows cover the whole month × 5 event types
    assert(out.count() >= 30 * 5 - 10)
    assert(out.columns.toSeq === Seq("window_start", "window_end",
      "event_type", "n", "sum_value"))
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    val raw = Streaming.readEventsStream(spark, sf("sf0.001"))
    val views = raw.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"))
    val purchases = raw.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val joined = Streaming.intervalJoin(views, purchases, "user_id", "ts",
      maxDelayMinutes = 60, watermark = "1 hour")
    // append mode is the only legal mode for stream-stream joins
    val q = joined.select(col("r.event_id"), col("l.ts").as("v_ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st_spec_ssjoin")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("st_spec_ssjoin")
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_views"))
      .as[(Long, Long)].collect().toMap

    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val want = p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("interval 60 minutes") &&
        col("v_ts") < col("p_ts"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_views"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("stream-static broadcast enrich equals the batch join") {
    // Stream side: events; static side: a small dimension (user tier from
    // id ranges) broadcast into every micro-batch — the standard
    // stream-enrichment shape: no state, no watermark, dimension re-read
    // per batch (so a dim update applies from the next batch on).
    import spark.implicits._
    val dimRows = (0L until 50L)
      .map(u => (u, if (u % 3 == 0) "gold" else "std"))
    val dim = dimRows.toDF("dim_user", "tier")
    val got = Streaming.runAvailableNow(spark, { s2 =>
        val d2 = s2.createDataFrame(dimRows).toDF("dim_user", "tier")
        Streaming.readEventsStream(s2, sf("sf0.001"))
          .join(broadcast(d2), col("user_id") === col("dim_user"), "left")
          .groupBy(coalesce(col("tier"), lit("unknown")).as("tier"))
          .agg(count(lit(1)).as("n"))
      }, "st_spec_enrich")
      .as[(String, Long)].collect().toMap
    val want = graft.Tables.events(spark, sf("sf0.001"))
      .join(broadcast(dim), col("user_id") === col("dim_user"), "left")
      .groupBy(coalesce(col("tier"), lit("unknown")).as("tier"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got.keySet == Set("gold", "std") || got.contains("unknown"))
  }

  test("stream-stream LEFT OUTER interval join equals the batch left " +
      "join below the min-watermark cutoff, including unmatched rows") {
    import spark.implicits._
    val raw = Streaming.readEventsStream(spark, sf("sf0.001"))
    val purchases = raw.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = raw.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"))
    val joined = Streaming.intervalJoinLeftOuter(purchases, views,
      "user_id", "ts", maxDelayMinutes = 60, watermark = "0 seconds")
    val q = joined.select(col("l.event_id").as("event_id"),
        col("l.ts").as("p_ts"), col("r.ts").as("v_ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st_spec_ssljoin")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    // cutoff = global watermark at termination = min over both sides'
    // max event time (0-second delay)
    val cutTs = ev.agg(least(
      max(when(col("event_type") === "purchase", col("ts"))),
      max(when(col("event_type") === "view", col("ts"))))).head().getTimestamp(0)
    val got = spark.table("st_spec_ssljoin")
      .where(col("p_ts") < lit(cutTs))
      .groupBy(col("event_id"))
      .agg(count(col("v_ts")).as("n_views"))
      .as[(Long, Long)].collect().toMap
    val p = ev.where(col("event_type") === "purchase" && col("ts") < lit(cutTs))
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val want = p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("interval 60 minutes") &&
        col("v_ts") < col("p_ts"), "left")
      .groupBy(col("event_id")).agg(count(col("v_ts")).as("n_views"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // non-vacuous both ways: some purchases matched, some null-padded
    assert(want.values.exists(_ > 0) && want.values.exists(_ == 0))
  }

  test("staticEnrich re-reads the dim between micro-batches: a dim file " +
      "updated between batches applies from the next batch on") {
    // The scaladoc contract: the static side is re-EXECUTED per
    // micro-batch, so overwriting the dim file between batches changes
    // the enrichment from the next batch on (slowly-changing dim). Two
    // AvailableNow runs over ONE checkpoint are two micro-batches of the
    // same logical stream; the SAME dim DataFrame object (plan built
    // once, before either run) is joined in both. The overwrite keeps
    // the file byte-length identical so the plan's cached FileStatus
    // stays valid — only the re-read contents differ.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_scd")
    val evDir = base.resolve("events"); val dimDir = base.resolve("dim")
    val outDir = s"$base/out"; val chk = s"$base/chk"
    java.nio.file.Files.createDirectories(evDir)
    java.nio.file.Files.createDirectories(dimDir)
    def writeDim(tag: String): Unit =
      java.nio.file.Files.write(dimDir.resolve("d.csv"),
        (0L until 10L).map(u => s"$u,tier_$tag").mkString("\n").getBytes)
    def addEvents(batch: Int): Unit = {
      val tmp = s"$base/stage$batch"
      (0L until 10L).map(u => (batch * 100L + u, u))
        .toDF("event_id", "user_id").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        evDir.resolve(s"b$batch.parquet"))
    }
    writeDim("v1"); addEvents(0)
    val stream = spark.readStream.schema("event_id LONG, user_id LONG")
      .parquet(evDir.toString)
    val dim = spark.read.schema("user_id LONG, tier STRING")
      .csv(dimDir.toString) // built ONCE, before both batches
    val enriched = Streaming.staticEnrich(stream, dim, Seq("user_id"))
      .select(col("event_id"), col("tier"))
    def runBatch(): Unit = {
      val q = enriched.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runBatch()
    writeDim("v2"); addEvents(1) // dim update lands BETWEEN batches
    runBatch()
    val got = spark.read.parquet(outDir)
      .select((col("event_id") >= 100).as("is_second_batch"), col("tier"))
      .distinct().as[(Boolean, String)].collect().toMap
    assert(got === Map(false -> "tier_v1", true -> "tier_v2"))
  }

  test("KmvAgg is streaming-compatible unchanged: AvailableNow daily " +
      "sketches equal the batch sketches bit-for-bit") {
    import graft.operators.ThetaSketch
    def daily(df: org.apache.spark.sql.DataFrame) = df
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(to_date(col("ts")).as("event_date"), col("user_id"))
    val streamed = Streaming.runAvailableNow(spark,
      s2 => ThetaSketch.kmvSketchAgg(
        daily(Streaming.readEventsStream(s2, sf("sf0.001"))),
        "event_date", "user_id", 32),
      "st_spec_kmv")
      .collect()
      .map(r => r.getDate(0).toString -> r.getSeq[Long](1).toSeq).toMap
    val batch = ThetaSketch.kmvSketchAgg(
      daily(graft.Tables.events(spark, sf("sf0.001"))),
      "event_date", "user_id", 32)
      .collect()
      .map(r => r.getDate(0).toString -> r.getSeq[Long](1).toSeq).toMap
    assert(streamed.nonEmpty && streamed === batch)
  }
}
