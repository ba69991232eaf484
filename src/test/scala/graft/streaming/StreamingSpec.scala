package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class StreamingSpec extends SparkSpecBase {

  test("AvailableNow daily stats equal the batch equivalent") {
    val stream = Streaming.readEventsStream(spark, sf("sf0.001"))
    val out = Streaming.runAvailableNow(spark,
      Streaming.dailyStats(stream), "st_spec_daily")

    val batch = graft.Tables.events(spark, sf("sf0.001"))
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n_events"))

    val got = out.select("event_date", "n_events").orderBy("event_date")
      .collect().toSeq
    val want = batch.orderBy("event_date").collect().toSeq
    assert(got === want)
  }

  test("windowed aggregation with watermark runs to completion") {
    val stream = Streaming.readEventsStream(spark, sf("sf0.001"))
    val out = Streaming.runAvailableNow(spark,
      Streaming.windowedStats(stream, "1 day", "1 day", "1 hour"),
      "st_spec_windowed")
    // complete-mode windows cover the whole month × 5 event types
    assert(out.count() >= 30 * 5 - 10)
    assert(out.columns.toSeq === Seq("window_start", "window_end",
      "event_type", "n", "sum_value"))
  }
}
