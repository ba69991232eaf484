package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

class SessionizeSpec extends SparkSpecBase {

  import spark.implicits._

  test("flatMapGroupsWithState sessionization closes sessions on gaps") {
    // user 1: two bursts 3h apart; user 2: one burst
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:10:00", 2.0),
      (1L, "2024-01-01 13:30:00", 3.0),
      (1L, "2024-01-01 13:40:00", 4.0),
      (2L, "2024-01-01 09:00:00", 5.0))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
      .select("user_id", "ts", "value")

    val dir = Files.createTempDirectory("graft_sessionize").toString
    rows.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.schema).parquet(s"$dir/in")

    val q = Streaming.sessionize(stream, gapMinutes = 60)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_spec").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // Only sessions CLOSED by a gap are emitted (open sessions stay in
    // state awaiting more data): user 1's first burst.
    val out = spark.table("sess_spec")
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Int, Double)].collect().toSet
    assert(out === Set((1L, 2, 3.0)))

    // batch form: same gap rule over the same input yields the closed
    // session PLUS the still-open ones the stream is withholding
    val batch = graft.operators.Sessionize.batchSessions(
        rows, "user_id", "ts", "value", gapMinutes = 60)
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(batch === Set((1L, 2L, 3.0), (1L, 2L, 7.0), (2L, 1L, 5.0)))
  }

  test("batchSessions drops null-timestamp rows instead of emitting " +
      "degenerate null sessions") {
    // cleaned ETL output deliberately KEEPS null-ts rows; a backfill over
    // it must not turn each of them into a one-row session with null
    // start/end (which the streaming form can never produce)
    val rows = Seq(
      (1L, Some("2024-01-01 10:00:00"), 1.0),
      (1L, Some("2024-01-01 10:10:00"), 2.0),
      (1L, None, 99.0),
      (1L, None, 98.0))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
      .select("user_id", "ts", "value")
    val out = graft.operators.Sessionize.batchSessions(
        rows, "user_id", "ts", "value", gapMinutes = 60)
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 2L, 3.0)))
  }

  // foreachBatch, not the memory sink: only foreachBatch supports
  // restarting from an existing checkpoint, which is how these tests
  // deliver late data in a SECOND micro-batch against persisted state.
  private def runSessionize(inDir: String, checkpoint: String)
      : Set[(Long, Long, Long, Int, Double)] = {
    val buf = scala.collection.mutable.Set
      .empty[(Long, Long, Long, Int, Double)]
    val schema = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value").schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = Streaming.sessionize(stream, gapMinutes = 60)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        buf.synchronized {
          buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getInt(3), r.getDouble(4)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    buf.toSet
  }

  // append new part files into the WATCHED directory itself — the file
  // stream source does not descend into non-partition subdirectories
  private def writeBatch(inDir: String, n: Int,
      rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
      .select("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(inDir)

  test("out-of-order: late event inside the still-open session folds in " +
      "without moving the session end backward") {
    val base = Files.createTempDirectory("graft_sess_ooo").toString
    val in = s"$base/in"; val cp = s"$base/cp"
    // batch 1: open session 10:00-10:30
    writeBatch(in, 1, Seq((1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:30:00", 2.0)))
    assert(runSessionize(in, cp).isEmpty) // nothing closed yet
    // batch 2: late 10:15 event (inside the open session), then a
    // 14:00 event whose gap closes it
    writeBatch(in, 2, Seq((1L, "2024-01-01 10:15:00", 4.0),
      (1L, "2024-01-01 14:00:00", 8.0)))
    val closed = runSessionize(in, cp)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val t30 = java.sql.Timestamp.valueOf("2024-01-01 10:30:00").getTime
    // the closed session spans 10:00-10:30 and CONTAINS the late event
    assert(closed === Set((1L, t0, t30, 3, 7.0)))
    // batch form over the full history agrees exactly here
    val allRows = Seq((1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:30:00", 2.0), (1L, "2024-01-01 10:15:00", 4.0),
      (1L, "2024-01-01 14:00:00", 8.0))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
    val batch = graft.operators.Sessionize.batchSessions(
        allRows, "user_id", "ts", "value", gapMinutes = 60)
      .select("user_id", "session_start_ms", "session_end_ms", "n_events",
        "sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(batch.contains((1L, t0, t30, 3L, 7.0)))
  }

  test("out-of-order: event for an already-emitted session folds into " +
      "the open session — the documented append-mode divergence vs batch") {
    val base = Files.createTempDirectory("graft_sess_late").toString
    val in = s"$base/in"; val cp = s"$base/cp"
    // batch 1: 10:00 burst, then 13:00 closes it
    writeBatch(in, 1, Seq((1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 13:00:00", 2.0)))
    val r1 = runSessionize(in, cp)
    val t10 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val t13 = java.sql.Timestamp.valueOf("2024-01-01 13:00:00").getTime
    assert(r1 === Set((1L, t10, t10, 1, 1.0))) // 10:00 session emitted
    // batch 2: VERY late 10:05 event — its true session (with 10:00)
    // was already emitted and append mode cannot retract it; the
    // sessionizer folds the late row into the OPEN 13:00 session,
    // widening its start to 10:05. The batch form over full history
    // instead yields sessions (10:00,10:05), (13:00), (14:30) — this
    // divergence is the price of unretractable append output, bounded
    // in production by pairing with a watermark-driven ingest that
    // drops older-than-horizon rows before they reach state.
    writeBatch(in, 2, Seq((1L, "2024-01-01 10:05:00", 4.0),
      (1L, "2024-01-01 14:30:00", 8.0)))
    val r2 = runSessionize(in, cp)
    val t1005 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00").getTime
    // includes r1's row (the buffer is per-run; only the newly closed
    // session appears): (10:05-13:00, 2 events, 2.0+4.0)
    assert(r2 === Set((1L, t1005, t13, 2, 6.0)))
    val batch = graft.operators.Sessionize.batchSessions(
        Seq((1L, "2024-01-01 10:00:00", 1.0), (1L, "2024-01-01 13:00:00", 2.0),
          (1L, "2024-01-01 10:05:00", 4.0), (1L, "2024-01-01 14:30:00", 8.0))
          .toDF("user_id", "t", "value")
          .withColumn("ts", to_timestamp(col("t"))),
        "user_id", "ts", "value", gapMinutes = 60)
      .select("n_events").as[Long].collect().toSeq.sorted
    assert(batch === Seq(1L, 1L, 2L)) // (13:00), (14:30), (10:00+10:05)
  }

  test("streamingDedup: duplicate WITHIN the watermark is dropped; a " +
      "duplicate older than the advanced watermark is dropped as late data") {
    val base = Files.createTempDirectory("graft_dedup_wm").toString
    val in = s"$base/in"; val cp = s"$base/cp"
    val schema = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("event_id", "ts", "value").schema
    def run(name: String): Set[Long] = {
      val buf = scala.collection.mutable.Set.empty[Long]
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = Streaming.streamingDedup(stream, Seq("event_id"), "ts",
          watermark = "1 hour")
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          buf.synchronized {
            buf ++= df.select("event_id").collect().map(_.getLong(0))
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      buf.toSet
    }
    def write(n: Int, rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("event_id", "t", "value")
        .withColumn("ts", to_timestamp(col("t")))
        .select("event_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(in)

    write(1, Seq((100L, "2024-01-01 10:00:00", 1.0)))
    assert(run("wm_r1") === Set(100L))
    // duplicate within the watermark horizon → dropped
    write(2, Seq((100L, "2024-01-01 10:00:00", 1.0),
      (200L, "2024-01-01 23:00:00", 2.0)))
    assert(run("wm_r2") === Set(200L))
    // watermark is now ~22:00; key 100's state (expiry 11:00) is gone.
    // The same duplicate arriving NOW tests the bounded-state trade-off
    // on an infinite stream: measured behavior is that Spark filters
    // rows older than the watermark BEFORE they reach dedup state, so
    // the late duplicate is dropped (not re-emitted) — stricter than the
    // batch form, which would keep exactly one copy wherever it appears.
    write(3, Seq((100L, "2024-01-01 10:00:00", 1.0)))
    val r3 = run("wm_r3")
    info(s"late duplicate after state expiry: ${
      if (r3.contains(100L)) "re-emitted" else "dropped as late data"}")
    assert(r3.isEmpty)
  }
}
