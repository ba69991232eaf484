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
}
