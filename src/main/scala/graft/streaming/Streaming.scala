package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming layer (SURVEY §1.1 last row). The reference is
  * batch-only with versioned re-runs (io_utils.py:192-224); a file-source
  * stream with Trigger.AvailableNow reproduces exactly that semantics —
  * "process everything that has arrived, then stop" — while also giving a
  * path to continuous ingestion on a cluster.
  */
object Streaming {

  /** Raw events schema as stored in the testdata parquet (ts is
    * TIMESTAMP(NANOS), surfaced as long via the nanosAsLong conf).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of the events table (file source). The file source
    * requires a directory, so the single-file testdata table is staged
    * into a temp dir (a real deployment streams a landing directory).
    */
  def readEventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staged = java.nio.file.Paths.get(
      s"/tmp/graft_stream-${new java.io.File(sfDir).getName}")
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      staged.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Daily stats as a streaming aggregation; identical results to the
    * batch a1 query modulo distinct counts (distinct aggregation is not
    * available in streaming — the scale answer there is HLL sketches).
    */
  def dailyStats(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")) + lit(1e-9), 6).as("sum_value"),
        round(avg(col("value")) + lit(1e-9), 6).as("avg_value"))

  /** Run a streaming aggregation to completion over the files currently
    * present (Trigger.AvailableNow ≙ the reference's versioned batch
    * re-run) and return the materialized result.
    */
  def runAvailableNow(spark: SparkSession, agg: DataFrame,
      queryName: String): DataFrame = {
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Sliding-window stats with a watermark — the continuous-ingestion
    * shape (not exercised by the batch oracle, covered by unit tests).
    */
  def windowedStats(events: DataFrame, window_ : String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"),
        col("sum_value"))
}
