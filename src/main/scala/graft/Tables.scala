package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided testdata star schema (TESTDATA.md).
  * One parquet file per table under the sf directory.
  *
  * SESSION-WIDE SIDE EFFECT (deliberate, ADVICE r6): `load` sets two
  * session confs — `legacy.parquet.nanosAsLong=true` and
  * `parquet.inferTimestampNTZ.enabled=false` — that stay set for the
  * session and affect EVERY later parquet read, not just these tables.
  * Both exist to absorb driver-fixture regeneration quirks (NANOS
  * timestamps; us-timestamps missing the UTC-adjusted flag), and both
  * are what this engine's sessions want globally: every session here
  * pins spark.sql.session.timeZone=UTC, so NTZ-as-LTZ reinterpretation
  * is identity. A host application embedding these loaders in a session
  * that also reads genuine TIMESTAMP_NTZ parquet should scope the confs
  * (set/restore around `load`) — per-read options don't exist for
  * either flag.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fixed vector length of `embeddings.embedding` in the driver fixtures
    * (every scale factor). LSH callers pass this so plane construction
    * needs no eager one-row probe job at plan-build time.
    */
  val embeddingDim: Int = 64

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The testdata writes `events.ts` as TIMESTAMP(NANOS), which Spark 4
    // rejects by default. Read nanos as long, then convert to a real
    // microsecond timestamp with integer division (a double division would
    // lose precision: ns epochs exceed 2^53).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Driver regenerations have also shipped timestamp[us] WITHOUT the
    // UTC-adjusted flag, which Spark 4 infers as TIMESTAMP_NTZ — a type
    // unix_micros/watermarks reject. Read those as plain TIMESTAMP; the
    // session timezone is pinned to UTC everywhere, so the instants match
    // the DuckDB oracle's naive reading of the same files.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case None    => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so the whole surface is also
    * reachable via spark.sql (SURVEY §7.0).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
