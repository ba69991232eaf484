package graft.analysis

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.streaming.Streaming

class CorpusPipelineSpec extends SparkSpecBase {

  import spark.implicits._

  test("corpus preparation filters, dedupes and splits the documents table") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val prepared = CorpusPipeline.prepare(docs, "text", "doc_id").cache()

    assert(prepared.count() > 0)
    assert(prepared.count() <= docs.count())
    // survivors satisfy the quality gate
    assert(prepared.where(col("n_tokens") < 5).count() === 0)
    // content hashes are unique post exact-dedup
    val hashes = prepared.select(
      graft.operators.TextAnalysis.fingerprint(col("text")).as("f"))
    assert(hashes.distinct().count() === hashes.count())
    // split column present with stable values
    assert(prepared.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    prepared.unpersist()
  }

  test("corpus prep drops near-duplicates and keeps the smallest id") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"),
      (11L, "the quick brown fox jumps over the lazy dog again tonight"),
      (12L, "completely different content about distributed query engines here"))
      .toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, "text", "doc_id",
        CorpusPipeline.Config(minTokens = 3, nearDupThreshold = 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(10L) && !out.contains(11L))
    assert(out.contains(12L))
  }

  test("dup-span-ratio gate drops boilerplate-dominated docs only") {
    val docs = Seq(
      // 3 tokens unique, then the same 3-gram four more times: ratio 12/15
      (1L, ("spam bacon eggs " * 5).trim),
      (2L, "a genuinely varied document with no internal repetition at all"))
      .toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(minTokens = 3, maxDupSpanRatio = 0.5)
    val out = CorpusPipeline.prepare(docs, "text", "doc_id", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(!out.contains(1L) && out.contains(2L))
    // disabled by default: both survive
    val all = CorpusPipeline.prepare(docs, "text", "doc_id",
        CorpusPipeline.Config(minTokens = 3))
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L))
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:05:00", 2.0), // dup key within horizon
      (2L, "2024-01-01 10:00:00", 3.0))
      .toDF("k", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).select("k", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    rows.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.schema).parquet(s"$dir/in")
    val q = Streaming.streamingDedup(stream, Seq("k"), "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_spec").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("sdedup_spec").count() === 2)
  }
}
