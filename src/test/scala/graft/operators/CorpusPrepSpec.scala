package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Corpus-prep operators: overlapping chunking and per-domain capping. */
class CorpusPrepSpec extends SparkSpecBase {

  import spark.implicits._

  test("chunkTokens: short doc yields exactly one full-coverage chunk") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val out = TextAnalysis.chunkTokens(df, "id", "text", 64, 32).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("chunk_idx") == 0)
    assert(out(0).getAs[Int]("chunk_tokens") == 3)
    assert(out(0).getAs[String]("chunk_text") == "a b c")
  }

  test("chunkTokens: overlap covers every token, no suffix-only chunk") {
    // 100 tokens, chunkLen 64, stride 32 → starts 0, 32, 64 (67 would be
    // a strict suffix of the 64-chunk and must not appear).
    val toks = (1 to 100).map(i => s"w$i")
    val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
    val rows = TextAnalysis.chunkTokens(df, "id", "text", 64, 32)
      .orderBy("chunk_idx").collect()
    assert(rows.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2))
    assert(rows.map(_.getAs[Int]("chunk_tokens")).toSeq == Seq(64, 64, 36))
    // Tail is covered: last chunk ends at token 100.
    assert(rows.last.getAs[String]("chunk_text").endsWith("w100"))
    // Overlap: chunk 1 starts at token 33.
    assert(rows(1).getAs[String]("chunk_text").startsWith("w33 "))
  }

  test("chunkTokens: blank and whitespace-only docs produce no chunks") {
    val df = Seq((1L, ""), (2L, "   \n\t ")).toDF("id", "text")
    assert(TextAnalysis.chunkTokens(df, "id", "text", 8, 4).count() == 0)
  }

  test("capPerGroup: caps each group and is order-independent") {
    val df = (1 to 40).map(i => (i.toLong, s"g${i % 2}")).toDF("k", "g")
    val capped = Sampling.capPerGroup(df, "g", "k", 7)
    val sizes = capped.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("g0" -> 7L, "g1" -> 7L))
    // Deterministic survivor set regardless of input partitioning/order.
    val shuffled = df.repartition(7).sortWithinPartitions(desc("k"))
    val a = capped.select("k").collect().map(_.getLong(0)).toSet
    val b = Sampling.capPerGroup(shuffled, "g", "k", 7)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // Groups under the cap survive whole.
    val small = Seq((100L, "tiny")).toDF("k", "g")
    assert(Sampling.capPerGroup(small, "g", "k", 7).count() == 1)
  }
}
