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

  test("temperatureMixture: alpha=1 is natural sampling — every group " +
      "keeps ~targetFrac; alpha<1 flattens toward rare groups") {
    // 1000 'big' keys vs 100 'rare' keys.
    val df = ((1 to 1000).map(i => (s"k$i", "big")) ++
      (1001 to 1100).map(i => (s"k$i", "rare"))).toDF("k", "g")
    def rates(alpha: Double): Map[String, Double] =
      Sampling.temperatureMixture(df, "g", "k", alpha, targetFrac = 0.5)
        .groupBy("g").agg(max(col("mix_rate")).as("r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val nat = rates(1.0)
    assert(math.abs(nat("big") - 0.5) < 1e-12)
    assert(math.abs(nat("rare") - 0.5) < 1e-12)
    // At targetFrac=0.3 no group's rate hits the 1.0 cap, so the mixture
    // conserves target mass exactly: Σ rate_g·n_g = targetFrac·N.
    def rates3(alpha: Double): Map[String, Double] =
      Sampling.temperatureMixture(df, "g", "k", alpha, targetFrac = 0.3)
        .groupBy("g").agg(max(col("mix_rate")).as("r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val flat = rates3(0.5)
    // alpha=0.5 upsamples the rare group, downsamples the big one.
    assert(flat("rare") > 0.3 && flat("big") < 0.3)
    val mass = flat("big") * 1000 + flat("rare") * 100
    assert(math.abs(mass - 0.3 * 1100) < 1e-9)
  }

  test("temperatureMixture: rate caps at 1 and keep decision is " +
      "per-key deterministic (order-independent)") {
    // Tiny rare group at a strong temperature: uncapped rate would
    // exceed 1; every rare row must simply survive.
    val df = ((1 to 2000).map(i => (s"k$i", "big")) ++
      (1 to 4).map(i => (s"r$i", "rare"))).toDF("k", "g")
    val kept = Sampling.temperatureMixture(df, "g", "k", 0.1, 0.9)
    assert(kept.where(col("g") === "rare").count() == 4L)
    val a = kept.select("k").collect().map(_.getString(0)).toSet
    val b = Sampling.temperatureMixture(
        df.orderBy(rand(7)).repartition(5), "g", "k", 0.1, 0.9)
      .select("k").collect().map(_.getString(0)).toSet
    assert(a == b)
  }
}
