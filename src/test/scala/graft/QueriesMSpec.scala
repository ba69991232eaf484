package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Invariants for catalog part M. */
class QueriesMSpec extends SparkSpecBase {
  import spark.implicits._

  test("simHashPairs: pigeonhole recall — near-identical docs must pair") {
    // Two docs differing in ONE token out of many have close
    // fingerprints; an exact copy has hamming 0. The block index must
    // surface both pairs (recall 1.0 is guaranteed, not probabilistic).
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),                       // exact copy -> hamming 0
      (3L, base.replace("tok30", "zzz")), // one-token edit
      (4L, (101 to 160).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap.get((1L, 2L)) === Some(0L), s"pairs: ${pairs.toSeq}")
    // every reported pair respects the threshold
    assert(pairs.forall(_._3 <= 3L))
    // the unrelated doc pairs with nothing
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simHashPairs agrees with the brute-force hamming filter") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val fp = Dedup.simHash(docs, "text", "doc_id")
    val brute = fp.select(col("doc_id").as("id_a"), col("simhash").as("a"))
      .join(fp.select(col("doc_id").as("id_b"), col("simhash").as("b")),
        col("id_a") < col("id_b"))
      .where(bit_count(col("a").bitwiseXOR(col("b"))) <= 3)
      .count()
    val blocked = Dedup.simHashPairs(docs, "text", "doc_id", 3).count()
    assert(blocked === brute) // pigeonhole: recall exactly 1.0
  }
}
