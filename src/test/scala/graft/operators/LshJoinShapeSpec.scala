package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The two MinHash-LSH pair-join shapes — the production band-key-only
  * form and the signature-carry A/B twin — must return IDENTICAL pair
  * sets with identical estimates on a corpus engineered to stress the
  * divergence surfaces: multi-band collisions (the carry form computes
  * the estimate once per collision and distincts after; the key form
  * distincts candidates first), near-threshold estimates, and docs too
  * short to shingle.
  */
class LshJoinShapeSpec extends SparkSpecBase {

  private lazy val docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, base),
      (2L, base),                                   // exact dup of 1
      (3L, base + " with a small tail change"),     // near-dup of 1
      (4L, "completely different text about spark catalyst optimizer plans"),
      (5L, "completely different text about spark catalyst optimizer runs"),
      (6L, "short"),                                // below shingle size
      (7L, "an unrelated third topic cluster mentioning graphs and joins")
    ).toDF("doc_id", "text")
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2))

  test("key-join and signature-carry shapes agree exactly") {
    val prod = Dedup.minHashLshPairs(docs, "text", "doc_id", 3, 32, 4, 0.3)
      .orderBy("id_a", "id_b").collect().map(key)
    val carry = Dedup.minHashLshPairsSigCarry(
        docs, "text", "doc_id", 3, 32, 4, 0.3)
      .orderBy("id_a", "id_b").collect().map(key)
    assert(prod.toSeq === carry.toSeq)
    // the planted structure must actually be found: the exact dup pair
    // at estimate 1.0, plus the near-dup pairs
    val pairs = prod.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(prod.find(t => t._1 == 1L && t._2 == 2L).get._3 === 1.0)
    assert(pairs.contains((4L, 5L)))
    assert(prod.forall(t => t._3 >= 0.3))
  }

  test("threshold filters identically in both shapes") {
    val prodHi = Dedup.minHashLshPairs(docs, "text", "doc_id", 3, 32, 4, 0.95)
      .collect().map(key).toSet
    val carryHi = Dedup.minHashLshPairsSigCarry(
        docs, "text", "doc_id", 3, 32, 4, 0.95)
      .collect().map(key).toSet
    assert(prodHi === carryHi)
    assert(prodHi.map(t => (t._1, t._2)).contains((1L, 2L)))
  }
}
