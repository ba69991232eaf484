package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Hand-checkable invariants for the part-P operator family. */
class PartPSpec extends SparkSpecBase {
  import spark.implicits._

  test("target encoding is leakage-free: a fold's encoding ignores its " +
      "own targets") {
    val base = Seq(
      ("a", 1.0, 0L), ("a", 2.0, 0L), ("a", 3.0, 1L), ("a", 4.0, 1L),
      ("b", 5.0, 0L), ("b", 6.0, 1L))
      .toDF("cat", "y", "fold")
    // poison fold 0 of category a: its own-fold targets explode, but
    // enc(a, 0) is built from fold 1 only, so it must not move
    val poisoned = Seq(
      ("a", 1000.0, 0L), ("a", 2000.0, 0L), ("a", 3.0, 1L), ("a", 4.0, 1L),
      ("b", 5.0, 0L), ("b", 6.0, 1L))
      .toDF("cat", "y", "fold")
    def enc(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Double] =
      FeatureEng.targetEncode(df, "cat", "y", "fold", smoothing = 0.0)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          r.getDouble(3)).toMap
    val e0 = enc(base)
    // hand value: enc(a,0) = mean of fold-1 targets = (3+4)/2
    assert(math.abs(e0(("a", 0L)) - 3.5) < 1e-9)
    assert(math.abs(e0(("a", 1L)) - 1.5) < 1e-9)
    val e1 = enc(poisoned)
    assert(e1(("a", 0L)) === e0(("a", 0L)),
      "own-fold targets leaked into the encoding")
    // the OTHER fold must see the poison (it is its training data)
    assert(e1(("a", 1L)) !== e0(("a", 1L)))
  }

  test("feature hashing: fixed dim space, weights sum token signs, " +
      "identical tokens collapse") {
    val df = Seq((1L, "x x y"), (2L, "x")).toDF("doc_id", "text")
    val out = FeatureEng.featureHash(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out.keys.forall { case (_, dim) => dim >= 0 && dim < 8 })
    // doc 2 has one token, weight must be +-1 in exactly one dim
    val d2 = out.filter(_._1._1 == 2L)
    assert(d2.size === 1 && math.abs(d2.head._2) === 1L)
    // doc 1: "x" twice -> x's dim carries weight 2*sign(x)
    val (xDim, xW) = d2.head
    assert(out((1L, xDim._2)) === 2 * xW ||
      // unless y hashes into x's dim, in which case +-1 offsets
      math.abs(out((1L, xDim._2)) - 2 * xW) === 1L)
  }

  test("personalized pagerank: mass stays on the seed side, non-seed " +
      "sources score zero, total rank bounded by 1") {
    // star: seed 1 -> {10, 11}; disconnected 2 -> 20
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 10L, 11L, 20L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    val ppr = Graph.pageRankPersonalized(nodes, "id", edges, "src", "dst",
      seeds, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr(2L) === 0.0 && ppr(20L) === 0.0,
      "rank reached a component with no seed")
    assert(ppr(1L) > 0 && ppr(10L) > 0 && ppr(11L) > 0)
    assert(math.abs(ppr(10L) - ppr(11L)) < 1e-12, "symmetric leaves differ")
    assert(ppr.values.sum <= 1.0 + 1e-9)
  }
}
