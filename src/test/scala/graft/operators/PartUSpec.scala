package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-12 operator specs: Cohen's kappa, per-node local clustering,
  * matryoshka truncation recall.
  */
class PartUSpec extends SparkSpecBase {

  import spark.implicits._

  test("cohensKappa: hand-computed 2x2 grid") {
    // 50 items: a=b=0 ×20, a=b=1 ×15, a=0/b=1 ×10, a=1/b=0 ×5.
    // p_o = 35/50 = 0.7; marginals a: 30/20, b: 25/25;
    // p_e = (30·25 + 20·25)/50² = 1250/2500 = 0.5; κ = 0.2/0.5 = 0.4.
    val rows = Seq.fill(20)((0, 0)) ++ Seq.fill(15)((1, 1)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(5)((1, 0))
    val r = Stats.cohensKappa(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(r.getAs[Long]("n_items") == 50L)
    assert(r.getAs[Long]("n_agree") == 35L)
    assert(math.abs(r.getAs[Double]("p_o") - 0.7) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_e") - 0.5) < 1e-5)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-5)
  }

  test("cohensKappa: perfect agreement is 1, marginal-independent swap is negative") {
    val perfect = Seq((0, 0), (1, 1), (2, 2), (0, 0)).toDF("a", "b")
    assert(math.abs(Stats.cohensKappa(perfect, col("a"), col("b"))
      .head().getAs[Double]("kappa") - 1.0) < 1e-5)
    val opposed = Seq((0, 1), (1, 0), (0, 1), (1, 0)).toDF("a", "b")
    assert(Stats.cohensKappa(opposed, col("a"), col("b"))
      .head().getAs[Double]("kappa") < 0.0)
  }

  test("localClustering: K4 plus pendant edge, node-level coefficients") {
    // K4 on {1,2,3,4}: every K4 node sits on 3 triangles. Node 4 also
    // has pendant neighbor 5 (degree 4 -> cc = 2·3/(4·3) = 0.5);
    // nodes 1,2,3 have degree 3 -> cc = 2·3/(3·2) = 1.0; node 5 degree 1
    // -> cc = 0 by convention.
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5))
      .toDF("s1", "s2")
    val got = Graph.localClustering(edges).collect()
      .map(r => r.getAs[Int]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("local_cc"))).toMap
    assert(got(1) == (3L, 3L, 1.0) && got(2) == (3L, 3L, 1.0) &&
      got(3) == (3L, 3L, 1.0))
    assert(got(4)._1 == 4L && got(4)._2 == 3L &&
      math.abs(got(4)._3 - 0.5) < 1e-5)
    assert(got(5) == (1L, 0L, 0.0))
    // node-level counts must be consistent with the global census:
    // Σ tri(v) = 3 · n_triangles
    val global = Graph.triangleStats(edges).head().getAs[Long]("n_triangles")
    assert(got.values.map(_._2).sum == 3 * global)
  }

  test("truncationRecall: full-width truncation recalls everything; " +
      "recall is in [0,1] and zero-overlap queries keep rows") {
    val emb = Tables_embeddings()
    val full = Similarity.truncationRecall(emb, "vec_id", "embedding",
      k = 5, dims = 64)
    assert(full.agg(min(col("recall_at_k"))).head().getDouble(0) > 0.999)
    val trunc = Similarity.truncationRecall(emb, "vec_id", "embedding",
      k = 5, dims = 4).collect()
    assert(trunc.length == emb.count())
    assert(trunc.forall { r =>
      val v = r.getAs[Double]("recall_at_k")
      v >= 0.0 && v <= 1.0001
    })
  }

  private def Tables_embeddings() =
    graft.Tables.embeddings(spark, sf("sf0.001"))

  test("rendezvousShard: deterministic, in range, and minimally disruptive 8->9") {
    val keys = (1L to 5000L).toDF("k")
    val a = Sampling.rendezvousShard(
      Sampling.rendezvousShard(keys, "k", 8, "s8"), "k", 9, "s9")
      .localCheckpoint(true)
    // every shard in range, both configs
    assert(a.where(col("s8") < 0 || col("s8") > 7 ||
      col("s9") < 0 || col("s9") > 8).count() == 0)
    // keys that stay out of shard 8's way keep their assignment: only
    // keys won by the NEW shard may move. Expected moved ≈ 1/9 ≈ 11%;
    // assert well under the ~8/9 a mod-N rehash would move.
    val moved = a.where(col("s8") =!= col("s9")).count().toDouble / 5000
    assert(moved > 0.05 && moved < 0.20, s"moved fraction $moved")
    // and every mover went TO the new shard (rendezvous property:
    // existing shards' win sets only shrink when a shard is added)
    assert(a.where(col("s8") =!= col("s9") && col("s9") =!= 8).count() == 0)
    // determinism
    val b = Sampling.rendezvousShard(keys, "k", 9, "s9b")
    assert(a.join(b, "k").where(col("s9") =!= col("s9b")).count() == 0)
  }

  test("rboWeights: identical rankings score exactly 1; disjoint score 0") {
    val ws = Similarity.rboWeights(10, 0.9)
    // identical lists: item at rank r has worse-rank m = r, so the sum
    // of all k weights is the full normalized mass
    assert(math.abs(ws.sum - 1.0) < 1e-12)
    // weights are positive and decreasing in m (deeper-only items
    // contribute less)
    assert(ws.zip(ws.tail).forall { case (a, b) => a > b && b > 0 })

    val runA = (1 to 10).map(r => (1L, r.toLong, r)).toDF(
      "query_id", "neighbor_id", "rank")
    val same = Similarity.rankBiasedOverlap(runA, runA, 10, 0.9).head()
    assert(same.getAs[Long]("n_common") == 10L)
    assert(math.abs(same.getAs[Double]("rbo") - 1.0) < 1e-5)
    val runB = (1 to 10).map(r => (1L, 100L + r, r)).toDF(
      "query_id", "neighbor_id", "rank")
    val disj = Similarity.rankBiasedOverlap(runA, runB, 10, 0.9).head()
    assert(disj.getAs[Long]("n_common") == 0L &&
      disj.getAs[Double]("rbo") < 1e-6)
  }

  test("rankBiasedOverlap: top-weighting — agreement at the top beats " +
      "the same agreement at the bottom") {
    val base = (1 to 10).map(r => (1L, r.toLong, r)).toDF(
      "query_id", "neighbor_id", "rank")
    // B agrees with A on ranks 1-5, disagrees 6-10
    val topAgree = ((1 to 5).map(r => (1L, r.toLong, r)) ++
      (6 to 10).map(r => (1L, 100L + r, r))).toDF(
      "query_id", "neighbor_id", "rank")
    // C agrees on items 6-10 AT ranks 1-5 (bottom items promoted)
    val botAgree = ((1 to 5).map(r => (1L, (r + 5).toLong, r)) ++
      (6 to 10).map(r => (1L, 100L + r, r))).toDF(
      "query_id", "neighbor_id", "rank")
    val top = Similarity.rankBiasedOverlap(base, topAgree, 10, 0.9)
      .head().getAs[Double]("rbo")
    val bot = Similarity.rankBiasedOverlap(base, botAgree, 10, 0.9)
      .head().getAs[Double]("rbo")
    assert(top > bot && top > 0.5 && bot > 0.0)
  }
}
