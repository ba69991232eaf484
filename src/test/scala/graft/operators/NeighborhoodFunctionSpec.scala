package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Structural invariants of [[Graph.neighborhoodFunction]] on graphs
  * with known closed-form reach: exact BFS counts, sub-capacity sketch
  * exactness (KMV union-exactness makes est == exact below k), component
  * isolation, and monotonicity in the hop.
  */
class NeighborhoodFunctionSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(nodeIds: Seq[Long], edges: Seq[(Long, Long)],
      seeds: Seq[Long], hops: Int, k: Int = 32) = {
    val nodesDf = nodeIds.toDF("id")
    val edgesDf = edges.toDF("src", "dst")
    Graph.neighborhoodFunction(nodesDf, "id", edgesDf, "src", "dst",
        col("id").isin(seeds.map(Long.box): _*), hops, k)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("hop")) ->
        ((r.getAs[Long]("n_reach"), r.getAs[Double]("anf_est")))).toMap
  }

  test("path graph: reach from an end grows by exactly one per hop") {
    // 1-2-3-4-5-6
    val out = run(1L to 6L, (1L to 5L).map(i => (i, i + 1)),
      seeds = Seq(1L), hops = 4)
    (1 to 4).foreach { h =>
      assert(out((1L, h)) === (((h + 1).toLong, (h + 1).toDouble)),
        s"hop $h")
    }
  }

  test("star graph: center saturates at hop 1, a leaf needs 2") {
    val leaves = 2L to 12L
    val out = run(1L +: leaves, leaves.map(l => (1L, l)),
      seeds = Seq(1L, 2L), hops = 2)
    assert(out((1L, 1)) === ((12L, 12.0)))
    assert(out((2L, 1)) === ((2L, 2.0)))
    assert(out((2L, 2)) === ((12L, 12.0)))
  }

  test("components do not leak: a seed in one clique never counts the other") {
    val cliqueA = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val cliqueB = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val out = run(Seq(1L, 2L, 3L, 10L, 11L, 12L), cliqueA ++ cliqueB,
      seeds = Seq(1L, 10L), hops = 3)
    Seq(1L, 10L).foreach { s =>
      (1 to 3).foreach(h => assert(out((s, h))._1 === 3L, s"seed $s hop $h"))
    }
  }

  test("sub-capacity estimates are EXACT (union-exactness), even through merges") {
    // binary-ish tree, 15 nodes, reach well below k=32 everywhere
    val edges = (1L to 7L).flatMap(i => Seq((i, 2 * i), (i, 2 * i + 1)))
    val out = run(1L to 15L, edges, seeds = Seq(1L, 8L), hops = 3, k = 32)
    out.foreach { case ((id, h), (n, est)) =>
      assert(est === n.toDouble, s"seed $id hop $h: est $est vs exact $n")
    }
    assert(out((1L, 3))._1 === 15L) // root reaches the whole tree
    assert(out((8L, 3))._1 === 6L)  // leaf 8: {8,4} {+2,9} {+1,5}
  }

  test("reach is monotone non-decreasing in the hop for every seed") {
    val rnd = new scala.util.Random(5)
    val edges = (1 to 40).map(_ =>
      (rnd.nextInt(20).toLong + 1, rnd.nextInt(20).toLong + 1))
      .filter(e => e._1 != e._2)
    val out = run(1L to 20L, edges, seeds = Seq(1L, 5L, 9L), hops = 3)
    Seq(1L, 5L, 9L).foreach { s =>
      assert(out((s, 1))._1 <= out((s, 2))._1 &&
        out((s, 2))._1 <= out((s, 3))._1, s"seed $s")
    }
  }
}
