package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class GraphSpec extends SparkSpecBase {

  import spark.implicits._

  test("pageRank: rank mass is conserved (sums to 1) with dangling nodes") {
    // 1→2, 1→3, 2→3; 3 and 4 dangling; 4 isolated.
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, "id", edges, "src", "dst", iters = 5)
    val total = pr.agg(sum("pagerank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-12)
  }

  test("pageRank: uniform cycle stays at the uniform fixed point") {
    // On a directed 4-cycle every node has in=out=1: rank 1/4 is exact
    // at every iteration, so any deviation exposes a formula bug.
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, "id", edges, "src", "dst", iters = 3)
      .collect()
    assert(pr.length === 4)
    pr.foreach(r => assert(math.abs(r.getAs[Double]("pagerank") - 0.25) < 1e-12))
  }

  test("pageRank: a sink pointed at by everyone outranks its sources") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, "id", edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(4L) > pr(1L) * 2)
    assert(math.abs(pr(1L) - pr(2L)) < 1e-15 && math.abs(pr(2L) - pr(3L)) < 1e-15)
  }
}
