package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-12 batch-2 operator specs: Jarque–Bera, Brown–Forsythe,
  * partial correlation, cumulative gains, Adamic–Adar, HITS, Neyman
  * allocation, filtered top-k.
  */
class PartVSpec extends SparkSpecBase {

  import spark.implicits._

  test("jarqueBera: symmetric two-point mass has skew 0, kurt 1, JB = n/6") {
    // {-1, +1} × 6 each: mean 0, m2 = 1, m3 = 0 (skew 0), m4 = 1
    // (kurt 1), JB = 12/6 · (0 + (1−3)²/4) = 2, p = exp(−1).
    val rows = Seq.fill(6)(("g", -1.0)) ++ Seq.fill(6)(("g", 1.0))
    val r = Stats.jarqueBera(rows.toDF("seg", "x"), "seg", "x").head()
    assert(r.getAs[Long]("n") == 12L)
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-6)
    assert(math.abs(r.getAs[Double]("kurtosis") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("jb_stat") - 2.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-1.0)) < 1e-5)
  }

  test("jarqueBera: a gaussian-ish sample scores small JB, a point mass " +
      "with an outlier scores large") {
    val rng = new scala.util.Random(7)
    val gauss = Seq.fill(500)(("g", rng.nextGaussian()))
    val g = Stats.jarqueBera(gauss.toDF("seg", "x"), "seg", "x").head()
    assert(g.getAs[Double]("p_value") > 0.01) // normality not rejected
    val spiked = Seq.fill(499)(("s", 1.0)) :+ (("s", 1000.0))
    val sp = Stats.jarqueBera(spiked.toDF("seg", "x"), "seg", "x").head()
    assert(sp.getAs[Double]("jb_stat") > 100.0)
    assert(sp.getAs[Double]("p_value") < 1e-6)
  }

  test("leveneBrownForsythe: hand-computed two-group W") {
    // A = {0,1,3,4}: median 2, z = {2,1,1,2}, mean 1.5, var 1/3.
    // B = {0,2,6,8}: median 4, z = {4,2,2,4}, mean 3, var 4/3.
    // ssb = 4.5, ssw = 5, W = (4.5/1)/(5/6) = 5.4, dof (1, 6).
    val rows = Seq(("a", 0.0), ("a", 1.0), ("a", 3.0), ("a", 4.0),
      ("b", 0.0), ("b", 2.0), ("b", 6.0), ("b", 8.0))
    val r = Stats.leveneBrownForsythe(rows.toDF("g", "x"), "g", "x").head()
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("k") == 2L)
    assert(math.abs(r.getAs[Double]("w_stat") - 5.4) < 1e-6)
    assert(r.getAs[Long]("df_between") == 1L)
    assert(r.getAs[Long]("df_within") == 6L)
  }

  test("partialCorr: x=y gives partial 1; y≈z explains x-y away; " +
      "z collinear with y is null, not a divide-by-zero") {
    val rng = new scala.util.Random(11)
    val base = Seq.fill(500)((rng.nextGaussian(), rng.nextGaussian(),
      rng.nextGaussian()))
    val same = base.map { case (a, b, _) => (a, a, b) }.toDF("x", "y", "z")
    val r1 = Stats.partialCorr(same, col("x"), col("y"), col("z")).head()
    assert(math.abs(r1.getAs[Double]("r_xy") - 1.0) < 1e-6)
    assert(math.abs(r1.getAs[Double]("r_xy_given_z") - 1.0) < 1e-4)
    // y = z + small noise: whatever raw x~y correlation the sample
    // shows is carried by z; conditioning on z removes it
    val near = base.map { case (a, b, c) => (a, b + 0.05 * c, b) }
      .toDF("x", "y", "z")
    val r2 = Stats.partialCorr(near, col("x"), col("y"), col("z")).head()
    assert(math.abs(r2.getAs[Double]("r_xy_given_z")) < 0.1)
    // degenerate: y = z exactly -> undefined -> null (ANSI-safe)
    val dup = base.map { case (a, b, _) => (a, b, b) }.toDF("x", "y", "z")
    val r3 = Stats.partialCorr(dup, col("x"), col("y"), col("z")).head()
    assert(r3.isNullAt(r3.fieldIndex("r_xy_given_z")))
  }

  test("cumulativeGains: positives stacked at the top give lift = 1/rate " +
      "in the first bucket and gain 1 from the bucket holding the last positive") {
    // 20 rows scored 20..1, ids 1..20; positives = the 5 best scores.
    val rows = (1 to 20).map(i => (-(21.0 - i), i.toLong,
      if (i <= 5) 1L else 0L))
    val got = Stats.cumulativeGains(rows.toDF("__nv", "id", "rel"),
      Seq("__nv", "id"), "rel", buckets = 10)
      .orderBy("bucket").collect()
    assert(got.length == 10)
    assert(got.forall(_.getAs[Long]("n_rows") == 2L))
    val b1 = got.head
    assert(b1.getAs[Long]("bucket") == 1L && b1.getAs[Long]("cum_pos") == 2L)
    assert(math.abs(b1.getAs[Double]("lift") - 4.0) < 1e-6) // (2/2)/(5/20)
    val b3 = got(2)
    assert(b3.getAs[Long]("cum_pos") == 5L)
    assert(math.abs(b3.getAs[Double]("gain") - 1.0) < 1e-6)
    val b10 = got.last
    assert(math.abs(b10.getAs[Double]("lift") - 1.0) < 1e-6) // full set = base rate
  }

  test("adamicAdar: square graph scores the two diagonals, " +
      "excludes existing edges, discounts by ln(deg)") {
    // Cycle 1-2-3-4-1: non-adjacent pairs (1,3) and (2,4) each share
    // two degree-2 neighbors -> aa = 2/ln(2); adjacent pairs excluded.
    val edges = Seq((1, 2), (2, 3), (3, 4), (1, 4)).toDF("s1", "s2")
    val got = Graph.adamicAdar(edges, minCommon = 2).collect()
      .map(r => (r.getAs[Int]("x"), r.getAs[Int]("y")) ->
        (r.getAs[Long]("n_common"), r.getAs[Double]("aa_score"))).toMap
    assert(got.keySet == Set((1, 3), (2, 4)))
    val expected = 2.0 / math.log(2.0)
    got.values.foreach { case (nc, aa) =>
      assert(nc == 2L && math.abs(aa - expected) < 1e-5)
    }
    // minCommon = 1 admits single-wedge pairs: path 5-6-7 adds (5,7)
    val path = Seq((5, 6), (6, 7)).toDF("s1", "s2")
    val one = Graph.adamicAdar(path, minCommon = 1).head()
    assert((one.getAs[Int]("x"), one.getAs[Int]("y")) == ((5, 7)))
    assert(math.abs(one.getAs[Double]("aa_score") - 1.0 / math.log(2.0))
      < 1e-5)
  }

  test("adamicAdar: maxDegPerCenter caps hub wedge fan-out " +
      "deterministically and keeps the TRUE-degree discount") {
    // Star: hub 0 — leaves 1..6. Uncapped: C(6,2)=15 pairs, each
    // discounted by the hub's true degree, aa = 1/ln(6).
    val star = (1 to 6).map(i => (0, i)).toDF("s1", "s2")
    val full = Graph.adamicAdar(star, minCommon = 1).collect()
    assert(full.length == 15)
    full.foreach(r => assert(
      math.abs(r.getAs[Double]("aa_score") - 1.0 / math.log(6.0)) < 1e-5))
    // Capped at 3 neighbors per center: the hub witnesses C(3,2)=3
    // pairs; the discount still uses deg=6 (never the capped count).
    val capped = Graph.adamicAdar(star, minCommon = 1,
      maxDegPerCenter = 3).collect()
    assert(capped.length == 3)
    capped.foreach(r => assert(
      math.abs(r.getAs[Double]("aa_score") - 1.0 / math.log(6.0)) < 1e-5))
    // Hash-ranked cap is deterministic: a rerun selects the same pairs.
    val rerun = Graph.adamicAdar(star, minCommon = 1,
      maxDegPerCenter = 3).collect()
    def pairs(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Int]("x"), r.getAs[Int]("y"))).toSet
    assert(pairs(capped) == pairs(rerun))
  }

  test("hits: hand-unrolled two rounds on a 2x2 bipartite graph") {
    // Edges (1,10), (2,10), (1,11). Unrolling two normalized rounds:
    // hub = (8/sqrt(89), 5/sqrt(89)), auth = (5/sqrt(34), 3/sqrt(34)).
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L)).toDF("c", "sp")
    val got = Graph.hits(edges, "c", "sp", iters = 2).collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("node")) ->
        r.getAs[Double]("score")).toMap
    assert(math.abs(got(("hub", 1L)) - 8.0 / math.sqrt(89)) < 1e-5)
    assert(math.abs(got(("hub", 2L)) - 5.0 / math.sqrt(89)) < 1e-5)
    assert(math.abs(got(("authority", 10L)) - 5.0 / math.sqrt(34)) < 1e-5)
    assert(math.abs(got(("authority", 11L)) - 3.0 / math.sqrt(34)) < 1e-5)
    // L2 norms are 1 on both sides after the final normalization
    val hubNorm = got.collect { case (("hub", _), s) => s * s }.sum
    val authNorm = got.collect { case (("authority", _), s) => s * s }.sum
    assert(math.abs(hubNorm - 1.0) < 1e-6 && math.abs(authNorm - 1.0) < 1e-6)
  }

  test("neymanAllocation: budget flows to the high-variance stratum; " +
      "zero-variance strata keep a ledger row with 0 draws") {
    val rows = Seq(("a", 0.0, 1L), ("a", 0.0, 2L), ("a", 10.0, 3L),
      ("a", 10.0, 4L), ("b", 7.0, 5L), ("b", 7.0, 6L), ("b", 7.0, 7L),
      ("b", 7.0, 8L)).toDF("st", "v", "id")
    val got = Sampling.neymanAllocation(rows, "st", "v", "id", nTotal = 4)
      .collect().map(r => r.getAs[String]("st") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_pop") == 4L)
    assert(math.abs(a.getAs[Double]("sigma") - 5.0) < 1e-6)
    assert(a.getAs[Long]("n_alloc") == 4L)
    assert(a.getAs[Long]("n_sampled") == 4L)
    assert(a.getAs[Long]("id_checksum") == 10L) // all four sampled
    val b = got("b")
    assert(b.getAs[Long]("n_alloc") == 0L && b.getAs[Long]("n_sampled") == 0L)
    // allocation never exceeds the stratum population
    val capped = Sampling.neymanAllocation(rows, "st", "v", "id", 1000)
      .collect()
    assert(capped.forall(r =>
      r.getAs[Long]("n_alloc") <= r.getAs[Long]("n_pop")))
  }

  test("filteredTopK: neighbors never cross the block boundary and rank " +
      "by within-block cosine") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 0),
      (10L, Seq(1.0f, 0.0f), 1), (11L, Seq(-1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.filteredTopK(vecs, "vec_id", "embedding",
      "label", k = 2).collect()
    // block purity: every neighbor shares the query's label
    val byId = Map(1L -> 0, 2L -> 0, 3L -> 0, 10L -> 1, 11L -> 1)
    assert(got.forall(r => byId(r.getAs[Long]("query_id")) ==
      byId(r.getAs[Long]("neighbor_id"))))
    // query 1 prefers near-parallel 2 over orthogonal 3
    val q1 = got.filter(_.getAs[Long]("query_id") == 1L)
      .sortBy(_.getAs[Int]("rank"))
    assert(q1.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L))
    // block of exactly two: each member gets one neighbor, rank 1
    val q10 = got.filter(_.getAs[Long]("query_id") == 10L)
    assert(q10.length == 1 && q10.head.getAs[Long]("neighbor_id") == 11L)
    assert(math.abs(q10.head.getAs[Double]("cosine") - (-1.0)) < 1e-5)
  }
}
