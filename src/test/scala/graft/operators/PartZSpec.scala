package graft.operators

import graft.SparkSpecBase

/** Round-14 operator specs: HDBSCAN-style λ-level clustering, the
  * prefix-doubling repeated-span profile, Newman modularity, and the
  * Laplace-smoothed Markov transition matrix.
  */
class PartZSpec extends SparkSpecBase {

  import spark.implicits._

  test("hdbscanLevels: a dense blob clusters at the fine level, a sparse " +
      "blob only at the coarse level, noise stays noise, levels nest") {
    // Blob A (dense): 5 points within ~0.015 of each other — cd <= 0.02.
    // Blob B (sparse): 4 collinear points 0.03 apart — cd in [0.06, 0.09],
    // so noise at lambda = 0.02 but members at lambda = 0.1.
    // One far point: noise at both levels.
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.01, 0.0), (3L, 0.0, 0.01),
      (4L, 0.01, 0.01), (5L, 0.005, 0.005),
      (10L, 1.0, 0.0), (11L, 1.03, 0.0), (12L, 1.06, 0.0), (13L, 1.09, 0.0),
      (99L, 5.0, 5.0)
    ).toDF("id", "x", "y")
    val got = graft.ml.Clustering
      .hdbscanLevels(pts, "id", "x", "y", minPts = 3,
        lambdas = Seq(0.02, 0.1))
      .collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("id")) ->
        r.getAs[Long]("cluster")).toMap
    // fine level: blob A is one cluster labeled by its min id
    (1L to 5L).foreach(i => assert(got((0L, i)) == 1L, s"A fine $i"))
    // fine level: sparse blob + far point are noise
    Seq(10L, 11L, 12L, 13L, 99L).foreach(i =>
      assert(got((0L, i)) == -1L, s"noise fine $i"))
    // coarse level: both blobs cluster separately, far point stays noise
    (1L to 5L).foreach(i => assert(got((1L, i)) == 1L, s"A coarse $i"))
    Seq(10L, 11L, 12L, 13L).foreach(i =>
      assert(got((1L, i)) == 10L, s"B coarse $i"))
    assert(got((1L, 99L)) == -1L)
    // nesting: every same-cluster pair at the fine level is same-cluster
    // at the coarse level (the single-linkage hierarchy property)
    val fine = got.collect { case ((0L, i), c) if c >= 0 => i -> c }
    for ((i, ci) <- fine; (j, cj) <- fine if ci == cj)
      assert(got((1L, i)) == got((1L, j)), s"nesting $i $j")
  }

  test("repeatedPrefixBuckets: cross-doc 4-window repeats, within-doc " +
      "overlapping repeats, and a unique doc score exactly") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d w x y z"),
      (3L, "p q p q p q"),
      (4L, "unique1 unique2 unique3")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .repeatedPrefixBuckets(docs, "doc_id", "text", maxPow = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("max_rep_bucket"),
          r.getAs[Long]("n_pos_rep4"), r.getAs[Long]("n_pos_rep16")))
      .toMap
    // docs 1 and 2 share exactly the 4-window "a b c d" at position 1;
    // their 8-windows differ, so the bucket tops out at 4
    assert(got(1L) == ((8L, 4L, 1L, 0L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((8L, 4L, 1L, 0L)), s"doc2: ${got(2L)}")
    // "p q p q p q": 4-windows at positions 1 and 3 are both "p q p q"
    // (overlapping within-doc repeat); position 2's "q p q p" is unique.
    // No 8-window fits in 6 tokens, so the bucket tops out at 4.
    assert(got(3L) == ((6L, 4L, 2L, 0L)), s"doc3: ${got(3L)}")
    // all-unique tokens: nothing repeats at any level
    assert(got(4L) == ((3L, 0L, 0L, 0L)), s"doc4: ${got(4L)}")
  }

  test("modularity: two clean triangles score Q = 0.5; one community " +
      "holding everything scores 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("s1", "s2")
    val good = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 2L), (5L, 2L), (6L, 2L)).toDF("v", "label")
    val q = graft.operators.Graph.modularity(edges, "s1", "s2",
        good, "v", "label")
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("internal_edges"), r.getAs[Long]("degree_sum"),
          r.getAs[Double]("q_contribution"))).toMap
    // per triangle: 3/6 - (6/12)^2 = 0.25
    assert(q(1L) == ((3L, 6L, 0.25)) && q(2L) == ((3L, 6L, 0.25)))
    val one = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("v", "label")
    val qOne = graft.operators.Graph.modularity(edges, "s1", "s2",
        one, "v", "label")
      .collect().map(_.getAs[Double]("q_contribution")).sum
    assert(math.abs(qOne) < 1e-9) // 6/6 - (12/12)^2 = 0
  }

  test("markovTransitions: counts, Laplace smoothing, and the uniform " +
      "row for a sink state") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    // user 1: a -> b -> a -> c ; user 2: a -> b. c is a sink (no out).
    val ev = Seq(
      (1L, t(0), 1L, "a"), (1L, t(1), 2L, "b"), (1L, t(2), 3L, "a"),
      (1L, t(3), 4L, "c"),
      (2L, t(0), 5L, "a"), (2L, t(1), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.Sessionize.markovTransitions(
        ev, "user_id", "ts", "event_id", "event_type", alpha = 1.0)
      .collect().map(r => (r.getAs[String]("from_type"),
        r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_transitions"), r.getAs[Double]("prob"))).toMap
    assert(got.size == 9) // full 3x3 grid
    // observed from 'a': a->b (u1 pos1), a->c (u1 pos3), a->b (u2)
    // => n(a,b)=2, n(a,c)=1, tot(a)=3
    assert(got(("a", "b"))._1 == 2L && got(("a", "c"))._1 == 1L)
    assert(got(("a", "b"))._2 == math.rint((2 + 1.0) / (3 + 3) * 1e6) / 1e6)
    // b: one outgoing b->a (u1); u2's trailing b has no successor
    assert(got(("b", "a"))._1 == 1L)
    // sink c: uniform smoothed row 1/3
    Seq("a", "b", "c").foreach { to =>
      assert(got(("c", to))._1 == 0L && got(("c", to))._2 == 0.333333)
    }
  }

  test("repeatedPrefixBuckets: ':' inside tokens does not forge a " +
      "repeat (ADVICE r14 separator-injectivity regression)") {
    // Under the old ':' separator, the level-2 keys for ("a:b","c") and
    // ("a","b:c") both hashed md5("a:b:c") and were falsely marked
    // repeated; with the space separator they stay distinct (tokens
    // cannot contain whitespace after the \s+ split).
    val docs = Seq(
      (1L, "a:b c x"),
      (2L, "a b:c y"),
      // true colon-token repeat: the 2-window ("http://x","12:30")
      // occurs in both docs 3 and 4
      (3L, "http://x 12:30 p"),
      (4L, "http://x 12:30 q")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .repeatedPrefixBuckets(docs, "doc_id", "text", maxPow = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("max_rep_bucket"))
      .toMap
    assert(got(1L) == 0L && got(2L) == 0L, s"forged repeat: $got")
    assert(got(3L) == 2L && got(4L) == 2L, s"missed real repeat: $got")
  }

  test("repeatedPrefixBuckets: a shared 16-token window reaches the " +
      "top bucket") {
    val span = (1 to 16).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, span + " tail1"),
      (2L, span + " tail2")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .repeatedPrefixBuckets(docs, "doc_id", "text", maxPow = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("max_rep_bucket"), r.getAs[Long]("n_pos_rep16")))
      .toMap
    assert(got(1L) == ((16L, 1L)) && got(2L) == ((16L, 1L)), got.toString)
  }
}
