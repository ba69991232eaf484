package graft.operators

import graft.SparkSpecBase

/** Round-14 operator specs: HDBSCAN-style λ-level clustering and the
  * prefix-doubling repeated-span profile.
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
