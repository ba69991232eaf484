package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-13 operator specs: simplified silhouette, LOF, char entropy,
  * PPMI, label propagation.
  */
class PartYSpec extends SparkSpecBase {

  import spark.implicits._

  test("simplifiedSilhouette: two tight, well-separated groups score " +
      "near 1; a point planted in the wrong group scores negative") {
    // Group 0 around (0,0), group 1 around (10,0). Point 5 is labeled 1
    // but sits at the group-0 centroid — its silhouette must be negative.
    val pts = Seq(
      (1L, 0, Seq(0.0f, 0.1f)), (2L, 0, Seq(0.1f, 0.0f)),
      (3L, 1, Seq(10.0f, 0.1f)), (4L, 1, Seq(10.1f, 0.0f)),
      (5L, 1, Seq(0.05f, 0.05f))
    ).toDF("vec_id", "label", "embedding")
    val got = graft.ml.Clustering
      .simplifiedSilhouette(pts, "vec_id", "embedding", "label")
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_points"), r.getAs[Double]("avg_silhouette"),
          r.getAs[Long]("n_negative"))).toMap
    assert(got(0)._1 == 2L && got(1)._1 == 3L)
    assert(got(0)._2 > 0.9) // tight group far from the other centroid
    assert(got(1)._3 == 1L) // exactly the planted point is misplaced
  }

  test("lofScores: a far-off-manifold point gets the top LOF score; " +
      "uniform-density points sit near 1") {
    // 2-D unit-ish directions: a tight bundle plus one orthogonal
    // outlier. Cosine-distance LOF must rank the outlier first.
    val vecs = Seq(
      (1L, Seq(1.00f, 0.00f)), (2L, Seq(0.99f, 0.14f)),
      (3L, Seq(0.99f, -0.14f)), (4L, Seq(0.98f, 0.20f)),
      (5L, Seq(0.98f, -0.20f)), (6L, Seq(0.97f, 0.24f)),
      (7L, Seq(0.97f, -0.24f)), (8L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.lofScores(vecs, "vec_id", "embedding",
      k = 3, topN = 8).collect()
    assert(got.length == 8)
    assert(got.head.getAs[Long]("vec_id") == 8L) // the outlier leads
    assert(got.head.getAs[Double]("lof") > 1.5)
    // the bundle's scores hover near 1 (comparable local densities)
    got.tail.foreach(r => assert(r.getAs[Double]("lof") < 1.5))
    assert(got.forall(_.getAs[Long]("n_neighbors") == 3L))
  }

  test("charEntropy: single-character text has zero entropy; a uniform " +
      "two-letter string has ln(2); 'other' bucket counts non-letters") {
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "a1a1"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("char_entropy")).toMap
    assert(math.abs(got(1L)) < 1e-6)
    assert(math.abs(got(2L) - math.log(2.0)) < 1e-5)
    // digits fold into ONE 'other' bucket: same entropy as 'abab'
    assert(math.abs(got(3L) - math.log(2.0)) < 1e-5)
  }

  test("ppmiPairs: a pair that always co-occurs beats independent " +
      "pairs; counts and marginals follow the directed-window algebra") {
    // 'x y' always adjacent; fillers vary. window=1 keeps the algebra
    // hand-checkable.
    val docs = Seq((1L, "x y a"), (2L, "x y b"), (3L, "a b x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.ppmiPairs(docs, "doc_id", "text",
      window = 1, minCount = 2L, topN = 10).collect()
    val top = got.head
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) == ("x", "y"))
    assert(top.getAs[Long]("n_cooc") == 3L)
    // pairs: (x,y)x3, (y,a), (y,b), (a,b), (b,x) -> T=7, l(x)=3, r(y)=3
    val expected = math.max(0.0, math.log(3.0 * 7 / (3.0 * 3)))
    assert(math.abs(top.getAs[Double]("ppmi") - expected) < 1e-5)
  }

  test("geometricMedian: an outlier drags the mean but barely moves " +
      "the geometric median; checksum is rerun-stable") {
    // 4 points at the origin corner, 1 far outlier. The mean moves
    // ~1/5 of the way to the outlier; the geometric median stays by
    // the cluster, so the average distance to it is much smaller than
    // to the mean.
    val pts = Seq(
      (1L, 0, Seq(0.0f, 0.0f)), (2L, 0, Seq(0.2f, 0.0f)),
      (3L, 0, Seq(0.0f, 0.2f)), (4L, 0, Seq(0.2f, 0.2f)),
      (5L, 0, Seq(100.0f, 100.0f))
    ).toDF("vec_id", "label", "embedding")
    val gm = graft.ml.Clustering.geometricMedian(pts, "vec_id",
      "embedding", "label", iters = 2).head()
    assert(gm.getAs[Long]("n_points") == 5L)
    // mean is at (20.08, 20.08): avg dist to mean ≈ 45; the Weiszfeld
    // estimate pulls back toward the cluster, cutting that sharply
    assert(gm.getAs[Double]("avg_dist_gm") < 40.0)
    val rerun = graft.ml.Clustering.geometricMedian(pts, "vec_id",
      "embedding", "label", iters = 2).head()
    assert(gm.getAs[Double]("gm_checksum") ==
      rerun.getAs[Double]("gm_checksum"))
  }

  test("withReadability: run counting is exact on a hand doc and " +
      "sentence floor guards terminator-free text") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences
      (2L, "no terminators here")        // 3 words, floor 1 sentence
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withReadability(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("n_words"), r.getAs[Double]("n_sentences"),
          r.getAs[Double]("n_syllables"))).toMap
    assert(got(1L) == ((6.0, 2.0, 6.0))) // e-a-a-e-o-a vowel runs
    assert(got(2L)._1 == 3.0 && got(2L)._2 == 1.0)
  }

  test("labelPropagation: two cliques joined by one bridge edge " +
      "resolve into two communities with min-label ids") {
    val clique1 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val clique2 = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val edges = (clique1 ++ clique2 :+ (3L, 10L)).toDF("s1", "s2")
    val got = Graph.labelPropagation(edges, rounds = 3).collect()
      .map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("size"), r.getAs[Long]("min_node"))).toMap
    assert(got.values.map(_._1).sum == 6L) // every node labeled once
    assert(got.size == 2) // the bridge does not merge the cliques
    // deterministic: a rerun agrees exactly
    val rerun = Graph.labelPropagation(edges, rounds = 3).collect()
      .map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("size"), r.getAs[Long]("min_node"))).toMap
    assert(got == rerun)
  }
}
