package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Product-quantization invariants ([[Similarity.pqCodebooks]] /
  * [[Similarity.pqEncode]] / [[Similarity.pqTopK]]) that hold for ANY
  * learned codebook: full-shortlist PQ ≡ exact brute force (the rerank
  * is exact, so only the shortlist can lose recall), code-table shape,
  * and encoding determinism given fixed codebooks.
  */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 8
  private val rnd = new Random(17)
  private lazy val vecs = (0L until 40L).map { i =>
    (i, (1 to dim).map(_ => rnd.nextGaussian().toFloat))
  }.toDF("vec_id", "embedding")

  test("with shortlist >= corpus, PQ top-k equals exact brute force " +
      "(rerank exactness — the shortlist is the only lossy stage)") {
    val pred = pmod(col("vec_id"), lit(4)) === 0
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 3)
      .where(pmod(col("query_id"), lit(4)) === 0)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank").collect().toSeq
    val pq = Similarity.pqTopK(vecs, "vec_id", "embedding", pred,
        k = 3, m = 4, ksub = 8, shortlist = 40, dim = dim, seed = 5L)
      .orderBy("query_id", "rank").collect().toSeq
    assert(pq === exact)
  }

  test("code table has exactly one code per (vector, subspace), codes within ksub") {
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      m = 4, ksub = 8, dim = dim, seed = 5L)
    assert(cb.count() === 32) // m * ksub rows
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb,
      m = 4, dim = dim)
    assert(codes.count() === 40L * 4)
    assert(codes.groupBy("vec_id", "sub").count()
      .where(col("count") > 1).count() === 0)
    val mm = codes.agg(min(col("code")), max(col("code"))).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 8)
  }

  test("r16 shuffle-free argmin encoding == independent grouped-join " +
      "argmin (min distance, ties to the smallest code)") {
    // pins the pqAssignByArgmin rewrite: recompute the assignment the
    // pre-r16 way (ksub-way equi-join + min(struct(d2, code)) regroup)
    // and require exact equality with pqEncode's map-side fold.
    val m = 4; val subDim = dim / m
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      m = m, ksub = 8, dim = dim, seed = 5L).localCheckpoint(true)
    val got = Similarity.pqEncode(vecs, "vec_id", "embedding", cb, m, dim)
      .orderBy("vec_id", "sub").collect().toSeq
    val v = transform(col("embedding"), x => x.cast("double"))
    val unitv = transform(v, x => x / sqrt(aggregate(v, lit(0.0),
      (acc, u) => acc + u * u)))
    val subs = vecs.select(col("vec_id").as("id"), unitv.as("vec"))
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("vec"))
      .select(col("id"), col("sub"),
        slice(col("vec"), col("sub") * subDim + 1, lit(subDim)).as("sv"))
    val d2 = aggregate(zip_with(col("sv"), col("cent"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
    val want = subs.join(broadcast(cb), Seq("sub"))
      .select(col("id").as("vec_id"), col("sub"), col("code"),
        d2.as("__d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("__d2"), col("code")))
        .getField("code").as("code"))
      .orderBy("vec_id", "sub").collect().toSeq
    assert(got === want)
  }

  test("encoding is deterministic given the codebooks") {
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      m = 4, ksub = 8, dim = dim, seed = 5L).localCheckpoint(true)
    val a = Similarity.pqEncode(vecs, "vec_id", "embedding", cb, 4, dim)
      .orderBy("vec_id", "sub").collect().toSeq
    val b = Similarity.pqEncode(vecs, "vec_id", "embedding", cb, 4, dim)
      .orderBy("vec_id", "sub").collect().toSeq
    assert(a === b)
  }
}
