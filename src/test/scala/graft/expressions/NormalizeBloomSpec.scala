package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Graph

class NormalizeBloomSpec extends SparkSpecBase {

  import spark.implicits._

  test("UnicodeNormalize: NFC composes, NFD decomposes, ASCII fast path") {
    val decomposed = "cafe\u0301"  // e + combining acute (5 codepoints)
    val composed = "caf\u00e9"     // precomposed e-acute (4 codepoints)
    val df = Seq(decomposed, composed, "plain ascii").toDF("s")
    val out = df.select(
      UnicodeNormalize.nfc(col("s")).as("nfc"),
      UnicodeNormalize.nfd(col("s")).as("nfd"),
      length(col("s")).as("n_in"),
      length(UnicodeNormalize.nfc(col("s"))).as("n_nfc")).collect()
    // Both encodings canonicalize to the same NFC string...
    assert(out(0).getString(0) == composed && out(1).getString(0) == composed)
    // ...and to the same NFD string.
    assert(out(0).getString(1) == decomposed && out(1).getString(1) == decomposed)
    // Codepoint counts prove real composition happened.
    assert(out(0).getInt(2) == 5 && out(0).getInt(3) == 4)
    // ASCII is untouched.
    assert(out(2).getString(0) == "plain ascii" && out(2).getString(1) == "plain ascii")
  }

  test("UnicodeNormalize: dedup digests unify after canonicalization") {
    val df = Seq((1L, "re\u0301sume\u0301"), (2L, "r\u00e9sum\u00e9")).toDF("id", "s")
    val distinctRaw = df.select(md5(col("s"))).distinct().count()
    val distinctNfc = df.select(md5(UnicodeNormalize.nfc(col("s"))))
      .distinct().count()
    assert(distinctRaw == 2 && distinctNfc == 1)
  }

  test("BloomMightContain: no false negatives; fpp stays near spec") {
    val keys = (0L until 2000L).filter(_ % 2 == 0)
    val dim = keys.toDF("k")
    val bloom = dim.stat.bloomFilter("k", 2000, 0.01)
    val probe = (0L until 4000L).toDF("p")
    val hits = probe.where(BloomMightContain(col("p"), bloom))
      .select("p").collect().map(_.getLong(0)).toSet
    // Every true member passes (Bloom filters never drop members)...
    assert(keys.forall(hits.contains))
    // ...and false positives stay within a loose 5× of the 1% target.
    val fp = hits.count(h => !keys.contains(h))
    assert(fp <= (4000 - keys.size) * 0.05,
      s"false-positive count $fp exceeds 5% of non-members")
  }

  test("triangleStats: known graph (K4 plus a pendant edge)") {
    // K4 on {1,2,3,4} has 4 triangles and 12 wedges; pendant 4-5 adds
    // 3 wedges (degree of 4 becomes 4: C(4,2)=6 vs 3) and no triangle.
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5))
      .toDF("s1", "s2")
    val r = Graph.triangleStats(edges).head()
    assert(r.getAs[Long]("n_triangles") == 4L)
    // Degrees: 1,2,3 → 3; 4 → 4; 5 → 1. Wedges = 3·3 + 6 + 0 = 15.
    assert(r.getAs[Long]("n_wedges") == 15L)
    assert(math.abs(r.getAs[Double]("clustering_coeff") - 3.0 * 4 / 15) < 1e-5)
  }

  test("triangleStats: triangle-free graph (star) counts zero") {
    val star = Seq((1, 2), (1, 3), (1, 4), (1, 5)).toDF("s1", "s2")
    val r = Graph.triangleStats(star).head()
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("n_wedges") == 6L)
  }

  test("CdcBoundaries: bit-identical to the SQL md5Hash56 rule, incl. multibyte") {
    // Mixed ASCII / multibyte / short docs — char-positions, not bytes.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 8),
      (2L, "café résumé naïve 你好世界 " * 12),
      (3L, "short"), // below window: empty boundary set
      (4L, "0123456789abcdef" * 20)).toDF("id", "t")
    val window = 8
    val divisor = 16
    val viaExpr = docs.select(col("id"),
      CdcBoundaries.of(col("t"), window, divisor).as("b"))
    val viaSql = docs.select(col("id"), expr(
      s"CASE WHEN length(t) < $window THEN array() ELSE " +
        s"filter(sequence($window, length(t)), i -> i = length(t) OR " +
        s"pmod(CAST(conv(substring(md5(substring(t, " +
        s"i - ${window - 1}, $window)), 1, 14), 16, 10) AS BIGINT), " +
        s"$divisor) = 0) END").cast("array<int>").as("b"))
    val a = viaExpr.orderBy("id").collect().map(_.getSeq[Int](1))
    val b = viaSql.orderBy("id").collect().map(_.getSeq[Int](1))
    assert(a.length == 4 && a.zip(b).forall { case (x, y) => x == y })
    assert(a(2).isEmpty) // doc shorter than window
    assert(a.forall(s => s.isEmpty || s.last > 0)) // end-of-doc boundary present
  }
}
