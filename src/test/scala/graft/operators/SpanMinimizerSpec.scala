package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Position-exact invariants for the round-8 span-level text operators
  * and the kNN classifier (catalog t42/t43/m34 carry the full DuckDB
  * oracles; these pin the hand-checkable cases).
  */
class SpanMinimizerSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5Of(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("repeatedSpanScrub removes exactly the repeated 3-gram's span") {
    // "a b c a b c d": the 3-gram at position 4 repeats position 1's
    // "a b c", covering positions 4-6; kept text is "a b c d".
    val df = Seq((1L, "a b c a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSpanScrub(df, "doc_id", "text", k = 3)
      .collect().head
    assert(out.getAs[Long]("n_tokens") === 7L)
    assert(out.getAs[Long]("n_removed") === 3L)
    assert(out.getAs[String]("cleaned_md5") === md5Of("a b c d"))
  }

  test("repeatedSpanScrubText rebuilds the exact surviving token stream") {
    val df = Seq((1L, "a b c a b c d"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSpanScrubText(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a b c d")
    assert(!out.contains(2L)) // blank docs are excluded, as in the scrub
    // text form and hashed form agree by construction
    val h = TextAnalysis.repeatedSpanScrub(df, "doc_id", "text", k = 3)
      .collect().head.getAs[String]("cleaned_md5")
    assert(h === md5Of(out(1L)))
  }

  test("repeatedSpanScrub is identity on repeat-free text") {
    val df = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSpanScrub(df, "doc_id", "text", k = 3)
      .collect().head
    assert(out.getAs[Long]("n_removed") === 0L)
    assert(out.getAs[String]("cleaned_md5") ===
      md5Of("the quick brown fox jumps"))
  }

  test("repeatedSpanScrub covers overlapping repeats without double count") {
    // "x x x x x": 3-grams at 1,2,3 are all "x x x"; repeats at 2 and 3
    // cover positions 2-5, keeping only position 1.
    val df = Seq((1L, "x x x x x")).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSpanScrub(df, "doc_id", "text", k = 3)
      .collect().head
    assert(out.getAs[Long]("n_tokens") === 5L)
    assert(out.getAs[Long]("n_removed") === 4L)
    assert(out.getAs[String]("cleaned_md5") === md5Of("x"))
  }

  test("minimizerSketch: window count, density bound, short-doc empties") {
    val df = Seq(
      (1L, "a b c d e f g h"), // 8 tokens, w=4 -> 5 windows
      (2L, "a b c")            // shorter than w -> empty sketch
    ).toDF("doc_id", "text")
    val out = TextAnalysis.minimizerSketch(df, "doc_id", "text", w = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_windows") === 5L)
    // adjacent windows share minimizers: distinct count <= windows
    assert(out(1L).getAs[Long]("n_minimizers") <= 5L)
    assert(out(1L).getAs[Long]("n_minimizers") >= 1L)
    assert(out(2L).getAs[Long]("n_windows") === 0L)
    assert(out(2L).getAs[String]("sketch_md5") === md5Of(""))
  }

  test("minimizerSketch is shard-stable: same text, same sketch") {
    val df = Seq((1L, "one two three four five six"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val rows = TextAnalysis.minimizerSketch(df, "doc_id", "text", w = 4)
      .select(col("sketch_md5")).distinct().count()
    assert(rows === 1L)
  }

  test("knnClassify votes the modal label, smallest label on tie") {
    // Corpus: two points at +x labeled 1, two at -x labeled 0.
    // Query at +x -> neighbors k=3 are {+x, +x, one of -x}: label 1 wins.
    // With k=2 on a symmetric query the vote ties 1-1 -> label 0 wins.
    val corpus = Seq(
      (10L, Array(1.0f, 0.1f), 1), (11L, Array(1.0f, -0.1f), 1),
      (20L, Array(-1.0f, 0.1f), 0), (21L, Array(-1.0f, -0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r3 = Similarity.knnClassify(corpus, q, "vec_id", "embedding",
      "label", k = 3).collect().head
    assert(r3.getAs[Long]("predicted_label") === 1L)
    assert(r3.getAs[Long]("n_votes") === 2L)
    val qTie = Seq((2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r2 = Similarity.knnClassify(corpus, qTie, "vec_id", "embedding",
      "label", k = 2).collect().head
    assert(r2.getAs[Long]("predicted_label") === 0L)
  }
}
