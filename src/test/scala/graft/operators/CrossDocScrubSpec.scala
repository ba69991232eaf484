package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Semantics of the cross-document ExactSubstr scrub
  * ([[TextAnalysis.crossDocSpanScrub]]): keep-lowest-doc survivorship,
  * strict cross-doc jurisdiction (within-doc repeats untouched), exact
  * covered-position arithmetic, and full-duplicate elimination.
  */
class CrossDocScrubSpec extends SparkSpecBase {

  import spark.implicits._

  private val rnd = new Random(7)

  private def distinctTokenDoc(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag${i}x${rnd.nextInt(1000)}").distinct.mkString(" ")

  private def scrub(rows: Seq[(Long, String)], k: Int = 4) =
    TextAnalysis.crossDocSpanScrub(rows.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned_md5")))).toMap

  test("corpus-unique docs are untouched and hash to their normalized text") {
    val rows = (1 to 8).map(i =>
      (i.toLong, distinctTokenDoc(5 + rnd.nextInt(20), s"u$i")))
    val out = scrub(rows)
    rows.foreach { case (id, text) =>
      val (tot, rem, h) = out(id)
      assert(tot === text.split(" ").length.toLong && rem === 0L)
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(text.toLowerCase.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(h === expected, s"doc $id hash")
    }
  }

  test("a full duplicate keeps the lowest doc id and empties every higher copy") {
    val t = distinctTokenDoc(12, "d")
    val out = scrub(Seq((3L, t), (9L, t), (5L, t)))
    val n = t.split(" ").length.toLong
    assert(out(3L)._2 === 0L)
    Seq(5L, 9L).foreach { id =>
      assert(out(id) === ((n, n,
        "d41d8cd98f00b204e9800998ecf8427e")), s"doc $id") // md5("")
    }
  }

  test("a shared interior 4-gram costs the higher doc exactly 4 tokens") {
    val shared = "alpha bravo charlie delta"
    val a = s"${distinctTokenDoc(6, "a")} $shared ${distinctTokenDoc(6, "b")}"
    val b = s"${distinctTokenDoc(6, "c")} $shared ${distinctTokenDoc(6, "e")}"
    val out = scrub(Seq((1L, a), (2L, b)))
    assert(out(1L)._2 === 0L, "lowest doc keeps its copy")
    assert(out(2L)._2 === 4L, "higher doc loses exactly the shared span")
    // reconstruction == the doc with the shared span cut out
    val expectedText = b.split(" ").patch(6, Nil, 4).mkString(" ")
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(expectedText.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(2L)._3 === expected)
  }

  test("within-doc repeats are out of jurisdiction (t42's pass, not this one)") {
    val t = distinctTokenDoc(8, "r")
    val out = scrub(Seq((1L, s"$t $t"), (2L, distinctTokenDoc(9, "z"))))
    assert(out(1L)._2 === 0L, "self-repeat must not be scrubbed cross-doc")
  }

  test("overlapping shared grams cover the union of their spans, not the sum") {
    // docs share a 6-token run => higher doc has three 4-gram hits whose
    // covered positions overlap; removed == 6 (union), not 12.
    val run = "p1 p2 p3 p4 p5 p6"
    val a = s"${distinctTokenDoc(5, "f")} $run"
    val b = s"${distinctTokenDoc(5, "g")} $run ${distinctTokenDoc(4, "h")}"
    val out = scrub(Seq((1L, a), (2L, b)))
    assert(out(2L)._2 === 6L, s"expected union cover 6, got ${out(2L)._2}")
  }

  test("text form rebuilds exactly what the md5 form hashes") {
    val shared = "s1 s2 s3 s4"
    val rows = Seq((1L, s"${distinctTokenDoc(5, "x")} $shared"),
      (2L, s"$shared ${distinctTokenDoc(5, "y")}"),
      (3L, distinctTokenDoc(7, "w")))
    val texts = TextAnalysis.crossDocSpanScrubText(
        rows.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("cleaned_text")).toMap
    val hashes = scrub(rows)
    rows.foreach { case (id, _) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(texts(id).getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(h === hashes(id)._3, s"doc $id text/hash divergence")
    }
    assert(texts(2L) === texts(2L).trim && !texts(2L).startsWith("s1"))
  }

  test("survivorship is transitive down the id order across three docs") {
    val shared = "q1 q2 q3 q4"
    val rows = Seq(
      (10L, s"${distinctTokenDoc(4, "m")} $shared"),
      (20L, s"$shared ${distinctTokenDoc(4, "n")}"),
      (30L, s"${distinctTokenDoc(3, "o")} $shared ${distinctTokenDoc(3, "w")}"))
    val out = scrub(rows)
    assert(out(10L)._2 === 0L)
    assert(out(20L)._2 === 4L)
    assert(out(30L)._2 === 4L)
  }
}
