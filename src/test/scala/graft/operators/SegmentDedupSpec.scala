package graft.operators

import scala.util.Random

import graft.SparkSpecBase

/** Semantics of the segment-level corpus dedup
  * ([[TextAnalysis.segmentDedup]]): global keep-first survivorship
  * (including within-doc repeats — the contrast with t59's cross-doc
  * jurisdiction), ragged-tail segmentation, alignment sensitivity, and
  * exact reconstruction.
  */
class SegmentDedupSpec extends SparkSpecBase {

  import spark.implicits._

  private val rnd = new Random(11)
  private val W = 5

  private def uniqueDoc(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag${i}x${rnd.nextInt(1000)}").distinct.mkString(" ")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def run(rows: Seq[(Long, String)]) =
    TextAnalysis.segmentDedup(rows.toDF("doc_id", "text"),
        "doc_id", "text", W)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned_md5")))).toMap

  test("unique corpus: ceil(n/w) segments, zero removed, text reconstructs") {
    val rows = (1 to 6).map { i =>
      val n = 1 + rnd.nextInt(23)
      (i.toLong, uniqueDoc(n, s"u$i"))
    }
    val out = run(rows)
    rows.foreach { case (id, text) =>
      val n = text.split(" ").length
      val (segs, rem, h) = out(id)
      assert(segs === ((n + W - 1) / W).toLong, s"doc $id segments")
      assert(rem === 0L, s"doc $id removed")
      assert(h === md5Hex(text.toLowerCase), s"doc $id reconstruction")
    }
  }

  test("an exact duplicate doc keeps nothing; the lowest id keeps everything") {
    val t = uniqueDoc(17, "d")
    val out = run(Seq((2L, t), (8L, t)))
    assert(out(2L)._2 === 0L)
    assert(out(8L) === ((4L, 4L, md5Hex(""))))
  }

  test("within-doc repeated blocks ARE removed (global keep-first, unlike t59)") {
    val block = "b1 b2 b3 b4 b5"
    val out = run(Seq((1L, s"$block $block"),
      (2L, uniqueDoc(7, "z"))))
    assert(out(1L)._2 === 1L, "second copy of the aligned block must go")
    assert(out(1L)._3 === md5Hex(block))
  }

  test("misaligned shared text does not match (alignment sensitivity)") {
    val block = "c1 c2 c3 c4 c5"
    // doc 2 shifts the shared run by one token => different block texts
    val out = run(Seq((1L, s"$block ${uniqueDoc(5, "p")}"),
      (2L, s"pad $block ${uniqueDoc(4, "q")}")))
    assert(out(2L)._2 === 0L, "shifted run must not be scrubbed")
  }

  test("ragged tails dedup like any block") {
    // both docs end in the same 2-token tail block after 5 full tokens
    val tail = "t1 t2"
    val out = run(Seq((1L, s"${uniqueDoc(5, "a")} $tail"),
      (2L, s"${uniqueDoc(5, "b")} $tail")))
    assert(out(1L)._2 === 0L)
    assert(out(2L)._2 === 1L, "duplicate ragged tail removed from doc 2")
  }

  test("boilerplate filter removes hot segments EVERYWHERE, first copy included") {
    val boiler = "h1 h2 h3 h4 h5"
    val rows = (1L to 4L).map(i => (i, s"$boiler ${uniqueDoc(5, s"q$i")}")) :+
      (9L, uniqueDoc(10, "z"))
    val out = TextAnalysis.boilerplateSegmentFilter(
        rows.toDF("doc_id", "text"), "doc_id", "text",
        segTokens = W, minDocFreq = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_md5"))))
      .toMap
    (1L to 4L).foreach { id =>
      assert(out(id)._1 === 1L, s"doc $id must lose the boilerplate block")
    }
    assert(out(9L)._1 === 0L)
    // contrast: segmentDedup keeps doc 1's copy
    val dedup = run(rows)
    assert(dedup(1L)._2 === 0L && dedup(2L)._2 === 1L)
  }

  test("boilerplate below the doc-frequency threshold survives everywhere") {
    val shared = "k1 k2 k3 k4 k5"
    val rows = Seq((1L, s"$shared ${uniqueDoc(5, "a")}"),
      (2L, s"$shared ${uniqueDoc(5, "b")}"))
    val out = TextAnalysis.boilerplateSegmentFilter(
        rows.toDF("doc_id", "text"), "doc_id", "text",
        segTokens = W, minDocFreq = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_removed")).toMap
    assert(out(1L) === 0L && out(2L) === 0L, "df=2 < threshold 3")
  }

  test("survivor order is (doc, block index): earlier block in the SAME doc wins") {
    val block = "e1 e2 e3 e4 e5"
    val filler = uniqueDoc(5, "f")
    val out = run(Seq((1L, s"$block $filler $block")))
    assert(out(1L) === ((3L, 1L, md5Hex(s"$block $filler"))))
  }
}
