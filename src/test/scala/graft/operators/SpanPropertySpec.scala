package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Structural properties of the round-8 span-level operators over
  * generated inputs (seeded — reproducible), checked against scalar
  * facts rather than hand-picked examples.
  */
class SpanPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val rnd = new Random(42)

  private def distinctTokenDoc(n: Int): String =
    (1 to n).map(i => s"w${i}x${rnd.nextInt(1000)}").distinct.mkString(" ")

  test("scrub of doc++doc removes exactly the second copy " +
      "(distinct-token docs, sizes 3..40)") {
    // For a distinct-token doc t of n >= 3 tokens, every 3-gram of the
    // second copy of t ++ t repeats a first-copy gram (the two boundary
    // grams are novel but start in the first copy), so covered positions
    // are exactly [n+1, 2n]: n removed, cleaned text == t.
    val docs = (1 to 12).map { i =>
      val n = 3 + rnd.nextInt(38)
      val t = distinctTokenDoc(n)
      (i.toLong, s"$t $t", t.split(" ").length.toLong)
    }
    val df = docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSpanScrub(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"))).toMap
    docs.foreach { case (id, _, n) =>
      val (tot, rem) = out(id)
      assert(tot === 2 * n, s"doc $id tokens")
      assert(rem === n, s"doc $id: removed $rem of ${2 * n}, expected $n")
    }
  }

  test("scrub is identity on distinct-token docs; counts always consistent") {
    val docs = (1 to 10).map(i => (i.toLong, distinctTokenDoc(5 + i)))
    val out = TextAnalysis.repeatedSpanScrub(docs.toDF("doc_id", "text"),
      "doc_id", "text", k = 3).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_removed") === 0L)
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
  }

  test("minimizer window count is exactly max(0, n_tokens - w + 1)") {
    val docs = (1 to 15).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "), n.toLong)
    }
    val out = TextAnalysis.minimizerSketch(
        docs.map(d => (d._1, d._2)).toDF("doc_id", "text"),
        "doc_id", "text", w = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_windows")).toMap
    docs.foreach { case (id, _, n) =>
      assert(out(id) === math.max(0L, n - 3), s"doc $id (n=$n)")
    }
  }

  test("decay fold is arrival-order independent (random permutations)") {
    val events = (1 to 25).map { i =>
      (1L, new java.sql.Timestamp(1700000000000L + rnd.nextInt(86400000) *
        30L + i * 1000L), rnd.nextDouble() * 10)
    }
    def foldOf(evs: Seq[(Long, java.sql.Timestamp, Double)]): Double = {
      // the streaming fold's algebra, scalar form
      var lastMs = 0L; var score = 0.0; var n = 0L
      val tauMs = 30.0 * 86400000.0
      evs.foreach { case (_, ts, v) =>
        val t = ts.getTime
        if (n == 0) { lastMs = t; score = v }
        else if (t >= lastMs) {
          score = score * math.exp(-(t - lastMs) / tauMs) + v; lastMs = t
        } else score = score + v * math.exp(-(lastMs - t) / tauMs)
        n += 1
      }
      score
    }
    val ref = foldOf(events.sortBy(_._2.getTime))
    (1 to 5).foreach { _ =>
      val perm = rnd.shuffle(events)
      assert(math.abs(foldOf(perm) - ref) < 1e-9 * math.abs(ref),
        "fold diverged under permutation")
    }
  }
}
