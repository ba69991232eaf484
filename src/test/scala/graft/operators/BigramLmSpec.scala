package graft.operators

import scala.util.Random

import graft.SparkSpecBase

/** [[TextAnalysis.bigramLmScore]] vs a scalar Scala reference LM on
  * random corpora, plus edge semantics (short docs, fluency ordering).
  */
class BigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private def scalarReference(docs: Seq[(Long, String)])
      : Map[Long, (Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    }.filter(_._2.nonEmpty)
    val all = toks.flatMap(_._2)
    val v = all.distinct.size
    val uni = all.groupBy(identity).map { case (k, g) => k -> g.size }
    val pairs = toks.flatMap(_._2.sliding(2).filter(_.size == 2)
      .map(s => (s(0), s(1))))
    val pc = pairs.groupBy(identity).map { case (k, g) => k -> g.size }
    toks.filter(_._2.size >= 2).map { case (id, tk) =>
      val bs = tk.sliding(2).filter(_.size == 2).toSeq
      val nll = bs.map { s =>
        -math.log((pc((s(0), s(1))) + 1.0) / (uni(s(0)) + v))
      }.sum / bs.size
      id -> ((bs.size.toLong,
        math.rint((nll + 1e-9) * 1e6) / 1e6))
    }.toMap
  }

  test("matches the scalar reference on a random corpus") {
    val rnd = new Random(31)
    val vocab = (1 to 12).map(i => s"w$i")
    val docs = (1L to 25L).map { id =>
      val n = 2 + rnd.nextInt(30)
      id -> (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val exp = scalarReference(docs)
    val got = TextAnalysis.bigramLmScore(docs.toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("nll")))).toMap
    assert(got.keySet === exp.keySet)
    exp.foreach { case (id, (nb, nll)) =>
      assert(got(id)._1 === nb, s"doc $id bigram count")
      assert(math.abs(got(id)._2 - nll) < 2e-6, s"doc $id nll")
    }
  }

  test("docs with fewer than 2 tokens emit no row") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens"))
    val got = TextAnalysis.bigramLmScore(docs.toDF("doc_id", "text"),
      "text", "doc_id").select("doc_id").as[Long].collect().toSet
    assert(got === Set(3L))
  }

  test("a doc of corpus-frequent bigrams scores more fluent (lower nll) than a shuffled one") {
    val fluent = "the cat sat on the mat"
    // 20 docs repeat the fluent phrase; one doc scrambles it
    val docs = (1L to 20L).map(i => i -> fluent) :+
      (99L -> "mat the on sat cat the")
    val got = TextAnalysis.bigramLmScore(docs.toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("nll")).toMap
    assert(got(1L) < got(99L),
      s"fluent ${got(1L)} should beat scrambled ${got(99L)}")
  }
}
