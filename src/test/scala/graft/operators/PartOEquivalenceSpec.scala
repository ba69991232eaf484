package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Last equivalence batch for part O: audio frame energy, OOV
  * accounting, and hard-negative mining each reproduced in plain scala
  * on seeded random inputs.
  */
class PartOEquivalenceSpec extends SparkSpecBase {
  import spark.implicits._

  test("audio frame energy equals the scala rms over random ascii " +
      "payloads, including the partial last frame") {
    val rnd = new Random(71)
    val docs = (0 until 20).map { i =>
      val len = rnd.nextInt(900) + 300
      (i.toLong, (0 until len)
        .map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    val got = Multimodal.audioFrameEnergy(
      Multimodal.toAssets(docs.toDF("doc_id", "text"), "doc_id", "text",
        "audio/pcm-u8"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val want = docs.flatMap { case (id, t) =>
      val s = t.take(1024)
      if (s.length < 256) Seq.empty
      else s.grouped(256).zipWithIndex.map { case (frame, fi) =>
        val amps = frame.map(c => (c.toInt - 32).toDouble)
        (id, fi.toLong) -> (frame.length.toLong,
          math.sqrt(amps.map(a => a * a).sum / amps.length))
      }.toSeq
    }.toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (n, rms)) =>
      assert(got(k)._1 === n, s"n_samples at $k")
      assert(math.abs(got(k)._2 - rms) < 1e-5, s"rms at $k")
    }
  }

  test("oov accounting equals the scala count under the deterministic " +
      "vocabulary cut") {
    val rnd = new Random(81)
    val vocab = (0 until 30).map(i => s"u$i")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until rnd.nextInt(25) + 5)
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "),
        s"g${i % 3}")
    }
    val df = docs.toDF("doc_id", "text", "source")
    val toks = docs.flatMap { case (_, t, g) =>
      t.split("\\s+").filter(_.nonEmpty).map(g -> _.toLowerCase) }
    val cut = toks.groupBy(_._2).map { case (w, xs) => w -> xs.size }
      .toSeq.sortBy { case (w, n) => (-n, w) }.take(10).map(_._1).toSet
    val got = TextAnalysis.oovByGroup(df, "text", "source", 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    toks.groupBy(_._1).foreach { case (g, ts) =>
      val oov = ts.count(t => !cut.contains(t._2)).toLong
      assert(got(g) === ((ts.size.toLong, oov)), s"group $g")
    }
  }

  test("hard negatives equal the scala brute-force different-label " +
      "top-k by cosine") {
    val rnd = new Random(91)
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1),
        (i % 4).toLong)
    }
    val df = vecs.map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
    val anchors = vecs.filter(_._1 % 5 == 0).map(_._1)
    val got = Similarity.hardNegatives(df,
      anchors.toDF("vec_id"), "vec_id", "embedding", "label", k = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (a, rs) =>
        a -> rs.sortBy(_.getInt(4)).map(r => r.getLong(2)).toSeq }

    def cos(a: Array[Float], b: Array[Float]): Double = {
      val na = math.sqrt(a.map(x => x * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x * x.toDouble).sum)
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum / (na * nb)
    }
    anchors.foreach { aid =>
      val (_, av, al) = vecs(aid.toInt)
      val want = vecs.filter(_._3 != al)
        .map { case (id, v, _) => (id, cos(av, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1)
      assert(got(aid) === want, s"anchor $aid")
    }
  }
}
