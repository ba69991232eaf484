package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Brute-force equivalence properties for the part-P statistical
  * queries over seeded random inputs — the catalog forms are inline
  * plans, so these rebuild the same shapes on generated frames and
  * check them against plain scala.
  */
class PartPPropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("target encoding equals the scala leave-fold-out means with " +
      "smoothing, on random frames") {
    for (seed <- Seq(41, 42)) {
      val rnd = new Random(seed)
      val rows = (0 until 400).map(_ => (s"c${rnd.nextInt(5)}",
        rnd.nextDouble() * 100, rnd.nextInt(4).toLong))
      val m = 10.0
      val prior = rows.map(_._2).sum / rows.size
      val got = FeatureEng.targetEncode(rows.toDF("cat", "y", "fold"),
        "cat", "y", "fold", smoothing = m)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      rows.groupBy(r => (r._1, r._3)).foreach { case ((cat, fold), subj) =>
        val others = rows.filter(r => r._1 == cat && r._3 != fold)
        val want = (others.map(_._2).sum + m * prior) / (others.size + m)
        val (nFold, enc) = got((cat, fold))
        assert(nFold === subj.size.toLong)
        assert(math.abs(enc - want) < 1e-5,
          s"enc($cat,$fold): $enc vs $want seed=$seed")
      }
    }
  }

  test("source jsd equals the scala divergence on a random corpus") {
    val rnd = new Random(51)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (0 until 40).map { i =>
      val src = s"s${i % 4}"
      (i.toLong, (0 until rnd.nextInt(20) + 5)
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "), src)
    }
    val dir = java.nio.file.Files.createTempDirectory("jsdprop").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.QueriesP.m47.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

    val toks = docs.flatMap { case (_, t, s) =>
      t.split("\\s+").filter(_.nonEmpty).map(s -> _) }
    val n = toks.size.toDouble
    val global = toks.groupBy(_._2).map { case (w, xs) => w -> xs.size / n }
    toks.groupBy(_._1).foreach { case (src, st) =>
      val ns = st.size.toDouble
      val p = st.groupBy(_._2).map { case (w, xs) => w -> xs.size / ns }
      val jsd = global.map { case (w, q) =>
        val pw = p.getOrElse(w, 0.0)
        val mw = (pw + q) / 2
        (if (pw > 0) pw * math.log(pw / mw) else 0.0) +
          q * math.log(q / mw)
      }.sum / 2
      assert(math.abs(got(src) - jsd) < 1e-5, s"jsd($src): ${got(src)} vs $jsd")
    }
  }

  test("ppmi pairs and values equal the scala brute force on a random " +
      "corpus") {
    val rnd = new Random(61)
    val vocab = (0 until 8).map(i => s"t$i")
    val docs = (0 until 25).map { i =>
      (i.toLong, (0 until rnd.nextInt(25) + 8)
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("ppmiprop").toString
    docs.toDF("doc_id", "text").withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.QueriesO.t53.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

    val co = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (_, t) =>
      val tk = t.split("\\s+").filter(_.nonEmpty)
      for (i <- tk.indices; j <- (i + 1) until math.min(i + 4, tk.length))
        co((tk(i), tk(j))) = co.getOrElse((tk(i), tk(j)), 0L) + 1
    }
    val nTot = co.values.sum.toDouble
    val ra = co.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val cb = co.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val want = co.filter(_._2 >= 5).map { case ((a, b), c) =>
      (a, b) -> (c, math.max(0.0,
        math.log(c * nTot / (ra(a).toDouble * cb(b))))) }
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (c, ppmi)) =>
      assert(got(k)._1 === c, s"count at $k")
      assert(math.abs(got(k)._2 - ppmi) < 1e-5, s"ppmi at $k")
    }
    assert(want.nonEmpty)
  }
}
