package graft.operators

import scala.util.Random

import graft.SparkSpecBase

/** Brute-force equivalence properties for the part-Q family over
  * seeded random inputs.
  */
class PartQPropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("kaplan-meier equals a scala brute-force product-limit curve " +
      "on random censored cohorts") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new Random(seed)
      val subjects = (0 until 300).map(_ =>
        (rnd.nextInt(15).toLong, if (rnd.nextDouble() < 0.7) 1 else 0))
      val got = Stats.kaplanMeier(subjects.toDF("dur", "ev"), "dur", "ev")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toMap

      // brute force
      val n = subjects.size
      val byDur = subjects.groupBy(_._1).toSeq.sortBy(_._1)
      var atRisk = n.toLong
      var surv = 1.0
      byDur.foreach { case (dur, subj) =>
        val d = subj.count(_._2 == 1).toLong
        val c = subj.size - d
        if (d > 0) surv *= 1.0 - d.toDouble / atRisk
        if (d > 0) {
          val (gAtRisk, gD, gC, gS) = got(dur)
          assert(gAtRisk === atRisk && gD === d && gC === c,
            s"counts at dur=$dur seed=$seed")
          assert(math.abs(gS - surv) < 1e-6,
            s"survival at dur=$dur: $gS vs $surv seed=$seed")
        } else assert(!got.contains(dur),
          s"censored-only dur=$dur must not emit a row seed=$seed")
        atRisk -= subj.size
      }
      assert(got.keySet === byDur.filter(_._2.exists(_._2 == 1))
        .map(_._1).toSet)
    }
  }

  test("containment pairs equal a scala brute force over random " +
      "token documents") {
    val rnd = new Random(31)
    val vocab = (0 until 40).map(i => s"v$i")
    def randDoc(len: Int): Seq[String] =
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
    val bases = (0 until 12).map(i => i.toLong -> randDoc(rnd.nextInt(15) + 10))
    // plant real containment: every third base gets a contiguous-slice
    // child (its shingles are a subset of the parent's) — the quote-
    // inclusion structure the operator exists for
    val children = bases.zipWithIndex.collect {
      case ((id, toks), i) if i % 3 == 0 =>
        val start = rnd.nextInt(math.max(1, toks.size - 6))
        (100L + id) -> toks.slice(start, start + 6)
    }
    val docs = (bases ++ children).map { case (id, tk) =>
      (id, tk.mkString(" ")) }
    val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
      "text", "doc_id", n = 3, minContainment = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap

    def shingleSet(t: String): Set[String] = {
      val tk = t.trim.split("\\s+")
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty
      i = (sa & sb).size
      ca = i.toDouble / sa.size; cb = i.toDouble / sb.size
      if math.max(ca, cb) >= 0.4
    } yield (a, b) -> (ca, cb)).toMap
    assert(got.keySet === want.keySet,
      s"pair sets differ: extra=${got.keySet -- want.keySet} " +
        s"missing=${want.keySet -- got.keySet}")
    want.foreach { case (k, (ca, cb)) =>
      assert(math.abs(got(k)._1 - ca) < 1e-5 &&
        math.abs(got(k)._2 - cb) < 1e-5, s"containment values at $k")
    }
    assert(want.nonEmpty, "random corpus should produce qualifying pairs")
  }
}
