package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Hand-checkable invariants for the part-O operator family: the
  * Misra-Gries approximation regime (the one the oracle can't reach —
  * see QueriesO.m43's rationale), snapshot-diff statuses, Kaplan-Meier
  * against a hand-computed curve, quantile mapping on a shifted
  * distribution, hard-negative label constraints, and the audio frame
  * energy of a known payload.
  */
class PartOSpec extends SparkSpecBase {
  import spark.implicits._

  test("misra-gries approximation regime: bounded size, never " +
      "overestimates, 2n/(k+1) error bound, heavies survive") {
    // zipf-ish stream, cardinality 200 >> k = 16, spread over 8
    // partitions so per-partition decrements and the merge-prune both
    // fire. freq(item i) proportional to 1/i via a deterministic ramp.
    val items = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"item_$i"))
    val n = items.size.toLong
    val k = 16
    val ds = spark.createDataset(items).repartition(8)
    val out = HeavyHitters.misraGries(ds, k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size <= k, s"summary size ${out.size} > k=$k")
    val exact = items.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    val bound = 2.0 * n / (k + 1)
    out.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
      assert(exact(t) - est <= bound,
        s"$t error ${exact(t) - est} > bound $bound")
    }
    exact.filter(_._2 > bound).foreach { case (t, f) =>
      assert(out.contains(t), s"heavy $t (freq $f > $bound) missing")
    }
  }

  test("misra-gries exact regime: cardinality <= k reproduces counts") {
    val items = Seq("a", "a", "a", "b", "b", "c")
    val out = HeavyHitters.misraGries(
      spark.createDataset(items).repartition(3), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("snapshot diff tags all four statuses, null-safe on state") {
    val oldV = Seq((1L, Some(10)), (2L, Some(20)), (3L, None: Option[Int]),
      (4L, Some(40))).toDF("k", "v")
    val newV = Seq((2L, Some(20)), (3L, Some(30)), (4L, Some(41)),
      (5L, Some(50))).toDF("k", "v")
    val got = SnapshotDiff.diff(oldV, newV, Seq("k"), Seq("v"))
      .select(col("k"), col("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "changed", 5L -> "added"))
  }

  test("kaplan-meier matches the hand-computed product-limit curve") {
    // durations: 1(event), 1(event), 2(censored), 3(event)
    // t=1: n=4, d=2 -> S = 1 - 2/4 = 0.5
    // t=2: censored only -> no output row, risk set drops to 1
    // t=3: n=1, d=1 -> S = 0.5 * (1 - 1/1) = 0
    val subj = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1)).toDF("dur", "ev")
    val rows = Stats.kaplanMeier(subj, "dur", "ev")
      .orderBy("dur").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val at1 = rows(0)
    assert(at1.getLong(1) === 4L && at1.getLong(2) === 2L &&
      at1.getLong(3) === 0L)
    assert(math.abs(at1.getDouble(4) - 0.5) < 1e-9)
    val at3 = rows(1)
    assert(at3.getLong(1) === 1L && at3.getLong(2) === 1L)
    assert(at3.getDouble(4) === 0.0)
  }

  test("quantile map sends a shifted distribution onto the reference " +
      "scale") {
    // group g = group r shifted by +1000: equal ranks, so every g row
    // must map to its own value minus the shift (the r quantile at the
    // same rank), exactly at the knots because ranks land on them.
    val r = (0 to 10).map(i => (i.toLong, "r", i * 10))
    val g = (0 to 10).map(i => (100L + i, "g", 1000 + i * 10))
    val df = (r ++ g).toDF("id", "grp", "score")
    val out = Stats.quantileMap(df, "grp", "score", "id", "r", knots = 20)
      .where(col("grp") === "g").collect()
    assert(out.length === 11)
    out.foreach { row =>
      val raw = row.getInt(2)
      val mapped = row.getDouble(4)
      assert(math.abs(mapped - (raw - 1000)) < 1e-6,
        s"raw $raw mapped to $mapped, expected ${raw - 1000}")
    }
  }

  test("hard negatives: only requested anchors, labels always differ, " +
      "ranks dense from 1") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val anchors = emb.where(pmod(col("vec_id"), lit(7)) === 0)
      .select("vec_id")
    val out = Similarity.hardNegatives(emb, anchors, "vec_id",
      "embedding", "label", k = 3).cache()
    val anchorIds = anchors.collect().map(_.getLong(0)).toSet
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => anchorIds.contains(r.getLong(0))))
    assert(rows.forall(r => r.getLong(1) != r.getLong(3)),
      "a negative shares its anchor's label")
    val byAnchor = rows.groupBy(_.getLong(0))
    byAnchor.values.foreach { rs =>
      assert(rs.map(_.getInt(4)).sorted.toSeq === (1 to rs.size).toSeq)
    }
    out.unpersist()
  }

  test("audio frame energy: constant payload gives exact rms, spaces " +
      "are silence") {
    // 256 'A's (code 65, amp 33) then 256 spaces (amp 0)
    val df = Seq((7L, "A" * 256 + " " * 256)).toDF("doc_id", "text")
    val out = Multimodal.audioFrameEnergy(
      Multimodal.toAssets(df, "doc_id", "text", "audio/pcm-u8"))
      .orderBy("frame_idx").collect()
    assert(out.length === 2)
    assert(out(0).getLong(2) === 256L &&
      math.abs(out(0).getDouble(3) - 33.0) < 1e-6 &&
      !out(0).getBoolean(4))
    assert(out(1).getLong(2) === 256L && out(1).getDouble(3) === 0.0 &&
      out(1).getBoolean(4))
  }

  test("count-min: never underestimates, collisions overestimate, " +
      "estimates are partition-independent") {
    // 300 distinct items into a width-16 grid forces collisions in
    // every hash row; unlike MG the estimates must be IDENTICAL under
    // any partitioning (cells are commutative sums).
    val items = (1 to 300).flatMap(i => Seq.fill(1 + i % 7)(s"k$i"))
    def run(parts: Int): Map[String, Long] = {
      val df = spark.createDataset(items).toDF("item").repartition(parts)
      val sk = CountMin.sketch(df, "item", depth = 4, width = 16)
      CountMin.estimate(sk, df, "item", depth = 4, width = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val est1 = run(1)
    val est8 = run(8)
    assert(est1 === est8, "estimates changed under repartitioning")
    val exact = items.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    est1.foreach { case (t, e) =>
      assert(e >= exact(t), s"$t underestimated: $e < ${exact(t)}")
    }
    assert(est1.map { case (t, e) => e - exact(t) }.sum > 0,
      "width 16 over 300 keys must collide somewhere")
  }

  test("ppmi: window pair space is exact and real collocations score " +
      "positive") {
    val one = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val toks = one.select(col("doc_id"),
      posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("p", "tok")))
    val pairs = toks.select(col("doc_id"), col("p").as("pa"),
        col("tok").as("tok_a"))
      .join(toks.select(col("doc_id"), col("p").as("pb"),
        col("tok").as("tok_b")), Seq("doc_id"))
      .where(col("pb") > col("pa") && col("pb") - col("pa") <= 3)
    assert(pairs.count() === 9L) // 4+3+2 forward pairs within window 3
    val out = graft.QueriesO.t53.fn(spark, sf("sf0.001"))
      .select(col("ppmi")).collect().map(_.getDouble(0))
    assert(out.nonEmpty && out.exists(_ > 0.0),
      "corpus should contain positively-associated pairs")
  }

  test("phash block index finds exactly the brute-force hamming<=2 " +
      "pairs (recall 1.0)") {
    val assets = Multimodal.toAssets(
      graft.Tables.documents(spark, sf("sf0.001"))
        .where(length(col("text")) >= 64), "doc_id", "text", "image")
    val ph = Multimodal.aHash16(assets)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ida, ha) <- ph; (idb, hb) <- ph
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (ida, idb)).toSet
    val blocked = graft.QueriesO.mm6.fn(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute,
      s"blocked ${blocked.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "test corpus should contain near-dup rasters")
  }

  test("vocabulary cut is deterministic and oov accounting adds up") {
    val df = Seq((1L, "a a b", "s1"), (2L, "b c", "s2"))
      .toDF("doc_id", "text", "source")
    val vocab = TextAnalysis.vocabulary(df, "text", 2).collect()
      .map(_.getString(0)).toSeq
    assert(vocab === Seq("a", "b")) // freq 2/2/1, tie a<b
    val oov = TextAnalysis.oovByGroup(df, "text", "source", 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(oov === Map("s1" -> (3L, 0L), "s2" -> (2L, 1L)))
  }
}
