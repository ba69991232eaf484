package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Hand-checkable invariants for the part-P operator family. */
class PartPSpec extends SparkSpecBase {
  import spark.implicits._

  test("target encoding is leakage-free: a fold's encoding ignores its " +
      "own targets") {
    val base = Seq(
      ("a", 1.0, 0L), ("a", 2.0, 0L), ("a", 3.0, 1L), ("a", 4.0, 1L),
      ("b", 5.0, 0L), ("b", 6.0, 1L))
      .toDF("cat", "y", "fold")
    // poison fold 0 of category a: its own-fold targets explode, but
    // enc(a, 0) is built from fold 1 only, so it must not move
    val poisoned = Seq(
      ("a", 1000.0, 0L), ("a", 2000.0, 0L), ("a", 3.0, 1L), ("a", 4.0, 1L),
      ("b", 5.0, 0L), ("b", 6.0, 1L))
      .toDF("cat", "y", "fold")
    def enc(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Double] =
      FeatureEng.targetEncode(df, "cat", "y", "fold", smoothing = 0.0)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          r.getDouble(3)).toMap
    val e0 = enc(base)
    // hand value: enc(a,0) = mean of fold-1 targets = (3+4)/2
    assert(math.abs(e0(("a", 0L)) - 3.5) < 1e-9)
    assert(math.abs(e0(("a", 1L)) - 1.5) < 1e-9)
    val e1 = enc(poisoned)
    assert(e1(("a", 0L)) === e0(("a", 0L)),
      "own-fold targets leaked into the encoding")
    // the OTHER fold must see the poison (it is its training data)
    assert(e1(("a", 1L)) !== e0(("a", 1L)))
  }

  test("feature hashing: fixed dim space, weights sum token signs, " +
      "identical tokens collapse") {
    val df = Seq((1L, "x x y"), (2L, "x")).toDF("doc_id", "text")
    val out = FeatureEng.featureHash(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out.keys.forall { case (_, dim) => dim >= 0 && dim < 8 })
    // doc 2 has one token, weight must be +-1 in exactly one dim
    val d2 = out.filter(_._1._1 == 2L)
    assert(d2.size === 1 && math.abs(d2.head._2) === 1L)
    // doc 1: "x" twice -> x's dim carries weight 2*sign(x)
    val (xDim, xW) = d2.head
    assert(out((1L, xDim._2)) === 2 * xW ||
      // unless y hashes into x's dim, in which case +-1 offsets
      math.abs(out((1L, xDim._2)) - 2 * xW) === 1L)
  }

  test("jsd: identical distribution scores 0, disjoint vocabularies " +
      "score ln 2") {
    // src 'a' == the corpus half it contributes; against a corpus where
    // the other half is disjoint, both sources sit strictly inside
    // (0, ln 2); a one-source corpus scores exactly 0.
    def jsdOf(rows: Seq[(Long, String, String)]): Map[String, Double] = {
      val df = rows.toDF("doc_id", "text", "source")
      val dir = java.nio.file.Files.createTempDirectory("jsd").toString
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // reuse the catalog plan by pointing Tables at the temp layout:
      // only documents is read by m47
      graft.QueriesP.m47.fn(spark, dir)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    }
    val same = jsdOf(Seq((1L, "x y z", "a"), (2L, "x y z", "a")))
    assert(math.abs(same("a")) < 1e-9)
    val split = jsdOf(Seq((1L, "x x y", "a"), (2L, "u u v", "b")))
    // each source is exactly half the corpus with a disjoint vocab:
    // jsd(p, mix) = ln 2 - H-mixing term; hand value: p has mass only
    // where q = p/2... jsd = ln(2) - 0.5*ln(2) ... compute directly:
    // p = (2/3, 1/3) on {x,y}; q = (1/3, 1/6) on them; m = (1/2, 1/4)
    // tp = 2/3 ln(4/3) + 1/3 ln(4/3) = ln(4/3)
    // tq over ALL tokens: on x,y: 1/3 ln(2/3) + 1/6 ln(2/3);
    //   on u,v (p=0): 1/3 ln 2 + 1/6 ln 2
    // jsd = (ln(4/3) + 0.5 ln(2/3) + 0.5 ln 2)/2
    val expected = (math.log(4.0 / 3) + 0.5 * math.log(2.0 / 3) +
      0.5 * math.log(2.0)) / 2
    assert(math.abs(split("a") - expected) < 1e-6, s"got ${split("a")}")
    assert(math.abs(split("b") - expected) < 1e-6)
  }

  test("orc roundtrip preserves schema and values") {
    import graft.sources.{Readers, Writers}
    val df = Seq((1L, "a", 1.5, java.sql.Date.valueOf("2024-01-02")),
      (2L, "b", -0.25, java.sql.Date.valueOf("2024-02-03")))
      .toDF("id", "k", "v", "d")
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    Writers.writeOrc(df, s"$dir/t")
    val back = Readers.readOrc(spark, s"$dir/t")
    // nullable flattens to true through any file format; names+types
    // must survive exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("personalized pagerank: mass stays on the seed side, non-seed " +
      "sources score zero, total rank bounded by 1") {
    // star: seed 1 -> {10, 11}; disconnected 2 -> 20
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 10L, 11L, 20L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    val ppr = Graph.pageRankPersonalized(nodes, "id", edges, "src", "dst",
      seeds, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr(2L) === 0.0 && ppr(20L) === 0.0,
      "rank reached a component with no seed")
    assert(ppr(1L) > 0 && ppr(10L) > 0 && ppr(11L) > 0)
    assert(math.abs(ppr(10L) - ppr(11L)) < 1e-12, "symmetric leaves differ")
    assert(ppr.values.sum <= 1.0 + 1e-9)
  }
}
