package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10x scale probes ON THE RECORD (VERDICT r7 #5): the "survives 100x"
  * grade for the dedup/CC/graph family previously rested on plan-shape
  * argument plus one README A/B (`LshAb`); this puts measured medians at
  * 1x and 10x into the bench artifact (`atScale` section) each round.
  *
  * Probes (the three the verdict named):
  *   - t17_cc — MinHash-LSH pairs -> connected components -> survivor
  *     pick (`Dedup.nearDupClusters`) over the documents corpus vs a 10x
  *     replica whose copies are strong near-dups (each copy differs in
  *     one trailing token — the LshAb corpus): candidate pair space
  *     grows ~45 pairs per source doc and every copy-set becomes one
  *     CC component, so banding, verify, AND the iterative min-label
  *     propagation are all genuinely exercised.
  *   - t7_jaccard — exact n-gram Jaccard via the inverted-index posting
  *     join with the hub cap (`Dedup.jaccardPairs`, maxShingleFreq=100,
  *     the t17-query config): at 10x every shingle's posting list grows
  *     10x (pair space ~100x where the cap admits it), which is exactly
  *     the blow-up the frequency cap exists to bound.
  *   - g5_labelprop — bounded min-label propagation
  *     (`Graph.labelPropagate`, 2 rounds) over a deterministic synthetic
  *     ring+chord graph at 100K vs 1M edges: the catalog g5's cost is
  *     dominated by deriving its 500-edge backbone, so scaling the
  *     OPERATOR needs an edge set that actually grows.
  *   - ann_lsh_topk — the ANN scale path (ann1's product plan) over a
  *     10x jittered vector corpus, with the plane count re-sized by the
  *     occupancy-constant rule (`Similarity.planesForCorpus`) the way a
  *     deployment re-sizes its index as the corpus grows.
  *   - t42_span_scrub (round 8) — the per-doc positionedTokens family
  *     (repeated-span scrub): every shuffle keys on doc_id, so the
  *     probe pins the ~linear-in-corpus claim for t42/t43.
  *
  * Each probe: 1 untimed warm rep (which also records result counts at
  * both scales — a probe whose output collapses would fake its ratio),
  * then 3 timed reps, median reported. A scaled/base wall ratio well
  * under factor x (super-linear would be the red flag; ~linear or
  * better is the pass) is the recorded evidence that the plan shape
  * holds as data grows.
  */
object ScaleProbe {

  private def medianOf(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def timeCount(f: () => DataFrame): (Double, Long) = {
    val n = f().count() // warm + result size
    val reps = (1 to 3).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      f().count()
      (System.nanoTime() - t0) / 1e9
    }
    (medianOf(reps), n)
  }

  /** Ring + long-chord graph: connected, deterministic, edge count 2n. */
  private def chordGraph(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("s1"), ((col("id") + 1) % n).as("s2"))
      .unionAll(spark.range(n)
        .select(col("id").as("s1"), ((col("id") + 7919) % n).as("s2")))

  /** Runs the probes and returns the `atScale` JSON object body. */
  def run(spark: SparkSession, sfDir: String, factor: Int): String = {
    import graft.operators.{Dedup, Graph, Similarity, TextAnalysis}
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint(true)
    // LshAb's replication: copies are near-dups (one trailing token
    // differs) so the near-dup probes exercise verify/CC, not just scan.
    val docsBig = docs
      .select(explode(sequence(lit(0), lit(factor - 1))).as("c"),
        col("doc_id"), col("text"))
      .select((col("doc_id") * factor + col("c")).as("doc_id"),
        concat(col("text"), lit(" zz"), col("c")).as("text"))
      .localCheckpoint(true)

    // ANN scale path (ann1's product plan): 10x the vector corpus, each
    // copy deterministically jittered in one dimension so copies are
    // near- but not exact neighbors — per-table bucket occupancy grows
    // 10x, which is what the banded hyperplane join must absorb.
    // k/planes/tables pinned to the catalog config.
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val embBig = emb
      .select(explode(sequence(lit(0), lit(factor - 1))).as("c"),
        col("vec_id"), col("embedding"))
      .select((col("vec_id") * factor + col("c")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + col("c").cast("float") * lit(0.001f))
            .otherwise(x)).as("embedding"))
      .localCheckpoint(true)

    // The hyperplane family's scale knob is planes ∝ log2(N)
    // (occupancy-constant — Similarity.planesForCorpus): at FIXED
    // planes=4 the 10x side measured 34x the base wall (bucket
    // occupancy 10x → per-bucket pairs ~100x). The probe runs the
    // configuration a deployment would: catalog planes (4) at 1x,
    // re-sized planes at 10x with occupancy held at the catalog
    // operating point (N / 2^4).
    val nBase = emb.count()
    val planesBig = Similarity.planesForCorpus(nBase * factor,
      math.max(1, (nBase >> 4).toInt))

    // g5 runs FIRST: its base side is the cheapest probe and sits
    // closest to the fixed-cost floor, so shuffle/GC debt left behind by
    // the heavy near-dup probes would bias exactly the number that can
    // least absorb it (measured: base 8.2 s after t7's 10x side vs
    // 3.0 s clean).
    val baseEdges = 100000L
    val probes: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("g5_labelprop",
        () => Graph.labelPropagate(chordGraph(spark, baseEdges), rounds = 2),
        () => Graph.labelPropagate(
          chordGraph(spark, baseEdges * factor), rounds = 2)),
      ("t17_cc",
        () => Dedup.nearDupClusters(docs, "text", "doc_id"),
        () => Dedup.nearDupClusters(docsBig, "text", "doc_id")),
      ("t7_jaccard",
        () => Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.3, 100),
        () => Dedup.jaccardPairs(docsBig, "text", "doc_id", 3, 0.3, 100)),
      // Per-doc span work (round 8): all shuffles key on doc_id, so the
      // scrub should scale ~linearly with the corpus — the probe pins
      // that claim for the whole positionedTokens family (t42/t43).
      ("t42_span_scrub",
        () => TextAnalysis.repeatedSpanScrub(docs, "doc_id", "text", k = 3),
        () => TextAnalysis.repeatedSpanScrub(docsBig, "doc_id", "text",
          k = 3)),
      ("ann_lsh_topk",
        () => Similarity.lshTopK(emb, "vec_id", "embedding", k = 5,
          numPlanes = 4, numTables = 8, dim = Tables.embeddingDim),
        () => Similarity.lshTopK(embBig, "vec_id", "embedding", k = 5,
          numPlanes = planesBig, numTables = 8,
          dim = Tables.embeddingDim)),
      // Misra-Gries (round 8, part O): the sketch's entire claim is that
      // shuffle volume is partitions × k regardless of corpus size — the
      // probe pins ~linear wall growth (scan-bound, k=8 forces constant
      // decrementing against the 31-token stream).
      ("m43_mg_sketch",
        () => {
          import spark.implicits._
          graft.operators.HeavyHitters.misraGries(
            docs.select(explode(split(lower(trim(col("text"))), "\\s+"))
              .as("token")).where(length(col("token")) > 0).as[String], 8)
        },
        () => {
          import spark.implicits._
          graft.operators.HeavyHitters.misraGries(
            docsBig.select(explode(split(lower(trim(col("text"))), "\\s+"))
              .as("token")).where(length(col("token")) > 0).as[String], 8)
        }),
      // mm6's phash block join is deliberately NOT probed at 10x: a
      // 16-bit aHash saturates by birthday effect near 50K assets (the
      // RESULT grows ~quadratically, so a wall ratio measures output
      // size, not join shape). The pigeonhole equi-join's scale
      // evidence is t49's 64-bit SimHash twin — same block-index shape,
      // collision-free hash width.
      )

    val entries = probes.map { case (name, baseFn, bigFn) =>
      val (baseS, baseN) = timeCount(baseFn)
      val (bigS, bigN) = timeCount(bigFn)
      val ratio = bigS / math.max(baseS, 1e-9)
      s""""$name":{"factor":$factor,"base_s":${f"$baseS%.3f"}""" +
        s""","scaled_s":${f"$bigS%.3f"},"wall_ratio":${f"$ratio%.2f"}""" +
        s""","base_rows":$baseN,"scaled_rows":$bigN}"""
    }
    entries.mkString("{", ",", "}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[at-scale] ${run(spark, sfDir, factor)}")
    spark.stop()
  }
}
