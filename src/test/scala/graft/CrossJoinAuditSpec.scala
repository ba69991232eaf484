package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}

/** Mechanized scale-hygiene audit #2 (companion to [[WindowAuditSpec]]):
  * walks the PHYSICAL plan of every catalog query and product twin and
  * fails on any cartesian pair loop — `CartesianProductExec`, or a
  * `BroadcastNestedLoopJoinExec` whose broadcast side is NOT a scalar
  * (global, zero-grouping-key) aggregate subtree — unless the query is
  * on the documented allowlist below.
  *
  * Scalar broadcasts (1-row aggregates carried to every row: corpus
  * totals, thresholds, quantile knot arrays) are exempted structurally:
  * they are O(1) payloads and the idiomatic alternative to a driver
  * collect. Everything else that multiplies rows must either be a
  * documented exact-oracle baseline (whose production twin avoids the
  * pair space) or a broadcast of a PROVABLY bounded frame (top-K,
  * dimension tables, sketches), each justified below.
  *
  * Self-policing like the window audit: an allowlist entry whose query
  * no longer plans a cartesian join fails as STALE.
  */
class CrossJoinAuditSpec extends SparkSpecBase {

  /** query name -> why its cartesian pair space is bounded/intended.
    * Two legitimate classes: (a) EXACT-ORACLE BASELINES — the
    * brute-force N×M pair loop IS the documented ground-truth side, and
    * the production twin (LSH/IVF bucketed equi-join) avoids it; (b)
    * BOUNDED BROADCASTS — the build side is provably small (top-K cut,
    * centroid table, calendar-bounded daily frame, per-source sketch
    * row) and a nested-loop against it is the idiomatic non-equi join.
    */
  private val bounded: Map[String, String] = Map(
    "ann2_ivf_topk" -> ("bounded broadcast: deterministic centroid table " +
      "(k cells) against vectors — IVF assignment is by construction a " +
      "vectors x centroids loop; probe join itself is cell equi-join"),
    "ann2b_ivf_multiprobe" -> "same centroid-assignment loop as ann2",
    "ann2c_ivf_learned" -> ("same centroid-assignment loop (learned " +
      "centroids); catalog form also carries the exact brute-force " +
      "recall-audit baseline, split out of the product twin"),
    "ann4_quantized_recall" -> ("exact-oracle baseline: quantized-vs-" +
      "float recall audit needs the exact pair loop as ground truth"),
    "ann8_hard_negatives" -> ("bounded broadcast: the designated anchor " +
      "subset (|A| << N) against the corpus — |A|·N by design, never " +
      "N²; at corpus scale composes over lshTopKAuto candidates"),
    "d9b_regime_broadcast_join" -> ("bounded broadcast: the regime " +
      "dimension (a handful of date ranges) non-equi joined on BETWEEN"),
    "e3_peer_effect_elasticity" -> ("bounded broadcast: distinct token " +
      "vocabulary (embedding-backed, corpus-bounded) re-joined for the " +
      "peer window; the bucketed twin j11b/windowAggBucketed is the " +
      "skew-scale path"),
    "e3c_peer_effect_timing" -> "e3's shape (same bounded vocabulary)",
    "e3d_peer_elasticity_lsh" -> "e3's exact regression side (audit twin)",
    "e3e_peer_grid" -> "e3's shape; grid derived by explode, not joins",
    "ann15_mmr_rerank" -> ("exact-oracle baseline: the brute-force " +
      "candidate pool is the documented ground truth (j12's argument); " +
      "r16's checkpoint-free mmrGreedy no longer truncates the plan, so " +
      "the pool's pair loop is visible here. The production twin " +
      "(mmrSelectLsh) draws its pool from lshTopKAuto buckets — no pair " +
      "loop (its plan carries only the fold over packed candidates)."),
    "j12_knn_cosine_top5" -> ("exact-oracle baseline: brute-force KNN " +
      "is the documented ground truth; lshTopK/ivfTopK are the scale " +
      "paths (ann1/ann2)"),
    "j12b_knn_k_sweep" -> "j12's pair loop, K as a dimension column",
    "m13_nearest_centroid" -> ("bounded broadcast: label-centroid table " +
      "(|labels| rows) against vectors"),
    "m67_silhouette" -> ("bounded broadcast: label-centroid table " +
      "(|labels| rows) against points — the N x k loop IS the " +
      "simplified-silhouette definition (m13's argument)"),
    // NOTE: m68_lof_outliers' exact kNN side is the same documented
    // exact-oracle baseline as j12, but lofScores materializes it
    // through an eager localCheckpoint (ann15's shape), so the returned
    // plan carries no cartesian node to allowlist; the production twin
    // (lofScoresLsh) builds its kNN from lshTopKAuto buckets.
    "m29_mann_kendall" -> ("bounded pair space: day-pair self-join over " +
      "the calendar-bounded daily aggregate (<= 30 rows/side)"),
    "m30_kendall_tau" -> "m29's calendar-bounded day-pair argument",
    "m34_knn_classify" -> ("exact-oracle baseline: Q×N vote loop; the " +
      "classifier composes over lshTopKAuto candidates at scale"),
    "m37_cramers_v" -> ("bounded broadcast: zero-filled contingency " +
      "grid scaffold (|types| x 7 rows)"),
    "m38_theil_sen" -> "m29's calendar-bounded day-pair argument",
    "m47_source_jsd" -> ("bounded broadcast: the global token " +
      "distribution (|vocab| rows, sketch-sized) crossed with the " +
      "per-source totals to build the |sources| x |vocab| scoring grid"),
    "m6_kmeans_clusters" -> ("bounded broadcast: k centroids against " +
      "vectors each Lloyd round — the assignment loop is the algorithm"),
    "m73_markov_transitions" -> ("bounded broadcast: the K x K state " +
      "grid (|event types|² rows) built from two tiny distinct frames " +
      "so Laplace smoothing covers unseen transitions — everything " +
      "after the (from, to) count shuffle is driver-scale algebra"),
    "t11_embedding_neardup" -> ("exact-oracle baseline: brute-force " +
      "near-dup ground truth; t11b's LSH-bucketed twin is the scale path"),
    "t57_semantic_dedup" -> ("exact-oracle baseline (brute-force pair " +
      "ground truth for the recall gate) + the bounded k-centroid " +
      "assignment loop; the product twin runs only the cell-blocked " +
      "equi-join path"),
    "t31_source_overlap" -> ("bounded pair space: per-SOURCE MinHash " +
      "signature rows (|sources|² pairs over union-merged sketches, " +
      "documents never pair)"),
    "ann9_pq_topk" -> ("exact-oracle baseline (brute-force recall ground " +
      "truth) + two bounded broadcasts: the m·ksub codebook against " +
      "vectors (PQ encoding IS the centroid-assignment loop, ann2's " +
      "argument) and the |Q|·m·ksub ADC lookup table; the candidate " +
      "scan itself is a (sub, code) equi-join"),
    "ann10_retrieval_metrics" -> ("exact-oracle baseline: the evaluated " +
      "run is the Q×N brute-force ground-truth ranking (m34's argument); " +
      "the product twin scores the same metrics over lshTopKAuto " +
      "candidates with no pair loop"),
    "ann11_mips_topk" -> ("exact-oracle baseline: brute-force Q×N inner " +
      "products are the MIPS ground truth; ann11b's SIMPLE-LSH " +
      "augmented-bucket path is the sublinear twin (its exact audit " +
      "side is plan-truncated by localCheckpoint)"),
    "ann12_matryoshka_recall" -> ("exact-oracle baseline, BOTH sides by " +
      "design: the audit compares two exact brute-force rankings (full " +
      "vs prefix-truncated) to measure what truncation itself loses — " +
      "an approximate side would conflate index recall with truncation " +
      "recall. At corpus scale the audit runs on a query sample; the " +
      "product twin is lshTopKAuto over the truncated vectors (bucketed " +
      "equi-join, no pair loop)"),
    "ann13_rank_biased_overlap" -> ("exact-oracle baseline, both sides " +
      "by design (ann12's argument applied to ORDER agreement): RBO " +
      "compares two exact rankings; the rankBiasedOverlap operator " +
      "itself is one equi-join over the run frames"))

  /** True when the plan subtree is a global aggregate (no grouping
    * keys) possibly wrapped in exchanges/projections — a 1-row scalar.
    */
  private def isScalarSubtree(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case other if other.children.size == 1 =>
      isScalarSubtree(other.children.head)
    case _ => false
  }

  private def cartesians(plan: SparkPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
        case c: CartesianProductExec =>
          out += s"CartesianProduct"
          c.children.foreach(walk)
        case b: BroadcastNestedLoopJoinExec =>
          val build = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case _ => b.right
          }
          if (!isScalarSubtree(build))
            out += s"BroadcastNestedLoopJoin(non-scalar build)"
          b.children.foreach(walk)
        case _ => p.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.result()
  }

  test("every catalog + product query is free of cartesian pair loops " +
      "outside the documented allowlist") {
    val dir = sf("sf0.001")
    val catalog =
      (SparkEntry.queries.toSeq ++
        SparkEntry.productQueries.toSeq.map { case (n, f) =>
          (s"$n.__product", f)
        }).sortBy(_._1)
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val hits = scala.collection.mutable.Set[String]()
    catalog.foreach { case (name, fn) =>
      val found = cartesians(fn(spark, dir).queryExecution.executedPlan)
      if (found.nonEmpty) {
        val base = name.stripSuffix(".__product")
        if (bounded.contains(base) || bounded.contains(name)) hits += base
        else offenders += s"$name: ${found.mkString("; ")}"
      }
    }
    val stale = bounded.keySet.filterNot(k =>
      hits.contains(k) || hits.contains(k.stripSuffix(".__product")))
    assert(offenders.isEmpty,
      s"undocumented cartesian joins:\n${offenders.mkString("\n")}")
    assert(stale.isEmpty, s"STALE allowlist entries: $stale")
  }
}
