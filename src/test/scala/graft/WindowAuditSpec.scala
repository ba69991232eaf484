package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Mechanized scale-hygiene audit: walks the PHYSICAL plan of every
  * catalog query (and every product-side twin) and fails on any
  * `WindowExec` with an empty partition spec — the "Moving all data to a
  * single partition" shape that melts at 100 TB — unless the query is on
  * the documented bounded-frame allowlist below.
  *
  * The allowlist is self-policing: an entry whose query no longer plans
  * an unpartitioned window fails the audit as STALE, so the list can't
  * rot into a blanket waiver. Every entry's justification states the
  * bound that keeps the single partition physically small (rows already
  * reduced before the window, or a frame bounded by a constant).
  */
class WindowAuditSpec extends SparkSpecBase {

  /** query name -> why its unpartitioned window is bounded. */
  private val bounded: Map[String, String] = Map(
    "e3c_peer_effect_timing" -> ("global p95 over `joined` = one row per " +
      "probe event (purchases semi-joined to the embedding vocabulary) — " +
      "already KNN-reduced; the measured alternative (agg+crossJoin) " +
      "defeats ReuseExchange and runs the dominant KNN subtree twice " +
      "(QueriesD.scala rationale comment)"),
    "m11_chi_square" -> "contingency cells: |event_type| x 7 weekdays rows",
    "m11b_chi_square_p" -> "same contingency-cell frame as m11",
    "m18_benford" -> "9 leading-digit rows",
    "m22_ks_test" -> ("rangePrefixSum second pass: frame is per-partition " +
      "subtotals, <= spark.sql.shuffle.partitions rows (Stats.scala)"),
    "m24_auc_score" -> "rangePrefixSum subtotal frame, <= numParts rows",
    "m60_average_precision" ->
      "rangePrefixSum subtotal frame, <= numParts rows",
    "m64_cumulative_gains" ->
      "rangePrefixSum subtotal frame, <= numParts rows",
    "m27_spearman_corr" -> "rangePrefixSum subtotal frame, <= numParts rows",
    "m51_mann_whitney" -> "rangePrefixSum subtotal frame, <= numParts rows",
    "m55_conformal" -> ("rangePrefixSum subtotal frame, <= numParts rows " +
      "(the calibration-residual rank that picks the conformal quantile)"),
    "m56_bh_fdr" -> ("BH step-up runs on the TEST frame — one row per " +
      "group/segment (facts reduced first by the chi-square aggregate); " +
      "the rank/threshold windows ride segment count, never data size"),
    "t64_zipf_fit" -> ("rank over the top-N token frame — post-limit, " +
      "bounded by the topN constant (100 rows) regardless of corpus size"),
    "t66_interleaved_order" -> ("source-index rank + count over the " +
      "DISTINCT-source frame (|sources| rows); per-doc ranks partition " +
      "by source"),
    "m22b_ks_test_window" -> ("documented bounded-cardinality twin of " +
      "m22 (distinct discretized values); m22's range-partitioned shape " +
      "is the scale path"),
    "m28_mutual_information" -> "joint-distribution cells: |x| x |y| rows",
    "m37_cramers_v" -> "full contingency grid: |types| x 7 rows",
    "w29_cusum_changepoint" -> "calendar-bounded daily frame (m29's argument)",
    "w30_rolling_corr" -> "calendar-bounded daily frame (m29's argument)",
    "m41_runs_test" -> "calendar-bounded daily frame (m29's argument)",
    "m42_markov_entropy" -> "transition cells: |types| x |types| rows",
    "m44_kaplan_meier" -> ("duration grid: one row per distinct " +
      "inter-purchase gap length, calendar-bounded (<= 31 rows) after " +
      "the per-purchase window + groupBy reduction"),
    "m74_qdigest_quantiles" -> ("postorder cumulative sweep over the " +
      "q-digest RETAINED-NODE frame: <= 2^(bits+1) rows by construction " +
      "(the dyadic universe tree, bits = 10 here), independent of N — " +
      "the facts are reduced by the leaf-histogram groupBy first"),
    "w2_rolling_mean_7" -> "daily calendar frame: one row per day",
    "w3_rolling_stats" -> "daily calendar frame: one row per day",
    "w4_pct_change" -> "daily calendar frame: one row per day",
    "w6_cumprod_equity" -> "daily calendar frame: one row per day")

  private def unpartitionedWindows(plan: SparkPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
        case w: WindowExec =>
          if (w.partitionSpec.isEmpty)
            out += w.windowExpression.map(_.sql).mkString("; ").take(200)
          w.children.foreach(walk)
        case _ => p.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.result()
  }

  test("every catalog + product query is free of unpartitioned windows " +
      "outside the bounded allowlist") {
    val dir = sf("sf0.001")
    val catalog: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] =
      (SparkEntry.queries.toSeq ++
        SparkEntry.productQueries.toSeq.map { case (n, f) =>
          (s"$n.__product", f)
        }).sortBy(_._1)
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val hits = scala.collection.mutable.Set[String]()
    catalog.foreach { case (name, fn) =>
      val wins =
        unpartitionedWindows(fn(spark, dir).queryExecution.executedPlan)
      if (wins.nonEmpty) {
        hits += name
        if (!bounded.contains(name))
          offenders += s"$name: ${wins.mkString(" | ")}"
      }
    }
    assert(offenders.isEmpty,
      s"\nunpartitioned WindowExec outside allowlist:\n" +
        offenders.mkString("\n"))
    val stale = bounded.keySet -- hits
    assert(stale.isEmpty,
      s"stale allowlist entries (no unpartitioned window anymore): $stale")
  }
}
