package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.{Graph, Sampling, Similarity, Stats}

/** Catalog part V (round 12, batch 2): the distribution-shape and
  * structure-mining battery a curation stack runs BEFORE trusting its
  * Gaussian-assuming monitors — normality (Jarque–Bera) and
  * variance-equality (Brown–Forsythe) screens, confounder-adjusted
  * correlation, cumulative-gains/lift model evaluation — plus
  * link-prediction (Adamic–Adar) and mutual-reinforcement ranking
  * (HITS) over the co-purchase graph, variance-optimal stratified
  * sampling (Neyman allocation), attribute-filtered vector retrieval,
  * and Bollinger-band breakout detection on the daily series.
  */
object QueriesV {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // M61 — Jarque–Bera normality screen per event segment: two-pass
  // population moments → skewness/kurtosis → JB. At dof 2 the χ²
  // survival is exactly exp(−JB/2), so even the p-value is oracled
  // (unlike the F battery's bracket oracle). A long-tailed `value`
  // column fails this screen before anyone points a z-score monitor at
  // it. Squares are written as products (not pow) on BOTH sides so the
  // engines execute the same fp ops.
  val m61 = Q("m61_jarque_bera",
    (s, d) => Stats.jarqueBera(ev(s, d), "event_type", "value"),
    Some("""WITH g AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        avg(value) AS mu FROM events WHERE value IS NOT NULL GROUP BY 1),
      m AS (SELECT e.event_type, any_value(g.n) AS n,
        avg((value - mu) * (value - mu)) AS m2,
        avg((value - mu) * (value - mu) * (value - mu)) AS m3,
        avg((value - mu) * (value - mu) * (value - mu) * (value - mu)) AS m4
        FROM events e JOIN g USING (event_type)
        WHERE value IS NOT NULL GROUP BY 1),
      st AS (SELECT event_type, n,
        m3 / pow(m2, 1.5) AS sk, m4 / (m2 * m2) AS ku FROM m),
      jb AS (SELECT event_type, n, sk, ku,
        n / 6.0 * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0) AS jb FROM st)
      SELECT event_type, CAST(n AS BIGINT) AS n,
        round(sk + 1e-9, 6) AS skewness,
        round(ku + 1e-9, 6) AS kurtosis,
        round(jb + 1e-9, 4) AS jb_stat,
        round(exp(-jb / 2.0) + 1e-9, 6) AS p_value
      FROM jb"""))

  // M62 — Brown–Forsythe variance-equality test (Levene with group
  // medians): |x − median_g| deviations through the one-way ANOVA
  // machinery. The homoscedasticity gate in front of pooled-variance
  // tests and plain OLS; median-based so m61's heavy tails don't fake a
  // variance difference. W statistic fully oracled (m4's sufficient-
  // statistics form); DuckDB median = quantile_cont(0.5), the same
  // interpolated percentile Spark's `percentile` computes.
  val m62 = Q("m62_levene_bf",
    (s, d) => Stats.leveneBrownForsythe(ev(s, d), "event_type", "value"),
    Some("""WITH med AS (SELECT event_type, median(value) AS med
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      z AS (SELECT e.event_type, abs(value - med) AS z
        FROM events e JOIN med USING (event_type) WHERE value IS NOT NULL),
      g AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n_g,
        avg(z) AS mean_g, var_samp(z) AS var_g FROM z GROUP BY 1),
      t AS (SELECT sum(n_g) AS n, CAST(count(*) AS DOUBLE) AS k,
        sum(n_g * mean_g) / sum(n_g) AS gm,
        sum(n_g * mean_g * mean_g) AS snm2,
        sum((n_g - 1) * var_g) AS ssw FROM g)
      SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        round(((snm2 - n * gm * gm) / (k - 1)) / (ssw / (n - k)) + 1e-9, 6)
          AS w_stat,
        CAST(k - 1 AS BIGINT) AS df_between,
        CAST(n - k AS BIGINT) AS df_within
      FROM t"""))

  // M63 — first-order partial correlation r(price, quantity | discount)
  // on lineitem: does extended price still track quantity once the
  // discount is held fixed? Closed form from the three pairwise Pearson
  // correlations in ONE aggregate pass — the confounder screen that
  // doesn't materialize residuals.
  val m63 = Q("m63_partial_corr",
    (s, d) => Stats.partialCorr(Tables.lineitem(s, d),
      col("l_extendedprice"), col("l_quantity"), col("l_discount")),
    Some("""WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        corr(l_extendedprice, l_quantity) AS rxy,
        corr(l_extendedprice, l_discount) AS rxz,
        corr(l_quantity, l_discount) AS ryz FROM lineitem)
      SELECT n, round(rxy + 1e-9, 6) AS r_xy,
        round(rxz + 1e-9, 6) AS r_xz, round(ryz + 1e-9, 6) AS r_yz,
        CASE WHEN (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0.0
          THEN round((rxy - rxz * ryz) /
            sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) + 1e-9, 6)
          END AS r_xy_given_z
      FROM c"""))

  // M64 — cumulative gains / lift table at deciles: rank events by
  // value (purchases = positives), cut into 10 equal-depth bins, report
  // per-bin capture and cumulative lift vs the base rate — the
  // model-free "is the top of this ranking worth paying for" read
  // behind every curation threshold. Ranks ride rangePrefixSum (m60's
  // discipline — never an unpartitioned data-sized window); the bin id
  // is integer algebra both engines compute identically; cumulative
  // counts fall out of MAX(prefix) per bin, no second window.
  val m64 = Q("m64_cumulative_gains",
    (s, d) => Stats.cumulativeGains(
      ev(s, d).where(col("value").isNotNull &&
        col("event_type").isin("purchase", "view"))
        .select((-col("value")).as("__nv"), col("event_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("rel")),
      Seq("__nv", "event_id"), "rel", buckets = 10),
    Some("""WITH e AS (SELECT event_id, value,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
        FROM events WHERE value IS NOT NULL
          AND event_type IN ('purchase', 'view')),
      r AS (SELECT rel,
        row_number() OVER (ORDER BY value DESC, event_id) AS rk,
        sum(rel) OVER (ORDER BY value DESC, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
        count(*) OVER () AS n, sum(rel) OVER () AS p FROM e),
      b AS (SELECT CAST(floor((rk * 10.0 + n - 1) / n) AS BIGINT)
          AS bucket, rel, rk, cum_pos, n, p FROM r)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(rel) AS BIGINT) AS n_pos,
        CAST(max(rk) AS BIGINT) AS cum_rows,
        CAST(max(cum_pos) AS BIGINT) AS cum_pos,
        round(CAST(max(cum_pos) AS DOUBLE) / any_value(p) + 1e-9, 6)
          AS gain,
        round((CAST(max(cum_pos) AS DOUBLE) / max(rk)) /
          (CAST(any_value(p) AS DOUBLE) / any_value(n)) + 1e-9, 6) AS lift
      FROM b GROUP BY 1"""))

  // G12 — Adamic–Adar link prediction over the supplier co-purchase
  // backbone: score non-adjacent pairs by Σ 1/ln(deg) of their shared
  // neighbors — the friends-of-friends recommender prior, discounted by
  // hub promiscuity. Candidates come only from the wedge equi-join
  // (2-hop paths), never a pair cross product; the integer n_common
  // floor bounds output deterministically (no fp-ordered LIMIT). Oracle
  // re-derives every pair from the naive wedge self-join.
  val g12 = Q("g12_adamic_adar",
    (s, d) => Graph.adamicAdar(QueriesG.backbone(s, d), minCommon = 1),
    Some("""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      p AS (SELECT a.sp AS s1, b.sp AS s2, count(*) AS sc
        FROM e0 a JOIN e0 b ON a.c = b.c AND a.sp < b.sp GROUP BY 1, 2),
      e AS (SELECT s1, s2 FROM p ORDER BY sc DESC, s1, s2 LIMIT 500),
      und AS (SELECT s1 AS z, s2 AS nb FROM e
        UNION ALL SELECT s2, s1 FROM e),
      deg AS (SELECT z, count(*) AS d FROM und GROUP BY 1),
      wedge AS (SELECT n1.nb AS x, n2.nb AS y, n1.z AS z
        FROM und n1 JOIN und n2 ON n1.z = n2.z AND n1.nb < n2.nb),
      cand AS (SELECT w.x, w.y, count(*) AS n_common,
          sum(1.0 / ln(deg.d)) AS aa
        FROM wedge w JOIN deg ON deg.z = w.z
        LEFT JOIN e ON e.s1 = w.x AND e.s2 = w.y
        WHERE e.s1 IS NULL GROUP BY 1, 2)
      SELECT x, y, CAST(n_common AS BIGINT) AS n_common,
        round(aa + 1e-9, 6) AS aa_score
      FROM cand WHERE n_common >= 1"""))

  // G13 — HITS hubs and authorities over the directed buyer→supplier
  // graph, 2 mutual-reinforcement rounds with L2 normalization after
  // every half-step: authorities rank suppliers by the strength of the
  // buyers backing them (degree-adjusted, unlike a raw count); hubs
  // rank buyers by the authority of what they buy. The oracle unrolls
  // the same two rounds as chained CTEs with scalar-subquery norms —
  // identical algebra, no iteration construct.
  val g13 = Q("g13_hits",
    (s, d) => Graph.hits(
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .distinct(),
      "c", "sp", iters = 2),
    Some("""WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      a1 AS (SELECT s, CAST(count(*) AS DOUBLE) AS a FROM e GROUP BY 1),
      a1n AS (SELECT s, a / (SELECT sqrt(sum(a * a)) FROM a1) AS a FROM a1),
      h1 AS (SELECT c, sum(a) AS h FROM e JOIN a1n USING (s) GROUP BY 1),
      h1n AS (SELECT c, h / (SELECT sqrt(sum(h * h)) FROM h1) AS h FROM h1),
      a2 AS (SELECT s, sum(h) AS a FROM e JOIN h1n USING (c) GROUP BY 1),
      a2n AS (SELECT s, a / (SELECT sqrt(sum(a * a)) FROM a2) AS a FROM a2),
      h2 AS (SELECT c, sum(a) AS h FROM e JOIN a2n USING (s) GROUP BY 1),
      h2n AS (SELECT c, h / (SELECT sqrt(sum(h * h)) FROM h2) AS h FROM h2)
      SELECT 'hub' AS side, c AS node, round(h + 1e-9, 6) AS score
      FROM h2n
      UNION ALL
      SELECT 'authority' AS side, s AS node, round(a + 1e-9, 6) AS score
      FROM a2n"""))

  // T68 — Neyman-allocation stratified sampling over the document
  // corpus: budget 1000 rows split across sources ∝ N_h·σ_h(n_chars) —
  // the allocation that minimizes stratified-mean variance at fixed
  // budget (vs proportional allocation over-sampling homogeneous
  // strata). Draws are md5-rank deterministic (the t9 convention), so
  // the oracle re-derives not just the counts but the exact sampled-id
  // checksum per stratum.
  val t68 = Q("t68_neyman_allocation",
    (s, d) => Sampling.neymanAllocation(
      docs(s, d), "source", "n_chars", "doc_id", nTotal = 1000),
    Some("""WITH st AS (SELECT source, count(*) AS n_pop,
        coalesce(stddev_pop(n_chars), 0) AS sigma
        FROM documents GROUP BY 1),
      den AS (SELECT sum(n_pop * sigma) AS den FROM st),
      alloc AS (SELECT source, n_pop, sigma,
        least(n_pop, CAST(round(1000 * n_pop * sigma / den + 1e-9, 0)
          AS BIGINT)) AS n_alloc FROM st, den),
      rk AS (SELECT source, doc_id, row_number() OVER (PARTITION BY source
        ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn FROM documents),
      smp AS (SELECT rk.source, count(*) AS n_sampled,
        sum(doc_id) AS id_checksum
        FROM rk JOIN alloc USING (source) WHERE rn <= n_alloc GROUP BY 1)
      SELECT alloc.source, CAST(n_pop AS BIGINT) AS n_pop,
        round(sigma + 1e-9, 6) AS sigma, n_alloc,
        CAST(coalesce(n_sampled, 0) AS BIGINT) AS n_sampled,
        CAST(coalesce(id_checksum, 0) AS BIGINT) AS id_checksum
      FROM alloc LEFT JOIN smp USING (source)"""))

  // ANN14 — attribute-filtered exact top-k retrieval: "nearest
  // neighbors WHERE label = query's label" — the tenant-scoped /
  // class-scoped vector search every production RAG stack runs. The
  // filter attribute IS the blocking key (label equi-join), so the pair
  // space is Σ n_label², never N², and the result can never be starved
  // the way post-filtering an unconstrained index at low selectivity
  // is. Exact within blocks, ties by neighbor id (j12's convention).
  val ann14 = Q("ann14_filtered_knn",
    (s, d) => Similarity.filteredTopK(
      Tables.embeddings(s, d), "vec_id", "embedding", "label", k = 5),
    Some("""WITH pairs AS (SELECT a.vec_id AS query_id, a.label AS block,
        b.vec_id AS neighbor_id,
        list_cosine_similarity(a.embedding::DOUBLE[],
          b.embedding::DOUBLE[]) AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
      SELECT query_id, block, neighbor_id, rank,
        round(cosine + 1e-9, 6) AS cosine
      FROM r WHERE rank <= 5"""))

  // W31 — Bollinger-band breakout detection on the per-type daily
  // series: 7-day rolling mean ± 2·stddev bands (strict — bands appear
  // only once the window is full, w2's min_periods convention), flag
  // the days that pierce them. The volatility-adjusted twin of m5's
  // global z-score anomaly: a quiet series gets tight bands, a noisy
  // one wide — same day-grain window partitioned by type.
  val w31 = Q("w31_bollinger_breakout",
    (s, d) => {
      val daily = ev(s, d).where(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(avg(col("value")).as("__v"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      daily
        .withColumn("__c", count(lit(1)).over(w))
        .withColumn("__ma", avg(col("__v")).over(w))
        .withColumn("__sd", stddev_samp(col("__v")).over(w))
        .select(col("event_type"), col("day"),
          round(col("__v") + lit(1e-9), 6).as("daily_value"),
          when(col("__c") === 7, round(col("__ma") + lit(1e-9), 6))
            .as("ma7"),
          when(col("__c") === 7,
            round(col("__ma") + col("__sd") * 2.0 + lit(1e-9), 6))
            .as("upper_band"),
          when(col("__c") === 7,
            round(col("__ma") - col("__sd") * 2.0 + lit(1e-9), 6))
            .as("lower_band"),
          when(col("__c") === 7 &&
            (col("__v") > col("__ma") + col("__sd") * 2.0 ||
              col("__v") < col("__ma") - col("__sd") * 2.0), 1L)
            .otherwise(0L).as("breakout"))
    },
    Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        avg(value) AS v FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      r AS (SELECT event_type, day, v, count(*) OVER w AS c,
        avg(v) OVER w AS ma, stddev_samp(v) OVER w AS sd
        FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT event_type, day, round(v + 1e-9, 6) AS daily_value,
        CASE WHEN c = 7 THEN round(ma + 1e-9, 6) END AS ma7,
        CASE WHEN c = 7 THEN round(ma + 2 * sd + 1e-9, 6) END
          AS upper_band,
        CASE WHEN c = 7 THEN round(ma - 2 * sd + 1e-9, 6) END
          AS lower_band,
        CAST(CASE WHEN c = 7 AND (v > ma + 2 * sd OR v < ma - 2 * sd)
          THEN 1 ELSE 0 END AS BIGINT) AS breakout
      FROM r"""))

  val all: Seq[Q] =
    Seq(m61, m62, m63, m64, g12, g13, t68, ann14, w31)
}
