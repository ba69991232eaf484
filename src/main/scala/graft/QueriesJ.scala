package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Catalog part J (round 8 continuation): Johnson-Lindenstrauss sign
  * projection with a distance-preservation audit, prefix-key dedup,
  * a two-proportion z-test, and threshold-based RFM segmentation.
  * Spark-first plans with full DuckDB oracles.
  */
object QueriesJ {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ANN7 — JL sign projection audit: project the 64-dim embeddings to 32
  // dims with Similarity.signProject (md5-derandomized ±1 planes) and
  // measure, for a deterministic pair sample (every 20th vector with its
  // successor), how well projected cosine tracks original cosine. The
  // audit every dim-reduction deployment runs before swapping its index
  // to the smaller vectors; here the WHOLE arithmetic — normalization,
  // sign matrix, projection, both cosines — is oracle-replayed. Long-form
  // projections keep the pair dot an equi-join on j (no array zips).
  val ann7 = Q("ann7_jl_projection",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      // 3 consumers (pa, pb, norms) — materialize once
      val proj = Similarity.signProject(emb, "vec_id", "embedding", 32,
          dim = Tables.embeddingDim)
        .localCheckpoint(true)
      val ids = emb.select(col("vec_id").cast("long").as("id"))
      val pairs = ids.where(col("id") % 20 === 0).select(col("id").as("id_a"))
        .join(ids.select(col("id").as("id_b")),
          col("id_b") === col("id_a") + 1)
      val u = Similarity.withUnitVector(
          emb.select(col("vec_id").cast("long").as("id"), col("embedding")),
          "embedding", "uvec")
        .select(col("id"), col("uvec"))
      val oc = pairs
        .join(u.select(col("id").as("id_a"), col("uvec").as("ua")), "id_a")
        .join(u.select(col("id").as("id_b"), col("uvec").as("ub")), "id_b")
        .select(col("id_a"), col("id_b"),
          Similarity.fastDot(col("ua"), col("ub")).as("orig_cos"))
      val pn = proj.groupBy(col("id"))
        .agg(sqrt(sum(col("p") * col("p"))).as("pn"))
      val pc = pairs
        .join(proj.select(col("id").as("id_a"), col("j"),
          col("p").as("pa")), "id_a")
        .join(proj.select(col("id").as("id_b"), col("j"),
          col("p").as("pb")), Seq("id_b", "j"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(col("pa") * col("pb")).as("pdot"))
        .join(pn.select(col("id").as("id_a"), col("pn").as("na")), "id_a")
        .join(pn.select(col("id").as("id_b"), col("pn").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          (col("pdot") / (col("na") * col("nb"))).as("proj_cos"))
      oc.join(pc, Seq("id_a", "id_b"))
        .select(col("id_a"), col("id_b"),
          round(col("orig_cos") + lit(1e-9), 6).as("orig_cos"),
          round(col("proj_cos") + lit(1e-9), 6).as("proj_cos"),
          round(abs(col("orig_cos") - col("proj_cos")) + lit(1e-9), 6)
            .as("abs_err"))
    },
    Some("""WITH dims AS (SELECT vec_id, i, embedding[i]::DOUBLE AS x
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
      nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS n FROM dims GROUP BY 1),
      ud AS (SELECT d.vec_id, i, x / n AS v FROM dims d
        JOIN nrm USING (vec_id)),
      proj AS (SELECT vec_id, j, sum(v * CASE WHEN
          substr(md5(i || ':' || j), 1, 1) < '8' THEN 1.0 ELSE -1.0 END)
          / sqrt(32.0) AS p
        FROM ud, unnest(generate_series(1, 32)) AS gj(j) GROUP BY 1, 2),
      pn AS (SELECT vec_id, sqrt(sum(p*p)) AS pn FROM proj GROUP BY 1),
      pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 20 = 0),
      oc AS (SELECT id_a, id_b, sum(ua.v * ub.v) AS orig_cos
        FROM pairs JOIN ud ua ON ua.vec_id = id_a
        JOIN ud ub ON ub.vec_id = id_b AND ub.i = ua.i GROUP BY 1, 2),
      pc AS (SELECT id_a, id_b,
          sum(pa.p * pb.p) / (any_value(na.pn) * any_value(nb.pn))
            AS proj_cos
        FROM pairs JOIN proj pa ON pa.vec_id = id_a
        JOIN proj pb ON pb.vec_id = id_b AND pb.j = pa.j
        JOIN pn na ON na.vec_id = id_a
        JOIN pn nb ON nb.vec_id = id_b GROUP BY 1, 2)
      SELECT o.id_a, o.id_b, round(orig_cos + 1e-9, 6) AS orig_cos,
        round(proj_cos + 1e-9, 6) AS proj_cos,
        round(abs(orig_cos - proj_cos) + 1e-9, 6) AS abs_err
      FROM oc o JOIN pc USING (id_a, id_b)"""))

  // T44 — prefix-key dedup: documents sharing the same first-16-token
  // prefix collapse to one survivor (longest text, then smallest id) —
  // the crawl-snapshot / boilerplate-header dedup rule that catches
  // trailing-edit near-copies exact hashing misses and pair-joins can't
  // afford. One md5 key projection + one doc-keyed window; no joins,
  // no pair space at all.
  val t44 = Q("t44_prefix_dedup",
    (s, d) => {
      val base = docs(s, d).where(trim(col("text")) =!= "")
        .select(col("doc_id").cast("long").as("doc_id"),
          length(trim(col("text"))).cast("long").as("len"),
          md5(array_join(slice(split(lower(trim(col("text"))), "\\s+"),
            1, 16), " ")).as("prefix_md5"))
      val wp = Window.partitionBy(col("prefix_md5"))
      base
        .withColumn("n_docs", count(lit(1)).over(wp))
        .withColumn("__rn", row_number().over(
          wp.orderBy(col("len").desc, col("doc_id"))))
        .where(col("n_docs") > 1 && col("__rn") === 1)
        .select(col("prefix_md5"), col("n_docs"),
          col("doc_id").as("survivor_id"), col("len").as("survivor_len"))
    },
    Some("""WITH base AS (SELECT doc_id,
        CAST(length(trim(text)) AS BIGINT) AS len,
        md5(array_to_string(
          string_split_regex(lower(trim(text)), '\s+')[1:16], ' '))
          AS prefix_md5
        FROM documents WHERE trim(text) <> ''),
      r AS (SELECT *, CAST(count(*) OVER (PARTITION BY prefix_md5)
          AS BIGINT) AS n_docs,
        row_number() OVER (PARTITION BY prefix_md5
          ORDER BY len DESC, doc_id) AS rn FROM base)
      SELECT prefix_md5, n_docs, doc_id AS survivor_id,
        len AS survivor_len
      FROM r WHERE n_docs > 1 AND rn = 1"""))

  // M36 — two-proportion z-test: did the purchase rate shift between the
  // first and second half of the observation window? Pooled-variance z
  // from ONE unconditional aggregate (four conditional sums — no
  // groupBy, no second scan); the halves split on integer day
  // arithmetic (2·(d−min) ≤ max−min) so the boundary is bit-exact
  // cross-engine. Companion to m14's Welch t (means) for rates.
  val m36 = Q("m36_two_proportion_z",
    (s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
        .withColumn("d", to_date(col("ts")))
      val mm = e.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      val early = (datediff(col("d"), col("mn")) * 2) <=
        datediff(col("mx"), col("mn"))
      val isPur = (col("event_type") === "purchase").cast("long")
      val sums = e.crossJoin(broadcast(mm)).agg(
        sum(when(early, 1L).otherwise(0L)).as("n1"),
        sum(when(early, isPur).otherwise(0L)).as("k1"),
        sum(when(!early, 1L).otherwise(0L)).as("n2"),
        sum(when(!early, isPur).otherwise(0L)).as("k2"))
      val p1 = col("k1").cast("double") / col("n1")
      val p2 = col("k2").cast("double") / col("n2")
      val pp = (col("k1") + col("k2")).cast("double") /
        (col("n1") + col("n2"))
      sums.select(col("n1"), col("k1"), col("n2"), col("k2"),
        round(p1 + lit(1e-9), 6).as("p1"),
        round(p2 + lit(1e-9), 6).as("p2"),
        round((p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n1") + lit(1.0) / col("n2"))) + lit(1e-9), 6)
          .as("z"))
    },
    Some("""WITH e AS (SELECT CAST(ts AS DATE) AS d, event_type
        FROM events WHERE ts IS NOT NULL),
      mm AS (SELECT min(d) AS mn, max(d) AS mx FROM e),
      s AS (SELECT
        CAST(sum(CASE WHEN 2 * date_diff('day', mn, d) <=
          date_diff('day', mn, mx) THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN 2 * date_diff('day', mn, d) <=
          date_diff('day', mn, mx) AND event_type = 'purchase'
          THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        CAST(sum(CASE WHEN 2 * date_diff('day', mn, d) >
          date_diff('day', mn, mx) THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN 2 * date_diff('day', mn, d) >
          date_diff('day', mn, mx) AND event_type = 'purchase'
          THEN 1 ELSE 0 END) AS BIGINT) AS k2
        FROM e CROSS JOIN mm)
      SELECT n1, k1, n2, k2,
        round(CAST(k1 AS DOUBLE) / n1 + 1e-9, 6) AS p1,
        round(CAST(k2 AS DOUBLE) / n2 + 1e-9, 6) AS p2,
        round((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2) /
          sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) *
            (1.0 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) *
            (1.0 / n1 + 1.0 / n2)) + 1e-9, 6) AS z
      FROM s"""))

  // A40 — RFM segmentation: per-user recency / frequency / monetary
  // quintiles, bucketed by THRESHOLD COMPARE against exact interpolated
  // quantiles (one bounded 1-row aggregate broadcast back) — not
  // ntile(), whose global ordered window would funnel every user through
  // one partition; threshold bucketing is the shape that survives a
  // billion users. Boundary compares inherit m32's order-statistic
  // safety. Output: segment cell counts + mean spend.
  val a40 = Q("a40_rfm_segments",
    (s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull && col("value").isNotNull)
        .withColumn("dte", to_date(col("ts")))
      val mx = e.agg(max(col("dte")).as("__mx"))
      val u = e.crossJoin(broadcast(mx)).groupBy(col("user_id"))
        .agg(min(datediff(col("__mx"), col("dte"))).cast("long").as("r"),
          count(lit(1)).as("f"), sum(col("value")).as("m"))
      val qs = Array(0.2, 0.4, 0.6, 0.8)
      val th = u.agg(
        percentile(col("r").cast("double"), typedLit(qs)).as("rt"),
        percentile(col("f").cast("double"), typedLit(qs)).as("ft"),
        percentile(col("m"), typedLit(qs)).as("mt"))
      def bucket(v: org.apache.spark.sql.Column, t: String) =
        (lit(1) + (1 to 4).map(i =>
          (v > element_at(col(t), i)).cast("int")).reduce(_ + _))
      u.crossJoin(broadcast(th))
        .select(col("user_id"), col("m"),
          bucket(col("r").cast("double"), "rt").as("r_q"),
          bucket(col("f").cast("double"), "ft").as("f_q"),
          bucket(col("m"), "mt").as("m_q"))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_users"),
          round(avg(col("m")) + lit(1e-9), 6).as("avg_monetary"))
    },
    Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS dte, value
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      mx AS (SELECT max(dte) AS mxd FROM e),
      u AS (SELECT user_id,
          CAST(min(date_diff('day', dte, mxd)) AS BIGINT) AS r,
          CAST(count(*) AS BIGINT) AS f, sum(value) AS m
        FROM e CROSS JOIN mx GROUP BY 1),
      t AS (SELECT
          quantile_cont(CAST(r AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS rt,
          quantile_cont(CAST(f AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS ft,
          quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS mt FROM u),
      b AS (SELECT user_id, m,
          1 + CAST(CAST(r AS DOUBLE) > rt[1] AS INT)
            + CAST(CAST(r AS DOUBLE) > rt[2] AS INT)
            + CAST(CAST(r AS DOUBLE) > rt[3] AS INT)
            + CAST(CAST(r AS DOUBLE) > rt[4] AS INT) AS r_q,
          1 + CAST(CAST(f AS DOUBLE) > ft[1] AS INT)
            + CAST(CAST(f AS DOUBLE) > ft[2] AS INT)
            + CAST(CAST(f AS DOUBLE) > ft[3] AS INT)
            + CAST(CAST(f AS DOUBLE) > ft[4] AS INT) AS f_q,
          1 + CAST(m > mt[1] AS INT) + CAST(m > mt[2] AS INT)
            + CAST(m > mt[3] AS INT) + CAST(m > mt[4] AS INT) AS m_q
        FROM u CROSS JOIN t)
      SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_users,
        round(avg(m) + 1e-9, 6) AS avg_monetary
      FROM b GROUP BY 1, 2, 3"""))

  // ER1 — end-to-end entity resolution, the composed showcase: distinct
  // part names → length-blocked edit-distance candidate pairs (t18's
  // blocking — never all-pairs on the Spark side), dist ≤ 1 edges →
  // connected components (t17's min-label propagation over the
  // edge-touching subgraph only) → golden-record survivorship (most
  // records, then lexicographic). Every stage is an operator already
  // oracled in isolation; this row pins the COMPOSITION against one
  // recursive-CTE oracle, because ER bugs live in the seams (blocking
  // that drops an edge, survivorship ranking the wrong variant).
  val er1 = Q("er1_entity_resolution",
    (s, d) => {
      val g = Tables.load(s, d, "part").groupBy(col("p_name"))
        .agg(count(lit(1)).as("n_records"))
        .localCheckpoint(true) // feeds pairs, CC nodes, and the join back
      val pairs = TextAnalysis.editDistancePairs(g, "p_name", "p_name",
        maxDist = 1)
      val cc = Dedup.connectedComponents(g.select(col("p_name")), "p_name",
        pairs, "id_a", "id_b")
      val wc = Window.partitionBy(col("cluster_id"))
      cc.join(g, "p_name")
        .withColumn("cluster_size", count(lit(1)).over(wc))
        .withColumn("__rn", row_number().over(
          wc.orderBy(col("n_records").desc, col("p_name"))))
        .select(col("p_name"), col("cluster_id"), col("cluster_size"),
          col("n_records"), (col("__rn") === 1).as("is_golden"))
    },
    Some("""WITH RECURSIVE g AS (SELECT p_name,
        CAST(count(*) AS BIGINT) AS n_records FROM part GROUP BY 1),
      pairs AS (SELECT a.p_name AS id_a, b.p_name AS id_b
        FROM g a JOIN g b ON a.p_name < b.p_name
          AND abs(length(a.p_name) - length(b.p_name)) <= 1
          AND levenshtein(a.p_name, b.p_name) <= 1),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, m) AS (SELECT p_name, p_name FROM g
        UNION SELECT r.id, e.dst FROM reach r JOIN edges e ON r.m = e.src),
      cc AS (SELECT id AS p_name, min(m) AS cluster_id FROM reach
        GROUP BY 1),
      j AS (SELECT c.p_name, c.cluster_id, g.n_records
        FROM cc c JOIN g USING (p_name))
      SELECT p_name, cluster_id,
        CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
          AS cluster_size,
        n_records,
        (row_number() OVER (PARTITION BY cluster_id
          ORDER BY n_records DESC, p_name) = 1) AS is_golden
      FROM j"""))

  // T46 — minimizer-sketch near-dup pairs: t43's winnowing sketch put to
  // work as a candidate generator. Docs pair ONLY through a shared
  // minimizer (posting self-join on the minimizer key, df ≤ 50 hub cap —
  // the jaccardPairs prune), and the sketch-level Jaccard
  // |A∩B| / |A∪B| ≥ 0.5 gates the output. The pair space is
  // Σ_z df_z² over capped postings, never N²; the estimate needs no
  // second pass over the text because the sketch IS the signature —
  // exactly how shard-local near-dup candidate generation runs at
  // corpus scale (sketches travel, documents don't).
  val t46 = Q("t46_minimizer_neardup",
    (s, d) => {
      // feeds both sides of the self-join AND the size frame
      val posts = TextAnalysis.minimizerPostings(docs(s, d), "doc_id",
        "text", w = 4, maxDf = 50).localCheckpoint(true)
      val sizes = posts.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("sz"))
      val shared = posts.select(col("doc_id").as("id_a"), col("minz"))
        .join(posts.select(col("doc_id").as("id_b"), col("minz")), "minz")
        .where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"))
      shared
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sa")),
          "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sb")),
          "id_b")
        .withColumn("sketch_jaccard", col("n_shared").cast("double") /
          (col("sa") + col("sb") - col("n_shared")))
        .where(col("sketch_jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("n_shared"),
          round(col("sketch_jaccard") + lit(1e-9), 6).as("sketch_jaccard"))
    },
    Some("""WITH base AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS tk
        FROM documents WHERE trim(text) <> ''),
      toks AS (SELECT doc_id, CAST(i AS BIGINT) AS p, md5(tk[i]) AS h,
          len(tk) AS m
        FROM base, unnest(generate_series(1, len(tk))) AS g(i)),
      mins AS (SELECT doc_id, p, m, min(h) OVER (PARTITION BY doc_id
        ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS minz
        FROM toks),
      dm AS (SELECT DISTINCT doc_id, minz FROM mins WHERE p <= m - 3),
      freq AS (SELECT minz, count(*) AS c FROM dm GROUP BY 1),
      kept AS (SELECT dm.doc_id, dm.minz FROM dm JOIN freq USING (minz)
        WHERE freq.c <= 50),
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s FROM kept
        GROUP BY 1),
      shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(count(*) AS BIGINT) AS n_shared
        FROM kept a JOIN kept b ON a.minz = b.minz
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, n_shared,
        round(CAST(n_shared AS DOUBLE) / (sa.s + sb.s - n_shared)
          + 1e-9, 6) AS sketch_jaccard
      FROM shared JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(n_shared AS DOUBLE) / (sa.s + sb.s - n_shared) >= 0.5"""))

  // ST4 — per-user decayed-score STATE, batch form: the closed-form
  // twin of `Streaming.decayScores` (mapGroupsWithState, one tiny state
  // row per user). Here score discounts to each user's OWN last event —
  // exactly what the incremental fold converges to — vs a38, which
  // discounts to the corpus max for a global ranking. One user-keyed
  // window max + the same groupBy shuffle; `StreamingSpec` pins
  // stream ≡ batch on this definition.
  val st4 = Q("st4_decay_state_batch",
    (s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull && col("value").isNotNull)
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          col("value"))
      val wu = Window.partitionBy(col("user_id"))
      e.withColumn("last_ms", max(col("ms")).over(wu))
        .groupBy(col("user_id"))
        .agg(max(col("ms")).as("last_ms"), count(lit(1)).as("n_events"),
          round(sum(col("value") * exp(-(col("last_ms") - col("ms")) /
            lit(86400000.0) / lit(30.0))) + lit(1e-9), 6)
            .as("decayed_score"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, value
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      w AS (SELECT user_id, ms, value,
        max(ms) OVER (PARTITION BY user_id) AS last_ms FROM e)
      SELECT user_id, CAST(max(ms) AS BIGINT) AS last_ms,
        CAST(count(*) AS BIGINT) AS n_events,
        round(sum(value * exp(-(last_ms - ms) / 86400000.0 / 30.0))
          + 1e-9, 6) AS decayed_score
      FROM w GROUP BY user_id"""))

  val all: Seq[Q] = Seq(ann7, t44, m36, a40, er1, t46, st4)
}
