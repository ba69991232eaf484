package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.TextAnalysis
import graft.streaming.Streaming

/** Catalog part Z (round 14): HDBSCAN-style density-level clustering,
  * suffix-structure repeated-span profiling via prefix doubling, the
  * watermarked stream-stream LEFT OUTER interval join (VERDICT r13 #7's
  * three named candidates), Newman modularity scoring for the LPA
  * communities, and the Laplace-smoothed Markov transition matrix —
  * SURVEY §2.12 X191–X195.
  */
object QueriesZ {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // M71 — HDBSCAN-style λ-level density clustering over the embedding's
  // first two axes: the λ-cuts (0.02, 0.04) of the mutual-reachability
  // single-linkage hierarchy with minPts = 5 — the density hierarchy
  // m53's fixed ε cannot express. Grid-blocked per level (exact 3×3
  // blocking), core distance from the same block, star-contraction CC;
  // every boundary decision is an identical-IEEE squared-distance
  // comparison, so the oracle reproduces each label from the exact N²
  // pair set with one recursive CC per level.
  val m71 = Q("m71_hdbscan_levels",
    (s, d) => graft.ml.Clustering.hdbscanLevels(
      Tables.embeddings(s, d).select(col("vec_id"),
        col("embedding")(0).as("x"), col("embedding")(1).as("y")),
      "vec_id", "x", "y", minPts = 5, lambdas = Seq(0.02, 0.04)),
    Some("""WITH RECURSIVE p AS (SELECT vec_id AS id,
        CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings),
      d AS (SELECT a.id AS ia, b.id AS ib,
          (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
        FROM p a JOIN p b ON a.id <> b.id),
      cdr AS (SELECT ia, d2,
          row_number() OVER (PARTITION BY ia ORDER BY d2, ib) AS rn FROM d),
      cd AS (SELECT ia AS id, d2 AS cd2 FROM cdr WHERE rn = 5),
      m0 AS (SELECT id FROM cd WHERE cd2 <= CAST(0.02 AS DOUBLE)*0.02),
      e0 AS (SELECT d.ia, d.ib FROM d
        JOIN m0 a ON a.id = d.ia JOIN m0 b ON b.id = d.ib
        WHERE d.d2 <= CAST(0.02 AS DOUBLE)*0.02),
      r0(id, m) AS (SELECT id, id FROM m0
        UNION SELECT r.id, e.ib FROM r0 r JOIN e0 e ON r.m = e.ia),
      c0 AS (SELECT id, min(m) AS lbl FROM r0 GROUP BY 1),
      m1 AS (SELECT id FROM cd WHERE cd2 <= CAST(0.04 AS DOUBLE)*0.04),
      e1 AS (SELECT d.ia, d.ib FROM d
        JOIN m1 a ON a.id = d.ia JOIN m1 b ON b.id = d.ib
        WHERE d.d2 <= CAST(0.04 AS DOUBLE)*0.04),
      r1(id, m) AS (SELECT id, id FROM m1
        UNION SELECT r.id, e.ib FROM r1 r JOIN e1 e ON r.m = e.ia),
      c1 AS (SELECT id, min(m) AS lbl FROM r1 GROUP BY 1)
      SELECT CAST(0 AS BIGINT) AS level, p.id AS vec_id,
        CAST(coalesce(c0.lbl, -1) AS BIGINT) AS cluster
      FROM p LEFT JOIN c0 ON p.id = c0.id
      UNION ALL
      SELECT CAST(1 AS BIGINT), p.id,
        CAST(coalesce(c1.lbl, -1) AS BIGINT)
      FROM p LEFT JOIN c1 ON p.id = c1.id"""))

  // T73 — suffix-structure repeated-span profile (prefix doubling, the
  // Manber–Myers rank construction): per position the largest
  // h ∈ {1,2,4,8,16} whose h-token window repeats anywhere in the
  // corpus, rolled up per doc. The oracle runs the gram LADDER (one
  // pass per length — the form whose shuffle keys grow with h and which
  // the log-round doubling replaces at scale) and must agree exactly.
  val t73 = Q("t73_repeated_prefix_buckets",
    (s, d) => TextAnalysis.repeatedPrefixBuckets(docs(s, d), "doc_id",
      "text", maxPow = 4),
    Some("""WITH base AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS tk
        FROM documents WHERE trim(text) <> ''),
      lv AS (SELECT CAST(h AS BIGINT) AS h FROM unnest([1,2,4,8,16]) AS t(h)),
      gr AS (SELECT b.doc_id, CAST(i AS BIGINT) AS p, lv.h,
          array_to_string(list_slice(tk, i, i + lv.h - 1), ' ') AS g
        FROM base b, lv, unnest(generate_series(1, len(tk))) AS gs(i)
        WHERE i + lv.h - 1 <= len(tk)),
      dup AS (SELECT g, h FROM gr GROUP BY 1, 2 HAVING count(*) >= 2),
      rep AS (SELECT doc_id, p, h FROM gr JOIN dup USING (g, h)),
      agg AS (SELECT doc_id, max(h) AS mb,
          count(*) FILTER (WHERE h = 4) AS r4,
          count(*) FILTER (WHERE h = 16) AS r16
        FROM rep GROUP BY 1)
      SELECT b.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        CAST(coalesce(mb, 0) AS BIGINT) AS max_rep_bucket,
        CAST(coalesce(r4, 0) AS BIGINT) AS n_pos_rep4,
        CAST(coalesce(r16, 0) AS BIGINT) AS n_pos_rep16
      FROM base b LEFT JOIN agg USING (doc_id)"""))

  // ST8 — watermarked stream-stream LEFT OUTER interval join (st3's
  // inner form is attribution; the outer form is the late-data audit:
  // which purchases had NO preceding view). Both sides watermarked at
  // 0 seconds; the GLOBAL watermark is the MIN over both watermark
  // nodes' max event time, so after AvailableNow's final no-data batch
  // it sits at least(max purchase ts, max view ts) and every left row
  // strictly below THAT is fully resolved — matched rows emitted
  // eagerly, unmatched null-padded on state eviction. The batch-parity
  // cutoff (p_ts < least(...)) is applied IN-PLAN on both engines, so
  // the boundary rows Spark withholds in state are excluded
  // identically.
  val st8 = Q("st8_stream_interval_left_outer",
    (s, d) => {
      val joined = Streaming.runAvailableNow(s, s2 => {
        val raw = Streaming.readEventsStream(s2, d)
        val purchases = raw.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = raw.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"))
        Streaming.intervalJoinLeftOuter(purchases, views, "user_id", "ts",
            maxDelayMinutes = 60, watermark = "0 seconds")
          .select(col("l.event_id").as("event_id"), col("l.ts").as("p_ts"),
            col("r.ts").as("v_ts"))
      }, s"st8_mem_${System.nanoTime()}", statePartitions = Some(2),
        mode = "append")
      val cut = Tables.events(joined.sparkSession, d)
        .agg(least(
          max(when(col("event_type") === "purchase", col("ts"))),
          max(when(col("event_type") === "view", col("ts"))))
          .as("__cut_ts"))
      joined.crossJoin(broadcast(cut)) // 1-row scalar attach
        .where(col("p_ts") < col("__cut_ts"))
        .groupBy(col("event_id"))
        .agg(count(col("v_ts")).as("n_views"),
          min(unix_seconds(col("p_ts")) - unix_seconds(col("v_ts")))
            .as("min_gap_sec"))
    },
    Some("""WITH mx AS (SELECT least(
        max(ts) FILTER (WHERE event_type = 'purchase'),
        max(ts) FILTER (WHERE event_type = 'view')) AS max_ts FROM events),
      p AS (SELECT event_id, user_id, ts FROM events, mx
        WHERE event_type = 'purchase' AND ts < max_ts),
      v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
      SELECT p.event_id, count(v.ts) AS n_views,
        min(date_diff('second', v.ts, p.ts)) AS min_gap_sec
      FROM p LEFT JOIN v ON v.user_id = p.user_id
        AND v.ts >= p.ts - INTERVAL 60 MINUTE AND v.ts < p.ts
      GROUP BY 1"""))

  // G17 — Newman modularity of the g16 LPA communities over the same
  // supplier co-purchase backbone: per community L_c/m − (d_c/2m)², the
  // quality gate that says whether the detected communities are denser
  // than chance. The oracle re-unrolls g16's three LPA rounds and
  // computes the identical algebra from the exact edge set.
  val g17 = Q("g17_modularity",
    (s, d) => {
      // r15: materialize the backbone ONCE — modularity and the LPA seed
      // each localCheckpoint their edge input, so an un-materialized
      // backbone plan executed twice (two full orders⋈lineitem passes).
      val backbone = QueriesG.backbone(s, d).localCheckpoint(true)
      graft.operators.Graph.modularity(backbone, "s1", "s2",
        graft.operators.Graph.labelPropagationAssign(backbone, rounds = 3),
        "v", "label")
    },
    Some("""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      p AS (SELECT a.sp AS s1, b.sp AS s2, count(*) AS sc
        FROM e0 a JOIN e0 b ON a.c = b.c AND a.sp < b.sp GROUP BY 1, 2),
      e AS (SELECT s1, s2 FROM p ORDER BY sc DESC, s1, s2 LIMIT 500),
      und AS (SELECT s1 AS v, s2 AS nb FROM e
        UNION ALL SELECT s2, s1 FROM e),
      l0 AS (SELECT DISTINCT v, v AS label FROM und),
      r1 AS (SELECT v, label FROM (
          SELECT u.v, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY u.v
              ORDER BY count(*) DESC, l.label) AS rn
          FROM und u JOIN l0 l ON l.v = u.nb GROUP BY u.v, l.label)
        WHERE rn = 1),
      r2 AS (SELECT v, label FROM (
          SELECT u.v, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY u.v
              ORDER BY count(*) DESC, l.label) AS rn
          FROM und u JOIN r1 l ON l.v = u.nb GROUP BY u.v, l.label)
        WHERE rn = 1),
      r3 AS (SELECT v, label FROM (
          SELECT u.v, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY u.v
              ORDER BY count(*) DESC, l.label) AS rn
          FROM und u JOIN r2 l ON l.v = u.nb GROUP BY u.v, l.label)
        WHERE rn = 1),
      m AS (SELECT count(*) AS m FROM e),
      deg AS (SELECT v, count(*) AS d FROM und GROUP BY 1),
      dc AS (SELECT r3.label AS c, sum(deg.d) AS degree_sum,
          count(*) AS n_nodes
        FROM deg JOIN r3 ON r3.v = deg.v GROUP BY 1),
      lc AS (SELECT a.label AS c, count(*) AS internal
        FROM e JOIN r3 a ON a.v = e.s1 JOIN r3 b ON b.v = e.s2
        WHERE a.label = b.label GROUP BY 1)
      SELECT dc.c AS community, CAST(n_nodes AS BIGINT) AS n_nodes,
        CAST(coalesce(internal, 0) AS BIGINT) AS internal_edges,
        CAST(degree_sum AS BIGINT) AS degree_sum,
        round(coalesce(internal, 0)::DOUBLE / m.m
          - pow(degree_sum::DOUBLE / (2 * m.m), 2) + 1e-9, 6)
          AS q_contribution
      FROM dc LEFT JOIN lc ON lc.c = dc.c, m"""))

  // M73 — first-order Markov transition matrix over per-user event
  // streams with Laplace smoothing (alpha = 1 over the observed state
  // set): the behavioral chain + the full smoothed K×K grid, unseen
  // transitions included. Ties inside a user's stream break on
  // event_id, so the chain is deterministic cross-engine.
  val m73 = Q("m73_markov_transitions",
    (s, d) => graft.operators.Sessionize.markovTransitions(
      Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
      alpha = 1.0),
    Some("""WITH p0 AS (SELECT event_type AS f,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS t
        FROM events),
      pr AS (SELECT f, t, count(*) AS n FROM p0
        WHERE t IS NOT NULL GROUP BY 1, 2),
      st AS (SELECT f AS s FROM pr UNION SELECT t FROM pr),
      k AS (SELECT count(*) AS k FROM st),
      tot AS (SELECT f, sum(n) AS tot FROM pr GROUP BY 1)
      SELECT a.s AS from_type, b.s AS to_type,
        CAST(coalesce(pr.n, 0) AS BIGINT) AS n_transitions,
        round((coalesce(pr.n, 0) + 1.0)
          / (coalesce(tot.tot, 0) + k.k) + 1e-9, 6) AS prob
      FROM st a CROSS JOIN st b CROSS JOIN k
      LEFT JOIN pr ON pr.f = a.s AND pr.t = b.s
      LEFT JOIN tot ON tot.f = a.s"""))

  val all: Seq[Q] = Seq(m71, t73, st8, g17, m73)
}
