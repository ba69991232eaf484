package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.{Graph, Stats}
import graft.streaming.Streaming

/** Catalog part AA (round 15): the VERDICT r14 #6 candidates — a
  * Louvain-style greedy local-move round composing g16's LPA assignment
  * with g17's modularity gate, the mergeable q-digest rank-sketch
  * quantile family (the merge-order-invariant member m20's fixed-bin
  * histogram is not), and the watermarked stream-stream FULL OUTER
  * interval join closing the st3 (inner) / st8 (left outer) audit
  * family — SURVEY §2.12 X196–X198.
  */
object QueriesAA {

  // G18 — one synchronous Louvain local-move round over the supplier
  // co-purchase backbone, seeded by g16's 3-round LPA assignment: every
  // node adopts the neighbor community with the largest modularity gain
  // ΔQ(i→c) = k_ic/m − k_i·Σ'_tot(c)/(2m²) (own community always a
  // candidate; ties to the smallest community id; all moves applied
  // simultaneously). The greedy refinement g17's modularity scores —
  // the oracle re-unrolls the LPA rounds, then unrolls the move rule
  // itself from the exact degree/σ/k_ic algebra.
  val g18 = Q("g18_louvain_move",
    (s, d) => {
      // r15: materialize the backbone ONCE (see g17) — both consumers
      // checkpoint their edge input, so a lazy backbone ran twice.
      val backbone = QueriesG.backbone(s, d).localCheckpoint(true)
      Graph.louvainMoveRound(backbone, "s1", "s2",
        Graph.labelPropagationAssign(backbone, rounds = 3), "v", "label")
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
      deg AS (SELECT v, count(*) AS k FROM und GROUP BY 1),
      sg AS (SELECT r3.label AS cc, sum(deg.k) AS sigma
        FROM deg JOIN r3 ON r3.v = deg.v GROUP BY 1),
      kic AS (SELECT u.v, l.label AS cc, count(*) AS kic
        FROM und u JOIN r3 l ON l.v = u.nb GROUP BY 1, 2),
      cand AS (SELECT v, cc, max(kic) AS kic FROM (
          SELECT v, cc, kic FROM kic
          UNION ALL SELECT v, label AS cc, CAST(0 AS BIGINT) FROM r3)
        GROUP BY 1, 2),
      sc AS (SELECT c.v, c.cc, c.kic, deg.k, r3.label AS cur,
          sg.sigma - CASE WHEN c.cc = r3.label THEN deg.k ELSE 0 END
            AS sigmaex
        FROM cand c JOIN deg ON deg.v = c.v JOIN r3 ON r3.v = c.v
        JOIN sg ON sg.cc = c.cc),
      g AS (SELECT v, cur, cc, kic,
          kic::DOUBLE / m.m
            - (k * sigmaex)::DOUBLE / (2.0 * m.m * m.m) AS gain,
          row_number() OVER (PARTITION BY v ORDER BY
            kic::DOUBLE / m.m
              - (k * sigmaex)::DOUBLE / (2.0 * m.m * m.m) DESC, cc) AS rn
        FROM sc, m)
      SELECT v, cur AS label_old, cc AS label_new,
        CAST(kic AS BIGINT) AS n_links,
        round(gain + 1e-9, 6) AS delta_q
      FROM g WHERE rn = 1"""))

  // M74 — canonical q-digest quantiles over the event values: 1024-leaf
  // dyadic universe on [0, 512), compression budget k = 64 (internal
  // retained nodes carry <= n/64 each, rank error <= 10·n/64). The
  // oracle unrolls all ten bottom-up compression levels as chained
  // CTEs — exactly the g16/m70 unroll discipline — and reads the same
  // postorder (upper-bound, level) sweep.
  val m74 = Q("m74_qdigest_quantiles",
    (s, d) => Stats.qDigestQuantiles(
      Tables.events(s, d).where(col("value").isNotNull), col("value"),
      lo = 0.0, hi = 512.0, bits = 10, k = 64,
      phis = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)),
    Some("""WITH t AS (SELECT count(*) AS n,
        greatest(1, CAST(floor(count(*) / 64.0) AS BIGINT)) AS thr
        FROM events WHERE value IS NOT NULL),
      h0 AS (SELECT least(greatest(
          CAST(floor((value - 0.0) / 512.0 * 1024.0) AS BIGINT), 0),
          1023) AS idx, count(*) AS cnt
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      p0 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM h0 GROUP BY 1),
      l1 AS (SELECT pidx AS idx, s AS cnt FROM p0, t WHERE s <= t.thr),
      r0 AS (SELECT h0.idx, h0.cnt, 0 AS lvl, (h0.idx + 1) * 1 - 1 AS ub
        FROM h0 JOIN p0 ON h0.idx // 2 = p0.pidx, t WHERE p0.s > t.thr),
      p1 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l1 GROUP BY 1),
      l2 AS (SELECT pidx AS idx, s AS cnt FROM p1, t WHERE s <= t.thr),
      r1 AS (SELECT l1.idx, l1.cnt, 1 AS lvl, (l1.idx + 1) * 2 - 1 AS ub
        FROM l1 JOIN p1 ON l1.idx // 2 = p1.pidx, t WHERE p1.s > t.thr),
      p2 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l2 GROUP BY 1),
      l3 AS (SELECT pidx AS idx, s AS cnt FROM p2, t WHERE s <= t.thr),
      r2 AS (SELECT l2.idx, l2.cnt, 2 AS lvl, (l2.idx + 1) * 4 - 1 AS ub
        FROM l2 JOIN p2 ON l2.idx // 2 = p2.pidx, t WHERE p2.s > t.thr),
      p3 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l3 GROUP BY 1),
      l4 AS (SELECT pidx AS idx, s AS cnt FROM p3, t WHERE s <= t.thr),
      r3 AS (SELECT l3.idx, l3.cnt, 3 AS lvl, (l3.idx + 1) * 8 - 1 AS ub
        FROM l3 JOIN p3 ON l3.idx // 2 = p3.pidx, t WHERE p3.s > t.thr),
      p4 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l4 GROUP BY 1),
      l5 AS (SELECT pidx AS idx, s AS cnt FROM p4, t WHERE s <= t.thr),
      r4 AS (SELECT l4.idx, l4.cnt, 4 AS lvl, (l4.idx + 1) * 16 - 1 AS ub
        FROM l4 JOIN p4 ON l4.idx // 2 = p4.pidx, t WHERE p4.s > t.thr),
      p5 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l5 GROUP BY 1),
      l6 AS (SELECT pidx AS idx, s AS cnt FROM p5, t WHERE s <= t.thr),
      r5 AS (SELECT l5.idx, l5.cnt, 5 AS lvl, (l5.idx + 1) * 32 - 1 AS ub
        FROM l5 JOIN p5 ON l5.idx // 2 = p5.pidx, t WHERE p5.s > t.thr),
      p6 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l6 GROUP BY 1),
      l7 AS (SELECT pidx AS idx, s AS cnt FROM p6, t WHERE s <= t.thr),
      r6 AS (SELECT l6.idx, l6.cnt, 6 AS lvl, (l6.idx + 1) * 64 - 1 AS ub
        FROM l6 JOIN p6 ON l6.idx // 2 = p6.pidx, t WHERE p6.s > t.thr),
      p7 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l7 GROUP BY 1),
      l8 AS (SELECT pidx AS idx, s AS cnt FROM p7, t WHERE s <= t.thr),
      r7 AS (SELECT l7.idx, l7.cnt, 7 AS lvl, (l7.idx + 1) * 128 - 1 AS ub
        FROM l7 JOIN p7 ON l7.idx // 2 = p7.pidx, t WHERE p7.s > t.thr),
      p8 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l8 GROUP BY 1),
      l9 AS (SELECT pidx AS idx, s AS cnt FROM p8, t WHERE s <= t.thr),
      r8 AS (SELECT l8.idx, l8.cnt, 8 AS lvl, (l8.idx + 1) * 256 - 1 AS ub
        FROM l8 JOIN p8 ON l8.idx // 2 = p8.pidx, t WHERE p8.s > t.thr),
      p9 AS (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM l9 GROUP BY 1),
      l10 AS (SELECT pidx AS idx, s AS cnt FROM p9, t WHERE s <= t.thr),
      r9 AS (SELECT l9.idx, l9.cnt, 9 AS lvl, (l9.idx + 1) * 512 - 1 AS ub
        FROM l9 JOIN p9 ON l9.idx // 2 = p9.pidx, t WHERE p9.s > t.thr),
      r10 AS (SELECT idx, cnt, 10 AS lvl, (idx + 1) * 1024 - 1 AS ub
        FROM l10),
      nodes AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1
        UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
        UNION ALL SELECT * FROM r6 UNION ALL SELECT * FROM r7
        UNION ALL SELECT * FROM r8 UNION ALL SELECT * FROM r9
        UNION ALL SELECT * FROM r10),
      nr AS (SELECT count(*) AS n_retained FROM nodes),
      c AS (SELECT idx, cnt, lvl, ub, sum(cnt) OVER (ORDER BY ub, lvl
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM nodes),
      ph AS (SELECT unnest([0.1::DOUBLE, 0.25::DOUBLE, 0.5::DOUBLE,
        0.75::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS phi),
      cand AS (SELECT ph.phi,
          greatest(1, CAST(ceil(ph.phi * t.n) AS BIGINT)) AS r,
          c.ub, c.lvl
        FROM c, ph, t
        WHERE c.cum >= greatest(1, CAST(ceil(ph.phi * t.n) AS BIGINT))),
      sel AS (SELECT phi, r, ub,
          row_number() OVER (PARTITION BY phi ORDER BY ub, lvl) AS rn
        FROM cand)
      SELECT phi, r AS rank_target,
        round(0.0 + (ub + 1) * 0.5 + 1e-9, 6) AS est_value,
        nr.n_retained
      FROM sel, nr WHERE rn = 1"""))

  // ST9 — watermarked stream-stream FULL OUTER interval join: the
  // two-sided audit (purchases with no preceding view AND views that
  // converted to nothing) st3/st8 cannot give in one pass. Both sides
  // watermarked at 0 seconds; batch parity cuts left-bearing rows at
  // p_ts < least(max purchase ts, max view ts) (st8's rule) and
  // view-only rows at v_ts + 60 min < the same cutoff (the instant the
  // state store proves no future purchase can attach) — both cuts
  // in-plan on both engines.
  val st9 = Q("st9_stream_interval_full_outer",
    (s, d) => {
      val joined = Streaming.runAvailableNow(s, s2 => {
        val raw = Streaming.readEventsStream(s2, d)
        val purchases = raw.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = raw.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"))
        Streaming.intervalJoinFullOuter(purchases, views, "user_id", "ts",
            maxDelayMinutes = 60, watermark = "0 seconds")
          .select(col("l.ts").as("p_ts"), col("r.ts").as("v_ts"),
            coalesce(col("l.user_id"), col("r.user_id")).as("uid"))
      }, s"st9_mem_${System.nanoTime()}", statePartitions = Some(2),
        mode = "append")
      val cut = Tables.events(joined.sparkSession, d)
        .agg(least(
          max(when(col("event_type") === "purchase", col("ts"))),
          max(when(col("event_type") === "view", col("ts"))))
          .as("__cut_ts"))
      joined.crossJoin(broadcast(cut)) // 1-row scalar attach
        .where((col("p_ts").isNotNull && col("p_ts") < col("__cut_ts")) ||
          (col("p_ts").isNull &&
            col("v_ts") + expr("interval 60 minutes") < col("__cut_ts")))
        .groupBy(when(col("p_ts").isNotNull && col("v_ts").isNotNull,
            "matched")
          .when(col("v_ts").isNull, "purchase_only")
          .otherwise("view_only").as("row_kind"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("uid")).as("n_users"),
          min(coalesce(col("p_ts"), col("v_ts"))).as("first_ts"))
    },
    Some("""WITH mx AS (SELECT least(
        max(ts) FILTER (WHERE event_type = 'purchase'),
        max(ts) FILTER (WHERE event_type = 'view')) AS cut FROM events),
      p AS (SELECT event_id, user_id AS pu, ts AS p_ts FROM events
        WHERE event_type = 'purchase'),
      v AS (SELECT user_id AS vu, ts AS v_ts FROM events
        WHERE event_type = 'view'),
      j AS (SELECT p.pu, p.p_ts, v.vu, v.v_ts
        FROM p FULL JOIN v ON v.vu = p.pu
          AND v.v_ts >= p.p_ts - INTERVAL 60 MINUTE
          AND v.v_ts < p.p_ts),
      f AS (SELECT * FROM j, mx
        WHERE (p_ts IS NOT NULL AND p_ts < cut)
          OR (p_ts IS NULL AND v_ts + INTERVAL 60 MINUTE < cut))
      SELECT CASE WHEN p_ts IS NOT NULL AND v_ts IS NOT NULL
          THEN 'matched'
          WHEN v_ts IS NULL THEN 'purchase_only'
          ELSE 'view_only' END AS row_kind,
        count(*) AS n_rows,
        count(DISTINCT coalesce(pu, vu)) AS n_users,
        min(coalesce(p_ts, v_ts)) AS first_ts
      FROM f GROUP BY 1"""))

  val all: Seq[Q] = Seq(g18, m74, st9)
}
