package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.{Graph, Multimodal, Stats}

/** Catalog part X (round 12, batch 4): deterministic random-walk
  * generation (the node2vec/DeepWalk corpus step), business-day
  * latency arithmetic, odds-ratio A/B readout with Wald CI, and
  * per-channel pixel statistics over multimodal payloads.
  */
object QueriesX {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // G15 — deterministic pseudo-random walks over the supplier
  // co-purchase backbone: one 4-step walk per node, next hop =
  // argmin md5(walk:step:neighbor) — the hash plays the RNG, so the
  // walk corpus (the input to any DeepWalk-style embedding) is
  // byte-reproducible across runs AND engines. The oracle unrolls the
  // same four hash-argmin steps as chained CTEs.
  val g15 = Q("g15_deterministic_walks",
    (s, d) => Graph.deterministicWalks(QueriesG.backbone(s, d), steps = 4),
    Some("""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      p AS (SELECT a.sp AS s1, b.sp AS s2, count(*) AS sc
        FROM e0 a JOIN e0 b ON a.c = b.c AND a.sp < b.sp GROUP BY 1, 2),
      e AS (SELECT s1, s2 FROM p ORDER BY sc DESC, s1, s2 LIMIT 500),
      adj AS (SELECT s1 AS u, s2 AS v FROM e
        UNION ALL SELECT s2, s1 FROM e),
      w0 AS (SELECT DISTINCT u AS walk_id FROM adj),
      h1 AS (SELECT walk_id, v AS node FROM (
        SELECT w0.walk_id, a.v, row_number() OVER (PARTITION BY w0.walk_id
          ORDER BY md5(w0.walk_id || ':1:' || a.v), a.v) AS rn
        FROM w0 JOIN adj a ON a.u = w0.walk_id) WHERE rn = 1),
      h2 AS (SELECT walk_id, v AS node FROM (
        SELECT h1.walk_id, a.v, row_number() OVER (PARTITION BY h1.walk_id
          ORDER BY md5(h1.walk_id || ':2:' || a.v), a.v) AS rn
        FROM h1 JOIN adj a ON a.u = h1.node) WHERE rn = 1),
      h3 AS (SELECT walk_id, v AS node FROM (
        SELECT h2.walk_id, a.v, row_number() OVER (PARTITION BY h2.walk_id
          ORDER BY md5(h2.walk_id || ':3:' || a.v), a.v) AS rn
        FROM h2 JOIN adj a ON a.u = h2.node) WHERE rn = 1),
      h4 AS (SELECT walk_id, v AS node FROM (
        SELECT h3.walk_id, a.v, row_number() OVER (PARTITION BY h3.walk_id
          ORDER BY md5(h3.walk_id || ':4:' || a.v), a.v) AS rn
        FROM h3 JOIN adj a ON a.u = h3.node) WHERE rn = 1)
      SELECT walk_id, 0 AS step, walk_id AS node FROM w0
      UNION ALL SELECT walk_id, 1, node FROM h1
      UNION ALL SELECT walk_id, 2, node FROM h2
      UNION ALL SELECT walk_id, 3, node FROM h3
      UNION ALL SELECT walk_id, 4, node FROM h4"""))

  // D14 — business-day latency from order to ship, per order priority:
  // weekends excluded by pure integer calendar algebra (business days
  // since an epoch Monday: ⌊i/7⌋·5 + min(i%7+1, 5) — no per-day
  // explode, no holiday table scan), so both engines count identically.
  // The SLA readout ops actually wants, at one closed-form expression
  // per row.
  /** Business days from the 1970-01-05 epoch Monday through `c`
    * inclusive: ⌊i/7⌋·5 full weeks plus min(i%7+1, 5) from the partial
    * week. Differences of this index count weekdays in a date range
    * with no per-day explode and no day-of-week branching.
    */
  private[graft] def businessDayIndex(c: Column): Column = {
    val i = datediff(c, lit("1970-01-05").cast("date"))
    floor(i / lit(7.0)) * 5 + least(pmod(i, lit(7)) + 1, lit(5))
  }

  val d14 = {
    def g(c: Column): Column = businessDayIndex(c)
    Q("d14_business_days",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          (g(to_date(col("l_shipdate"))) - g(to_date(col("o_orderdate"))))
            .as("bdays"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(avg(col("bdays")) + lit(1e-9), 6).as("avg_bdays"),
          min(col("bdays")).as("min_bdays"),
          max(col("bdays")).as("max_bdays")),
      Some("""WITH j AS (SELECT o_orderpriority,
          date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE))
            AS io,
          date_diff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE))
            AS isd
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        b AS (SELECT o_orderpriority,
          CAST(floor(isd / 7.0) * 5 + least(((isd % 7) + 7) % 7 + 1, 5)
            AS BIGINT)
        - CAST(floor(io / 7.0) * 5 + least(((io % 7) + 7) % 7 + 1, 5)
            AS BIGINT)
            AS bdays FROM j)
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
          round(avg(bdays) + 1e-9, 6) AS avg_bdays,
          CAST(min(bdays) AS BIGINT) AS min_bdays,
          CAST(max(bdays) AS BIGINT) AS max_bdays
        FROM b GROUP BY 1"""))
  }

  // M66 — odds ratio with 95% Wald CI: does the purchase funnel carry
  // high-value interactions disproportionately vs views? The 2×2
  // exposure/outcome A/B readout (exposure = purchase, outcome =
  // value > 100) with the interval a launch decision actually
  // thresholds on — all from one conditional-aggregate pass.
  val m66 = Q("m66_odds_ratio",
    (s, d) => Stats.oddsRatio(
      ev(s, d).where(col("value").isNotNull &&
        col("event_type").isin("purchase", "view")),
      col("event_type") === "purchase", col("value") > 100.0),
    Some("""WITH e AS (SELECT event_type = 'purchase' AS ex,
        value > 100.0 AS pos FROM events
        WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')),
      t AS (SELECT
        sum(CASE WHEN ex AND pos THEN 1 ELSE 0 END) AS a,
        sum(CASE WHEN ex AND NOT pos THEN 1 ELSE 0 END) AS b,
        sum(CASE WHEN NOT ex AND pos THEN 1 ELSE 0 END) AS c,
        sum(CASE WHEN NOT ex AND NOT pos THEN 1 ELSE 0 END) AS d
        FROM e)
      SELECT CAST(a AS BIGINT) AS n_exp_pos,
        CAST(b AS BIGINT) AS n_exp_neg,
        CAST(c AS BIGINT) AS n_unexp_pos,
        CAST(d AS BIGINT) AS n_unexp_neg,
        CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
          THEN round((a * d) / (b * c) + 1e-9, 6) END AS odds_ratio,
        CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
          THEN round(exp(ln((a * d) / (b * c)) - 1.96 *
            sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)) + 1e-9, 6)
          END AS ci_low,
        CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
          THEN round(exp(ln((a * d) / (b * c)) + 1.96 *
            sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)) + 1e-9, 6)
          END AS ci_high
      FROM t"""))

  // MM7 — per-channel pixel statistics over the RGB-interleaved payload
  // prefix (96 bytes = 32 pixels): channel means/stddevs + dominant-
  // channel flag — the tint screen and one-color near-dup prefilter a
  // vision pipeline runs before any real decode. Bounded per-asset
  // explode (mm3's discipline); channel means are exact in binary so
  // the dominant-channel argmax is bit-identical cross-engine.
  val mm7 = Q("mm7_channel_stats",
    (s, d) => Multimodal.channelStats(Multimodal.toAssets(
      docs(s, d).where(length(col("text")) >= 96), "doc_id", "text",
      "image"), nBytes = 96),
    Some("""WITH a AS (SELECT doc_id AS asset_id, hex(encode(text)) AS h
        FROM documents WHERE length(text) >= 96),
      i AS (SELECT asset_id, h, unnest(generate_series(0, 95)) AS bi
        FROM a),
      p AS (SELECT asset_id, bi % 3 AS channel,
        CAST(CAST('0x' || substr(h, CAST(bi * 2 + 1 AS INT), 2) AS INT)
          AS DOUBLE) AS b FROM i),
      g AS (SELECT asset_id, channel, count(*) AS n_px, avg(b) AS m,
        stddev_pop(b) AS sd FROM p GROUP BY 1, 2)
      SELECT asset_id, CAST(channel AS INT) AS channel,
        CAST(n_px AS BIGINT) AS n_px,
        round(m + 1e-9, 6) AS ch_mean, round(sd + 1e-9, 6) AS ch_std,
        CAST(CASE WHEN row_number() OVER (PARTITION BY asset_id
          ORDER BY m DESC, channel) = 1 THEN 1 ELSE 0 END AS BIGINT)
          AS is_dominant
      FROM g"""))

  val all: Seq[Q] = Seq(g15, d14, m66, mm7)
}
