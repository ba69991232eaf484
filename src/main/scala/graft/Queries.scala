package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** The oracle-checked query catalog. Every entry pairs a Spark plan with a
  * DuckDB SQL statement over the same parquet tables; the driver
  * hash-compares results (column names must match — everything is aliased
  * identically on both sides).
  *
  * Naming convention: the prefix is the SURVEY §2 operator id the query
  * exercises (a=aggregate, j=join, w=window, v=validation/dedup, p=scalar,
  * d=date, m=stats/ml, t=text, s=source).
  *
  * Determinism rules (SURVEY §7.4): double aggregates are rounded to 6
  * decimals (2 or 0 for large-magnitude sums where cross-engine float
  * summation order dominates); every top-k / dedup pick has an explicit
  * total-order tie-break; all vector math is upcast to double before
  * accumulation.
  */
import graft.QueryDef.Q

object Queries {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---------------------------------------------------------------- A: aggregates

  val a1 = Q("a1_daily_event_stats",
    (s, d) => ev(s, d)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")) + lit(1e-9), 6).as("sum_value"),
        round(avg(col("value")) + lit(1e-9), 6).as("avg_value")),
    Some("""SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_events,
      count(DISTINCT user_id) AS n_users, round(sum(value) + 1e-9,6) AS sum_value,
      round(avg(value) + 1e-9,6) AS avg_value FROM events GROUP BY 1"""),
    headline = true)

  // A1b — the approximate fast path (SURVEY §7.4 risk 7) as a DRIVER-
  // GATED audit: HLL distinct counts + approx_percentile computed next
  // to their exact twins in ONE aggregate, the exact columns emitted
  // for the oracle to reproduce and the sketch columns reduced to
  // deterministic tolerance booleans the oracle asserts as TRUE — if
  // either sketch ever drifts past its bound, the hash gate goes red.
  // Bounds: HLL within 15% (3σ of the default rsd 0.05; measured max
  // 9.6% at sf0.1, 5.2% at sf0.01), approx median inside the exact
  // p40..p60 band (approx_percentile returns a true element, so a
  // relative delta is the wrong metric on small days). The approx-ONLY
  // production form (no exact twin anywhere in the plan) remains
  // EventAggregator.dailyCollectionStatsApprox, spec-bounded.
  val a1b = Q("a1b_daily_stats_approx",
    (s, d) => ev(s, d)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id")).as("__au"),
        percentile(col("value"), lit(0.4)).as("__p40"),
        percentile(col("value"), lit(0.6)).as("__p60"),
        approx_percentile(col("value"), lit(0.5), lit(1000)).as("__am"))
      .select(col("event_date"), col("n_events"), col("n_users"),
        (abs(col("__au") - col("n_users")) / col("n_users") <= 0.15)
          .as("hll_within_3sigma"),
        (col("__am") >= col("__p40") && col("__am") <= col("__p60"))
          .as("median_in_p40_p60")),
    Some("""SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_events,
      count(DISTINCT user_id) AS n_users,
      true AS hll_within_3sigma, true AS median_in_p40_p60
      FROM events GROUP BY 1"""))

  val a2 = Q("a2_price_stats_median",
    (s, d) => li(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")) + lit(0.001), 0).as("sum_price"),
        round(avg(col("l_extendedprice")) + lit(1e-9), 6).as("avg_price"),
        round(percentile(col("l_extendedprice"), lit(0.5)) + lit(1e-9), 6).as("median_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price")),
    Some("""SELECT l_returnflag, count(*) AS n,
      round(sum(l_extendedprice) + 0.001,0) AS sum_price,
      round(avg(l_extendedprice) + 1e-9,6) AS avg_price,
      round(quantile_cont(l_extendedprice, 0.5) + 1e-9,6) AS median_price,
      min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
      FROM lineitem GROUP BY 1"""),
    headline = true)

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val a7 = Q("a7_pivot_event_counts",
    (s, d) => ev(s, d)
      .groupBy(to_date(col("ts")).as("event_date"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0, eventTypes),
    Some("""SELECT CAST(ts AS DATE) AS event_date,
      count(*) FILTER (WHERE event_type = 'click') AS "click",
      count(*) FILTER (WHERE event_type = 'error') AS "error",
      count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
      count(*) FILTER (WHERE event_type = 'signup') AS "signup",
      count(*) FILTER (WHERE event_type = 'view') AS "view"
      FROM events GROUP BY 1"""))

  val a11 = Q("a11_summary_quartiles",
    (s, d) => li(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("n_parts"),
        to_date(min(col("l_shipdate"))).as("first_ship"),
        to_date(max(col("l_shipdate"))).as("last_ship"),
        round(percentile(col("l_extendedprice"), lit(0.25)) + lit(1e-9), 6).as("p25"),
        round(percentile(col("l_extendedprice"), lit(0.5)) + lit(1e-9), 6).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.75)) + lit(1e-9), 6).as("p75")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
      count(DISTINCT l_partkey) AS n_parts,
      CAST(min(l_shipdate) AS DATE) AS first_ship,
      CAST(max(l_shipdate) AS DATE) AS last_ship,
      round(quantile_cont(l_extendedprice, 0.25) + 1e-9,6) AS p25,
      round(quantile_cont(l_extendedprice, 0.5) + 1e-9,6) AS p50,
      round(quantile_cont(l_extendedprice, 0.75) + 1e-9,6) AS p75
      FROM lineitem GROUP BY 1, 2"""))

  val a5 = Q("a5_argmax_last_value",
    (s, d) => ev(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        to_date(max(col("ts"))).as("last_date"),
        max_by(col("value"), col("ts")).as("last_value")),
    Some("""SELECT user_id, count(*) AS n, CAST(max(ts) AS DATE) AS last_date,
      arg_max(value, ts) AS last_value FROM events GROUP BY 1"""))

  val a19 = Q("a19_top15_buyers",
    (s, d) => ev(s, d)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("sum_spent"))
      .orderBy(col("n_purchases").desc, col("user_id"))
      .limit(15),
    Some("""SELECT user_id, count(*) AS n_purchases,
      round(sum(value),2) AS sum_spent FROM events
      WHERE event_type = 'purchase' GROUP BY 1
      ORDER BY n_purchases DESC, user_id LIMIT 15"""))

  val a22 = Q("a22_mode_event_type",
    (s, d) => {
      val counts = ev(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_event_type"),
          col("n").as("mode_n"))
    },
    Some("""WITH c AS (SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY n DESC, event_type) AS rn FROM c)
      SELECT user_id, event_type AS mode_event_type, n AS mode_n
      FROM r WHERE rn = 1"""))

  // ---------------------------------------------------------------- J: joins

  val j1 = Q("j1_composite_left_join",
    (s, d) => {
      val e = ev(s, d).withColumn("event_date", to_date(col("ts")))
      val stats = e.groupBy(col("event_type"), col("event_date"))
        .agg(count(lit(1)).as("n_events"))
      val high = e.where(col("value") > 10)
        .groupBy(col("event_type"), col("event_date"))
        .agg(count(lit(1)).as("n_high"), round(avg(col("value")) + lit(1e-9), 6).as("avg_high"))
      stats.join(high, Seq("event_type", "event_date"), "left")
        .withColumn("n_high", coalesce(col("n_high"), lit(0L)))
    },
    Some("""WITH s AS (SELECT event_type, CAST(ts AS DATE) AS event_date,
        count(*) AS n_events FROM events GROUP BY 1, 2),
      h AS (SELECT event_type, CAST(ts AS DATE) AS event_date,
        count(*) AS n_high, round(avg(value) + 1e-9,6) AS avg_high
        FROM events WHERE value > 10 GROUP BY 1, 2)
      SELECT s.event_type, s.event_date, s.n_events,
        coalesce(h.n_high, 0) AS n_high, h.avg_high
      FROM s LEFT JOIN h ON s.event_type = h.event_type
        AND s.event_date = h.event_date"""),
    headline = true)

  val j3 = Q("j3_star_join_revenue",
    (s, d) => li(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + lit(0.001), 0)
          .as("revenue")),
    Some("""SELECT r_name, count(DISTINCT o_orderkey) AS n_orders,
      round(sum(l_extendedprice * (1 - l_discount)) + 0.001,0) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1"""),
    headline = true)

  val j4 = Q("j4_full_outer_wallet",
    (s, d) => {
      val e = ev(s, d).withColumn("event_date", to_date(col("ts")))
      val buy = e.where(col("event_type") === "purchase").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_buy"), min(col("event_date")).as("first_buy"),
          max(col("event_date")).as("last_buy"))
      val clk = e.where(col("event_type") === "click").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_click"), min(col("event_date")).as("first_click"),
          max(col("event_date")).as("last_click"))
      buy.join(clk, Seq("user_id"), "full_outer")
        .select(
          col("user_id"),
          coalesce(col("n_buy"), lit(0L)).as("n_buy"),
          coalesce(col("n_click"), lit(0L)).as("n_click"),
          (coalesce(col("n_buy"), lit(0L)) + coalesce(col("n_click"), lit(0L)))
            .as("n_total"),
          least(col("first_buy"), col("first_click")).as("first_activity"),
          greatest(col("last_buy"), col("last_click")).as("last_activity"))
    },
    Some("""WITH b AS (SELECT user_id, count(*) AS n_buy,
        min(CAST(ts AS DATE)) AS first_buy, max(CAST(ts AS DATE)) AS last_buy
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      c AS (SELECT user_id, count(*) AS n_click,
        min(CAST(ts AS DATE)) AS first_click, max(CAST(ts AS DATE)) AS last_click
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT coalesce(b.user_id, c.user_id) AS user_id,
        coalesce(n_buy, 0) AS n_buy, coalesce(n_click, 0) AS n_click,
        coalesce(n_buy, 0) + coalesce(n_click, 0) AS n_total,
        least(first_buy, first_click) AS first_activity,
        greatest(last_buy, last_click) AS last_activity
      FROM b FULL OUTER JOIN c ON b.user_id = c.user_id"""))

  val j7 = Q("j7_semi_join",
    (s, d) => {
      val buyers = ev(s, d).where(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      ev(s, d).where(col("event_type") === "error")
        .join(buyers, Seq("user_id"), "left_semi")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_errors"))
    },
    Some("""SELECT user_id, count(*) AS n_errors FROM events e
      WHERE event_type = 'error' AND EXISTS (SELECT 1 FROM events b
        WHERE b.event_type = 'purchase' AND b.user_id = e.user_id)
      GROUP BY 1"""))

  // Anti join at the (user, day) grain — active-but-not-converting
  // days. (The original "users who never purchased" form returned ZERO
  // rows at every SF — with ~66 events/user everyone purchases — so the
  // gate was vacuous; this keys the membership test on user-days, which
  // carry real mass at every scale.)
  val j7a = Q("j7_anti_join",
    (s, d) => {
      val purchDays = ev(s, d)
        .where(col("ts").isNotNull && col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("dte")).distinct()
      ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("dte")).distinct()
        .join(purchDays, Seq("user_id", "dte"), "left_anti")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_idle_days"))
    },
    Some("""WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dte
        FROM events WHERE ts IS NOT NULL),
      p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dte FROM events
        WHERE ts IS NOT NULL AND event_type = 'purchase')
      SELECT a.user_id, count(*) AS n_idle_days FROM a
      WHERE NOT EXISTS (SELECT 1 FROM p
        WHERE p.user_id = a.user_id AND p.dte = a.dte)
      GROUP BY 1"""))

  val j11 = Q("j11_peer_window_join",
    (s, d) => {
      val probes = ev(s, d).where(col("event_type") === "purchase")
      PeerEffects.windowAgg(probes, ev(s, d), "user_id", "ts", "value",
          "event_id", windowDays = 7)
        .select(col("event_id"), col("n_peers"),
          round(col("peer_avg") + lit(1e-9), 6).as("peer_avg"), col("peer_max"))
    },
    Some("""SELECT e.event_id, count(p.value) AS n_peers,
      round(avg(p.value) + 1e-9,6) AS peer_avg, max(p.value) AS peer_max
      FROM events e LEFT JOIN events p ON p.user_id = e.user_id
        AND p.ts >= e.ts - INTERVAL 7 DAY AND p.ts < e.ts
      WHERE e.event_type = 'purchase' GROUP BY 1"""),
    headline = true)

  val j12 = Q("j12_knn_cosine_top5",
    (s, d) => Similarity.bruteForceTopK(
      Tables.embeddings(s, d), "vec_id", "embedding", k = 5)
      .withColumnRenamed("rank", "knn_rank"),
    Some("""WITH pairs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          AS cosine
        FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id) AS knn_rank FROM pairs)
      SELECT query_id, neighbor_id, knn_rank, round(cosine + 1e-9,6) AS cosine
      FROM r WHERE knn_rank <= 5"""),
    headline = true)

  // ------------------------------------------------------- V: dedup / validation

  val v1 = Q("v1_dedup_deterministic",
    (s, d) => Dedup.dropDuplicatesDeterministic(
        ev(s, d).withColumn("event_date", to_date(col("ts"))),
        Seq("user_id", "event_type", "event_date"), col("event_id"))
      .select(col("user_id"), col("event_type"), col("event_date"), col("event_id")),
    Some("""SELECT user_id, event_type, CAST(ts AS DATE) AS event_date,
      min(event_id) AS event_id FROM events GROUP BY 1, 2, 3"""))

  val v2 = Q("v2_duplicate_keys",
    (s, d) => Dedup.duplicateKeys(
      ev(s, d).withColumn("event_date", to_date(col("ts"))),
      Seq("user_id", "event_type", "event_date")),
    Some("""SELECT user_id, event_type, CAST(ts AS DATE) AS event_date,
      count(*) AS n_dups FROM events GROUP BY 1, 2, 3 HAVING count(*) > 1"""))

  val v9 = Q("v9_quality_metrics",
    (s, d) => ev(s, d).agg(
      count(lit(1)).as("total_rows"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_event_types"),
      to_date(min(col("ts"))).as("min_date"),
      to_date(max(col("ts"))).as("max_date"),
      sum(when(col("value") > 0, 1L).otherwise(0L)).as("n_positive"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value")),
    Some("""SELECT count(*) AS total_rows, count(DISTINCT user_id) AS n_users,
      count(DISTINCT event_type) AS n_event_types,
      CAST(min(ts) AS DATE) AS min_date, CAST(max(ts) AS DATE) AS max_date,
      count(*) FILTER (WHERE value > 0) AS n_positive,
      count(*) FILTER (WHERE value IS NULL) AS n_null_value
      FROM events"""))

  // ------------------------------------------------------------- W: windows

  val w1 = Q("w1_lead_days_to_next",
    (s, d) => TimeSeries.daysToNext(
        ev(s, d).where(col("event_type") === "purchase"),
        Seq("user_id"), "ts", col("event_id"), "days_to_next")
      .select(col("user_id"), col("event_id"),
        round(col("days_to_next") + lit(1e-9), 6).as("days_to_next")),
    Some("""SELECT user_id, event_id,
      round((epoch_us(lead(ts) OVER (PARTITION BY user_id
        ORDER BY ts, event_id)) - epoch_us(ts)) / 86400e6 + 1e-9, 6) AS days_to_next
      FROM events WHERE event_type = 'purchase'"""))

  val w2 = Q("w2_rolling_mean_7",
    (s, d) => {
      val daily = ev(s, d).groupBy(to_date(col("ts")).as("event_date"))
        .agg(sum(col("value")).as("sum_value"))
      TimeSeries.rollingMeanStrict(daily, "event_date", "sum_value", 7)
        .select(col("event_date"), round(col("sum_value") + lit(1e-9), 6).as("sum_value"),
          round(col("rolling_avg_7") + lit(1e-9), 6).as("rolling_avg_7"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS event_date,
        sum(value) AS sum_value FROM events GROUP BY 1)
      SELECT event_date, round(sum_value + 1e-9,6) AS sum_value,
        round(CASE WHEN count(*) OVER w = 7 THEN avg(sum_value) OVER w END + 1e-9, 6)
          AS rolling_avg_7
      FROM daily WINDOW w AS (ORDER BY event_date
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""))

  val w4 = Q("w4_pct_change",
    (s, d) => {
      val daily = ev(s, d).groupBy(to_date(col("ts")).as("event_date"))
        .agg(avg(col("value")).as("avg_value"))
      TimeSeries.pctChange(daily, "event_date", "avg_value", "pct_change")
        .select(col("event_date"), round(col("avg_value") + lit(1e-9), 6).as("avg_value"),
          round(col("pct_change") + lit(1e-9), 6).as("pct_change"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS event_date,
        avg(value) AS avg_value FROM events GROUP BY 1)
      SELECT event_date, round(avg_value + 1e-9,6) AS avg_value,
        round((avg_value - lag(avg_value) OVER (ORDER BY event_date))
          / lag(avg_value) OVER (ORDER BY event_date) + 1e-9, 6) AS pct_change
      FROM daily"""))

  // W8 (extension): forward-fill — nulls planted deterministically
  // (event_id % 5) so the oracle replants them; per-user series ordered
  // by (ts, event_id) for a total order.
  val w8 = Q("w8_forward_fill",
    (s, d) => {
      val gappy = ev(s, d).withColumn("v",
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("value")))
      TimeSeries.forwardFill(gappy, Seq("user_id"), "ts", col("event_id"),
          "v", "v_filled")
        .select(col("event_id"), col("user_id"),
          round(col("v_filled") + lit(1e-9), 6).as("v_filled"))
    },
    Some("""WITH gappy AS (SELECT event_id, user_id, ts,
        CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        FROM events)
      SELECT event_id, user_id,
        round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-9, 6)
          AS v_filled
      FROM gappy"""))

  // W9 (extension): EWMA via the closed-form running window — the oracle
  // runs the SAME unrolled arithmetic (per-row weight, ordered running
  // sum, final scale), so the two engines add in the same order.
  val w9 = Q("w9_ewma",
    (s, d) => TimeSeries.ewma(ev(s, d), Seq("user_id"), "ts",
        col("event_id"), "value", alpha = 0.3, "ewma")
      .select(col("event_id"), col("user_id"),
        round(col("ewma") + lit(1e-9), 6).as("ewma")),
    Some("""WITH ordered AS (SELECT user_id, event_id, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
          AS j
        FROM events),
      wx AS (SELECT user_id, event_id, j,
        CASE WHEN j = 0 THEN 1.0
          ELSE 0.3 * power(0.7, -CAST(j AS DOUBLE)) END * value AS wx
        FROM ordered)
      SELECT event_id, user_id,
        round(power(0.7, CAST(j AS DOUBLE))
          * sum(wx) OVER (PARTITION BY user_id ORDER BY j
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-9, 6)
          AS ewma
      FROM wx"""))

  // W10 (extension): time-weighted linear interpolation — same planted
  // nulls as w8; the oracle rebuilds the identical two-window
  // prev/next-neighbor arithmetic (DuckDB has no native interpolate).
  val w10 = Q("w10_interpolate",
    (s, d) => {
      val gappy = ev(s, d).withColumn("v",
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("value")))
      TimeSeries.interpolateTime(gappy, Seq("user_id"), "ts",
          col("event_id"), "v", "v_interp")
        .select(col("event_id"), col("user_id"),
          round(col("v_interp") + lit(1e-9), 6).as("v_interp"))
    },
    Some("""WITH gappy AS (SELECT event_id, user_id, ts,
        epoch_us(ts)::DOUBLE AS t,
        CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        FROM events),
      nb AS (SELECT event_id, user_id, t, v,
        last_value(v IGNORE NULLS) OVER asc_w AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
          OVER asc_w AS prev_t,
        last_value(v IGNORE NULLS) OVER desc_w AS next_v,
        last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
          OVER desc_w AS next_t
        FROM gappy
        WINDOW asc_w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        desc_w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_id, user_id, round(CASE
          WHEN v IS NOT NULL THEN v
          WHEN prev_v IS NULL THEN NULL
          WHEN next_v IS NULL THEN prev_v
          WHEN next_t = prev_t THEN prev_v
          ELSE prev_v + (next_v - prev_v) * (t - prev_t)
            / (next_t - prev_t) END + 1e-9, 6) AS v_interp
      FROM nb"""))

  val w5 = Q("w5_cumsum_by_type",
    (s, d) => {
      val daily = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
      TimeSeries.cumSum(daily, "event_date", "n", "cum_n", Seq("event_type"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS event_date,
        count(*) AS n FROM events GROUP BY 1, 2)
      SELECT event_type, event_date, n,
        CAST(sum(n) OVER (PARTITION BY event_type ORDER BY event_date
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
      FROM daily"""))

  val w6 = Q("w6_cumprod_equity",
    (s, d) => {
      val daily = ev(s, d).groupBy(to_date(col("ts")).as("event_date"))
        .agg(avg(col("value")).as("avg_value"))
      val ret = TimeSeries.pctChange(daily, "event_date", "avg_value", "r")
        .where(col("r").isNotNull)
      TimeSeries.cumProd1p(ret, "event_date", "r", "equity")
        .select(col("event_date"), round(col("r") + lit(1e-9), 6).as("r"),
          round(col("equity") + lit(1e-9), 6).as("equity"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS event_date,
        avg(value) AS avg_value FROM events GROUP BY 1),
      ret AS (SELECT event_date,
        (avg_value - lag(avg_value) OVER (ORDER BY event_date))
          / lag(avg_value) OVER (ORDER BY event_date) AS r FROM daily)
      SELECT event_date, round(r + 1e-9,6) AS r,
        round(exp(sum(ln(1 + r)) OVER (ORDER BY event_date
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) + 1e-9, 6) AS equity
      FROM ret WHERE r IS NOT NULL"""))

  // ------------------------------------------------------------ P/D: scalar ops

  val p9 = Q("p9_value_remap",
    (s, d) => ev(s, d)
      .withColumn("category",
        when(col("event_type").isin("purchase", "signup"), "conversion")
          .when(col("event_type").isin("click", "view"), "engagement")
          .otherwise("other"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")) + lit(1e-9), 6).as("avg_value")),
    Some("""SELECT CASE WHEN event_type IN ('purchase','signup') THEN 'conversion'
        WHEN event_type IN ('click','view') THEN 'engagement'
        ELSE 'other' END AS category,
      count(*) AS n, round(avg(value) + 1e-9,6) AS avg_value
      FROM events GROUP BY 1"""))

  val p13 = Q("p13_quantile_outlier_filter",
    (s, d) => {
      val e = ev(s, d)
      val p99 = e.agg(percentile(col("value"), lit(0.99)).as("p99"))
      e.crossJoin(broadcast(p99)).where(col("value") < col("p99"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")) + lit(1e-9), 6).as("avg_value"))
    },
    Some("""SELECT count(*) AS n, round(avg(value) + 1e-9,6) AS avg_value FROM events
      WHERE value < (SELECT quantile_cont(value, 0.99) FROM events)"""))

  val d9 = Q("d9_regime_label",
    (s, d) => ev(s, d)
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("regime",
        when(col("event_date") <= lit("2024-01-10").cast("date"), "early")
          .when(col("event_date") <= lit("2024-01-20").cast("date"), "mid")
          .otherwise("late"))
      .groupBy(col("regime"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
        round(avg(col("value")) + lit(1e-9), 6).as("avg_value")),
    Some("""SELECT CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-10' THEN 'early'
        WHEN CAST(ts AS DATE) <= DATE '2024-01-20' THEN 'mid'
        ELSE 'late' END AS regime,
      count(*) AS n, count(DISTINCT user_id) AS n_users,
      round(avg(value) + 1e-9,6) AS avg_value
      FROM events GROUP BY 1"""))

  // --------------------------------------------------------------- M: stats/ml

  private def kCol = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
    .cast("long")

  val m1 = Q("m1_pearson_corr",
    (s, d) => ev(s, d).agg(
      count(lit(1)).as("n"),
      round(corr(col("value"), kCol) + lit(1e-9), 6).as("pearson_r")),
    Some("""SELECT count(*) AS n,
      round(corr(value, CAST(regexp_extract(props, '"k":\s*(\d+)', 1)
        AS BIGINT)) + 1e-9,6) AS pearson_r FROM events"""))

  val m3 = Q("m3_ols_closed_form",
    (s, d) => Stats.olsByGroup(
        ev(s, d).withColumn("k", kCol), Seq("event_type"), col("k"), col("value"))
      .select(col("event_type"), col("n"), round(col("slope") + lit(1e-9), 6).as("slope"),
        round(col("intercept") + lit(1e-9), 6).as("intercept"), round(col("r2") + lit(1e-9), 6).as("r2")),
    Some("""SELECT event_type, count(*) AS n,
      round(regr_slope(value, x) + 1e-9, 6) AS slope,
      round(regr_intercept(value, x) + 1e-9, 6) AS intercept,
      round(regr_r2(value, x) + 1e-9, 6) AS r2
      FROM (SELECT event_type, value,
        CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS x
        FROM events) GROUP BY 1"""))

  val m4 = Q("m4_anova_f",
    (s, d) => Stats.anova(ev(s, d), "event_type", "value")
      .select(col("n").cast("long").as("n"), col("k").cast("long").as("k"),
        round(col("f_stat") + lit(1e-9), 6).as("f_stat"),
        round(col("eta_squared") + lit(1e-9), 6).as("eta_squared")),
    Some("""WITH g AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n_g,
        avg(value) AS mean_g, var_samp(value) AS var_g
        FROM events GROUP BY 1),
      t AS (SELECT sum(n_g) AS n, CAST(count(*) AS DOUBLE) AS k,
        sum(n_g * mean_g) / sum(n_g) AS gm,
        sum(n_g * mean_g * mean_g) AS snm2,
        sum((n_g - 1) * var_g) AS ssw FROM g)
      SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        round(((snm2 - n * gm * gm) / (k - 1)) / (ssw / (n - k)) + 1e-9, 6) AS f_stat,
        round((snm2 - n * gm * gm) / ((snm2 - n * gm * gm) + ssw) + 1e-9, 6)
          AS eta_squared
      FROM t"""))

  // M4b — same ANOVA with the p-value surfaced in-plan (FDistCdf
  // expression; reference reports scipy-style p,
  // analyze_visual_cycles.py:162-231). DuckDB has no F-CDF, so the
  // p-value NUMBER can't be oracled — instead the DECISIONS it implies
  // are: sig_05/sig_01 come from the real in-plan CDF (p < α), while
  // the oracle derives the same booleans from F > F_crit(α; dfb, dfw)
  // via a literal critical-value table at the observed dof grid
  // (commons-math3 inverseCumulativeProbability, the exact same
  // distribution the expression integrates — CDF monotonicity makes
  // p < α ⇔ F > crit an identity, so a hash match certifies the CDF
  // path end-to-end). The dof join is deliberately exact: if the data
  // generator ever changes k or n, the oracle VALUES join goes empty
  // and the gate fails LOUDLY on row count instead of silently
  // bracketing at the wrong dof. The p-value numeric itself stays
  // spec-pinned to commons-math3 in OperatorsSpec.
  val m4b = Q("m4b_anova_p",
    (s, d) => Stats.anovaWithP(ev(s, d), "event_type", "value")
      .select(col("n").cast("long").as("n"), col("k").cast("long").as("k"),
        round(col("f_stat") + lit(1e-9), 6).as("f_stat"),
        round(col("eta_squared") + lit(1e-9), 6).as("eta_squared"),
        (col("p_value") < 0.05).as("sig_05"),
        (col("p_value") < 0.01).as("sig_01")),
    Some("""WITH g AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n_g,
        avg(value) AS mean_g, var_samp(value) AS var_g
        FROM events GROUP BY 1),
      t AS (SELECT sum(n_g) AS n, CAST(count(*) AS DOUBLE) AS k,
        sum(n_g * mean_g) / sum(n_g) AS gm,
        sum(n_g * mean_g * mean_g) AS snm2,
        sum((n_g - 1) * var_g) AS ssw FROM g),
      f AS (SELECT n, k,
        ((snm2 - n * gm * gm) / (k - 1)) / (ssw / (n - k)) AS f_raw,
        (snm2 - n * gm * gm) / ((snm2 - n * gm * gm) + ssw) AS eta,
        k - 1 AS dfb, n - k AS dfw FROM t),
      -- F critical values at the observed dof grid
      -- (commons-math3 FDistribution.inverseCumulativeProbability)
      crit(dfb, dfw, c05, c01) AS (VALUES
        (4, 995,   2.3808758069, 3.3380476333),
        (4, 9995,  2.3728209081, 3.3210490602),
        (4, 99995, 2.3720210674, 3.3193631964))
      SELECT CAST(f.n AS BIGINT) AS n, CAST(f.k AS BIGINT) AS k,
        round(f.f_raw + 1e-9, 6) AS f_stat,
        round(f.eta + 1e-9, 6) AS eta_squared,
        f.f_raw > crit.c05 AS sig_05,
        f.f_raw > crit.c01 AS sig_01
      FROM f JOIN crit ON f.dfb = crit.dfb AND f.dfw = crit.dfw"""))

  val m5 = Q("m5_zscore_anomaly",
    (s, d) => {
      val daily = ev(s, d).groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n_events"))
      TimeSeries.zScores(daily, "n_events", "z")
        .select(col("event_date"), col("n_events"), round(col("z") + lit(1e-9), 6).as("z"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS event_date,
        count(*) AS n_events FROM events GROUP BY 1)
      SELECT event_date, n_events,
        round((n_events - avg(n_events) OVER ())
          / stddev_samp(n_events) OVER () + 1e-9, 6) AS z
      FROM daily"""))

  val m2 = Q("m2_corr_matrix",
    (s, d) => {
      val daily = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
        .agg(avg(col("value")).as("avg_value"))
      Stats.corrMatrix(daily, "event_type", "event_date", "avg_value")
        .select(col("series_a"), col("series_b"), col("n_aligned"),
          round(col("pearson_r") + lit(1e-9), 6).as("pearson_r"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS event_date,
        avg(value) AS avg_value FROM events GROUP BY 1, 2)
      SELECT a.event_type AS series_a, b.event_type AS series_b,
        count(*) AS n_aligned, round(corr(a.avg_value, b.avg_value) + 1e-9,6)
          AS pearson_r
      FROM daily a JOIN daily b ON a.event_date = b.event_date
        AND a.event_type < b.event_type
      GROUP BY 1, 2"""))

  val m8 = Q("m8_quantile_bucket",
    (s, d) => {
      val daily = ev(s, d).groupBy(to_date(col("ts")).as("event_date"))
        .agg(sum(col("value")).as("sum_value"))
      val th = daily.agg(
        percentile(col("sum_value"), lit(0.25)).as("q1"),
        percentile(col("sum_value"), lit(0.5)).as("q2"),
        percentile(col("sum_value"), lit(0.75)).as("q3"))
      daily.crossJoin(broadcast(th))
        .select(col("event_date"),
          when(col("sum_value") < col("q1"), "Q1")
            .when(col("sum_value") < col("q2"), "Q2")
            .when(col("sum_value") < col("q3"), "Q3")
            .otherwise("Q4").as("bucket"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS event_date,
        sum(value) AS sum_value FROM events GROUP BY 1),
      th AS (SELECT quantile_cont(sum_value, 0.25) AS q1,
        quantile_cont(sum_value, 0.5) AS q2,
        quantile_cont(sum_value, 0.75) AS q3 FROM daily)
      SELECT event_date, CASE WHEN sum_value < q1 THEN 'Q1'
        WHEN sum_value < q2 THEN 'Q2' WHEN sum_value < q3 THEN 'Q3'
        ELSE 'Q4' END AS bucket
      FROM daily, th"""))

  // ----------------------------------------------------------------- T: text

  val t1q = Q("t1_text_quality",
    (s, d) => TextAnalysis.withQualityFeatures(
        docs(s, d).where(length(trim(col("text"))) > 0), "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("mean_token_len") + lit(1e-9), 6).as("mean_token_len"),
        round(col("punct_ratio") + lit(1e-9), 6).as("punct_ratio"),
        round(col("stopword_ratio") + lit(1e-9), 6).as("stopword_ratio")),
    Some("""SELECT doc_id,
      CASE WHEN length(trim(text)) = 0 THEN 0
        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
      round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        / len(string_split_regex(trim(text), '\s+')) + 1e-9, 6) AS mean_token_len,
      round(CAST(length(regexp_replace(regexp_replace(text, '\s+', '', 'g'),
          '[\p{L}\p{N}]', '', 'g')) AS DOUBLE)
        / length(regexp_replace(text, '\s+', '', 'g')) + 1e-9, 6) AS punct_ratio,
      round(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
          w -> list_contains(['the','a','an','and','or','of','to','in','is',
            'it','that','for','on','with','as'], w))) AS DOUBLE)
        / len(string_split_regex(trim(text), '\s+')) + 1e-9, 6) AS stopword_ratio
      FROM documents WHERE length(trim(text)) > 0"""))

  val t2q = Q("t2_fingerprint",
    (s, d) => docs(s, d).select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"),
      TextAnalysis.rollingHash(col("text")).as("rolling_hash")),
    Some("""SELECT doc_id,
      md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split_regex(trim(text), '\s+'),
            t -> CAST(('0x' || substr(md5(t), 1, 14)) AS BIGINT) % 1000000007)),
        (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash
      FROM documents"""))

  val t3q = Q("t3_exact_dedup",
    (s, d) => Dedup.exactTextDedup(docs(s, d), "text", "doc_id"),
    Some("""SELECT md5(lower(trim(text))) AS content_hash,
      min(doc_id) AS doc_id, count(*) AS n_copies
      FROM documents GROUP BY 1"""))

  // --------------------------------------------------------------- catalog

  val all: Seq[Q] = Seq(
    a1, a1b, a2, a5, a7, a11, a19, a22,
    j1, j3, j4, j7, j7a, j11, j12,
    v1, v2, v9,
    w1, w2, w4, w5, w6, w8, w9, w10,
    p9, p13, d9,
    m1, m2, m3, m4, m4b, m5, m8,
    t1q, t2q, t3q)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin)).toMap

  def headlines: Seq[Q] = all.filter(_.headline)
}
