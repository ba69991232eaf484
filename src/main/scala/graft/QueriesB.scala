package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q

/** Catalog part B: remaining SURVEY §2 aggregate rows (A3-A23), scalar /
  * string / date function rows (P, F, D), validation audits (V4-V8) and
  * set ops (O4, O5). Same determinism rules as [[Queries]].
  */
object QueriesB {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // A3: per-token stats (token_stats analog: count, sum, distinct owners)
  val a3 = Q("a3_token_stats",
    (s, d) => li(s, d)
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("l_quantity")), 2).as("total_qty"),
        round(avg(col("l_extendedprice")) + lit(1e-9), 6).as("avg_price"),
        countDistinct(col("l_suppkey")).as("n_suppliers")),
    Some("""SELECT l_partkey, count(*) AS n_events,
      round(sum(l_quantity),2) AS total_qty,
      round(avg(l_extendedprice) + 1e-9,6) AS avg_price,
      count(DISTINCT l_suppkey) AS n_suppliers
      FROM lineitem GROUP BY 1"""))

  // A4: first-event date per key under a filter (first mint date analog)
  val a4 = Q("a4_first_event_date",
    (s, d) => ev(s, d).where(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("first_signup")),
    Some("""SELECT user_id, CAST(min(ts) AS DATE) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY 1"""))

  // A6 + A10: dimension row per group with HAVING-style post-filter
  val a6 = Q("a6_dimension_having",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        to_date(min(col("o_orderdate"))).as("first_order"),
        to_date(max(col("o_orderdate"))).as("last_order"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        round(sum(col("o_totalprice")) + lit(0.001), 0).as("lifetime_value"))
      .where(col("n_orders") >= 3),
    Some("""SELECT o_custkey, count(*) AS n_orders,
      CAST(min(o_orderdate) AS DATE) AS first_order,
      CAST(max(o_orderdate) AS DATE) AS last_order,
      count(DISTINCT o_orderpriority) AS n_priorities,
      round(sum(o_totalprice) + 0.001,0) AS lifetime_value
      FROM orders GROUP BY 1 HAVING count(*) >= 3"""))

  // A13: monthly stats incl. stddev (different grain source: lineitem)
  val a13 = Q("a13_monthly_stats",
    (s, d) => li(s, d)
      .groupBy(year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("l_extendedprice")) + lit(1e-9), 6).as("avg_price"),
        round(percentile(col("l_extendedprice"), lit(0.5)) + lit(1e-9), 6)
          .as("median_price"),
        round(stddev_samp(col("l_extendedprice")) + lit(1e-9), 6).as("std_price")),
    Some("""SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
      EXTRACT(month FROM l_shipdate) AS ship_month, count(*) AS n,
      round(avg(l_extendedprice) + 1e-9,6) AS avg_price,
      round(quantile_cont(l_extendedprice, 0.5) + 1e-9,6) AS median_price,
      round(stddev_samp(l_extendedprice) + 1e-9,6) AS std_price
      FROM lineitem GROUP BY 1, 2"""))

  // A14: two-dimensional group stats (cluster × cycle analog)
  val a14 = Q("a14_two_key_stats",
    (s, d) => docs(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")) + lit(1e-9), 6).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars")),
    Some("""SELECT lang, source, count(*) AS n_docs,
      round(avg(n_chars) + 1e-9,6) AS avg_chars,
      min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM documents GROUP BY 1, 2"""))

  // A16: weekday / hour-of-day activity profile (D5 extracts)
  val a16 = Q("a16_weekday_hour_profile",
    (s, d) => ev(s, d)
      .groupBy(dayofweek(col("ts")).as("weekday"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value")),
    Some("""SELECT dayofweek(ts) + 1 AS weekday, EXTRACT(hour FROM ts) AS hour,
      count(*) AS n, round(sum(value),2) AS sum_value
      FROM events GROUP BY 1, 2"""))

  // A17: year/month time series on multi-year data (D4, D6)
  val a17 = Q("a17_yoy_monthly",
    (s, d) => li(s, d)
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty")),
    Some("""SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
      count(*) AS n, round(sum(l_quantity),2) AS sum_qty
      FROM lineitem GROUP BY 1"""))

  // A20: within-group distribution share via window over aggregate
  val a20 = Q("a20_within_group_share",
    (s, d) => {
      val counts = docs(s, d).groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"))
      counts.withColumn("pct_in_source",
        round(col("n") * lit(100.0) /
          sum(col("n")).over(Window.partitionBy(col("source"))) + lit(1e-9), 6))
    },
    Some("""WITH c AS (SELECT source, lang, count(*) AS n
        FROM documents GROUP BY 1, 2)
      SELECT source, lang, n,
        round(n * 100.0 / sum(n) OVER (PARTITION BY source) + 1e-9, 6)
          AS pct_in_source
      FROM c"""))

  // A21: over-representation vs global share (ratio of shares + filter)
  val a21 = Q("a21_over_representation",
    (s, d) => {
      // Global total as a broadcast 1-row aggregate, not an eager count():
      // keeps the whole query one lazy plan (no extra driver-side job).
      val total = broadcast(docs(s, d).agg(count(lit(1)).cast("double").as("__total")))
      val inSource = docs(s, d).groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .withColumn("pct_in_source",
          col("n") * lit(100.0) /
            sum(col("n")).over(Window.partitionBy(col("source"))))
      val global = docs(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("__lang_n"))
        .crossJoin(total)
        .select(col("lang"),
          (col("__lang_n") * lit(100.0) / col("__total")).as("pct_global"))
      inSource.join(global, Seq("lang"))
        .withColumn("ratio", col("pct_in_source") / col("pct_global"))
        .where(col("ratio") >= 1.5 && col("pct_in_source") > 20)
        .select(col("source"), col("lang"), col("n"),
          round(col("pct_in_source") + lit(1e-9), 6).as("pct_in_source"),
          round(col("pct_global") + lit(1e-9), 6).as("pct_global"),
          round(col("ratio") + lit(1e-9), 6).as("ratio"))
    },
    Some("""WITH c AS (SELECT source, lang, count(*) AS n
        FROM documents GROUP BY 1, 2),
      s AS (SELECT source, lang, n,
        n * 100.0 / sum(n) OVER (PARTITION BY source) AS pct_in_source FROM c),
      g AS (SELECT lang, count(*) * 100.0 /
          (SELECT count(*) FROM documents) AS pct_global
        FROM documents GROUP BY 1)
      SELECT source, s.lang, n,
        round(pct_in_source + 1e-9, 6) AS pct_in_source,
        round(pct_global + 1e-9, 6) AS pct_global,
        round(pct_in_source / pct_global + 1e-9, 6) AS ratio
      FROM s JOIN g ON s.lang = g.lang
      WHERE pct_in_source / pct_global >= 1.5 AND pct_in_source > 20"""))

  // A23/M10: monthly mean → returns → cumulative equity per strategy,
  // then a weighted two-strategy blend joined on month.
  val a23 = Q("a23_backtest_blend",
    (s, d) => {
      val monthly = li(s, d)
        .withColumn("strategy",
          when(col("l_returnflag") === "R", "contrarian").otherwise("momentum"))
        .groupBy(col("strategy"),
          date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
        .agg(avg(col("l_extendedprice")).as("avg_price"))
      val w = Window.partitionBy(col("strategy")).orderBy(col("ship_month"))
      val ret = monthly
        .withColumn("r",
          (col("avg_price") - lag(col("avg_price"), 1).over(w))
            / lag(col("avg_price"), 1).over(w))
        .where(col("r").isNotNull)
      val a = ret.where(col("strategy") === "momentum")
        .select(col("ship_month"), col("r").as("r_a"))
      val b = ret.where(col("strategy") === "contrarian")
        .select(col("ship_month"), col("r").as("r_b"))
      a.join(b, Seq("ship_month"))
        .select(col("ship_month"),
          round(col("r_a") + lit(1e-9), 6).as("r_a"),
          round(col("r_b") + lit(1e-9), 6).as("r_b"),
          round(col("r_a") * 0.6 + col("r_b") * 0.4 + lit(1e-9), 6)
            .as("r_blend"))
    },
    Some("""WITH m AS (SELECT
        CASE WHEN l_returnflag = 'R' THEN 'contrarian' ELSE 'momentum' END
          AS strategy,
        CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
        avg(l_extendedprice) AS avg_price
        FROM lineitem GROUP BY 1, 2),
      ret AS (SELECT strategy, ship_month,
        (avg_price - lag(avg_price) OVER (PARTITION BY strategy
          ORDER BY ship_month)) / lag(avg_price) OVER (PARTITION BY strategy
          ORDER BY ship_month) AS r FROM m)
      SELECT a.ship_month, round(a.r + 1e-9, 6) AS r_a,
        round(b.r + 1e-9, 6) AS r_b,
        round(a.r * 0.6 + b.r * 0.4 + 1e-9, 6) AS r_blend
      FROM ret a JOIN ret b ON a.ship_month = b.ship_month
        AND a.strategy = 'momentum' AND b.strategy = 'contrarian'
      WHERE a.r IS NOT NULL AND b.r IS NOT NULL"""))

  // P1/P2/P3/P4/P10/P11/P12: the minimal-schema projection pipeline —
  // rename, cast, defaults, conditionals, composite key, boolean derivation.
  val p1 = Q("p1_minimal_projection",
    (s, d) => ev(s, d).select(
      concat_ws("_", col("event_id"), col("user_id")).as("row_key"),
      col("event_id"),
      col("user_id").cast("string").as("actor"),
      lower(trim(col("event_type"))).as("event_type"),
      to_date(col("ts")).as("event_date"),
      coalesce(col("value"), lit(0.0)).as("value_filled"),
      when(col("value") > 50, lit("high")).otherwise(lit("normal"))
        .as("value_band"),
      (col("event_type") === "purchase").as("is_purchase")),
    Some("""SELECT event_id || '_' || user_id AS row_key, event_id,
      CAST(user_id AS VARCHAR) AS actor,
      lower(trim(event_type)) AS event_type,
      CAST(ts AS DATE) AS event_date,
      coalesce(value, 0.0) AS value_filled,
      CASE WHEN value > 50 THEN 'high' ELSE 'normal' END AS value_band,
      event_type = 'purchase' AS is_purchase
      FROM events"""))

  // P5-P8: compound filter (numeric, isin, range, not-null/not-empty)
  val p5 = Q("p5_compound_filter",
    (s, d) => ev(s, d)
      .where(col("value") >= 0 &&
        col("event_type").isin("purchase", "signup") &&
        col("ts").between(lit("2024-01-05").cast("timestamp"),
          lit("2024-01-25").cast("timestamp")) &&
        col("props").isNotNull && col("props") =!= "")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")),
    Some("""SELECT count(*) AS n, round(sum(value),2) AS sum_value FROM events
      WHERE value >= 0 AND event_type IN ('purchase','signup')
        AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
          AND TIMESTAMP '2024-01-25 00:00:00'
        AND props IS NOT NULL AND props <> ''"""))

  // F1-F8: string function battery incl. address-shortening display form
  val f1 = Q("f1_string_functions",
    (s, d) => docs(s, d).select(
      col("doc_id"),
      lower(col("source")).as("source_lower"),
      upper(col("lang")).as("lang_upper"),
      col("source").rlike("^src[0-9]+$").as("source_valid"),
      concat(substring(col("text"), 1, 6), lit("..."),
        substring(col("text"), -4, 4)).as("text_short"),
      length(col("text")).as("text_len"),
      trim(col("text")).substr(lit(1), lit(10)).as("text_head")),
    Some("""SELECT doc_id, lower(source) AS source_lower,
      upper(lang) AS lang_upper,
      regexp_full_match(source, 'src[0-9]+') AS source_valid,
      substr(text, 1, 6) || '...' || substr(text, length(text) - 3, 4)
        AS text_short,
      length(text) AS text_len,
      substr(trim(text), 1, 10) AS text_head
      FROM documents"""))

  // F5/F6: timestamp parse + format round trip
  val f5 = Q("f5_time_format",
    (s, d) => ev(s, d).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM").as("year_month"),
      date_format(col("ts"), "EEEE").as("weekday_name"),
      to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .cast("long").as("parsed_epoch")),
    Some("""SELECT event_id, strftime(ts, '%Y-%m') AS year_month,
      strftime(ts, '%A') AS weekday_name,
      CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS parsed_epoch
      FROM events"""))

  // D1/D2/D4/D5/D7/D8: date/time function battery
  val d1 = Q("d1_time_functions",
    (s, d) => ev(s, d).select(
      col("event_id"),
      year(col("ts")).as("y"),
      month(col("ts")).as("m"),
      quarter(col("ts")).as("q"),
      dayofweek(col("ts")).as("dow"),
      hour(col("ts")).as("h"),
      to_date(col("ts")).as("event_date"),
      date_sub(to_date(col("ts")), 7).as("week_before"),
      unix_micros(col("ts")).as("epoch_us"),
      timestamp_seconds(unix_micros(col("ts")).divide(lit(1000000)).cast("long"))
        .cast("date").as("roundtrip_date")),
    Some("""SELECT event_id, EXTRACT(year FROM ts) AS y,
      EXTRACT(month FROM ts) AS m, EXTRACT(quarter FROM ts) AS q,
      dayofweek(ts) + 1 AS dow, EXTRACT(hour FROM ts) AS h,
      CAST(ts AS DATE) AS event_date,
      CAST(ts AS DATE) - 7 AS week_before,
      epoch_us(ts) AS epoch_us,
      CAST(to_timestamp(epoch_us(ts) // 1000000) AS DATE) AS roundtrip_date
      FROM events"""))

  // V4: null counts per critical column (conditional-sum audit)
  val v4 = Q("v4_null_audit",
    (s, d) => {
      val e = ev(s, d)
      e.agg(
        count(lit(1)).as("n"),
        sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("null_event_id"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_user_id"),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("null_event_type"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_value"),
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("null_ts"))
    },
    Some("""SELECT count(*) AS n,
      count(*) FILTER (WHERE event_id IS NULL) AS null_event_id,
      count(*) FILTER (WHERE user_id IS NULL) AS null_user_id,
      count(*) FILTER (WHERE event_type IS NULL) AS null_event_type,
      count(*) FILTER (WHERE value IS NULL) AS null_value,
      count(*) FILTER (WHERE ts IS NULL) AS null_ts
      FROM events"""))

  // V5: whitelist audit — counts of values outside the declared domain
  val v5 = Q("v5_whitelist_audit",
    (s, d) => ev(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("is_valid",
        col("event_type").isin("click", "error", "purchase", "signup", "view")),
    Some("""SELECT event_type, count(*) AS n,
      event_type IN ('click','error','purchase','signup','view') AS is_valid
      FROM events GROUP BY 1"""))

  // V6: format audit via regex on an identifier-like column
  val v6 = Q("v6_format_audit",
    (s, d) => docs(s, d).agg(
      count(lit(1)).as("n"),
      sum(when(col("source").rlike("^src[0-9]+$"), 0L).otherwise(1L))
        .as("n_invalid_source"),
      sum(when(col("lang").rlike("^[a-z]{2}$"), 0L).otherwise(1L))
        .as("n_invalid_lang")),
    Some("""SELECT count(*) AS n,
      count(*) FILTER (WHERE NOT regexp_full_match(source, 'src[0-9]+'))
        AS n_invalid_source,
      count(*) FILTER (WHERE NOT regexp_full_match(lang, '[a-z]{2}'))
        AS n_invalid_lang
      FROM documents"""))

  // V7: numeric consistency audit (price-consistency analog)
  val v7 = Q("v7_consistency_audit",
    (s, d) => li(s, d).agg(
      count(lit(1)).as("n"),
      sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)).as("n_neg_price"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("n_bad_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L))
        .as("n_bad_discount"),
      sum(when(col("l_tax") < 0, 1L).otherwise(0L)).as("n_neg_tax")),
    Some("""SELECT count(*) AS n,
      count(*) FILTER (WHERE l_extendedprice < 0) AS n_neg_price,
      count(*) FILTER (WHERE l_quantity <= 0) AS n_bad_qty,
      count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
        AS n_bad_discount,
      count(*) FILTER (WHERE l_tax < 0) AS n_neg_tax
      FROM lineitem"""))

  // V8: timestamp plausibility audit (range + parseability)
  val v8 = Q("v8_timestamp_audit",
    (s, d) => ev(s, d).agg(
      count(lit(1)).as("n"),
      sum(when(col("ts") < lit("2015-01-01").cast("timestamp") ||
        col("ts") >= lit("2033-05-18").cast("timestamp"), 1L).otherwise(0L))
        .as("n_out_of_range"),
      sum(when(to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .isNull, 1L).otherwise(0L)).as("n_unparseable")),
    Some("""SELECT count(*) AS n,
      count(*) FILTER (WHERE ts < TIMESTAMP '2015-01-01 00:00:00'
        OR ts >= TIMESTAMP '2033-05-18 00:00:00') AS n_out_of_range,
      count(*) FILTER (WHERE try_cast(strftime(ts, '%Y-%m-%d %H:%M:%S')
        AS TIMESTAMP) IS NULL) AS n_unparseable
      FROM events"""))

  // O4: union-by-name with missing columns (schema-merging concat)
  val o4 = Q("o4_union_by_name",
    (s, d) => {
      val e = ev(s, d)
      val left = e.where(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val right = e.where(col("event_id") % 2 === 1)
        .select(col("event_id"), col("event_type"), col("user_id")) // no value
      left.unionByName(right, allowMissingColumns = true)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"))
    },
    Some("""WITH u AS (
        SELECT event_id, user_id, event_type, value FROM events
          WHERE event_id % 2 = 0
        UNION ALL BY NAME
        SELECT event_id, event_type, user_id FROM events
          WHERE event_id % 2 = 1)
      SELECT event_type, count(*) AS n,
        count(*) FILTER (WHERE value IS NULL) AS n_null_value
      FROM u GROUP BY 1"""))

  // O5: key-set intersection via chained semi-joins
  val o5 = Q("o5_key_intersection",
    (s, d) => {
      val e = ev(s, d)
      def users(t: String) =
        e.where(col("event_type") === t).select(col("user_id")).distinct()
      users("purchase")
        .join(users("signup"), Seq("user_id"), "left_semi")
        .join(users("error"), Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("n_users_in_all_three"))
    },
    Some("""SELECT count(*) AS n_users_in_all_three FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error')"""))

  val all: Seq[Q] = Seq(a3, a4, a6, a13, a14, a16, a17, a20, a21, a23,
    p1, p5, f1, f5, d1, v4, v5, v6, v7, v8, o4, o5)
}
