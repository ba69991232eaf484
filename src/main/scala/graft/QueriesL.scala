package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q

/** Catalog part L (round 8 continuation): change-point detection,
  * autocorrelation, concentration share, and a null-rate drift audit.
  * Spark-first plans with full DuckDB oracles.
  */
object QueriesL {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  // W29 — CUSUM change-point scan: running sum of deviations from the
  // global mean over the daily total series; the day of maximum |CUSUM|
  // is the classic single-change-point estimate (the monitoring
  // companion to m17's PSI and w15's seasonal z). Both windows run on
  // the calendar-bounded DAILY frame (m22b/m29's argument), allowlisted
  // in WindowAuditSpec; facts are reduced by one groupBy first.
  val w29 = Q("w29_cusum_changepoint",
    (s, d) => {
      val daily = ev(s, d)
        .where(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dte"))
        .agg(sum(col("value")).as("v"))
      val m = daily.agg(avg(col("v")).as("__m"))
      val wcum = Window.orderBy(col("dte"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cusum = daily.crossJoin(broadcast(m))
        .withColumn("cusum", sum(col("v") - col("__m")).over(wcum))
      cusum
        .withColumn("__rn", row_number().over(
          Window.orderBy(abs(col("cusum")).desc, col("dte"))))
        .where(col("__rn") === 1)
        .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
        .select(col("n_days"), col("dte").as("changepoint_date"),
          round(abs(col("cusum")) + lit(1e-9), 6).as("max_abs_cusum"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS dte,
        sum(value) AS v FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY 1),
      m AS (SELECT avg(v) AS mn, CAST(count(*) AS BIGINT) AS n_days
        FROM daily),
      c AS (SELECT dte, sum(v - mn) OVER (ORDER BY dte
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        FROM daily CROSS JOIN m),
      r AS (SELECT dte, cusum, row_number() OVER
        (ORDER BY abs(cusum) DESC, dte) AS rn FROM c)
      SELECT m.n_days, r.dte AS changepoint_date,
        round(abs(r.cusum) + 1e-9, 6) AS max_abs_cusum
      FROM r CROSS JOIN m WHERE r.rn = 1"""))

  // M40 — autocorrelation function, lags 1..7, over the daily mean
  // series: ACF_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)². Pairs come from
  // a calendar-index equi-join (i+k = i'), so missing days drop out
  // naturally instead of mis-aligning a row-shift; the mean/ssq scalars
  // ride one broadcast. The weekly-seasonality fingerprint m25's
  // decomposition assumes — here measured, not assumed.
  val m40 = Q("m40_acf",
    (s, d) => {
      val daily = ev(s, d)
        .where(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dte"))
        .agg(avg(col("value")).as("v"))
        .withColumn("i",
          datediff(col("dte"), lit("1970-01-01").cast("date")))
        .select(col("i"), col("v"))
      val stats = daily.crossJoin(broadcast(daily.agg(avg(col("v"))
          .as("__m"))))
        .agg(max(col("__m")).as("__m"),
          sum(pow(col("v") - col("__m"), 2)).as("__ssq"))
      daily.withColumn("k", explode(sequence(lit(1), lit(7))))
        .select((col("i") + col("k")).as("ib"), col("k"),
          col("v").as("va"))
        .join(daily.select(col("i").as("ib"), col("v").as("vb")), "ib")
        .crossJoin(broadcast(stats))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum((col("va") - col("__m")) * (col("vb") - col("__m"))) /
            max(col("__ssq")) + lit(1e-9), 6).as("acf"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS dte,
        avg(value) AS v FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY 1),
      ix AS (SELECT date_diff('day', DATE '1970-01-01', dte) AS i, v
        FROM daily),
      st AS (SELECT avg(v) AS m FROM ix),
      ssq AS (SELECT sum(pow(v - m, 2)) AS s FROM ix CROSS JOIN st)
      SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
        round(sum((a.v - st.m) * (b.v - st.m)) / max(ssq.s) + 1e-9, 6)
          AS acf
      FROM ix a, unnest(generate_series(1, 7)) AS g(k)
      JOIN ix b ON b.i = a.i + k
      CROSS JOIN st CROSS JOIN ssq
      GROUP BY k"""))

  // A42 — Pareto concentration share: what fraction of total value the
  // top 1% of users carries — the point statistic behind m19's full
  // Gini curve. Threshold = exact p99 of per-user totals (one bounded
  // aggregate broadcast back, m32's order-statistic boundary safety);
  // membership and shares are then plain conditional sums.
  val a42 = Q("a42_pareto_share",
    (s, d) => {
      val u = ev(s, d).where(col("value").isNotNull)
        .groupBy(col("user_id")).agg(sum(col("value")).as("m"))
      val thr = u.agg(percentile(col("m"), lit(0.99)).as("__thr"))
      u.crossJoin(broadcast(thr)).agg(
        count(lit(1)).as("n_users"),
        sum((col("m") >= col("__thr")).cast("long")).as("n_top"),
        round(max(col("__thr")) + lit(1e-9), 6).as("p99_threshold"),
        round(sum(when(col("m") >= col("__thr"), col("m"))
          .otherwise(lit(0.0))) / sum(col("m")) + lit(1e-9), 6)
          .as("top_share"))
    },
    Some("""WITH u AS (SELECT user_id, sum(value) AS m FROM events
        WHERE value IS NOT NULL GROUP BY 1),
      t AS (SELECT quantile_cont(m, 0.99) AS thr FROM u)
      SELECT CAST(count(*) AS BIGINT) AS n_users,
        CAST(sum(CASE WHEN m >= thr THEN 1 ELSE 0 END) AS BIGINT)
          AS n_top,
        round(max(thr) + 1e-9, 6) AS p99_threshold,
        round(sum(CASE WHEN m >= thr THEN m ELSE 0.0 END) / sum(m)
          + 1e-9, 6) AS top_share
      FROM u CROSS JOIN t"""))

  // V10 — null-rate drift audit: per-column null rates across two
  // deterministic ingest shards (event_id parity — reproducible, unlike
  // wall-clock file order) and their drift. The schema-health companion
  // to m17's value-distribution PSI: a column whose null rate moves
  // between ingest batches is the classic upstream-schema-change
  // symptom. One aggregate per shard, integer counts, single divisions
  // — bit-exact cross-engine; unpivoted via stack so the report is one
  // row per column.
  val v10 = Q("v10_null_drift",
    (s, d) => {
      val byShard = ev(s, d)
        .groupBy((col("event_id") % 2).as("shard"))
        .agg(count(lit(1)).as("n"),
          sum(col("ts").isNull.cast("long")).as("ts"),
          sum(col("value").isNull.cast("long")).as("value"),
          sum(col("props").isNull.cast("long")).as("props"),
          sum(col("event_type").isNull.cast("long")).as("event_type"))
      val long = byShard.selectExpr("shard", "n",
        "stack(4, 'ts', ts, 'value', value, 'props', props, " +
          "'event_type', event_type) AS (col_name, n_null)")
      long.groupBy(col("col_name")).agg(
          sum(when(col("shard") === 0, col("n_null"))).as("n_null_a"),
          sum(when(col("shard") === 1, col("n_null"))).as("n_null_b"),
          max(when(col("shard") === 0, col("n"))).as("__na"),
          max(when(col("shard") === 1, col("n"))).as("__nb"))
        .select(col("col_name"), col("n_null_a"), col("n_null_b"),
          round(col("n_null_a").cast("double") / col("__na") + lit(1e-9), 6)
            .as("rate_a"),
          round(col("n_null_b").cast("double") / col("__nb") + lit(1e-9), 6)
            .as("rate_b"),
          round(abs(col("n_null_a").cast("double") / col("__na") -
            col("n_null_b").cast("double") / col("__nb")) + lit(1e-9), 6)
            .as("drift"))
    },
    Some("""WITH s AS (SELECT event_id % 2 AS shard,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS ts_n,
        CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS value_n,
        CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS props_n,
        CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS event_type_n
        FROM events GROUP BY 1),
      u AS (
        SELECT shard, n, 'ts' AS col_name, ts_n AS n_null FROM s
        UNION ALL SELECT shard, n, 'value', value_n FROM s
        UNION ALL SELECT shard, n, 'props', props_n FROM s
        UNION ALL SELECT shard, n, 'event_type', event_type_n FROM s)
      SELECT col_name,
        CAST(sum(CASE WHEN shard = 0 THEN n_null END) AS BIGINT)
          AS n_null_a,
        CAST(sum(CASE WHEN shard = 1 THEN n_null END) AS BIGINT)
          AS n_null_b,
        round(CAST(sum(CASE WHEN shard = 0 THEN n_null END) AS DOUBLE) /
          max(CASE WHEN shard = 0 THEN n END) + 1e-9, 6) AS rate_a,
        round(CAST(sum(CASE WHEN shard = 1 THEN n_null END) AS DOUBLE) /
          max(CASE WHEN shard = 1 THEN n END) + 1e-9, 6) AS rate_b,
        round(abs(CAST(sum(CASE WHEN shard = 0 THEN n_null END) AS DOUBLE)
            / max(CASE WHEN shard = 0 THEN n END) -
          CAST(sum(CASE WHEN shard = 1 THEN n_null END) AS DOUBLE) /
            max(CASE WHEN shard = 1 THEN n END)) + 1e-9, 6) AS drift
      FROM u GROUP BY 1"""))

  val all: Seq[Q] = Seq(w29, m40, a42, v10)
}
