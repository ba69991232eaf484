package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q

/** Catalog part N (round 8 continuation): audience decomposition, graph
  * assortativity, a distribution-free randomness test, and the Markov
  * entropy rate. Spark-first plans with full DuckDB oracles.
  */
object QueriesN {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  // A44 — new-vs-returning decomposition: daily active users split by
  // whether the day is the user's first-seen day. One per-user min-date
  // aggregate joined back to the distinct (user, day) frame — the
  // growth-accounting query every product dashboard leads with, and the
  // audience complement to a28's cohort retention.
  val a44 = Q("a44_new_vs_returning",
    (s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("dte")).distinct()
      val first = e.groupBy(col("user_id")).agg(min(col("dte")).as("fd"))
      e.join(first, "user_id")
        .groupBy(col("dte"))
        .agg(count(lit(1)).as("dau"),
          sum((col("fd") === col("dte")).cast("long")).as("new_users"))
        .withColumn("returning", col("dau") - col("new_users"))
    },
    Some("""WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dte
        FROM events WHERE ts IS NOT NULL),
      f AS (SELECT user_id, min(dte) AS fd FROM e GROUP BY 1)
      SELECT dte, CAST(count(*) AS BIGINT) AS dau,
        CAST(sum(CASE WHEN fd = dte THEN 1 ELSE 0 END) AS BIGINT)
          AS new_users,
        CAST(count(*) - sum(CASE WHEN fd = dte THEN 1 ELSE 0 END)
          AS BIGINT) AS returning
      FROM e JOIN f USING (user_id) GROUP BY 1"""))

  // G6 — degree assortativity: Pearson correlation of endpoint degrees
  // over the supplier backbone's edges (both orientations, so the
  // statistic is symmetric). Positive = hubs link hubs (social shape),
  // negative = hubs link leaves (infrastructure shape) — the one-number
  // topology fingerprint that decides whether g4's k-core or g5's
  // communities is the right lens. Degrees from one groupBy, two
  // broadcast-sized joins back, one corr aggregate.
  val g6 = Q("g6_degree_assortativity",
    (s, d) => {
      val e = QueriesG.backbone(s, d).localCheckpoint(true)
      val deg = e.select(col("s1").as("v"))
        .unionAll(e.select(col("s2").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).cast("double").as("deg"))
      val pairs = e
        .join(deg.select(col("v").as("s1"), col("deg").as("da")), "s1")
        .join(deg.select(col("v").as("s2"), col("deg").as("db")), "s2")
      // corr() written out as covar_pop/(σx·σy) behind a lazy when():
      // Spark's Corr throws DIVIDE_BY_ZERO under ANSI on a degenerate
      // graph (no edges, or all degrees equal — sf0.001's backbone),
      // where DuckDB's corr returns NULL; the guarded form returns NULL
      // on both engines and is identical at 6 dp otherwise.
      pairs.select(col("da").as("x"), col("db").as("y"))
        .unionAll(pairs.select(col("db").as("x"), col("da").as("y")))
        .agg(count(lit(1)).as("n_endpoints"),
          covar_pop(col("x"), col("y")).as("__cv"),
          stddev_pop(col("x")).as("__sx"), stddev_pop(col("y")).as("__sy"))
        .select(col("n_endpoints"),
          round(when(col("__sx") * col("__sy") > 0,
            col("__cv") / (col("__sx") * col("__sy"))) + lit(1e-9), 6)
            .as("assortativity"))
    },
    Some("""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      p AS (SELECT a.sp AS s1, b.sp AS s2, count(*) AS sc
        FROM e0 a JOIN e0 b ON a.c = b.c AND a.sp < b.sp GROUP BY 1, 2),
      e AS (SELECT s1, s2 FROM p ORDER BY sc DESC, s1, s2 LIMIT 500),
      deg AS (SELECT v, CAST(count(*) AS DOUBLE) AS deg FROM
        (SELECT s1 AS v FROM e UNION ALL SELECT s2 AS v FROM e)
        GROUP BY 1),
      pr AS (SELECT da.deg AS x, db.deg AS y FROM e
        JOIN deg da ON da.v = e.s1 JOIN deg db ON db.v = e.s2),
      sym AS (SELECT x, y FROM pr UNION ALL SELECT y, x FROM pr)
      SELECT CAST(count(*) AS BIGINT) AS n_endpoints,
        round(corr(x, y) + 1e-9, 6) AS assortativity FROM sym"""))

  // M41 — Wald-Wolfowitz runs test: is the daily mean-value series
  // random around its median, or does it trend/cluster? Median-split
  // signs, runs counted with one lag over the calendar-bounded daily
  // frame (allowlisted), then the closed-form normal approximation.
  // The randomness complement to m29's monotone-trend test.
  val m41 = Q("m41_runs_test",
    (s, d) => {
      val daily = ev(s, d)
        .where(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dte"))
        .agg(avg(col("value")).as("v"))
      val med = daily.agg(percentile(col("v"), lit(0.5)).as("__med"))
      val w = Window.orderBy(col("dte"))
      val flagged = daily.crossJoin(broadcast(med))
        .withColumn("s", (col("v") > col("__med")).cast("int"))
        .withColumn("chg",
          when(lag(col("s"), 1).over(w).isNotNull &&
            col("s") =!= lag(col("s"), 1).over(w), 1L).otherwise(0L))
      val agg = flagged.agg(
        count(lit(1)).as("n_days"),
        (sum(col("chg")) + 1L).as("n_runs"),
        sum(col("s").cast("long")).as("n_above"),
        (count(lit(1)) - sum(col("s").cast("long"))).as("n_below"))
      val n1 = col("n_above").cast("double")
      val n2 = col("n_below").cast("double")
      val n = n1 + n2
      val eR = lit(2.0) * n1 * n2 / n + lit(1.0)
      val vR = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n) /
        (n * n * (n - lit(1.0)))
      agg.select(col("n_days"), col("n_runs"), col("n_above"),
        col("n_below"),
        round((col("n_runs").cast("double") - eR) / sqrt(vR) + lit(1e-9), 6)
          .as("z"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS dte,
        avg(value) AS v FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY 1),
      med AS (SELECT quantile_cont(v, 0.5) AS m FROM daily),
      fl AS (SELECT dte, CASE WHEN v > m THEN 1 ELSE 0 END AS s
        FROM daily CROSS JOIN med),
      ch AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY dte) IS NOT NULL
          AND s <> lag(s) OVER (ORDER BY dte) THEN 1 ELSE 0 END AS chg
        FROM fl),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        CAST(sum(chg) + 1 AS BIGINT) AS n_runs,
        CAST(sum(s) AS BIGINT) AS n_above,
        CAST(count(*) - sum(s) AS BIGINT) AS n_below FROM ch)
      SELECT n_days, n_runs, n_above, n_below,
        round((CAST(n_runs AS DOUBLE) -
          (2.0 * n_above * n_below / (n_above + n_below) + 1.0)) /
          sqrt(2.0 * n_above * n_below *
            (2.0 * n_above * n_below - (n_above + n_below)) /
            (CAST(n_above + n_below AS DOUBLE) * (n_above + n_below) *
             (n_above + n_below - 1.0))) + 1e-9, 6) AS z
      FROM a"""))

  // M42 — Markov entropy rate: H = −Σ_ij (c_ij/n)·ln(c_ij/c_i) over
  // m16's per-user consecutive event-type transitions — how predictable
  // is the next action given the current one, in one number (the
  // information-theoretic roll-up of the full transition matrix).
  // Transition cells are ≤ |types|² rows; marginals via windows over
  // that bounded frame (m28's shape, allowlisted).
  val m42 = Q("m42_markov_entropy",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = ev(s, d).where(col("ts").isNotNull)
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .where(col("nxt").isNotNull)
      val cells = pairs.groupBy(col("event_type").as("i"),
          col("nxt").as("j"))
        .agg(count(lit(1)).cast("double").as("c"))
      cells
        .withColumn("ci", sum(col("c")).over(Window.partitionBy("i")))
        .withColumn("n", sum(col("c")).over(Window.partitionBy()))
        .agg(max(col("n")).cast("long").as("n_transitions"),
          round(-sum((col("c") / col("n")) *
            log(col("c") / col("ci"))) + lit(1e-9), 6)
            .as("entropy_rate_nats"))
    },
    Some("""WITH p AS (SELECT user_id, event_type AS i,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS j
        FROM events WHERE ts IS NOT NULL),
      cells AS (SELECT i, j, CAST(count(*) AS DOUBLE) AS c FROM p
        WHERE j IS NOT NULL GROUP BY 1, 2),
      m AS (SELECT i, j, c, sum(c) OVER (PARTITION BY i) AS ci,
        sum(c) OVER () AS n FROM cells)
      SELECT CAST(max(n) AS BIGINT) AS n_transitions,
        round(-sum((c / n) * ln(c / ci)) + 1e-9, 6) AS entropy_rate_nats
      FROM m"""))

  val all: Seq[Q] = Seq(a44, g6, m41, m42)
}
