package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.Dedup

/** Catalog part Q (round 8 continuation): forecast-accuracy backtest,
  * Brier calibration decomposition, asymmetric containment near-dup,
  * and a functional-dependency data-quality audit. Spark-first plans
  * with full DuckDB oracles.
  */
object QueriesQ {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // X126 — seasonal-naive forecast backtest with MASE: how predictable
  // is the daily series, scored by the standard scale-free forecast
  // metric (MASE = MAE of the 7-day seasonal-naive forecast / MAE of
  // the 1-day naive). MASE < 1 means weekly seasonality carries real
  // signal — the go/no-go check before fitting anything fancier (and
  // the evaluation harness a forecast deployment keeps). Calendar
  // alignment by date-equality joins (m40's pattern) so gaps drop out
  // instead of mis-aligning a row shift; all frames daily-bounded.
  val m48 = Q("m48_mase_backtest",
    (s, d) => {
      val daily = ev(s, d)
        .where(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dte"))
        .agg(sum(col("value")).as("v"))
        .localCheckpoint(true)
      val base = daily
        .join(daily.select(date_add(col("dte"), 7).as("dte"),
          col("v").as("v7")), "dte")
        .join(daily.select(date_add(col("dte"), 1).as("dte"),
          col("v").as("v1")), "dte")
      base.agg(count(lit(1)).as("n_days"),
        round(avg(abs(col("v") - col("v7"))) + lit(1e-9), 4)
          .as("mae_snaive7"),
        round(avg(abs(col("v") - col("v1"))) + lit(1e-9), 4)
          .as("mae_naive1"),
        round(sum(abs(col("v") - col("v7"))) /
          sum(abs(col("v") - col("v1"))) + lit(1e-9), 6).as("mase"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS dte, sum(value)
          AS v
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1),
      base AS (SELECT d.dte, d.v, s7.v AS v7, s1.v AS v1
        FROM daily d
        JOIN daily s7 ON s7.dte + 7 = d.dte
        JOIN daily s1 ON s1.dte + 1 = d.dte)
      SELECT CAST(count(*) AS BIGINT) AS n_days,
        round(avg(abs(v - v7)) + 1e-9, 4) AS mae_snaive7,
        round(avg(abs(v - v1)) + 1e-9, 4) AS mae_naive1,
        round(sum(abs(v - v7)) / sum(abs(v - v1)) + 1e-9, 6) AS mase
      FROM base"""))

  // X127 — Murphy decomposition of the Brier score: reliability −
  // resolution + uncertainty over 10 fixed probability bins — the
  // standard diagnostic splitting a probabilistic scorer's error into
  // "is it calibrated" (REL, lower better) vs "does it discriminate"
  // (RES, higher better) vs base-rate entropy (UNC). The identity
  // brier_binned = rel − res + unc holds exactly for bin-mean
  // forecasts; brier (raw) is also emitted. Predictor: value scaled
  // into [0,1]; outcome: purchase-vs-view (m26's population).
  val m49 = Q("m49_brier_decomposition",
    (s, d) => {
      val e = ev(s, d)
        .where(col("value").isNotNull &&
          col("event_type").isin("purchase", "view"))
        .select(
          least(greatest(col("value"), lit(0.0)) / 500, lit(1.0)).as("p"),
          when(col("event_type") === "purchase", 1.0).otherwise(0.0)
            .as("y"))
        .withColumn("bin", least(floor(col("p") * 10), lit(9L)))
      val g = broadcast(e.agg(count(lit(1)).as("nn"), avg(col("y")).as("ybar"),
        avg((col("p") - col("y")) * (col("p") - col("y"))).as("brier")))
      e.groupBy(col("bin"))
        .agg(count(lit(1)).as("nb"), avg(col("p")).as("pb"),
          avg(col("y")).as("yb"))
        .crossJoin(g)
        .agg(first(col("nn")).as("n"),
          round(first(col("brier")) + lit(1e-9), 6).as("brier"),
          round(sum(col("nb") * (col("pb") - col("yb")) *
            (col("pb") - col("yb"))) / first(col("nn")) + lit(1e-9), 6)
            .as("reliability"),
          round(sum(col("nb") * (col("yb") - col("ybar")) *
            (col("yb") - col("ybar"))) / first(col("nn")) + lit(1e-9), 6)
            .as("resolution"),
          round(first(col("ybar")) * (lit(1.0) - first(col("ybar")))
            + lit(1e-9), 6).as("uncertainty"))
    },
    Some("""WITH e AS (SELECT least(greatest(value, 0) / 500, 1.0) AS p,
          CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE value IS NOT NULL
          AND event_type IN ('purchase', 'view')),
      b AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin, p, y
        FROM e),
      g AS (SELECT CAST(count(*) AS BIGINT) AS nn, avg(y) AS ybar,
        avg((p - y) * (p - y)) AS brier FROM e),
      bins AS (SELECT bin, count(*) AS nb, avg(p) AS pb, avg(y) AS yb
        FROM b GROUP BY 1)
      SELECT any_value(g.nn) AS n,
        round(any_value(g.brier) + 1e-9, 6) AS brier,
        round(sum(nb * (pb - yb) * (pb - yb)) / any_value(g.nn)
          + 1e-9, 6) AS reliability,
        round(sum(nb * (yb - g.ybar) * (yb - g.ybar)) / any_value(g.nn)
          + 1e-9, 6) AS resolution,
        round(any_value(g.ybar) * (1 - any_value(g.ybar)) + 1e-9, 6)
          AS uncertainty
      FROM bins, g"""))

  // X128 — asymmetric containment near-dup: c(A→B) = |A∩B|/|A| over
  // 3-gram shingles, pair kept when either direction >= 0.5 — the
  // quote/boilerplate-inclusion case symmetric Jaccard structurally
  // misses (a block fully contained in a much larger page has Jaccard
  // ~|A|/|B| but containment ~1). Same posting join + hub cap as t7;
  // one shared shingle materialization.
  val t56 = Q("t56_containment_pairs",
    (s, d) => Dedup.containmentPairs(docs(s, d), "text", "doc_id",
      n = 3, minContainment = 0.5, maxShingleFreq = 100),
    Some(s"""WITH ${QueriesC.shingleSql},
      rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 100),
      pr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
      sizes AS (SELECT doc_id, count(*) AS set_size FROM pr GROUP BY 1),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(count(*) AS BIGINT) AS n_common
        FROM pr a JOIN pr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, n_common,
        round(CAST(n_common AS DOUBLE) / sa.set_size + 1e-9, 6)
          AS containment_a,
        round(CAST(n_common AS DOUBLE) / sb.set_size + 1e-9, 6)
          AS containment_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE greatest(CAST(n_common AS DOUBLE) / sa.set_size,
        CAST(n_common AS DOUBLE) / sb.set_size) >= 0.5"""))

  // X129 — functional-dependency audit: does lhs determine rhs? The
  // schema-contract check ingest runs next to v4-v8's value audits
  // (a violated FD usually means a bad join key or a duplicated
  // upstream export). One groupBy per declared FD; violations counted
  // as groups carrying >1 distinct rhs and the total surplus values.
  // event_id→user_id must HOLD (key integrity); the two behavioral
  // FDs are expected to fail — the audit proves both directions read
  // correctly, not just the happy path.
  val v11 = Q("v11_fd_audit",
    (s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type"),
          to_date(col("ts")).as("dte"))
        .localCheckpoint(true)
      def fd(name: String, lhs: org.apache.spark.sql.Column,
          rhs: org.apache.spark.sql.Column): DataFrame =
        e.groupBy(lhs.as("__l"))
          .agg(countDistinct(rhs).as("__d"))
          .agg(lit(name).as("fd"),
            count(lit(1)).as("n_groups"),
            sum(when(col("__d") > 1, 1L).otherwise(0L))
              .as("n_violating_groups"),
            sum(col("__d") - 1).as("n_extra_values"),
            (sum(when(col("__d") > 1, 1L).otherwise(0L)) === 0)
              .as("fd_holds"))
      fd("event_id->user_id", col("event_id"), col("user_id"))
        .unionByName(fd("user_id->event_type", col("user_id"),
          col("event_type")))
        .unionByName(fd("dte->event_type", col("dte"), col("event_type")))
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type,
          CAST(ts AS DATE) AS dte
        FROM events WHERE ts IS NOT NULL),
      f1 AS (SELECT event_id AS l, count(DISTINCT user_id) AS dv
        FROM e GROUP BY 1),
      f2 AS (SELECT user_id AS l, count(DISTINCT event_type) AS dv
        FROM e GROUP BY 1),
      f3 AS (SELECT dte AS l, count(DISTINCT event_type) AS dv
        FROM e GROUP BY 1)
      SELECT 'event_id->user_id' AS fd, CAST(count(*) AS BIGINT)
          AS n_groups,
        CAST(sum(CASE WHEN dv > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violating_groups,
        CAST(sum(dv - 1) AS BIGINT) AS n_extra_values,
        sum(CASE WHEN dv > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
      FROM f1
      UNION ALL
      SELECT 'user_id->event_type', CAST(count(*) AS BIGINT),
        CAST(sum(CASE WHEN dv > 1 THEN 1 ELSE 0 END) AS BIGINT),
        CAST(sum(dv - 1) AS BIGINT),
        sum(CASE WHEN dv > 1 THEN 1 ELSE 0 END) = 0
      FROM f2
      UNION ALL
      SELECT 'dte->event_type', CAST(count(*) AS BIGINT),
        CAST(sum(CASE WHEN dv > 1 THEN 1 ELSE 0 END) AS BIGINT),
        CAST(sum(dv - 1) AS BIGINT),
        sum(CASE WHEN dv > 1 THEN 1 ELSE 0 END) = 0
      FROM f3"""))

  val all: Seq[Q] = Seq(m48, m49, t56, v11)
}
