package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.operators._

/** Catalog part E: deterministic sampling/splits and the multi-window
  * peer-effect sweep.
  */
object QueriesE {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // Deterministic hash sample: ~30% of documents by doc_id
  val t9 = Q("t9_hash_sample",
    (s, d) => Sampling.hashSample(docs(s, d), "doc_id", buckets = 10, keep = 3)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), round(avg(col("n_chars")) + lit(1e-9), 6)
        .as("avg_chars")),
    Some("""SELECT lang, count(*) AS n, round(avg(n_chars) + 1e-9,6)
        AS avg_chars
      FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
        AS BIGINT) % 10 < 3
      GROUP BY 1"""))

  // Stable train/val/test split assignment (10% val, 10% test)
  val t10 = Q("t10_train_val_test_split",
    (s, d) => Sampling.withSplit(docs(s, d), "doc_id", valPct = 10,
        testPct = 10)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("source")).as("n_sources")),
    Some("""WITH b AS (SELECT *,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
          % 100 AS bucket
        FROM documents)
      SELECT CASE WHEN bucket < 10 THEN 'val'
        WHEN bucket < 20 THEN 'test' ELSE 'train' END AS split,
        count(*) AS n, count(DISTINCT source) AS n_sources
      FROM b GROUP BY 1"""))

  // The reference's full parameter sweep (window ∈ {7, 30}) as one plan
  val e3b = Q("e3b_peer_window_sweep",
    (s, d) => {
      val probes = ev(s, d).where(col("event_type") === "purchase")
      PeerEffects.multiWindowAgg(probes, ev(s, d), "user_id", "ts", "value",
          "event_id", windowsDays = Seq(7, 30))
        .groupBy(col("window_days"))
        .agg(count(lit(1)).as("n_probes"),
          sum(col("n_peers")).as("total_peers"),
          round(avg(col("peer_avg")) + lit(1e-9), 6).as("mean_peer_avg"))
    },
    Some("""WITH w AS (SELECT 7 AS window_days UNION ALL SELECT 30),
      per AS (SELECT e.event_id, w.window_days,
        count(p.value) AS n_peers, avg(p.value) AS peer_avg
        FROM events e
        CROSS JOIN w
        LEFT JOIN events p ON p.user_id = e.user_id
          AND p.ts >= e.ts - to_days(w.window_days) AND p.ts < e.ts
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2)
      SELECT window_days, count(*) AS n_probes,
        CAST(sum(n_peers) AS BIGINT) AS total_peers,
        round(avg(peer_avg) + 1e-9, 6) AS mean_peer_avg
      FROM per GROUP BY 1"""))

  val all: Seq[Q] = Seq(t9, t10, e3b)
}
