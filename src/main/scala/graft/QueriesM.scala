package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.Dedup

/** Catalog part M (round 8 continuation): pigeonhole-blocked SimHash
  * pair search and rolling correlation. Spark-first plans with full
  * DuckDB oracles.
  */
object QueriesM {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // T49 — SimHash hamming pairs via the pigeonhole block index: any
  // pair within 3 differing bits agrees exactly on one of 4 14-bit
  // blocks, so candidates are an equi-join on (block, value) with
  // GUARANTEED recall 1.0 — no probabilistic tables to size (t6's
  // fingerprints finally paired; the deterministic sibling of the
  // MinHash band join). The one-long signature rides the join (the
  // byte ledger that made minHashLshPairs go key-only points the other
  // way at 8 bytes — documented on the operator).
  val t49 = Q("t49_simhash_hamming_pairs",
    (s, d) => Dedup.simHashPairs(docs(s, d), "text", "doc_id",
      maxHamming = 3),
    Some("""WITH tk AS (SELECT doc_id,
        unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents),
      th AS (SELECT doc_id,
        CAST(('0x' || substr(md5(tok), 1, 14)) AS BIGINT) AS h
        FROM tk WHERE tok <> ''),
      votes AS (SELECT doc_id, b,
        sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th, unnest(generate_series(0, 55)) AS g(b) GROUP BY 1, 2),
      fp AS (SELECT doc_id,
        CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
          AS BIGINT) AS simhash FROM votes GROUP BY 1),
      blk AS (SELECT doc_id, simhash, b AS blk,
          (simhash >> (b * 14)) & 16383 AS bv
        FROM fp, unnest(generate_series(0, 3)) AS g(b)),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          a.simhash AS sh_a, b.simhash AS sh_b
        FROM blk a JOIN blk b ON a.blk = b.blk AND a.bv = b.bv
          AND a.doc_id < b.doc_id)
      SELECT id_a, id_b,
        CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3"""))

  // W30 — rolling 7-day correlation between daily activity (count) and
  // daily mean price: does volume track price this week? The windowed
  // sibling of m1's global Pearson; strict 7-row frames (w2's
  // convention — partial windows emit nothing). Facts reduce to the
  // calendar-bounded daily frame first; the global ordered window is
  // allowlisted on m29's argument.
  val w30 = Q("w30_rolling_corr",
    (s, d) => {
      val daily = ev(s, d)
        .where(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dte"))
        .agg(count(lit(1)).cast("double").as("x"),
          avg(col("value")).as("y"))
      val w = Window.orderBy(col("dte")).rowsBetween(-6, 0)
      daily
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__r", corr(col("x"), col("y")).over(w))
        .where(col("__n") === 7)
        .select(col("dte"), round(col("__r") + lit(1e-9), 6)
          .as("rolling_corr"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS dte,
        CAST(count(*) AS DOUBLE) AS x, avg(value) AS y FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY 1),
      w AS (SELECT dte, count(*) OVER win AS n,
          corr(x, y) OVER win AS r
        FROM daily WINDOW win AS (ORDER BY dte
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT dte, round(r + 1e-9, 6) AS rolling_corr
      FROM w WHERE n = 7"""))

  val all: Seq[Q] = Seq(t49, w30)
}
