package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.{Similarity, TextAnalysis}

/** Catalog part I (round 8 continuation): intra-document span scrubbing
  * and minimizer fingerprints (the winnowing family of corpus-dedup
  * primitives), robust/grouped statistics, kNN classification over the
  * embedding corpus, decay-weighted scoring, and session path mining.
  * Spark-first plans with full DuckDB oracles, same determinism
  * discipline as parts A-H (md5-keyed hashes, explicit tie-breaks,
  * round(+1e-9, 6) on doubles).
  */
object QueriesI {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // T42 — intra-document repeated-span removal: the within-doc variant of
  // training-data dedup (every 3-gram occurrence after its first marks
  // its 3 positions; surviving tokens re-join in order). Covered
  // positions come from a bounded sequence-explode (3 rows per repeat
  // start — never a range join) and the scrub is one anti-join on
  // (doc, position); every shuffle keys on doc_id so the operator is
  // per-doc parallel at any corpus size. Output carries the rebuilt
  // text's md5 so the row stays narrow and the oracle can hash-compare
  // the exact reconstruction.
  val t42 = Q("t42_repeated_span_scrub",
    (s, d) => TextAnalysis.repeatedSpanScrub(docs(s, d), "doc_id", "text",
      k = 3),
    Some("""WITH base AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS tk
        FROM documents WHERE trim(text) <> ''),
      toks AS (SELECT doc_id, CAST(i AS BIGINT) AS p, tk[i] AS tok
        FROM base, unnest(generate_series(1, len(tk))) AS g(i)),
      grams AS (SELECT doc_id, CAST(i AS BIGINT) AS p,
          tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
        FROM base, unnest(generate_series(1, len(tk) - 2)) AS gs(i)),
      rep AS (SELECT doc_id, p FROM (SELECT doc_id, p,
          min(p) OVER (PARTITION BY doc_id, g) AS fp FROM grams)
        WHERE p > fp),
      cov AS (SELECT DISTINCT doc_id, p + d AS p
        FROM rep, unnest(generate_series(0, 2)) AS gd(d)),
      kept AS (SELECT doc_id, p, tok FROM toks t
        WHERE NOT EXISTS (SELECT 1 FROM cov c
          WHERE c.doc_id = t.doc_id AND c.p = t.p)),
      ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
          md5(string_agg(tok, ' ' ORDER BY p)) AS cleaned_md5
        FROM kept GROUP BY 1)
      SELECT b.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        CAST(len(tk) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        coalesce(cleaned_md5, md5('')) AS cleaned_md5
      FROM base b LEFT JOIN ka USING (doc_id)"""))

  // T43 — winnowing minimizer sketch: sliding min of token md5 hashes
  // over every 4-token window; the distinct-minimizer set is a
  // deterministic ~1/w-density fingerprint two shards of a 100 TB corpus
  // agree on exactly (the classic local-fingerprinting scheme for
  // shard-local near-dup candidate generation). One windowed min + one
  // per-doc aggregate; no joins beyond the per-doc length lookup.
  val t43 = Q("t43_minimizer_sketch",
    (s, d) => TextAnalysis.minimizerSketch(docs(s, d), "doc_id", "text",
      w = 4),
    Some("""WITH base AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS tk
        FROM documents WHERE trim(text) <> ''),
      toks AS (SELECT doc_id, CAST(i AS BIGINT) AS p, md5(tk[i]) AS h,
          len(tk) AS m
        FROM base, unnest(generate_series(1, len(tk))) AS g(i)),
      mins AS (SELECT doc_id, p, m, min(h) OVER (PARTITION BY doc_id
        ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS minz
        FROM toks),
      wins AS (SELECT doc_id, minz FROM mins WHERE p <= m - 3),
      nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
        FROM wins GROUP BY 1),
      dm AS (SELECT DISTINCT doc_id, minz FROM wins),
      sk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_minimizers,
          md5(string_agg(minz, '' ORDER BY minz)) AS sketch_md5
        FROM dm GROUP BY 1)
      SELECT b.doc_id, coalesce(n_windows, CAST(0 AS BIGINT)) AS n_windows,
        coalesce(n_minimizers, CAST(0 AS BIGINT)) AS n_minimizers,
        coalesce(sketch_md5, md5('')) AS sketch_md5
      FROM base b LEFT JOIN nw USING (doc_id) LEFT JOIN sk USING (doc_id)"""))

  // M32 — robust-center battery: trimmed mean (drop outside [p10, p90])
  // and winsorized mean (clamp into [p10, p90]) per event type. Exact
  // linear-interpolation percentiles (Spark percentile ≡ DuckDB
  // quantile_cont — the a11 equivalence) computed in one bounded
  // aggregate and broadcast back; the boundary compare is safe because a
  // data value can only equal an interpolated quantile when the quantile
  // IS an order statistic (frac = 0 or tied neighbors), which both
  // engines compute exactly.
  val m32 = Q("m32_robust_center",
    (s, d) => {
      val e = ev(s, d).where(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      val qs = e.groupBy(col("event_type")).agg(
        percentile(col("value"), lit(0.1)).as("q10"),
        percentile(col("value"), lit(0.9)).as("q90"))
      e.join(broadcast(qs), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("value")) + lit(1e-9), 6).as("full_mean"),
          round(avg(when(col("value") >= col("q10") &&
            col("value") <= col("q90"), col("value"))) + lit(1e-9), 6)
            .as("trimmed_mean"),
          round(avg(least(greatest(col("value"), col("q10")), col("q90")))
            + lit(1e-9), 6).as("winsor_mean"))
    },
    Some("""WITH e AS (SELECT event_type, value FROM events
        WHERE value IS NOT NULL),
      q AS (SELECT event_type, quantile_cont(value, 0.1) AS q10,
          quantile_cont(value, 0.9) AS q90 FROM e GROUP BY 1)
      SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        round(avg(value) + 1e-9, 6) AS full_mean,
        round(avg(CASE WHEN value >= q10 AND value <= q90 THEN value END)
          + 1e-9, 6) AS trimmed_mean,
        round(avg(least(greatest(value, q10), q90)) + 1e-9, 6)
          AS winsor_mean
      FROM e JOIN q USING (event_type) GROUP BY 1"""))

  // M33 — grouped OLS: per-event-type regression of value on hour-of-day,
  // closed form from one pass of moment sums (n, Σx, Σy, Σxx, Σyy, Σxy) —
  // the per-group sibling of m3's single regression. The oracle repeats
  // the identical closed-form arithmetic over its own sums rather than
  // regr_slope(), so both engines evaluate the same expression tree and
  // rounding absorbs only summation-order noise.
  val m33 = Q("m33_grouped_ols",
    (s, d) => {
      val e = ev(s, d).where(col("value").isNotNull && col("ts").isNotNull)
        .select(col("event_type"),
          hour(col("ts")).cast("double").as("x"), col("value").as("y"))
      val sums = e.groupBy(col("event_type")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      sums.select(col("event_type"), col("n").cast("long").as("n"),
        round(slope + lit(1e-9), 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n") + lit(1e-9), 6)
          .as("intercept"),
        round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
           (col("n") * col("syy") - col("sy") * col("sy"))) + lit(1e-9), 6)
          .as("r2"))
    },
    Some("""WITH s AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        sum(CAST(hour(ts) AS DOUBLE)) AS sx, sum(value) AS sy,
        sum(CAST(hour(ts) AS DOUBLE) * CAST(hour(ts) AS DOUBLE)) AS sxx,
        sum(value * value) AS syy,
        sum(CAST(hour(ts) AS DOUBLE) * value) AS sxy
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1)
      SELECT event_type, CAST(n AS BIGINT) AS n,
        round((n*sxy - sx*sy) / (n*sxx - sx*sx) + 1e-9, 6) AS slope,
        round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n + 1e-9, 6)
          AS intercept,
        round(pow(n*sxy - sx*sy, 2) /
          ((n*sxx - sx*sx) * (n*syy - sy*sy)) + 1e-9, 6) AS r2
      FROM s"""))

  // M34 — kNN majority-vote classification: every 10th vector is held
  // out as a query; its label is predicted by the modal label of its 5
  // nearest corpus vectors by cosine. Exact Q×N search here (the
  // oracle-checkable baseline, j12's arithmetic); the vote aggregate
  // composes unchanged over lshTopKAuto's candidates at corpus scale.
  // Ties: votes desc, then smallest label — fully deterministic.
  val m34 = Q("m34_knn_classify",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.knnClassify(
        emb.where(col("vec_id") % 10 =!= 0),
        emb.where(col("vec_id") % 10 === 0),
        "vec_id", "embedding", "label", k = 5)
    },
    Some("""WITH q AS (SELECT * FROM embeddings WHERE vec_id % 10 = 0),
      c AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
      pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          CAST(c.label AS BIGINT) AS label,
          list_cosine_similarity(q.embedding::DOUBLE[],
            c.embedding::DOUBLE[]) AS cosine
        FROM q, c),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id) AS rk FROM pairs),
      v AS (SELECT query_id, label, CAST(count(*) AS BIGINT) AS n_votes
        FROM r WHERE rk <= 5 GROUP BY 1, 2),
      m AS (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY n_votes DESC, label) AS vr FROM v)
      SELECT query_id, label AS predicted_label, n_votes
      FROM m WHERE vr = 1"""))

  // A38 — exponential time-decay scoring: each user's activity weighted
  // by exp(-age_days/30) as of the corpus max timestamp (one in-plan
  // scalar, broadcast — no driver collect). The recency-weighted ranking
  // every feed/abuse/engagement system keeps; map-side combinable sum,
  // top-20 with id tie-break.
  val a38 = Q("a38_time_decay_score",
    (s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull && col("value").isNotNull)
      val mx = e.agg(max(unix_millis(col("ts"))).as("__mx"))
      e.crossJoin(broadcast(mx))
        .withColumn("__wt", exp(-((col("__mx") - unix_millis(col("ts"))) /
          lit(86400000.0)) / lit(30.0)))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value") * col("__wt")).as("__score"))
        .orderBy(col("__score").desc, col("user_id")).limit(20)
        .select(col("user_id"), col("n_events"),
          round(col("__score") + lit(1e-9), 6).as("decayed_score"))
    },
    Some("""WITH e AS (SELECT user_id, value, epoch_ms(ts) AS ms
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      mx AS (SELECT max(ms) AS mx FROM e),
      s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          sum(value * exp(-((mx - ms) / 86400000.0) / 30.0)) AS score
        FROM e CROSS JOIN mx GROUP BY 1)
      SELECT user_id, n_events, round(score + 1e-9, 6) AS decayed_score
      FROM s ORDER BY score DESC, user_id LIMIT 20"""))

  // A39 — session path mining: gap-30min sessions (st2's semantics with
  // an explicit (ts, event_id) tie-break so the path string is
  // deterministic), path = first 8 event types joined by '>', top-10
  // paths by session count. The behavioral-sequence query product
  // analytics runs constantly; two user-keyed sorts + two aggregates,
  // no self-join.
  val a39 = Q("a39_session_paths",
    (s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ms = unix_millis(col("ts"))
      val prevMs = lag(ms, 1).over(wu)
      val flagged = e
        .withColumn("__new", when(prevMs.isNull ||
          ms - prevMs > 30 * 60 * 1000L, 1L).otherwise(0L))
        .withColumn("__sid", sum(col("__new")).over(
          wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("user_id"), col("__sid"))
            .orderBy(col("ts"), col("event_id"))))
      flagged.where(col("__rn") <= 8)
        .groupBy(col("user_id"), col("__sid"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("__rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(10)
    },
    Some("""WITH e AS (SELECT user_id, event_id, ts, event_type
        FROM events WHERE ts IS NOT NULL),
      flagged AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
          OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 30 * 60 * 1000
          THEN 1 ELSE 0 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      idx AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        CURRENT ROW) AS sid FROM flagged),
      rn AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
        ORDER BY ts, event_id) AS r FROM idx),
      p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY r)
        AS path FROM rn WHERE r <= 8 GROUP BY 1, 2)
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      FROM p GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10"""))

  val all: Seq[Q] = Seq(t42, t43, m32, m33, m34, a38, a39)
}
