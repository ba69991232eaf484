package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
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

  // J11 scale form: (key, time-bucket) equi-keys split hot entities
  // across shuffle cells; same oracle as the plain j11 — identical
  // results, different physical plan.
  val j11b = Q("j11b_peer_window_bucketed",
    (s, d) => {
      val probes = ev(s, d).where(col("event_type") === "purchase")
      PeerEffects.windowAggBucketed(probes, ev(s, d), "user_id", "ts",
          "value", "event_id", windowDays = 7, bucketDays = 2)
        .select(col("event_id"), col("n_peers"),
          round(col("peer_avg") + lit(1e-9), 6).as("peer_avg"),
          col("peer_max"))
    },
    Some("""SELECT e.event_id, count(p.value) AS n_peers,
      round(avg(p.value) + 1e-9,6) AS peer_avg, max(p.value) AS peer_max
      FROM events e LEFT JOIN events p ON p.user_id = e.user_id
        AND p.ts >= e.ts - INTERVAL 7 DAY AND p.ts < e.ts
      WHERE e.event_type = 'purchase' GROUP BY 1"""))

  // Salted two-phase aggregation: correctness-neutral skew handling —
  // the oracle is the direct group-by.
  val o7 = Q("o7_salted_aggregate",
    (s, d) => Skew.saltedAggregate(ev(s, d), Seq("event_type"),
        Skew.SaltedAgg(sums = Seq("value"), mins = Seq("value"),
          maxs = Seq("value")), numSalts = 16)
      .select(col("event_type"), col("n"),
        round(col("sum_value"), 2).as("sum_value"),
        col("min_value"), col("max_value")),
    Some("""SELECT event_type, count(*) AS n, round(sum(value),2)
        AS sum_value,
      min(value) AS min_value, max(value) AS max_value
      FROM events GROUP BY 1"""))

  // Embedding-cosine near-duplicate pairs (threshold form of J12: all
  // pairs above a similarity bar, not top-k) — the embedding-space dedup
  // a training pipeline runs before sampling.
  val t11 = Q("t11_embedding_neardup",
    (s, d) => Similarity.exactThresholdPairs(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", 0.45),
    Some("""WITH unit AS (SELECT vec_id AS id,
        list_transform(embedding::DOUBLE[],
          x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
            embedding::DOUBLE[]))) AS vec
        FROM embeddings)
      SELECT a.id AS id_a, b.id AS id_b,
        round(list_dot_product(a.vec, b.vec) + 1e-9, 6) AS cosine
      FROM unit a JOIN unit b ON a.id < b.id
      WHERE list_dot_product(a.vec, b.vec) >= 0.45"""))

  // J12b — the reference's K-sweep (analyze_peer_effects.py:63-64 runs
  // K ∈ {10,20,50} as separate passes): K becomes a dimension column in
  // ONE plan — rank once at the maximum K, explode the K values, filter
  // rank <= K, aggregate per K. One crossJoin + one window for the whole
  // sweep instead of one per K.
  val j12b = Q("j12b_knn_k_sweep",
    (s, d) => Similarity.bruteForceTopK(
        Tables.embeddings(s, d), "vec_id", "embedding", 5)
      .withColumn("k", explode(array(lit(3), lit(5))))
      .where(col("rank") <= col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("cosine")) + lit(1e-9), 6).as("avg_cosine")),
    Some("""WITH unit AS (SELECT vec_id AS id,
        list_transform(embedding::DOUBLE[],
          x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
            embedding::DOUBLE[]))) AS vec
        FROM embeddings),
      pairs AS (SELECT a.id AS query_id, b.id AS neighbor_id,
        list_dot_product(a.vec, b.vec) AS c
        FROM unit a JOIN unit b ON a.id <> b.id),
      ranked AS (SELECT round(c + 1e-9, 6) AS cosine,
        row_number() OVER (PARTITION BY query_id
          ORDER BY c DESC, neighbor_id) AS rn FROM pairs),
      ks AS (SELECT unnest([3, 5]) AS k)
      SELECT k, count(*) AS n_pairs,
        round(avg(cosine) + 1e-9, 6) AS avg_cosine
      FROM ranked JOIN ks ON ranked.rn <= ks.k
      GROUP BY k"""))

  // t11b: the LSH-bucketed scale path for the same near-dup semantics —
  // checked against the SAME oracle as the exact t11 (the j11/j11b
  // pattern: one result contract, two plans). Candidates come from
  // hyperplane buckets; exact cosine only on candidates. At corpus scale
  // this replaces t11's O(N²) crossJoin with a bucket equi-join.
  //
  // Oracle-pinning caveat: exact-equality vs t11 holds on the FIXED
  // driver fixtures (per-pair miss ≈ 1e-4 at 2 planes / 16 tables,
  // verified at sf0.001/0.01/0.1) — regenerated embeddings or much
  // larger N could miss a pair without any code bug. That is a property
  // of checking an approximate operator against an exact oracle; the
  // recall-bound form of the guarantee (the one that survives any
  // fixture) is the lshThresholdPairsAuto measurement in OperatorsSpec
  // (recall 0.998 at a production threshold).
  val t11b = Q("t11b_embedding_neardup_lsh",
    (s, d) => Similarity.lshThresholdPairs(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", 0.45, dim = Tables.embeddingDim),
    t11.oracle)

  // T13: Gopher-style repetition quality filter — flags documents whose
  // duplicate-bigram or top-word share marks them as repetitious
  // low-quality training data. Pure array math; full SQL oracle.
  val t13 = Q("t13_repetition_quality",
    (s, d) => TextAnalysis.withRepetitionStats(docs(s, d), "text")
      .select(col("doc_id"), col("n_words"),
        round(col("dup_word_frac") + lit(1e-9), 6).as("dup_word_frac"),
        round(col("dup_bigram_frac") + lit(1e-9), 6).as("dup_bigram_frac"),
        round(col("top_word_frac") + lit(1e-9), 6).as("top_word_frac"),
        (col("dup_bigram_frac") > 0.3 || col("top_word_frac") > 0.2)
          .as("repetitive")),
    Some("""WITH w AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS words
        FROM documents),
      m AS (SELECT doc_id, len(words) AS n_words,
        1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
          AS dup_word_frac,
        CASE WHEN len(words) > 1 THEN 1.0 -
          CAST(len(list_distinct(list_transform(range(1, len(words)),
            i -> words[i] || ' ' || words[i + 1]))) AS DOUBLE)
            / (len(words) - 1)
          ELSE 0.0 END AS dup_bigram_frac,
        CAST(list_max(list_transform(list_distinct(words),
          w2 -> len(list_filter(words, x -> x = w2)))) AS DOUBLE)
          / len(words) AS top_word_frac
        FROM w)
      SELECT doc_id, n_words,
        round(dup_word_frac + 1e-9, 6) AS dup_word_frac,
        round(dup_bigram_frac + 1e-9, 6) AS dup_bigram_frac,
        round(top_word_frac + 1e-9, 6) AS top_word_frac,
        (dup_bigram_frac > 0.3 OR top_word_frac > 0.2) AS repetitive
      FROM m"""))

  // ST2: gap-based sessionization, batch form — same semantics as the
  // streaming flatMapGroupsWithState sessionizer (SessionizeSpec asserts
  // equivalence); here as window functions with a full SQL oracle.
  val st2 = Q("st2_sessionize_batch",
    (s, d) => Sessionize.batchSessions(ev(s, d), "user_id", "ts",
        "value", gapMinutes = 30)
      .select(col("user_id"), col("session_start_ms"),
        col("session_end_ms"), col("n_events"),
        round(col("sum_value") + lit(1e-9), 6).as("sum_value")),
    Some("""WITH flagged AS (SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
          OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 30 * 60 * 1000
          THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      indexed AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS session_idx FROM flagged)
      SELECT user_id,
        min(epoch_ms(ts)) AS session_start_ms,
        max(epoch_ms(ts)) AS session_end_ms,
        CAST(count(*) AS BIGINT) AS n_events,
        round(sum(value) + 1e-9, 6) AS sum_value
      FROM indexed GROUP BY user_id, session_idx"""))

  // J13 — as-of join (the market-data "quote in effect at trade time"):
  // each purchase matched to the most recent view of the same user at or
  // before it. The Spark plan is AsOfJoin.asOf's union + ordered window
  // (no join node, no range-join pair blowup); the oracle is DuckDB's
  // native ASOF LEFT JOIN. Views are pre-aggregated to one row per
  // (user, ts) — the uniqueness contract both forms need.
  val j13 = Q("j13_asof_join",
    (s, d) => {
      val views = ev(s, d).where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
        .withColumn("view_ts_sec", unix_seconds(col("ts")))
      val purchases = ev(s, d).where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.asOf(purchases, views, Seq("user_id"), "ts",
          Seq("view_value", "view_ts_sec"))
        .select(col("event_id"), col("user_id"),
          round(col("asof_view_value") + lit(1e-9), 6).as("asof_view_value"),
          col("asof_view_ts_sec"))
    },
    Some("""WITH v AS (SELECT user_id, ts, max(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      p AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id,
        round(v.view_value + 1e-9, 6) AS asof_view_value,
        CAST(floor(epoch(v.ts)) AS BIGINT) AS asof_view_ts_sec
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND v.ts <= p.ts"""))

  // ST3 — view→purchase attribution interval join, batch form. The
  // streaming twin is Streaming.intervalJoin (stream-stream inner join,
  // watermarked both sides, time-bounded both ends so join state is
  // evictable); StreamingSpec pins stream ≡ batch on this exact shape.
  // One hash-partitioned equi-join on user_id with the time bound as a
  // residual predicate — at scale this is j11's bucketed form's sibling.
  val st3 = Q("st3_interval_join_batch",
    (s, d) => {
      val purchases = ev(s, d).where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      val views = ev(s, d).where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      purchases.join(views,
          purchases("user_id") === views("user_id") &&
            col("v_ts") >= col("p_ts") - expr("interval 24 hours") &&
            col("v_ts") < col("p_ts"))
        .groupBy(purchases("event_id"))
        .agg(count(lit(1)).as("n_views"),
          min(unix_seconds(col("p_ts")) - unix_seconds(col("v_ts")))
            .as("min_gap_sec"))
    },
    Some("""SELECT p.event_id, count(*) AS n_views,
        min(date_diff('second', v.ts, p.ts)) AS min_gap_sec
      FROM events p JOIN events v ON v.user_id = p.user_id
        AND v.event_type = 'view'
        AND v.ts >= p.ts - INTERVAL 24 HOUR AND v.ts < p.ts
      WHERE p.event_type = 'purchase'
      GROUP BY 1"""))

  // Deterministic class-balanced sampling: per-language keep rates via
  // the same md5 hash bucket (downsample the dominant class).
  val t12 = Q("t12_stratified_sample",
    (s, d) => {
      val rate = when(col("lang") === "en", 20).otherwise(80) // of 100
      docs(s, d)
        .where(Sampling.hashBucket(col("doc_id"), 100) < rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          round(avg(col("n_chars")) + lit(1e-9), 6).as("avg_chars"))
    },
    Some("""SELECT lang, count(*) AS n_kept,
        round(avg(n_chars) + 1e-9, 6) AS avg_chars
      FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
          AS BIGINT) % 100
        < CASE WHEN lang = 'en' THEN 20 ELSE 80 END
      GROUP BY 1"""))

  // E3E — the reference's FULL peer-effect parameter grid
  // (analyze_peer_effects.py:32,63-64: K ∈ {10,20,50} × window ∈ {7,30},
  // six separate Python passes) as ONE plan: KNN ranked once at K=50,
  // peers joined once at the 30-day widest window, then the 6-combo grid
  // exploded and filtered before the per-(probe,k,window) aggregation —
  // j12b's rank-once-explode-K composed with e3b's window explode. The
  // output is the reference's 6-row elasticity table.
  val e3e = Q("e3e_peer_grid",
    (s, d) => {
      val purchases = ev(s, d).where(col("event_type") === "purchase")
      val neighbors = Similarity.bruteForceTopKFor(
        Tables.embeddings(s, d),
        purchases.select(col("user_id").as("vec_id")).distinct(),
        "vec_id", "embedding", 50)
      val probes = purchases.join(
        Tables.embeddings(s, d).select(col("vec_id").as("user_id")),
        Seq("user_id"), "left_semi")
      val peerStats = PeerEffects.neighborGridAgg(
        probes, neighbors, purchases, "user_id", "ts", "value", "event_id",
        ks = Seq(10, 20, 50), windowsDays = Seq(7, 30))
      val joined = peerStats.where(col("n_peers") > 0)
        .join(purchases.select(col("event_id"), col("value")),
          Seq("event_id"))
      Stats.olsByGroup(joined, Seq("k", "window_days"),
          col("peer_avg"), col("value"))
        .select(col("k"), col("window_days"), col("n"),
          round(col("slope") + lit(1e-9), 6).as("slope"),
          round(col("intercept") + lit(1e-9), 6).as("intercept"),
          round(col("r2") + lit(1e-9), 6).as("r2"))
    },
    Some("""WITH pairs AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          AS c
        FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
      ranked AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        ORDER BY c DESC, nid) AS rn FROM pairs),
      purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
      grid AS (SELECT k, window_days
        FROM (SELECT unnest([10, 20, 50]) AS k)
        CROSS JOIN (SELECT unnest([7, 30]) AS window_days)),
      peer AS (SELECT e.event_id, g.k, g.window_days,
        count(p.value) AS n_peers, avg(p.value) AS peer_avg
        FROM purchases e
        JOIN ranked nb ON nb.qid = e.user_id
        CROSS JOIN grid g
        JOIN purchases p ON p.user_id = nb.nid
          AND p.ts >= e.ts - to_days(g.window_days) AND p.ts < e.ts
        WHERE nb.rn <= g.k
        GROUP BY 1, 2, 3)
      SELECT peer.k, peer.window_days, count(*) AS n,
        round(regr_slope(e.value, peer.peer_avg) + 1e-9, 6) AS slope,
        round(regr_intercept(e.value, peer.peer_avg) + 1e-9, 6) AS intercept,
        round(regr_r2(e.value, peer.peer_avg) + 1e-9, 6) AS r2
      FROM peer JOIN purchases e ON e.event_id = peer.event_id
      GROUP BY 1, 2"""),
    product = Some((s, d) => {
      // the grid at scale rides the LSH neighbor provider (e3d's
      // production swap) ranked once at max-K — brute-force KNN is the
      // oracle-able ground truth, not the deployable plan
      val purchases = ev(s, d).where(col("event_type") === "purchase")
      val neighbors = Similarity.lshTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", 50, dim = Tables.embeddingDim)
      val probes = purchases.join(
        Tables.embeddings(s, d).select(col("vec_id").as("user_id")),
        Seq("user_id"), "left_semi")
      val peerStats = PeerEffects.neighborGridAgg(
        probes, neighbors, purchases, "user_id", "ts", "value", "event_id",
        ks = Seq(10, 20, 50), windowsDays = Seq(7, 30))
      val joined = peerStats.where(col("n_peers") > 0)
        .join(purchases.select(col("event_id"), col("value")),
          Seq("event_id"))
      Stats.olsByGroup(joined, Seq("k", "window_days"),
        col("peer_avg"), col("value"))
    }))

  // T14 — PII redaction over the documents table. The synthetic corpus
  // carries no real PII, so the query plants deterministic PII spans
  // (emails / phones / chain addresses keyed off doc_id — the oracle
  // replants them identically) and then runs the production operator.
  // Output keeps the redacted text as an md5 so the full masked string is
  // value-checked without shipping long text through the compare.
  val t14 = Q("t14_pii_redaction",
    (s, d) => {
      val planted = docs(s, d).withColumn("text_pii",
        when(col("doc_id") % 7 === 0, concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com")))
        .when(col("doc_id") % 11 === 0, concat(col("text"),
          lit(" call +1 555 000 12"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0")))
        .when(col("doc_id") % 13 === 0, concat(col("text"),
          lit(" wallet 0x"), lpad(col("doc_id").cast("string"), 40, "0")))
        .otherwise(col("text")))
      TextAnalysis.redactPii(planted, "text_pii")
        .select(col("doc_id"), col("n_redactions"),
          md5(col("text_redacted")).as("redacted_md5"))
    },
    Some("""WITH aug AS (SELECT doc_id,
        CASE WHEN doc_id % 7 = 0 THEN text || ' contact user'
            || CAST(doc_id AS VARCHAR) || '@example.com'
          WHEN doc_id % 11 = 0 THEN text || ' call +1 555 000 12'
            || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
          WHEN doc_id % 13 = 0 THEN text || ' wallet 0x'
            || lpad(CAST(doc_id AS VARCHAR), 40, '0')
          ELSE text END AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          + len(regexp_extract_all(t, '\+[0-9][0-9 -]{7,}[0-9]'))
          + len(regexp_extract_all(t, '0x[0-9a-fA-F]{40}')) AS BIGINT)
          AS n_redactions,
        md5(regexp_replace(regexp_replace(regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\+[0-9][0-9 -]{7,}[0-9]', '[PHONE]', 'g'),
          '0x[0-9a-fA-F]{40}', '[ADDR]', 'g')) AS redacted_md5
      FROM aug"""))

  // T15 — benchmark-contamination check: docs with doc_id % 97 == 0 play
  // the held-out eval set; every other document is scored by its count of
  // DISTINCT shared word 3-grams and flagged at >= 5 (the GPT-3/PaLM-style
  // n-gram decontamination pass, as a shingle equi-join — never all-pairs).
  val t15 = Q("t15_contamination_check",
    (s, d) => {
      val bench = docs(s, d).where(col("doc_id") % 97 === 0)
      val cands = docs(s, d).where(col("doc_id") % 97 =!= 0)
      TextAnalysis.contaminationCheck(cands, bench, "text", "doc_id",
        n = 3, minOverlap = 5)
    },
    Some("""WITH toks AS (SELECT doc_id,
        string_split_regex(trim(text), '\s+') AS tk FROM documents),
      sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ')
          AS shingle
        FROM toks, unnest(generate_series(1, len(tk) - 2)) AS g(i)
        WHERE len(tk) >= 3),
      bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
      SELECT s.doc_id, count(*) AS n_overlap,
        count(*) >= 5 AS contaminated
      FROM sh s JOIN bench b USING (shingle)
      WHERE s.doc_id % 97 <> 0
      GROUP BY 1"""))

  // T16 — deterministic shard packing: the md5-bucket shard assignment
  // (stable per doc across runs/engines, uncorrelated with ingest order =
  // a coordination-free global shuffle) summarized per shard. The physical
  // packing (one output partition per shard, key-sorted within) is
  // Sampling.packShards, exercised in SamplingSpec.
  val t16 = Q("t16_shard_pack",
    (s, d) => Sampling.withShard(docs(s, d), "doc_id", numShards = 16)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id")),
    Some("""SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
          AS BIGINT) % 16 AS shard,
        count(*) AS n_docs, count(DISTINCT source) AS n_sources,
        min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      FROM documents GROUP BY 1"""))

  // T17 — duplicate-CLUSTER resolution: near-dup pairs (same MinHash-LSH
  // plan as t5) closed under transitivity via distributed min-label
  // propagation, one canonical survivor per component (`keep` = the
  // min-id doc). This is the step that turns pair evidence into an
  // actionable training-set filter. Oracle: DuckDB recursive CTE
  // computes the same transitive closure over the same pairs.
  val t17 = Q("t17_dup_clusters",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dd = docs(s, d)
      Dedup.nearDupClusters(dd, "text", "doc_id")
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .withColumn("keep", col("doc_id") === col("cluster_id"))
    },
    Some("""WITH RECURSIVE toks AS (SELECT doc_id,
        string_split_regex(trim(text), '\s+') AS tk FROM documents),
      sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
        FROM toks, unnest(generate_series(1, len(tk) - 2)) AS g(i)
        WHERE len(tk) >= 3),
      hx AS (SELECT doc_id,
        CAST(('0x' || substr(md5(shingle), 1, 14)) AS BIGINT) % 2147483647
          AS h FROM sh),
      sig AS (SELECT doc_id, i AS hash_idx,
        min((h * ((2654435761 * (i+1)) % 2147483647)
          + ((40503 * (i+1)) % 2147483647)) % 2147483647) AS min_hash
        FROM hx, unnest(generate_series(0, 31)) AS g(i) GROUP BY 1, 2),
      band AS (SELECT doc_id, hash_idx // 4 AS band,
        list(min_hash ORDER BY hash_idx) AS bsig FROM sig GROUP BY 1, 2),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band a JOIN band b ON a.band = b.band AND a.bsig = b.bsig
          AND a.doc_id < b.doc_id),
      pairs AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
          CAST(sum(CASE WHEN sa.min_hash = sb.min_hash THEN 1 ELSE 0 END)
            AS DOUBLE) / 32 AS ej
          FROM cand
          JOIN sig sa ON sa.doc_id = id_a
          JOIN sig sb ON sb.doc_id = id_b AND sa.hash_idx = sb.hash_idx
          GROUP BY 1, 2) WHERE ej >= 0.5),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, m) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.id, e.dst FROM reach r JOIN edges e ON r.m = e.src),
      cc AS (SELECT id AS doc_id, min(m) AS cluster_id FROM reach GROUP BY 1)
      SELECT doc_id, cluster_id,
        count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        doc_id = cluster_id AS keep
      FROM cc"""))

  val all: Seq[Q] = Seq(t9, t10, e3b, e3e, j11b, j12b, j13, o7, st2, st3, t11,
    t11b, t12, t13, t14, t15, t16, t17)
}
