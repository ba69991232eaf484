package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, MapType, StringType,
  StructField, StructType}

import graft.QueryDef.Q
import graft.operators._
import graft.sources.{Readers, Writers}
import graft.streaming.Streaming

/** Catalog part C: sources/sinks round trips (S1, S4/S6), streaming,
  * broadcast dict-lookup and JSON-explode joins (J5, J8, J10/§2.11),
  * KMeans (M6), cycle sensitivity (M9), and the training-data-pipeline
  * extensions: MinHash-LSH / SimHash / n-gram-Jaccard dedup, subword
  * counting, LSH ANN, and multimodal asset plumbing.
  */
object QueriesC {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private def tmpDir(prefix: String, d: String): String =
    s"/tmp/graft_$prefix-${new java.io.File(d).getName}"

  // S1/S2/S7: CSV sink + tolerant multi-file scan + union-by-name roundtrip
  val s1 = Q("s1_csv_union_roundtrip",
    (s, d) => {
      val tmp = tmpDir("s1", d)
      val e = ev(s, d)
      Writers.writeCsv(e.where(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value")),
        s"$tmp/a")
      Writers.writeCsv(e.where(col("event_id") % 2 === 1)
        .select(col("event_id"), col("event_type"), col("user_id")), s"$tmp/b")
      Readers.readCsvUnionByName(s, Seq(s"$tmp/a", s"$tmp/b"),
          inferSchema = true)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
          round(sum(col("value")), 2).as("sum_value"))
    },
    Some("""WITH u AS (
        SELECT event_id, user_id, event_type, value FROM events
          WHERE event_id % 2 = 0
        UNION ALL BY NAME
        SELECT event_id, event_type, user_id FROM events
          WHERE event_id % 2 = 1)
      SELECT event_type, count(*) AS n,
        count(*) FILTER (WHERE value IS NULL) AS n_null_value,
        round(sum(value),2) AS sum_value
      FROM u GROUP BY 1"""))

  // S4/S6: hive-partitioned sink + partition-pruned scan roundtrip
  val s4 = Q("s4_partition_pruned_scan",
    (s, d) => {
      val tmp = tmpDir("s4", d)
      Writers.writePartitioned(
        ev(s, d).withColumn("event_date", to_date(col("ts"))),
        tmp, Seq("event_type"))
      Readers.readPartitioned(s, tmp)
        .where(col("event_type") === "purchase") // partition pruning
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    },
    Some("""SELECT CAST(ts AS DATE) AS event_date, count(*) AS n,
      round(sum(value),2) AS sum_value FROM events
      WHERE event_type = 'purchase' GROUP BY 1"""))

  // Streaming daily stats via Trigger.AvailableNow — same oracle shape as
  // a1 minus distinct counts (not available in streaming aggregation).
  val st1 = Q("st1_streaming_daily_stats",
    (s, d) => {
      // state = the daily grain (tens of rows): 2 state partitions, not
      // one per core — see runAvailableNow's statePartitions note. r16:
      // every micro-batch pays one delta-write + fsync per provider per
      // state store, so the provider count IS the streaming fixed cost
      // at this state volume (measured on st8: 8 -> 2 partitions cut
      // per-batch state commit 3.8 s -> 0.4 s of task time, run wall
      // 3.4 -> 2.6 s, identical results). A deployment with millions of
      // state keys passes a large value — the knob stays per-call.
      Streaming.runAvailableNow(s,
        s2 => Streaming.dailyStats(Streaming.readEventsStream(s2, d)),
        s"st1_mem_${System.nanoTime()}", statePartitions = Some(2))
    },
    Some("""SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_events,
      round(sum(value) + 1e-9,6) AS sum_value,
      round(avg(value) + 1e-9,6) AS avg_value FROM events GROUP BY 1"""))

  // X55 — stream-static broadcast enrichment: every AvailableNow
  // micro-batch left-joins the (re-read) embeddings label dimension,
  // unmatched users bucketed as -1 — the streaming twin of j5, oracled
  // against the equivalent static join. No state store, no watermark:
  // enrichment is stateless per batch, so the batch and streaming
  // results are identical by construction.
  val st7 = Q("st7_stream_static_enrich",
    (s, d) => {
      Streaming.runAvailableNow(s, s2 => {
        val dim = Tables.embeddings(s2, d)
          .select(col("vec_id").as("user_id"), col("label"))
        Streaming.staticEnrich(
            Streaming.readEventsStream(s2, d), dim, Seq("user_id"))
          .groupBy(coalesce(col("label"), lit(-1)).as("label"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")) + lit(1e-9), 6).as("sum_value"))
      }, s"st7_mem_${System.nanoTime()}", statePartitions = Some(2))
    },
    Some("""SELECT coalesce(label, -1) AS label, count(*) AS n,
      round(sum(value) + 1e-9, 6) AS sum_value
      FROM events LEFT JOIN embeddings ON user_id = vec_id GROUP BY 1"""))

  // J5/J6: broadcast enrichment join (txns ⋈ cluster assignments analog)
  val j5 = Q("j5_broadcast_enrich",
    (s, d) => {
      val dim = Tables.embeddings(s, d)
        .select(col("vec_id").as("user_id"), col("label"))
      ev(s, d).join(broadcast(dim), Seq("user_id"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          round(avg(col("value")) + lit(1e-9), 6).as("avg_value"))
    },
    Some("""SELECT label, count(*) AS n, count(DISTINCT user_id) AS n_users,
      round(avg(value) + 1e-9,6) AS avg_value
      FROM events JOIN embeddings ON user_id = vec_id GROUP BY 1"""))

  // J8/J9: dict-lookup as a broadcast join against an inline dimension
  val j8 = Q("j8_dict_lookup_join",
    (s, d) => {
      import s.implicits._
      val weights = Seq(("purchase", 1.0), ("signup", 0.5), ("click", 0.25),
        ("view", 0.05), ("error", 0.0)).toDF("event_type", "weight")
      ev(s, d).join(broadcast(weights), Seq("event_type"), "left")
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(round(sum(col("value") * col("weight")), 4).as("weighted_value"))
    },
    Some("""SELECT CAST(ts AS DATE) AS event_date,
      round(sum(value * CASE event_type WHEN 'purchase' THEN 1.0
        WHEN 'signup' THEN 0.5 WHEN 'click' THEN 0.25 WHEN 'view' THEN 0.05
        ELSE 0.0 END), 4) AS weighted_value
      FROM events GROUP BY 1"""))

  // J10 + §2.11: semi-structured traits via from_json + explode (the
  // reference's JSON-traits parse loop as a built-in Generator)
  val j10 = Q("j10_json_explode",
    (s, d) => ev(s, d)
      .select(col("value").as("event_value"),
        explode(from_json(col("props"), MapType(StringType, LongType))))
      .groupBy(col("key").as("prop_key"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("event_value")) + lit(1e-9), 6).as("avg_event_value"),
        round(avg(col("value")) + lit(1e-9), 6).as("avg_prop_value")),
    Some("""SELECT 'k' AS prop_key, count(*) AS n,
      round(avg(value) + 1e-9,6) AS avg_event_value,
      round(avg(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))
        + 1e-9,6) AS avg_prop_value
      FROM events WHERE regexp_extract(props, '"k":\s*(\d+)', 1) <> ''
      GROUP BY 1"""))

  // J10b: the reference's trait-metadata parse shape (SURVEY §1.1;
  // analyze_cluster_traits.py:58-145 over raw/bayc_metadata.json):
  // a JSON ARRAY of {"trait_type","value"} objects per token →
  // from_json to ARRAY<STRUCT> → map_from_entries → explode →
  // per-trait value shares. The testdata carries no array-JSON column,
  // so the attribute string is synthesized in-plan from event columns
  // (deterministic, same on both sides); the operator under test is the
  // array-parse path, which j10's MAP form does not exercise.
  val j10b = Q("j10b_trait_array_map",
    (s, d) => {
      val band = when(col("value") > 50, lit("high")).otherwise(lit("normal"))
      val attrs = concat(
        lit("""[{"trait_type":"EventType","value":""""), col("event_type"),
        lit(""""},{"trait_type":"ValueBand","value":""""), band,
        lit(""""}]"""))
      val traitSchema = ArrayType(StructType(Seq(
        StructField("trait_type", StringType),
        StructField("value", StringType))))
      val parsed = ev(s, d).select(
        map_from_entries(transform(from_json(attrs, traitSchema),
          x => struct(x.getField("trait_type"), x.getField("value"))))
          .as("traits"))
      parsed.select(explode(col("traits")).as(Seq("trait_type", "trait_value")))
        .groupBy(col("trait_type"), col("trait_value"))
        .agg(count(lit(1)).as("n"))
        .withColumn("pct_in_trait",
          round(col("n") * lit(100.0) /
            sum(col("n")).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("trait_type"))) + lit(1e-9), 6))
    },
    Some("""WITH t AS (
        SELECT 'EventType' AS trait_type, event_type AS trait_value
          FROM events
        UNION ALL
        SELECT 'ValueBand',
          CASE WHEN value > 50 THEN 'high' ELSE 'normal' END FROM events)
      SELECT trait_type, trait_value, count(*) AS n,
        round(count(*) * 100.0 /
          sum(count(*)) OVER (PARTITION BY trait_type) + 1e-9, 6)
          AS pct_in_trait
      FROM t GROUP BY 1, 2"""))

  // M6: distributed KMeans over the embedding table, driver-gated as an
  // ASSIGNMENT AUDIT (ann1's pattern; VERDICT r7 #3): centroid init is
  // engine-specific so raw assignments can't be hashed against an
  // oracle, but the Voronoi property — every vector in its nearest
  // centroid's cell — is engine-independent. The query fits k=10,
  // recomputes each vector's argmin-euclidean centroid in-plan
  // (broadcast centroid table, never a second fit), and reduces to a
  // deterministic (n_vectors, k_clusters, assign_nearest_ok) row DuckDB
  // reproduces. Per-cluster sizes/inertia stay unit-tested
  // (VisualMarketSpec); the production assignment path stays
  // Clustering.kmeansAssign (timed as the product side).
  val m6 = Q("m6_kmeans_clusters",
    (s, d) => graft.ml.Clustering.kmeansAssignAudit(
      Tables.embeddings(s, d), "vec_id", "embedding", k = 10, seed = 42),
    Some("""SELECT count(*) AS n_vectors, CAST(10 AS BIGINT) AS k_clusters,
      true AS assign_nearest_ok FROM embeddings"""),
    product = Some((s, d) => graft.ml.Clustering.kmeansAssign(
        Tables.embeddings(s, d), "vec_id", "embedding", k = 10, seed = 42)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))))

  // M9: regime-sensitivity score per group (pivoted conditional aggregates
  // + log-ratio + 3-way label)
  val m9 = Q("m9_cycle_sensitivity",
    (s, d) => {
      val e = ev(s, d).withColumn("event_date", to_date(col("ts")))
      e.groupBy(col("event_type"))
        .agg(
          avg(when(col("event_date") <= lit("2024-01-10").cast("date"),
            col("value"))).as("early_avg"),
          avg(when(col("event_date") > lit("2024-01-20").cast("date"),
            col("value"))).as("late_avg"))
        .withColumn("sensitivity", abs(log(col("early_avg") / col("late_avg"))))
        .select(col("event_type"),
          round(col("early_avg") + lit(1e-9), 6).as("early_avg"),
          round(col("late_avg") + lit(1e-9), 6).as("late_avg"),
          round(col("sensitivity") + lit(1e-9), 6).as("sensitivity"),
          when(col("sensitivity") > 0.10, "sensitive")
            .when(col("sensitivity") > 0.02, "moderate")
            .otherwise("stable").as("sensitivity_label"))
    },
    Some("""WITH g AS (SELECT event_type,
        avg(value) FILTER (WHERE CAST(ts AS DATE) <= DATE '2024-01-10')
          AS early_avg,
        avg(value) FILTER (WHERE CAST(ts AS DATE) > DATE '2024-01-20')
          AS late_avg
        FROM events GROUP BY 1)
      SELECT event_type, round(early_avg + 1e-9, 6) AS early_avg,
        round(late_avg + 1e-9, 6) AS late_avg,
        round(abs(ln(early_avg / late_avg)) + 1e-9, 6) AS sensitivity,
        CASE WHEN abs(ln(early_avg / late_avg)) > 0.10 THEN 'sensitive'
          WHEN abs(ln(early_avg / late_avg)) > 0.02 THEN 'moderate'
          ELSE 'stable' END AS sensitivity_label
      FROM g"""))

  // ---- training-data-pipeline dedup extensions --------------------------

  private[graft] val shingleSql = """toks AS (SELECT doc_id,
        string_split_regex(trim(text), '\s+') AS tk FROM documents),
      sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
        FROM toks, unnest(generate_series(1, len(tk) - 2)) AS g(i)
        WHERE len(tk) >= 3)"""

  // n-gram Jaccard near-dup pairs (exact verification path)
  val t7q = Q("t7_jaccard_pairs",
    (s, d) => Dedup.jaccardPairs(docs(s, d), "text", "doc_id",
      n = 3, threshold = 0.3, maxShingleFreq = 100),
    Some(s"""WITH $shingleSql,
      rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 100),
      pr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
      sizes AS (SELECT doc_id, count(*) AS set_size FROM pr GROUP BY 1),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM pr a JOIN pr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, round(CAST(n_common AS DOUBLE)
          / (sa.set_size + sb.set_size - n_common) + 1e-9, 6) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE)
        / (sa.set_size + sb.set_size - n_common) >= 0.3"""))

  // MinHash-LSH candidate pairs + signature-estimated Jaccard (scale path)
  val t5q = Q("t5_minhash_lsh_pairs",
    (s, d) => Dedup.minHashLshPairs(docs(s, d), "text", "doc_id",
      shingleSize = 3, numHashes = 32, rowsPerBand = 4, threshold = 0.5),
    Some(s"""WITH $shingleSql,
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
      est AS (SELECT id_a, id_b,
        CAST(sum(CASE WHEN sa.min_hash = sb.min_hash THEN 1 ELSE 0 END)
          AS DOUBLE) / 32 AS ej
        FROM cand
        JOIN sig sa ON sa.doc_id = id_a
        JOIN sig sb ON sb.doc_id = id_b AND sa.hash_idx = sb.hash_idx
        GROUP BY 1, 2)
      SELECT id_a, id_b, round(ej + 1e-9, 6) AS est_jaccard
      FROM est WHERE ej >= 0.5"""))

  // SimHash 56-bit fingerprints
  val t6q = Q("t6_simhash",
    (s, d) => Dedup.simHash(docs(s, d), "text", "doc_id"),
    Some("""WITH tk AS (SELECT doc_id,
        unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      th AS (SELECT doc_id,
        CAST(('0x' || substr(md5(tok), 1, 14)) AS BIGINT) AS h
        FROM tk WHERE tok <> ''),
      votes AS (SELECT doc_id, b,
        sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th, unnest(generate_series(0, 55)) AS g(b) GROUP BY 1, 2)
      SELECT doc_id,
        CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
          AS BIGINT) AS simhash
      FROM votes GROUP BY 1"""))

  // Token + BPE-ish subword count estimate
  val t8q = Q("t8_subword_count",
    (s, d) => docs(s, d).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.subwordCountEstimate(col("text")).as("n_subwords")),
    Some("""SELECT doc_id,
      CASE WHEN length(trim(text)) = 0 THEN 0
        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
      CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
          w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT)
        END AS n_subwords
      FROM documents"""))

  // ANN scale path, driver-gated as a RECALL AUDIT: the LSH top-k
  // (4 planes / 8 tables — the config production would tune) is scored
  // in-plan against the exact brute-force top-5, and the recall reduces
  // to a deterministic boolean the oracle asserts TRUE (planes are
  // hash-seeded, so recall is a fixed number per corpus: measured 0.68
  // at sf0.001, 0.70 at sf0.01, 0.73 at sf0.1 — floor pinned at 0.6,
  // same as the spec bound). Exact-side counts are emitted for the
  // oracle to reproduce. The approx-only production entry point stays
  // Similarity.lshTopK; the exact side here is the audit's ground
  // truth, not a production cost.
  val ann1 = Q("ann1_lsh_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      // two consumers (semi-join probe + count) — materialize the
      // exact top-k once
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", k = 5,
          numPlanes = 4, numTables = 8, dim = Tables.embeddingDim)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("__hits"))
      exact.agg(countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_exact"))
        .crossJoin(hits)
        .select(col("n_queries"), col("n_exact"),
          (col("__hits").cast("double") / col("n_exact") >= 0.6)
            .as("recall_ok"))
    },
    Some("""SELECT count(*) AS n_queries, 5 * count(*) AS n_exact,
      true AS recall_ok FROM embeddings"""),
    product = Some((s, d) => Similarity.lshTopK(Tables.embeddings(s, d),
      "vec_id", "embedding", k = 5, numPlanes = 4, numTables = 8,
      dim = Tables.embeddingDim)))

  // ANN self-sizing production path, driver-gated as a RECALL AUDIT
  // (ann1's shape): `lshTopKAuto` sizes planes from the
  // occupancy-constant rule and tables from the Charikar bound at the
  // (0.8, 0.9) operating point, so the config FOLLOWS the corpus
  // (n=500 → 2 planes × 3 tables; n=2000 → 4 × 5) instead of being
  // hand-pinned per scale like ann1's 4 × 8. Hash-seeded planes make
  // recall a fixed number per corpus: measured 0.749 at sf0.001, 0.740
  // at sf0.01, 0.557 at sf0.1 — the sf0.1 value is lower because the
  // synthetic corpus's true top-5 sit well below the 0.8 design cosine
  // (where the 0.9 bound actually applies); floor pinned at 0.45 =
  // min-across-fixtures minus margin.
  val ann5 = Q("ann5_lsh_auto",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val auto = Similarity.lshTopKAuto(emb, "vec_id", "embedding", k = 5,
          dim = Tables.embeddingDim)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(auto, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("__hits"))
      exact.agg(countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_exact"))
        .crossJoin(hits)
        .select(col("n_queries"), col("n_exact"),
          (col("__hits").cast("double") / col("n_exact") >= 0.45)
            .as("recall_ok"))
    },
    Some("""SELECT count(*) AS n_queries, 5 * count(*) AS n_exact,
      true AS recall_ok FROM embeddings"""),
    product = Some((s, d) => Similarity.lshTopKAuto(Tables.embeddings(s, d),
      "vec_id", "embedding", k = 5, dim = Tables.embeddingDim)))

  // ---- multimodal asset plumbing ---------------------------------------

  val mm1 = Q("mm1_multimodal_assets",
    (s, d) => Multimodal.withFakeDecodedFeatures(
        Multimodal.toAssets(docs(s, d), "doc_id", "text", "text/plain"))
      .select(col("asset_id"), col("media_type"), col("byte_len"),
        col("payload_md5"), col("width"), col("height"), col("aspect_ratio")),
    Some("""SELECT doc_id AS asset_id, 'text/plain' AS media_type,
      octet_length(encode(text)) AS byte_len, md5(text) AS payload_md5,
      CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
      CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
      round(CAST(octet_length(encode(text)) % 640 + 1 AS DOUBLE)
        / ((octet_length(encode(text)) * 7) % 480 + 1) + 1e-9, 6)
        AS aspect_ratio
      FROM documents"""))

  val mm2 = Q("mm2_patch_sampling",
    (s, d) => Multimodal.samplePatches(
        Multimodal.toAssets(docs(s, d), "doc_id", "text", "text/plain"), 4)
      .select(col("asset_id"), col("patch_idx"), col("patch_offset"),
        col("patch_sig")),
    Some("""SELECT doc_id AS asset_id, i AS patch_idx,
      CAST(floor(i * (octet_length(encode(text)) / 4.0)) AS BIGINT)
        AS patch_offset,
      md5(md5(text) || CAST(i AS VARCHAR)) AS patch_sig
      FROM documents, unnest(generate_series(0, 3)) AS g(i)"""))

  val all: Seq[Q] = Seq(s1, s4, st1, st7, j5, j8, j10, j10b, m6, m9,
    t5q, t6q, t7q, t8q, ann1, ann5, mm1, mm2)
}
