package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.{Graph, Sampling, Similarity, Stats}
import graft.sources.Writers

/** Catalog part U (round 12): oracle coverage for the two sink operators
  * that were spec-only through round 11 (VERDICT r11 #5) — dynamic
  * partition overwrite (X11) and small-file compaction (X49) — each
  * query DRIVES the sink against a temp directory and returns the
  * post-write state as a DataFrame, so the DuckDB oracle checks the
  * sink's effect (replace semantics, row preservation, output file
  * count), not just that a write call didn't throw. Plus three new
  * operator families: inter-rater agreement (Cohen's κ — annotation
  * QA), per-node local clustering coefficients (graph-aware
  * stratification), and matryoshka prefix-truncation recall (the MRL
  * embedding storage knob).
  */
object QueriesU {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Fresh temp dir per invocation (bench reps re-run the whole
    * write+read cycle — these are sink benchmarks by design). Not
    * deleted until JVM exit: Verify materializes the returned frame
    * AFTER the query function returns.
    */
  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // O15 — incremental ingest via dynamic partition overwrite (X11): a
  // full partitioned write, then a DELTA overwrite of one partition
  // (the daily re-ingest pattern at 100 TB: only the re-ingested
  // partition directory is rewritten). The delta deliberately changes
  // BOTH the row count and the values of the replaced partition, so the
  // read-back can only match the oracle if the sink REPLACED the
  // partition (append would inflate the count, merge would keep the
  // dropped rows, a static overwrite would erase the other four
  // partitions).
  val o15 = Q("o15_dynamic_partition_overwrite",
    (s, d) => {
      val out = tmpDir("graft_o15")
      val events = ev(s, d).select(col("event_id"), col("user_id"),
        col("value"), col("event_type"))
      Writers.writePartitioned(events, out, Seq("event_type"))
      val delta = events
        .where(col("event_type") === "purchase" && col("value") > 50)
        .withColumn("value", col("value") * 2)
      Writers.overwritePartitions(delta, out, Seq("event_type"))
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")) + lit(1e-9), 6).as("sum_value"))
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        round(sum(value) + 1e-9, 6) AS sum_value
      FROM (
        SELECT event_type, value * 2 AS value FROM events
          WHERE event_type = 'purchase' AND value > 50
        UNION ALL
        SELECT event_type, value FROM events WHERE event_type <> 'purchase'
      ) GROUP BY 1"""))

  // O16 — small-file compaction (X49): shatter the events table into 64
  // tiny files, compact to ~25K-row files, then read back. The oracle
  // pins (a) row and value preservation (compaction must be a pure
  // layout rewrite) and (b) the OUTPUT FILE COUNT — ceil(rows / target),
  // a number DuckDB derives from the data alone, so a compactor that
  // skipped the rewrite (64 files) or collapsed to one task regardless
  // of size (1 file at every SF) fails on a value, not a vibe.
  val o16 = Q("o16_compaction",
    (s, d) => {
      val out = tmpDir("graft_o16")
      val events = ev(s, d).select(col("event_id"), col("user_id"),
        col("value"), col("event_type"))
      events.repartition(64).write.mode("overwrite").parquet(out)
      Writers.compact(s, out, targetRowsPerFile = 25000L)
      val nFiles = new java.io.File(out).listFiles()
        .count(f => f.isFile && f.getName.startsWith("part-"))
      s.read.parquet(out)
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("value")) + lit(1e-9), 6).as("sum_value"))
        .withColumn("n_files", lit(nFiles.toLong))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
        round(sum(value) + 1e-9, 6) AS sum_value,
        CAST(ceil(count(*) / 25000.0) AS BIGINT) AS n_files
      FROM events"""))

  // M58 — Cohen's kappa between two deterministic "annotators" over the
  // document corpus: rater A buckets by length (n_chars thresholds),
  // rater B by mean word length (chars per whitespace-token) — two
  // quality heuristics whose RAW agreement is inflated by the dominant
  // middle class; κ reports the chance-corrected signal an annotation
  // gate must threshold on. Both raters are pure integer/double CASE
  // algebra, reproduced verbatim in the oracle.
  val m58 = Q("m58_cohens_kappa",
    (s, d) => {
      val base = docs(s, d).withColumn("__spaces",
        length(col("text")) - length(regexp_replace(col("text"), " ", "")))
      val r1 = when(col("n_chars") < 400, 0L)
        .when(col("n_chars") < 900, 1L).otherwise(2L)
      val r2 = when(col("n_chars") / (col("__spaces") + 1.0) < 5.6, 0L)
        .when(col("n_chars") / (col("__spaces") + 1.0) < 6.4, 1L)
        .otherwise(2L)
      Stats.cohensKappa(base, r1, r2)
    },
    Some("""WITH r AS (SELECT
        CASE WHEN n_chars < 400 THEN 0 WHEN n_chars < 900 THEN 1 ELSE 2 END AS a,
        CASE WHEN n_chars / (length(text) - length(replace(text, ' ', '')) + 1.0) < 5.6 THEN 0
             WHEN n_chars / (length(text) - length(replace(text, ' ', '')) + 1.0) < 6.4 THEN 1
             ELSE 2 END AS b
        FROM documents),
      cells AS (SELECT a, b, count(*)::DOUBLE AS c FROM r GROUP BY 1, 2),
      tot AS (SELECT sum(c) AS n,
        sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree FROM cells),
      m1 AS (SELECT a, sum(c) AS ca FROM cells GROUP BY 1),
      m2 AS (SELECT b, sum(c) AS cb FROM cells GROUP BY 1),
      pe AS (SELECT coalesce(sum(ca * cb), 0) AS pen2
        FROM m1 JOIN m2 ON m1.a = m2.b)
      SELECT CAST(n AS BIGINT) AS n_items, CAST(agree AS BIGINT) AS n_agree,
        round(agree / n + 1e-9, 6) AS p_o,
        round(pen2 / (n * n) + 1e-9, 6) AS p_e,
        round((agree / n - pen2 / (n * n)) / (1.0 - pen2 / (n * n)) + 1e-9, 6)
          AS kappa
      FROM tot, pe"""))

  // G11 — per-node local clustering coefficient over g3's co-occurrence
  // backbone: the node-grain refinement of the triangle census
  // (community cores vs brokers at the same degree). Spark enumerates
  // each triangle once via degree orientation; the oracle re-derives
  // every per-node count with the naive oriented three-way self-join —
  // different enumeration, same triangles (the g3 discipline), now
  // checked at NODE grain.
  val g11 = Q("g11_local_clustering",
    (s, d) => Graph.localClustering(QueriesG.backbone(s, d)),
    Some("""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      p AS (SELECT a.sp AS s1, b.sp AS s2, count(*) AS sc
        FROM e0 a JOIN e0 b ON a.c = b.c AND a.sp < b.sp GROUP BY 1, 2),
      e AS (SELECT s1, s2 FROM p ORDER BY sc DESC, s1, s2 LIMIT 500),
      tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
        FROM e e1 JOIN e e2 ON e2.s1 = e1.s1 AND e2.s2 > e1.s2
                  JOIN e e3 ON e3.s1 = e1.s2 AND e3.s2 = e2.s2),
      pt AS (SELECT v, count(*) AS t FROM (
          SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri) GROUP BY 1),
      deg AS (SELECT v, count(*) AS d FROM
        (SELECT s1 AS v FROM e UNION ALL SELECT s2 AS v FROM e) GROUP BY 1)
      SELECT deg.v AS node, CAST(deg.d AS BIGINT) AS degree,
        CAST(coalesce(pt.t, 0) AS BIGINT) AS n_triangles,
        round(CASE WHEN deg.d >= 2
          THEN 2.0 * coalesce(pt.t, 0) / (deg.d * (deg.d - 1))
          ELSE 0 END + 1e-9, 6) AS local_cc
      FROM deg LEFT JOIN pt ON pt.v = deg.v"""))

  // ANN12 — matryoshka prefix-truncation recall: top-10 cosine retrieval
  // over only the first 16 of 64 embedding dimensions vs the full
  // vector, per-query overlap. Unlike the LSH/IVF/PQ recall gates, both
  // sides are exact rankings — the audit measures what the 4×-cheaper
  // prefix index LOSES, deterministically, so every row is hash-oracled.
  // The production side is the truncated search itself.
  val ann12 = Q("ann12_matryoshka_recall",
    (s, d) => Similarity.truncationRecall(
      Tables.embeddings(s, d), "vec_id", "embedding", k = 10, dims = 16),
    Some("""WITH fullr AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        row_number() OVER (PARTITION BY a.vec_id ORDER BY
          list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
            DESC, b.vec_id) AS r
        FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
      tr AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        row_number() OVER (PARTITION BY a.vec_id ORDER BY
          list_cosine_similarity(a.embedding[1:16]::DOUBLE[],
            b.embedding[1:16]::DOUBLE[]) DESC, b.vec_id) AS r
        FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
      c AS (SELECT f.query_id, count(*) AS n_common
        FROM (SELECT query_id, neighbor_id FROM fullr WHERE r <= 10) f
        JOIN (SELECT query_id, neighbor_id FROM tr WHERE r <= 10) t
          USING (query_id, neighbor_id) GROUP BY 1)
      SELECT e.vec_id AS query_id,
        CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
        round(coalesce(c.n_common, 0) / 10.0 + 1e-9, 6) AS recall_at_k
      FROM embeddings e LEFT JOIN c ON c.query_id = e.vec_id"""),
    product = Some((s, d) => Similarity.lshTopKAuto(
      Tables.embeddings(s, d).select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding")),
      "vec_id", "embedding", k = 10, dim = 16)))

  // M60 — average precision (the area under the precision-recall curve,
  // computed exactly): AP = (1/n₊) Σ_{positives} precision@rank. Where
  // m24's AUC-ROC weighs positives against negatives symmetrically, AP
  // is the class-imbalance-honest metric a curation threshold is tuned
  // on (a 2%-positive corpus can score AUC 0.95 while the top of the
  // ranking is junk). Ranks come from ONE range-partitioned prefix sum
  // over (score desc, id) — m24's rank-free discipline, never an
  // unpartitioned data-sized window.
  val m60 = Q("m60_average_precision",
    (s, d) => {
      val e = ev(s, d).where(col("value").isNotNull &&
        col("event_type").isin("purchase", "view"))
        .select((-col("value")).as("__nv"), col("event_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("rel"),
          lit(1L).as("one"))
      Stats.rangePrefixSum(e, Seq("__nv", "event_id"),
        Seq("one" -> "rk", "rel" -> "cum_p"))
        .agg(max(col("cum_p_total")).cast("long").as("n_pos"),
          max(col("rk_total")).cast("long").as("n"),
          round(sum(when(col("rel") === 1L,
            col("cum_p").cast("double") / col("rk")))
            / max(col("cum_p_total")) + lit(1e-9), 6)
            .as("average_precision"))
    },
    Some("""WITH e AS (SELECT event_id, value,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
        FROM events WHERE value IS NOT NULL
          AND event_type IN ('purchase', 'view')),
      r AS (SELECT rel,
        row_number() OVER (ORDER BY value DESC, event_id) AS rk,
        sum(rel) OVER (ORDER BY value DESC, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p
        FROM e)
      SELECT CAST(sum(rel) AS BIGINT) AS n_pos,
        CAST(count(*) AS BIGINT) AS n,
        round(sum(CASE WHEN rel = 1
            THEN CAST(cum_p AS DOUBLE) / rk END) / sum(rel) + 1e-9, 6)
          AS average_precision
      FROM r"""))

  // T67 — rendezvous (highest-random-weight) shard assignment audit:
  // assign every document under 8 shards and under 9, and ledger the
  // movement per shard. The property on trial is consistent hashing's
  // minimal disruption — growing 8 → 9 must move ONLY the keys the new
  // shard wins (~1/9 of the corpus), where hash-mod-N would move ~8/9
  // and force every per-shard artifact to rebuild. The oracle
  // recomputes both assignments from the same md5 argmax, so every
  // n_stayed is checked, not just the aggregate fraction.
  val t67 = Q("t67_rendezvous_shards",
    (s, d) => {
      val assigned = Sampling.rendezvousShard(
        Sampling.rendezvousShard(docs(s, d).select(col("doc_id")),
          "doc_id", 8, "shard8"),
        "doc_id", 9, "shard")
      val before = assigned.groupBy(col("shard8").as("shard"))
        .agg(count(lit(1)).as("n_before"))
      val after = assigned.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_after"),
          sum(when(col("shard8") === col("shard"), 1L).otherwise(0L))
            .as("n_stayed"))
      after.join(before, Seq("shard"), "full_outer")
        .na.fill(0L, Seq("n_before", "n_after", "n_stayed"))
        .select(col("shard").cast("long").as("shard"), col("n_before"),
          col("n_after"), col("n_stayed"))
    },
    Some("""WITH d AS (SELECT doc_id FROM documents),
      c8 AS (SELECT doc_id, s,
        CAST(('0x' || substr(md5(doc_id || ':' || s), 1, 14)) AS BIGINT) AS h
        FROM d, unnest(generate_series(0, 7)) AS g(s)),
      r8 AS (SELECT doc_id, s AS shard8 FROM (SELECT doc_id, s,
        row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC)
          AS rn FROM c8) WHERE rn = 1),
      c9 AS (SELECT doc_id, s,
        CAST(('0x' || substr(md5(doc_id || ':' || s), 1, 14)) AS BIGINT) AS h
        FROM d, unnest(generate_series(0, 8)) AS g(s)),
      r9 AS (SELECT doc_id, s AS shard9 FROM (SELECT doc_id, s,
        row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC)
          AS rn FROM c9) WHERE rn = 1),
      j AS (SELECT r9.doc_id, shard9, shard8 FROM r9 JOIN r8 USING (doc_id)),
      b AS (SELECT shard8 AS shard, count(*) AS n_before FROM j GROUP BY 1),
      a AS (SELECT shard9 AS shard, count(*) AS n_after,
        sum(CASE WHEN shard8 = shard9 THEN 1 ELSE 0 END) AS n_stayed
        FROM j GROUP BY 1)
      SELECT CAST(coalesce(a.shard, b.shard) AS BIGINT) AS shard,
        CAST(coalesce(b.n_before, 0) AS BIGINT) AS n_before,
        CAST(coalesce(a.n_after, 0) AS BIGINT) AS n_after,
        CAST(coalesce(a.n_stayed, 0) AS BIGINT) AS n_stayed
      FROM a FULL OUTER JOIN b ON a.shard = b.shard"""))

  // ANN13 — rank-biased overlap (p = 0.9, depth 10) between the full
  // and the 16-dim-prefix rankings: ann12's recall counts SET overlap;
  // RBO scores ORDER agreement with geometric top-weighting — the
  // ranking-similarity judge for "is the cheap ranker faithful where it
  // matters". The per-item weight table is computed once at plan time
  // and interpolated verbatim into the oracle, so both engines sum
  // bit-identical constants.
  val ann13 = {
    val k = 10
    val ws = Similarity.rboWeights(k, p = 0.9)
    val wValues = ws.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    Q("ann13_rank_biased_overlap",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val full = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k)
        val trunc = Similarity.bruteForceTopK(
          emb.select(col("vec_id"),
            slice(col("embedding"), 1, 16).as("embedding")),
          "vec_id", "embedding", k)
        Similarity.rankBiasedOverlap(full, trunc, k, p = 0.9)
      },
      Some(s"""WITH fullr AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY a.vec_id ORDER BY
            list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              DESC, b.vec_id) AS r
          FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
        tr AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY a.vec_id ORDER BY
            list_cosine_similarity(a.embedding[1:16]::DOUBLE[],
              b.embedding[1:16]::DOUBLE[]) DESC, b.vec_id) AS r
          FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
        w(m, wt) AS (VALUES $wValues),
        j AS (SELECT f.query_id, greatest(f.r, t.r) AS m
          FROM (SELECT query_id, neighbor_id, r FROM fullr WHERE r <= $k) f
          JOIN (SELECT query_id, neighbor_id, r FROM tr WHERE r <= $k) t
            USING (query_id, neighbor_id)),
        q AS (SELECT j.query_id, count(*) AS n_common, sum(w.wt) AS rbo
          FROM j JOIN w ON w.m = j.m GROUP BY 1)
        SELECT e.vec_id AS query_id,
          CAST(coalesce(q.n_common, 0) AS BIGINT) AS n_common,
          round(coalesce(q.rbo, 0) + 1e-9, 6) AS rbo
        FROM embeddings e LEFT JOIN q ON q.query_id = e.vec_id"""))
  }

  val all: Seq[Q] = Seq(o15, o16, m58, g11, ann12, m60, t67, ann13)
}
