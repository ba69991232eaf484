package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.{CountMin, Dedup, FeatureEng, Graph}
import graft.sources.{Readers, Writers}

/** Catalog part P (round 8 continuation): streaming-ready count-min
  * cells, leakage-protected target encoding, the feature-hashing trick,
  * and personalized PageRank. Spark-first plans with full DuckDB
  * oracles.
  */
object QueriesP {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // X120 — count-min cells as a STREAMING aggregation surface: the cell
  // grid is a plain (select + groupBy count) plan, so CountMin.sketch
  // runs UNCHANGED as a Structured Streaming aggregation — the same
  // "mergeable state is stream-ready" claim a29/IncrementalAgg pins,
  // here for frequency sketches. This batch twin is fully oracled;
  // StreamingSpec proves AvailableNow cells ≡ these batch cells. Items
  // carry a 50-way user split so the 250-key domain forces real
  // multi-key cells at width 128.
  val st5 = Q("st5_cms_cells_batch",
    (s, d) => {
      val items = ev(s, d)
        .where(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(concat(col("event_type"), lit(":"),
          pmod(col("user_id"), lit(50))).as("item"))
      CountMin.sketch(items, "item", depth = 4, width = 128)
    },
    Some("""WITH e AS (SELECT event_type || ':' ||
          CAST(user_id % 50 AS VARCHAR) AS item
        FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      b AS (SELECT item, r, CAST(('0x' || substr(md5(CAST(r AS VARCHAR)
          || ':' || item), 1, 14)) AS BIGINT) % 128 AS bucket
        FROM e, range(0, 4) rr(r))
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS cell_n
      FROM b GROUP BY 1, 2"""))

  // X121 — K-fold leakage-protected target encoding: the mean-value
  // feature each (event_type, fold) slice sees EXCLUDES its own fold,
  // with smoothing toward the global prior — the standard guard against
  // target leakage in boosted-tree training. Folds are md5-keyed so the
  // assignment is engine- and retry-reproducible (t10's split rule).
  val m46 = Q("m46_target_encoding",
    (s, d) => {
      val e = ev(s, d)
        .where(col("value").isNotNull && col("event_type").isNotNull &&
          col("event_id").isNotNull)
        .select(col("event_type"), col("value"),
          pmod(Dedup.md5Hash56(col("event_id").cast("string")), lit(5L))
            .as("fold"))
      FeatureEng.targetEncode(e, "event_type", "value", "fold")
    },
    Some("""WITH e AS (SELECT event_type, value,
        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 14))
          AS BIGINT) % 5 AS fold
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
          AND event_id IS NOT NULL),
      cf AS (SELECT event_type, fold, sum(value) AS s,
        CAST(count(*) AS BIGINT) AS n_fold FROM e GROUP BY 1, 2),
      ct AS (SELECT event_type, sum(s) AS ts, sum(n_fold) AS tn
        FROM cf GROUP BY 1),
      p AS (SELECT avg(value) AS pr FROM e)
      SELECT cf.event_type, cf.fold, cf.n_fold,
        round((ct.ts - cf.s + 10.0 * p.pr) / (ct.tn - cf.n_fold + 10.0)
          + 1e-9, 6) AS encoding
      FROM cf JOIN ct USING (event_type), p"""))

  // X122 — feature hashing (the hashing trick): tokens into a FIXED
  // 32-dim space with a signed second hash so collisions cancel in
  // expectation; long-form (doc, dim, weight) postings. The
  // dimensionality is independent of vocabulary size — the property the
  // operator exists for at corpus scale.
  val t54 = Q("t54_feature_hashing",
    (s, d) => FeatureEng.featureHash(docs(s, d), "doc_id", "text", 32),
    Some("""WITH tok AS (SELECT doc_id,
        unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        FROM documents),
      t AS (SELECT doc_id, token FROM tok WHERE len(token) > 0),
      h AS (SELECT doc_id,
        CAST(('0x' || substr(md5('d:' || token), 1, 14)) AS BIGINT) % 32
          AS dim,
        CASE WHEN CAST(('0x' || substr(md5('s:' || token), 1, 14))
          AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
        FROM t)
      SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS weight
      FROM h GROUP BY 1, 2"""))

  // X123 — personalized PageRank: teleport pinned to a seed set of
  // customers, rank becomes random-walk-with-restart proximity to the
  // seeds — the related-item / audience-expansion scorer. Same graph and
  // per-round shape as g1 (one shuffle + broadcast dangling scalar per
  // iteration); 3 iterations so the unrolled oracle stays readable.
  val g7 = Q("g7_personalized_pagerank",
    (s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (-(col("l_suppkey") + 1)).as("dst"))
      val nodes = Tables.customer(s, d).select(col("c_custkey").as("id"))
        .union(Tables.supplier(s, d).select((-(col("s_suppkey") + 1)).as("id")))
      val seeds = Tables.customer(s, d)
        .where(pmod(col("c_custkey"), lit(97)) === 0)
        .select(col("c_custkey").as("id"))
      Graph.pageRankPersonalized(nodes, "id", edges, "src", "dst", seeds,
        iters = 3)
        .select(col("id"), round(col("ppr") + lit(1e-9), 6).as("ppr"))
    },
    Some("""WITH nodes AS (SELECT c_custkey AS id FROM customer
        UNION ALL SELECT -(s_suppkey + 1) FROM supplier),
      edges AS (SELECT DISTINCT o_custkey AS src, -(l_suppkey + 1) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
      seeds AS (SELECT c_custkey AS id FROM customer
        WHERE c_custkey % 97 = 0),
      ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM seeds),
      t AS (SELECT nodes.id, CASE WHEN seeds.id IS NOT NULL
          THEN 1.0 / ns.s ELSE 0.0 END AS tv
        FROM nodes LEFT JOIN seeds ON nodes.id = seeds.id, ns),
      r0 AS (SELECT id, tv AS r FROM t),
      d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
        LEFT JOIN outdeg o ON r0.id = o.src WHERE o.src IS NULL),
      c1 AS (SELECT e.dst AS id, sum(r0.r / o.od) AS c FROM edges e
        JOIN r0 ON r0.id = e.src JOIN outdeg o ON o.src = e.src GROUP BY 1),
      r1 AS (SELECT t.id, t.tv,
          0.15 * t.tv + 0.85 * (coalesce(c1.c, 0) + d1.dm * t.tv) AS r
        FROM t LEFT JOIN c1 ON t.id = c1.id, d1),
      d2 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
        LEFT JOIN outdeg o ON r1.id = o.src WHERE o.src IS NULL),
      c2 AS (SELECT e.dst AS id, sum(r1.r / o.od) AS c FROM edges e
        JOIN r1 ON r1.id = e.src JOIN outdeg o ON o.src = e.src GROUP BY 1),
      r2 AS (SELECT t.id, t.tv,
          0.15 * t.tv + 0.85 * (coalesce(c2.c, 0) + d2.dm * t.tv) AS r
        FROM t LEFT JOIN c2 ON t.id = c2.id, d2),
      d3 AS (SELECT coalesce(sum(r), 0) AS dm FROM r2
        LEFT JOIN outdeg o ON r2.id = o.src WHERE o.src IS NULL),
      c3 AS (SELECT e.dst AS id, sum(r2.r / o.od) AS c FROM edges e
        JOIN r2 ON r2.id = e.src JOIN outdeg o ON o.src = e.src GROUP BY 1),
      r3 AS (SELECT t.id,
          0.15 * t.tv + 0.85 * (coalesce(c3.c, 0) + d3.dm * t.tv) AS r
        FROM t LEFT JOIN c3 ON t.id = c3.id, d3)
      SELECT id, round(r + 1e-9, 6) AS ppr FROM r3"""))

  // X124 — ORC sink + scan roundtrip: format breadth for
  // Hive/Trino-adjacent estates; the cleaned event projection goes out
  // as zstd ORC and comes back through the ORC reader (same
  // pushdown/pruning machinery as parquet), oracled against the
  // original parquet — any writer/reader type drift flips the gate.
  val o14 = Q("o14_orc_roundtrip",
    (s, d) => {
      // applicationId in the path: bench + test suites may build/run this
      // query concurrently from separate sessions; a fixed path would race
      // on the overwrite-then-read.
      val tmp = s"/tmp/graft_o14-${new java.io.File(d).getName}-" +
        s.sparkContext.applicationId
      Writers.writeOrc(ev(s, d)
        .where(col("ts").isNotNull && col("value").isNotNull)
        .select(col("event_id"), col("event_type"), col("value"),
          to_date(col("ts")).as("dte")), tmp)
      Readers.readOrc(s, tmp)
        .where(col("value") > 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("dte")).as("first_day"),
          round(sum(col("value")) + lit(1e-9), 6).as("sum_value"))
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        min(CAST(ts AS DATE)) AS first_day,
        round(sum(value) + 1e-9, 6) AS sum_value
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        AND value > 0
      GROUP BY 1"""))

  // X125 — Jensen-Shannon divergence of each source's token
  // distribution against the corpus — the bounded (0..ln 2), symmetric
  // drift metric for MIXTURE decisions (which sources are
  // off-distribution), complementing m17's value-space PSI. One
  // (source, token) shuffle; the global distribution derives from it by
  // a second tiny aggregate; the scoring grid is |sources|·|vocab|
  // rows of pure column algebra (zero-count sources contribute only
  // the corpus-side term, handled exactly, not by epsilon).
  val m47 = Q("m47_source_jsd",
    (s, d) => {
      val st = docs(s, d).select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .where(length(col("token")) > 0)
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val g = st.groupBy(col("token")).agg(sum(col("c")).as("gc"))
      val nTot = broadcast(st.agg(sum(col("c")).as("nn")))
      val srcTot = st.groupBy(col("source")).agg(sum(col("c")).as("ns"))
      val grid = srcTot.crossJoin(broadcast(g))
        .join(st, Seq("source", "token"), "left")
        .crossJoin(nTot)
        .withColumn("p", coalesce(col("c"), lit(0L)) / col("ns"))
        .withColumn("q", col("gc") / col("nn"))
        .withColumn("m", (col("p") + col("q")) / 2)
        .withColumn("tp",
          when(col("p") > 0, col("p") * log(col("p") / col("m")))
            .otherwise(lit(0.0)))
        .withColumn("tq", col("q") * log(col("q") / col("m")))
      grid.groupBy(col("source"))
        .agg(first(col("ns")).as("n_tokens"),
          round((sum(col("tp")) + sum(col("tq"))) / 2 + lit(1e-9), 6)
            .as("jsd"))
    },
    Some("""WITH tok AS (SELECT source,
        unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        FROM documents),
      st AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM tok WHERE len(token) > 0 GROUP BY 1, 2),
      g AS (SELECT token, sum(c) AS gc FROM st GROUP BY 1),
      nt AS (SELECT CAST(sum(c) AS DOUBLE) AS nn FROM st),
      srct AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
        FROM st GROUP BY 1),
      grid AS (SELECT srct.source, srct.ns, g.token,
          coalesce(st.c, 0) / CAST(srct.ns AS DOUBLE) AS p,
          g.gc / nt.nn AS q
        FROM srct CROSS JOIN g
        LEFT JOIN st ON st.source = srct.source AND st.token = g.token,
        nt),
      terms AS (SELECT source, ns,
          CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END AS tp,
          q * ln(q / ((p + q) / 2)) AS tq
        FROM grid)
      SELECT source, any_value(ns) AS n_tokens,
        round((sum(tp) + sum(tq)) / 2 + 1e-9, 6) AS jsd
      FROM terms GROUP BY 1"""))

  val all: Seq[Q] = Seq(st5, m46, t54, g7, o14, m47)
}
