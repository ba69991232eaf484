package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators.{Graph, Similarity, TextAnalysis}

/** Catalog part Y (round 13): clustering-quality audit (simplified
  * silhouette), density-relative anomaly scoring (LOF), character-entropy
  * quality screen, PPMI skip-gram association mining, and synchronous
  * label-propagation community detection — SURVEY §2.12 X184–X188.
  */
object QueriesY {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // M67 — simplified (centroid) silhouette over the embedding labels:
  // per point, distance to its own label centroid vs the nearest other
  // centroid, s = (b−a)/max(a,b); per-label mean + misplaced count. The
  // clustering-eval that scales: N × k centroid loop, never the O(N²)
  // pair mean. Centroid components and distances are quantized before
  // any comparison, so a/b selection is bit-reproducible cross-engine.
  val m67 = Q("m67_silhouette",
    (s, d) => graft.ml.Clustering.simplifiedSilhouette(
      Tables.embeddings(s, d), "vec_id", "embedding", "label"),
    Some("""WITH c0 AS (SELECT label, pos, round(avg(v) + 1e-9, 6) AS cv
        FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
          generate_subscripts(embedding, 1) AS pos FROM embeddings)
        GROUP BY 1, 2),
      cent AS (SELECT label AS clabel, list(cv ORDER BY pos) AS cvec
        FROM c0 GROUP BY 1),
      d AS (SELECT e.vec_id, e.label, c.clabel,
          round(list_distance(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
            + 1e-9, 6) AS dist
        FROM embeddings e, cent c),
      pp AS (SELECT vec_id, label,
          max(dist) FILTER (WHERE label = clabel) AS a,
          min(dist) FILTER (WHERE label <> clabel) AS b
        FROM d GROUP BY 1, 2),
      s AS (SELECT label, CASE WHEN greatest(a, b) > 0
          THEN round((b - a) / greatest(a, b) + 1e-9, 6) END AS s FROM pp)
      SELECT label, CAST(count(*) AS BIGINT) AS n_points,
        round(avg(s) + 1e-9, 6) AS avg_silhouette,
        CAST(count(*) FILTER (WHERE s < 0) AS BIGINT) AS n_negative
      FROM s GROUP BY 1"""))

  // M68 — Local Outlier Factor (k=5, cosine distance) over the
  // embeddings: density-relative anomaly scores, top-20 by LOF. The
  // exact kNN side is the documented oracle baseline (j12's pair loop,
  // plan-truncated by the eager checkpoint); the product twin runs the
  // identical LOF algebra over lshTopKAuto candidates. Distances are
  // quantized before the kNN cut with id tie-breaks, so neighborhood
  // membership — and every kdist/reachability value downstream — is
  // bit-reproducible; the top-20 cut orders by ROUNDED lof with an id
  // tie-break.
  val m68 = Q("m68_lof_outliers",
    (s, d) => Similarity.lofScores(Tables.embeddings(s, d), "vec_id",
      "embedding", k = 5, topN = 20),
    product = Some((s, d) => Similarity.lofScoresLsh(
      Tables.embeddings(s, d), "vec_id", "embedding", k = 5, topN = 20)),
    oracle = Some("""WITH pairs AS (SELECT a.vec_id AS q, b.vec_id AS nb,
        1.0 - round(list_cosine_similarity(a.embedding::DOUBLE[],
          b.embedding::DOUBLE[]) + 1e-9, 6) AS dist
        FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
      knn AS (SELECT q, nb, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY q
            ORDER BY dist, nb) AS rn FROM pairs)
        WHERE rn <= 5),
      kd AS (SELECT q AS o, max(dist) AS kdist FROM knn GROUP BY 1),
      reach AS (SELECT k.q, k.nb, greatest(kd.kdist, k.dist) AS reach
        FROM knn k JOIN kd ON kd.o = k.nb),
      lrd AS (SELECT q, CASE WHEN sum(reach) > 0
          THEN 5.0 / sum(reach) END AS lrd FROM reach GROUP BY 1),
      lof AS (SELECT k.q, sum(o.lrd) / 5.0 AS avg_lrd_o,
          count(*) AS n_neighbors
        FROM knn k JOIN lrd o ON o.q = k.nb GROUP BY 1)
      SELECT lof.q AS vec_id, CAST(n_neighbors AS BIGINT) AS n_neighbors,
        round(p.lrd + 1e-9, 6) AS lrd,
        round(avg_lrd_o / p.lrd + 1e-9, 6) AS lof
      FROM lof JOIN lrd p ON p.q = lof.q
      ORDER BY round(avg_lrd_o / p.lrd + 1e-9, 6) DESC NULLS LAST, vec_id
      LIMIT 20"""))

  // T70 — character-entropy quality screen, bucketed corpus profile:
  // Shannon entropy (nats) over a bounded 27-bucket alphabet (a–z +
  // other) per doc, then 0.25-nat histogram buckets with per-bucket
  // means. 27 substring scans per row, no per-character explode, no
  // shuffle until the bucket aggregate — t65's discipline applied to
  // entropy. The oracle rebuilds the identical fixed-order fold.
  val t70 = {
    val letters = ('a' to 'z').map(_.toString)
    def cnt(c: String) =
      s"CAST(length(t) - length(replace(t, '$c', '')) AS DOUBLE)"
    val sumCnt = letters.map(cnt).mkString(" + ")
    def term(e: String) =
      s"CASE WHEN $e > 0 THEN -($e / n) * ln($e / n) ELSE 0.0 END"
    val hExpr =
      (letters.map(c => term(cnt(c))) :+ term(s"(n - ($sumCnt))"))
        .mkString(" + ")
    Q("t70_char_entropy",
      (s, d) => TextAnalysis.charEntropy(docs(s, d), "doc_id", "text")
        .groupBy(floor(col("char_entropy") / lit(0.25)).cast("long")
          .as("entropy_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("char_entropy")) + lit(1e-9), 6).as("avg_entropy"),
          round(avg(col("n_chars_norm")) + lit(1e-9), 2).as("avg_len")),
      Some(s"""WITH d0 AS (SELECT lower(trim(text)) AS t FROM documents
          WHERE length(lower(trim(text))) > 0),
        d1 AS (SELECT t, CAST(length(t) AS DOUBLE) AS n FROM d0),
        h AS (SELECT round(($hExpr) + 1e-9, 6) AS char_entropy,
          length(t) AS n_chars_norm FROM d1)
        SELECT CAST(floor(char_entropy / 0.25) AS BIGINT)
            AS entropy_bucket,
          CAST(count(*) AS BIGINT) AS n_docs,
          round(avg(char_entropy) + 1e-9, 6) AS avg_entropy,
          round(avg(n_chars_norm) + 1e-9, 2) AS avg_len
        FROM h GROUP BY 1"""))
  }

  // T71 — PPMI skip-gram association mining (window +1..+2, directed):
  // the count-based distributional-semantics statistic — which token
  // pairs co-occur far above chance. Token stream → bounded offset
  // explode → (doc, pos) equi-join → one (w1, w2) count shuffle;
  // marginals and the 1-row total ride the counted pair frame. minCount
  // = 2 kills hapax noise; top-30 by rounded ppmi, (w1, w2) tie-break.
  val t71 = Q("t71_ppmi_pairs",
    (s, d) => TextAnalysis.ppmiPairs(docs(s, d), "doc_id", "text",
      window = 2, minCount = 2L, topN = 30),
    Some("""WITH tok0 AS (SELECT doc_id AS doc,
        unnest(string_split_regex(lower(trim(text)), '\s+')) AS term,
        generate_subscripts(string_split_regex(lower(trim(text)), '\s+'),
          1) AS pos
        FROM documents),
      tok AS (SELECT doc, term, pos FROM tok0 WHERE term <> ''),
      pr AS (SELECT a.term AS w1, b.term AS w2, count(*) AS c
        FROM tok a, unnest([1, 2]) AS o(off)
        JOIN tok b ON b.doc = a.doc AND b.pos = a.pos + off
        GROUP BY 1, 2),
      tot AS (SELECT sum(c) AS t FROM pr),
      lm AS (SELECT w1, sum(c) AS lc FROM pr GROUP BY 1),
      rm AS (SELECT w2, sum(c) AS rc FROM pr GROUP BY 1)
      SELECT pr.w1, pr.w2, CAST(c AS BIGINT) AS n_cooc,
        round(greatest(0.0, ln(c::DOUBLE * t / (lc::DOUBLE * rc)))
          + 1e-9, 6) AS ppmi
      FROM pr JOIN lm USING (w1) JOIN rm USING (w2), tot
      WHERE c >= 2
      ORDER BY ppmi DESC, w1, w2
      LIMIT 30"""))

  // G16 — synchronous label-propagation communities over the supplier
  // co-purchase backbone, 3 deterministic rounds (frequency argmax,
  // min-label tie-break): carves dense regions apart INSIDE a
  // component, where connected components sees one blob. The oracle
  // unrolls the same three rounds as chained CTEs.
  val g16 = Q("g16_label_propagation",
    (s, d) => Graph.labelPropagation(QueriesG.backbone(s, d), rounds = 3),
    Some("""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      p AS (SELECT a.sp AS s1, b.sp AS s2, count(*) AS sc
        FROM e0 a JOIN e0 b ON a.c = b.c AND a.sp < b.sp GROUP BY 1, 2),
      e AS (SELECT s1, s2 FROM p ORDER BY sc DESC, s1, s2 LIMIT 500),
      und AS (SELECT s1 AS v, s2 AS nb FROM e
        UNION ALL SELECT s2, s1 FROM e),
      l0 AS (SELECT DISTINCT v, v AS label FROM und),
      r1 AS (SELECT v, label FROM (
          SELECT u.v, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY u.v
              ORDER BY count(*) DESC, l.label) AS rn
          FROM und u JOIN l0 l ON l.v = u.nb GROUP BY u.v, l.label)
        WHERE rn = 1),
      r2 AS (SELECT v, label FROM (
          SELECT u.v, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY u.v
              ORDER BY count(*) DESC, l.label) AS rn
          FROM und u JOIN r1 l ON l.v = u.nb GROUP BY u.v, l.label)
        WHERE rn = 1),
      r3 AS (SELECT v, label FROM (
          SELECT u.v, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY u.v
              ORDER BY count(*) DESC, l.label) AS rn
          FROM und u JOIN r2 l ON l.v = u.nb GROUP BY u.v, l.label)
        WHERE rn = 1)
      SELECT label AS community, CAST(count(*) AS BIGINT) AS size,
        min(v) AS min_node
      FROM r3 GROUP BY 1"""))

  // M70 — per-label geometric median (Weiszfeld, 2 quantized
  // iterations) over the embeddings: the robust centroid a corrupted
  // minority can't drag. The oracle unrolls both reweighting rounds
  // with the identical quantize-every-iteration algebra, so estimates
  // match bit-for-bit; the readout is the mean distance to the robust
  // center plus the estimate checksum.
  val m70 = Q("m70_geometric_median",
    (s, d) => graft.ml.Clustering.geometricMedian(
      Tables.embeddings(s, d), "vec_id", "embedding", "label", iters = 2),
    Some("""WITH p AS (SELECT label, vec_id, embedding::DOUBLE[] AS v
        FROM embeddings),
      x0 AS (SELECT label, vec_id, unnest(v) AS x,
        generate_subscripts(v, 1) AS pos FROM p),
      c0 AS (SELECT label, pos, round(avg(x) + 1e-9, 6) AS cv
        FROM x0 GROUP BY 1, 2),
      e0 AS (SELECT label, list(cv ORDER BY pos) AS ev FROM c0 GROUP BY 1),
      d1 AS (SELECT p.label, p.vec_id, p.v,
          round(list_distance(p.v, e0.ev::DOUBLE[]) + 1e-9, 6) AS d
        FROM p JOIN e0 USING (label)),
      c1 AS (SELECT label, pos,
          round(sum(x * w) / sum(w) + 1e-9, 6) AS cv
        FROM (SELECT label, 1.0 / d AS w, unnest(v) AS x,
              generate_subscripts(v, 1) AS pos
            FROM d1 WHERE d > 0)
        GROUP BY 1, 2),
      e1n AS (SELECT label, list(cv ORDER BY pos) AS ev FROM c1 GROUP BY 1),
      e1 AS (SELECT e0.label, coalesce(e1n.ev, e0.ev) AS ev
        FROM e0 LEFT JOIN e1n USING (label)),
      d2 AS (SELECT p.label, p.vec_id, p.v,
          round(list_distance(p.v, e1.ev::DOUBLE[]) + 1e-9, 6) AS d
        FROM p JOIN e1 USING (label)),
      c2 AS (SELECT label, pos,
          round(sum(x * w) / sum(w) + 1e-9, 6) AS cv
        FROM (SELECT label, 1.0 / d AS w, unnest(v) AS x,
              generate_subscripts(v, 1) AS pos
            FROM d2 WHERE d > 0)
        GROUP BY 1, 2),
      e2n AS (SELECT label, list(cv ORDER BY pos) AS ev FROM c2 GROUP BY 1),
      e2 AS (SELECT e1.label, coalesce(e2n.ev, e1.ev) AS ev
        FROM e1 LEFT JOIN e2n USING (label)),
      df AS (SELECT p.label,
          round(list_distance(p.v, e2.ev::DOUBLE[]) + 1e-9, 6) AS d
        FROM p JOIN e2 USING (label))
      SELECT df.label, CAST(count(*) AS BIGINT) AS n_points,
        round(avg(d) + 1e-9, 6) AS avg_dist_gm,
        any_value(cs) AS gm_checksum
      FROM df JOIN (SELECT label, round(list_sum(ev) + 1e-9, 6) AS cs
        FROM e2) c USING (label)
      GROUP BY 1"""))

  // T72 — Flesch reading-ease corpus profile per source: words,
  // vowel-run syllables, and terminator-run sentences all counted by
  // the collapse-to-one-char regex trick (three regex scans per row, no
  // explode, no shuffle before the per-source aggregate) — the
  // text-difficulty screen that complements t1's length/punct ratios.
  val t72 = Q("t72_readability",
    (s, d) => TextAnalysis.withReadability(docs(s, d), "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_words") / col("n_sentences")) + lit(1e-9), 6)
          .as("avg_words_per_sentence"),
        round(avg(col("n_syllables") / col("n_words")) + lit(1e-9), 6)
          .as("avg_syllables_per_word"),
        round(avg(col("flesch")) + lit(1e-9), 6).as("avg_flesch")),
    Some("""WITH d0 AS (SELECT source, lower(trim(text)) AS t
        FROM documents WHERE length(lower(trim(text))) > 0),
      m AS (SELECT source,
        CAST(length(regexp_replace(t, '[^\s]+', '#', 'g')) -
             length(regexp_replace(t, '[^\s]+', '', 'g')) AS DOUBLE) AS w,
        CAST(length(regexp_replace(t, '[aeiou]+', '#', 'g')) -
             length(regexp_replace(t, '[aeiou]+', '', 'g')) AS DOUBLE) AS y,
        greatest(1.0,
          CAST(length(regexp_replace(t, '[.!?]+', '#', 'g')) -
               length(regexp_replace(t, '[.!?]+', '', 'g')) AS DOUBLE))
          AS sc
        FROM d0)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        round(avg(w / sc) + 1e-9, 6) AS avg_words_per_sentence,
        round(avg(y / w) + 1e-9, 6) AS avg_syllables_per_word,
        round(avg(206.835 - 1.015 * (w / sc) - 84.6 * (y / w)) + 1e-9, 6)
          AS avg_flesch
      FROM m GROUP BY 1"""))

  val all: Seq[Q] = Seq(m67, m68, t70, t71, g16, m70, t72)
}
