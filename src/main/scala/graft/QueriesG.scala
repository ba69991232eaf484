package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.operators._

/** Catalog part G (round 3, cont.): corpus-prep operators a training-data
  * pipeline runs between cleaning and tokenization — overlapping context-
  * window chunking, domain balancing, bigram language-model statistics —
  * plus Unicode normalization and join-reduction additions. Spark-first
  * plans with full DuckDB oracles.
  */
object QueriesG {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // T23 — overlapping token-window chunking (chunkLen=64, stride=32): the
  // context-window prep step before tokenization. Pure per-row column
  // algebra (sequence → explode → slice), so it's scan-speed map work
  // with no shuffle — the plan you need when chunking 100 TB. Start
  // offsets stop once the remaining tail is already covered by the
  // previous chunk, so short docs yield exactly one chunk and the tail
  // is never dropped (least() caps the last chunk's token count).
  val t23 = Q("t23_chunk_overlap",
    (s, d) => TextAnalysis.chunkTokens(docs(s, d), "doc_id", "text",
      chunkLen = 64, stride = 32),
    Some("""WITH t AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks
        FROM documents WHERE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0),
      s AS (SELECT doc_id, toks, n,
          unnest(generate_series(0, greatest(n - 64 + 32 - 1, 0), 32)) AS st
        FROM (SELECT doc_id, toks, len(toks) AS n FROM t))
      SELECT doc_id, CAST(st // 32 AS INT) AS chunk_idx,
        least(n - st, 64) AS chunk_tokens,
        array_to_string(list_slice(toks, st + 1, st + 64), ' ') AS chunk_text
      FROM s"""))

  // T24 — per-domain cap (domain balancing): keep at most 15 documents
  // per source, selected by deterministic md5-of-id order, NOT scan
  // order — the survivor set is identical across runs, engines, and
  // retries, which is what makes a capped corpus reproducible. One
  // shuffle on the domain key; the operator scaladoc documents the
  // map-side threshold pre-filter that bounds the hot partition when one
  // domain dominates a 100 TB crawl mix.
  val t24 = Q("t24_domain_cap",
    (s, d) => Sampling.capPerGroup(docs(s, d), "source", "doc_id", cap = 15)
      .select(col("doc_id"), col("source"), col("rn")),
    Some("""SELECT doc_id, source, rn FROM (
        SELECT doc_id, source, row_number() OVER (
          PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents) WHERE rn <= 15"""))

  // T25 — bigram language-model statistics: per head word, the most
  // likely continuation and its conditional probability P(w2|w1) =
  // c(w1,w2)/c(w1). Bigrams come from one per-row transform over the
  // token array (no self-join: position i pairs with i+1 inside the
  // array), then ONE shuffle groups (w1,w2); the per-head total and
  // argmax ride a single window over the grouped (already reduced)
  // frame. tot >= 20 keeps the output to statistically meaningful heads.
  // This is the n-gram-LM build step of a perplexity-style quality
  // filter (t22 consumes unigram stats the same way).
  val t25 = Q("t25_bigram_lm",
    (s, d) => {
      val cleaned = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val toks = split(cleaned, " ")
      val bg = docs(s, d).where(length(cleaned) > 0)
        .select(toks.as("t")).where(size(col("t")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("bg"))
        .select(col("bg.w1"), col("bg.w2"))
      val counts = bg.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt"))
      val wTot = Window.partitionBy(col("w1"))
      val wTop = wTot.orderBy(col("cnt").desc, col("w2"))
      counts
        .withColumn("tot", sum(col("cnt")).over(wTot))
        .withColumn("rn", row_number().over(wTop))
        .where(col("rn") === 1 && col("tot") >= 20)
        .select(col("w1"), col("w2"), col("cnt"),
          round(col("cnt") / col("tot") + lit(1e-9), 6).as("cond_p"))
    },
    Some("""WITH toks AS (
        SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents WHERE length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) > 0),
      bg AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM
        (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
         FROM toks WHERE len(t) >= 2)),
      c AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2),
      r AS (SELECT w1, w2, cnt, sum(cnt) OVER (PARTITION BY w1) AS tot,
        row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2) AS rn FROM c)
      SELECT w1, w2, cnt, round(cnt / tot + 1e-9, 6) AS cond_p
      FROM r WHERE rn = 1 AND tot >= 20"""))

  val all: Seq[Q] = Seq(t23, t24, t25)
}
