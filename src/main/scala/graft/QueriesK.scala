package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q

/** Catalog part K (round 8 continuation): gaps-and-islands streaks,
  * effect-size and robust-trend statistics, and a code-likeness screen
  * for corpus curation. Spark-first plans with full DuckDB oracles.
  */
object QueriesK {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // W27 — activity streaks (gaps-and-islands): longest run of
  // consecutive active days per user via the day-index-minus-row-number
  // island key — the classic sessionless form; one distinct, one
  // user-keyed sort, two user-keyed aggregates, no self-join. The
  // engagement metric cohort analyses (a28) consume.
  val w27 = Q("w27_activity_streaks",
    (s, d) => {
      val days = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("dte")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("dte"))
      val islands = days
        .withColumn("__island",
          datediff(col("dte"), lit("1970-01-01").cast("date")) -
            row_number().over(w))
        .groupBy(col("user_id"), col("__island"))
        .agg(count(lit(1)).as("len"))
      islands.groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_active_days"),
          max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
    },
    Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dte
        FROM events WHERE ts IS NOT NULL),
      g AS (SELECT user_id, dte,
        date_diff('day', DATE '1970-01-01', dte) -
          row_number() OVER (PARTITION BY user_id ORDER BY dte) AS island
        FROM days),
      st AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
        FROM g GROUP BY 1, 2)
      SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        max(len) AS longest_streak, CAST(count(*) AS BIGINT) AS n_streaks
      FROM st GROUP BY 1"""))

  // M37 — Cramér's V effect size for event_type × ISO weekday (m28's
  // contingency convention: Spark weekday+1 ≡ DuckDB isodow). The full
  // r×c grid is materialized (distinct-x × distinct-y cross join, zero
  // fill) so EMPTY cells contribute their (0−e)²/e term — the classic
  // chi-square-over-observed-cells-only bug. Bounded frames throughout:
  // the grid is ≤ |types|·7 rows.
  val m37 = Q("m37_cramers_v",
    (s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
        .select(col("event_type").as("x"), (weekday(col("ts")) + 1).as("y"))
      val cells = e.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).cast("double").as("cxy"))
      val grid = cells.select(col("x")).distinct()
        .crossJoin(cells.select(col("y")).distinct())
        .join(cells, Seq("x", "y"), "left")
        .withColumn("cxy", coalesce(col("cxy"), lit(0.0)))
      val m = grid
        .withColumn("cx", sum(col("cxy")).over(Window.partitionBy("x")))
        .withColumn("cy", sum(col("cxy")).over(Window.partitionBy("y")))
        .withColumn("n", sum(col("cxy")).over(Window.partitionBy()))
      m.agg(
        max(col("n")).cast("long").as("n"),
        countDistinct(col("x")).as("r"),
        countDistinct(col("y")).as("c"),
        round(sum(pow(col("cxy") - col("cx") * col("cy") / col("n"), 2) /
          (col("cx") * col("cy") / col("n"))) + lit(1e-9), 6).as("chi2"),
        round(sqrt(sum(pow(col("cxy") - col("cx") * col("cy") / col("n"), 2)
            / (col("cx") * col("cy") / col("n"))) /
          (max(col("n")) * (least(countDistinct(col("x")),
            countDistinct(col("y"))) - lit(1)))) + lit(1e-9), 6)
          .as("cramers_v"))
    },
    Some("""WITH e AS (SELECT event_type AS x, isodow(ts) AS y FROM events
        WHERE ts IS NOT NULL),
      cells AS (SELECT x, y, CAST(count(*) AS DOUBLE) AS cxy FROM e
        GROUP BY 1, 2),
      grid AS (SELECT gx.x, gy.y, coalesce(c.cxy, 0.0) AS cxy
        FROM (SELECT DISTINCT x FROM cells) gx
        CROSS JOIN (SELECT DISTINCT y FROM cells) gy
        LEFT JOIN cells c ON c.x = gx.x AND c.y = gy.y),
      m AS (SELECT x, y, cxy,
        sum(cxy) OVER (PARTITION BY x) AS cx,
        sum(cxy) OVER (PARTITION BY y) AS cy,
        sum(cxy) OVER () AS n FROM grid)
      SELECT CAST(max(n) AS BIGINT) AS n,
        CAST(count(DISTINCT x) AS BIGINT) AS r,
        CAST(count(DISTINCT y) AS BIGINT) AS c,
        round(sum(pow(cxy - cx * cy / n, 2) / (cx * cy / n)) + 1e-9, 6)
          AS chi2,
        round(sqrt(sum(pow(cxy - cx * cy / n, 2) / (cx * cy / n)) /
          (max(n) * (least(count(DISTINCT x), count(DISTINCT y)) - 1)))
          + 1e-9, 6) AS cramers_v
      FROM m"""))

  // M38 — Theil–Sen robust trend: the median of all pairwise daily
  // slopes. Day-pair space is calendar-bounded (m29's argument: a 100 TB
  // fact table still has ~10³ days), so the pair join is a bounded
  // self-join over the daily aggregate, never over facts. The
  // breakdown-point-0.29 complement to w17's least-squares slope.
  val m38 = Q("m38_theil_sen",
    (s, d) => {
      val daily = ev(s, d)
        .where(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dte"))
        .agg(avg(col("value")).as("v"))
        .withColumn("i",
          datediff(col("dte"), lit("1970-01-01").cast("date")))
        .select(col("i"), col("v"))
      val slopes = daily.select(col("i").as("ia"), col("v").as("va"))
        .join(daily.select(col("i").as("ib"), col("v").as("vb")),
          col("ib") > col("ia"))
        .select(((col("vb") - col("va")) /
          (col("ib") - col("ia"))).as("slope"))
      slopes.agg(count(lit(1)).as("n_pairs"),
        round(percentile(col("slope"), lit(0.5)) + lit(1e-9), 6)
          .as("theil_sen_slope"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS dte, avg(value) AS v
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1),
      ix AS (SELECT date_diff('day', DATE '1970-01-01', dte) AS i, v
        FROM daily),
      slopes AS (SELECT (b.v - a.v) / (b.i - a.i) AS slope
        FROM ix a JOIN ix b ON b.i > a.i)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        round(quantile_cont(slope, 0.5) + 1e-9, 6) AS theil_sen_slope
      FROM slopes"""))

  // T48 — code-likeness screen: symbol/digit densities and keyword hits
  // as pure column arithmetic over one scan — the cheap prose-vs-code
  // triage a pretraining corpus routes on before language-specific
  // pipelines. Counts are integer (length-difference after a global
  // regexp strip), so the is_code boolean compares bit-exactly across
  // engines; the only doubles are final ratios.
  val t48 = Q("t48_code_likeness",
    (s, d) => {
      val t = col("text")
      val nChars = length(t).cast("long")
      val symbolCnt = (length(t) -
        length(regexp_replace(t, "[;{}()=<>\\[\\]]", ""))).cast("long")
      val digitCnt = (length(t) -
        length(regexp_replace(t, "[0-9]", ""))).cast("long")
      val kwCnt = size(regexp_extract_all(lower(t),
        lit("\\b(def|class|return|import|function|var|val|int|void)\\b"),
        lit(0))).cast("long")
      docs(s, d).select(col("doc_id"), nChars.as("n_chars"),
          symbolCnt.as("symbol_cnt"), digitCnt.as("digit_cnt"),
          kwCnt.as("kw_cnt"))
        .withColumn("symbol_ratio",
          round(when(col("n_chars") > 0, col("symbol_cnt").cast("double") /
            col("n_chars")).otherwise(lit(0.0)) + lit(1e-9), 6))
        .withColumn("is_code",
          col("n_chars") > 0 &&
            (col("symbol_cnt").cast("double") / col("n_chars") > 0.05 ||
              col("kw_cnt") >= 3))
    },
    Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text,
          '[;{}()=<>\[\]]', '', 'g')) AS BIGINT) AS symbol_cnt,
        CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
          AS BIGINT) AS digit_cnt,
        CAST(len(regexp_extract_all(lower(text),
          '\b(def|class|return|import|function|var|val|int|void)\b'))
          AS BIGINT) AS kw_cnt,
        round(CASE WHEN length(text) > 0 THEN
          CAST(length(text) - length(regexp_replace(text,
            '[;{}()=<>\[\]]', '', 'g')) AS DOUBLE) / length(text)
          ELSE 0.0 END + 1e-9, 6) AS symbol_ratio,
        (length(text) > 0 AND
          (CAST(length(text) - length(regexp_replace(text,
            '[;{}()=<>\[\]]', '', 'g')) AS DOUBLE) / length(text) > 0.05
           OR len(regexp_extract_all(lower(text),
             '\b(def|class|return|import|function|var|val|int|void)\b'))
             >= 3)) AS is_code
      FROM documents"""))

  val all: Seq[Q] = Seq(w27, m37, m38, t48)
}
