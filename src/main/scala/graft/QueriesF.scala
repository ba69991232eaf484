package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef.Q
import graft.operators._

/** Catalog part F (round 3): multi-granularity aggregates, the remaining
  * window battery, distribution analysis, and blocked fuzzy matching —
  * each a Spark-first plan with a full DuckDB oracle.
  */
object QueriesF {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def part(s: SparkSession, d: String) = Tables.part(s, d)

  // A26 — multi-granularity aggregate in ONE pass: ROLLUP(event_type,
  // month) yields per-(type,month), per-type subtotal, and grand-total
  // rows from a single shuffle (Catalyst expands grouping sets map-side;
  // the alternative — three groupBys + union — scans the fact table three
  // times). grouping_id() disambiguates the stratum. Sum rounded to 2
  // decimals: subtotal/grand rows accumulate the whole table, where
  // cross-engine float summation order dominates beyond that.
  // (month rendered as a string so the subtotal rows' NULLs normalize
  // identically across engines)
  val a26 = Q("a26_rollup_multigrain",
    (s, d) => ev(s, d)
      .withColumn("month", date_format(date_trunc("month", col("ts")), "yyyy-MM"))
      .rollup(col("event_type"), col("month"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")) + lit(1e-9), 2).as("sum_value"),
        grouping_id().as("gid")),
    Some("""SELECT event_type,
        strftime(date_trunc('month', CAST(ts AS DATE)), '%Y-%m') AS month,
        count(*) AS n_events, round(sum(value) + 1e-9, 2) AS sum_value,
        GROUPING(event_type, month) AS gid
      FROM events GROUP BY ROLLUP(event_type, month)"""))

  // W11 — ranking battery: rank / dense_rank / percent_rank / cume_dist /
  // ntile(4) in one window pass (one shuffle on the partition key; all
  // five functions share the same sort). Tie-break on event_id makes the
  // ordering total, so every rank flavor is deterministic cross-engine.
  val w11 = Q("w11_rank_battery",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      ev(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("event_type"), col("value"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w) + lit(1e-9), 6).as("prnk"),
          round(cume_dist().over(w) + lit(1e-9), 6).as("cdist"),
          ntile(4).over(w).as("quartile"))
    },
    Some("""SELECT event_id, event_type, value,
        rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        round(percent_rank() OVER w + 1e-9, 6) AS prnk,
        round(cume_dist() OVER w + 1e-9, 6) AS cdist,
        ntile(4) OVER w AS quartile
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)"""))

  // W12 — rolling 7-row median of the daily value series. Spark has no
  // median window function, but the frame is BOUNDED (≤7 rows), so a
  // sorted in-row array does it inside whole-stage codegen: collect_list
  // over the frame → array_sort → middle element (avg of the two middles
  // for even counts). The array never exceeds the frame length, so this
  // stays O(1) memory per row at any table size — the pattern for any
  // order statistic over a bounded window.
  val w12 = Q("w12_rolling_median",
    (s, d) => {
      val daily = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
        .agg(sum(col("value")).as("v"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_date"))
        .rowsBetween(-6, Window.currentRow)
      val arr = array_sort(collect_list(col("v")).over(w))
      val n = size(arr)
      val med = when(n % 2 === 1, element_at(arr, ((n + 1) / 2).cast("int")))
        .otherwise((element_at(arr, (n / 2).cast("int"))
          + element_at(arr, (n / 2).cast("int") + 1)) / 2)
      daily.select(col("event_type"), col("event_date"),
        round(med + lit(1e-9), 6).as("rolling_median"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS event_date,
        sum(value) AS v FROM events GROUP BY 1, 2)
      SELECT event_type, event_date,
        round(median(v) OVER (PARTITION BY event_type ORDER BY event_date
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 1e-9, 6)
          AS rolling_median
      FROM daily"""))

  // M10 — dense fixed-bin histogram of the value distribution: bin
  // arithmetic is the IDENTICAL float expression on both engines (no
  // width_bucket, whose boundary rounding is implementation-defined),
  // empty bins are filled by a range join so the domain is complete.
  // The bin spine is a broadcast of `nBins` rows — the fact table is
  // scanned once and aggregated map-side.
  private val histStep = 25.0
  private val histBins = 20
  val m10 = Q("m10_histogram",
    (s, d) => {
      val binned = ev(s, d).where(col("value").isNotNull)
        .withColumn("bin",
          least(greatest(floor(col("value") / lit(histStep)), lit(0L)),
            lit((histBins - 1).toLong)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("value")) + lit(1e-9), 6).as("avg_value"))
      val spine = s.range(histBins).select(col("id").as("bin"))
      spine.join(binned, Seq("bin"), "left")
        .select(col("bin"), (col("bin") * lit(histStep)).as("bin_lo"),
          coalesce(col("n"), lit(0L)).as("n"), col("avg_value"))
    },
    Some("""WITH binned AS (SELECT
        CAST(least(greatest(floor(value / 25.0), 0), 19) AS BIGINT) AS bin,
        count(*) AS n, round(avg(value) + 1e-9, 6) AS avg_value
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      spine AS (SELECT i AS bin FROM unnest(generate_series(0, 19)) AS g(i))
      SELECT bin, bin * 25.0 AS bin_lo, coalesce(n, 0) AS n, avg_value
      FROM spine LEFT JOIN binned USING (bin)"""))

  // M11 — chi-square test of independence (event_type × weekday
  // contingency): observed cell counts from one groupBy; expected =
  // row·col/total derived with two tiny broadcast aggregates; statistic,
  // degrees of freedom, and Cramér's V in closed form — the entire test
  // is three aggregates over an already-tiny frame, no driver math.
  // (marginals via windows over the already-aggregated ~35-row cell
  // frame — the fact table is scanned exactly once; a join-based
  // formulation would recompute the contingency subtree per marginal)
  val m11 = Q("m11_chi_square",
    (s, d) => {
      val cells = ev(s, d)
        .groupBy(col("event_type"), dayofweek(col("ts")).as("wd"))
        .agg(count(lit(1)).cast("double").as("o"))
      // bounded frame: |event_types| × 7 cells — an unpartitioned window
      // over ≤ ~35 rows is safe at any corpus size (the facts reduced
      // first; only the contingency table rides the window).
      val wAll = Window.partitionBy()
      val chi2raw = sum(pow(col("o") - col("e"), 2) / col("e"))
      cells
        .withColumn("rt", sum("o").over(Window.partitionBy("event_type")))
        .withColumn("ct", sum("o").over(Window.partitionBy("wd")))
        .withColumn("tot", sum("o").over(wAll))
        .withColumn("r", size(collect_set(col("event_type")).over(wAll)).cast("long"))
        .withColumn("c", size(collect_set(col("wd")).over(wAll)).cast("long"))
        .withColumn("e", col("rt") * col("ct") / col("tot"))
        .agg(
          round(chi2raw + lit(1e-9), 6).as("chi2"),
          ((first("r") - 1) * (first("c") - 1)).as("dof"),
          round(sqrt(chi2raw
            / (first("tot") * least(first("r") - 1, first("c") - 1)))
            + lit(1e-9), 6).as("cramers_v"))
    },
    Some("""WITH cells AS (SELECT event_type,
        dayofweek(CAST(ts AS DATE)) + 1 AS wd, CAST(count(*) AS DOUBLE) AS o
        FROM events GROUP BY 1, 2),
      rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
      ct AS (SELECT wd, sum(o) AS ct FROM cells GROUP BY 1),
      n AS (SELECT sum(o) AS tot, count(DISTINCT event_type) AS r,
        count(DISTINCT wd) AS c FROM cells),
      j AS (SELECT o, rt.rt * ct.ct / n.tot AS e, n.tot AS tot, n.r, n.c
        FROM cells JOIN rt USING (event_type) JOIN ct USING (wd) CROSS JOIN n)
      SELECT round(sum((o - e) * (o - e) / e) + 1e-9, 6) AS chi2,
        (any_value(r) - 1) * (any_value(c) - 1) AS dof,
        round(sqrt(sum((o - e) * (o - e) / e)
          / (any_value(tot) * least(any_value(r) - 1, any_value(c) - 1)))
          + 1e-9, 6) AS cramers_v
      FROM j"""))

  // M11b — the chi-square test WITH its p-value in-plan via the custom
  // `ChiSquareCdf` expression (the m4/m4b FDistCdf pattern): one lazy
  // frame end-to-end, no driver-side stats library post-step. DuckDB
  // has no chi-square CDF, so the p-value NUMBER stays spec-pinned to
  // commons-math3 — but its DECISIONS are oracled: sig_05/sig_01 come
  // from the in-plan CDF (p < α) on the Spark side and from
  // chi2 > crit(α; dof) on the oracle side, joined against a literal
  // critical-value row at the observed dof (24 = (5−1)(7−1), fixed by
  // the event-type × weekday grid at every SF). CDF monotonicity makes
  // the two formulations an identity at matching dof; a changed grid
  // empties the VALUES join and fails the gate loudly on row count.
  val m11b = Q("m11b_chi_square_p",
    (s, d) => m11.fn(s, d)
      .withColumn("p_value", graft.expressions.ChiSquareCdf.chi2PValue(
        col("chi2"), col("dof").cast("double")))
      .select(col("chi2"), col("dof"), col("cramers_v"),
        (col("p_value") < 0.05).as("sig_05"),
        (col("p_value") < 0.01).as("sig_01")),
    Some("""WITH cells AS (SELECT event_type,
        dayofweek(CAST(ts AS DATE)) + 1 AS wd, CAST(count(*) AS DOUBLE) AS o
        FROM events GROUP BY 1, 2),
      rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
      ct AS (SELECT wd, sum(o) AS ct FROM cells GROUP BY 1),
      n AS (SELECT sum(o) AS tot, count(DISTINCT event_type) AS r,
        count(DISTINCT wd) AS c FROM cells),
      j AS (SELECT o, rt.rt * ct.ct / n.tot AS e, n.tot AS tot, n.r, n.c
        FROM cells JOIN rt USING (event_type) JOIN ct USING (wd) CROSS JOIN n),
      stat AS (SELECT round(sum((o - e) * (o - e) / e) + 1e-9, 6) AS chi2,
        sum((o - e) * (o - e) / e) AS chi2_raw,
        (any_value(r) - 1) * (any_value(c) - 1) AS dof,
        round(sqrt(sum((o - e) * (o - e) / e)
          / (any_value(tot) * least(any_value(r) - 1, any_value(c) - 1)))
          + 1e-9, 6) AS cramers_v
        FROM j),
      -- chi-square critical values at the observed dof
      -- (commons-math3 ChiSquaredDistribution.inverseCumulativeProbability)
      crit(dof, c05, c01) AS (VALUES (24, 36.4150285017, 42.9798201394))
      SELECT stat.chi2, stat.dof, stat.cramers_v,
        stat.chi2_raw > crit.c05 AS sig_05,
        stat.chi2_raw > crit.c01 AS sig_01
      FROM stat JOIN crit ON stat.dof = crit.dof"""))

  // T18 — fuzzy (edit-distance) matching over part names, summarized per
  // distance. Two-level blocking, the shape that survives scale:
  //   1. DEDUP FIRST — fuzzy-join the distinct-string VOCABULARY, not
  //      the corpus. Real string columns are heavy-tailed (here: 20k
  //      rows share 64 names at sf0.1), and every duplicated string
  //      would otherwise re-run the same DP quadratically. Identical
  //      pairs (dist 0) fall out of the group sizes as C(cnt,2); cross
  //      pairs expand as cnt_a·cnt_b — exact id-level counts without
  //      id-level work.
  //   2. LENGTH BLOCKING on the vocabulary — levenshtein(a,b) ≤ k needs
  //      |len(a)−len(b)| ≤ k, so the probe side explodes 2k+1 candidate
  //      lengths and the pair space is an equi-join on length, never a
  //      cross join.
  // The oracle verifies the same counts from the raw id-level
  // inequality join — so a pass proves the grouped expansion exact.
  val t18 = Q("t18_fuzzy_name_match",
    (s, d) => {
      val g = part(s, d).groupBy(col("p_name"))
        .agg(count(lit(1)).as("cnt"))
      val d0 = g.agg(
        lit(0).as("dist"),
        sum((col("cnt") * (col("cnt") - 1) / 2).cast("long")).as("n_pairs"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_name_pairs"))
      val pairs = TextAnalysis.editDistancePairs(g, "p_name", "p_name",
          maxDist = 1)
        .where(col("dist") === 1)
      val d1 = pairs
        .join(broadcast(g.select(col("p_name").as("id_a"),
          col("cnt").as("cnt_a"))), "id_a")
        .join(broadcast(g.select(col("p_name").as("id_b"),
          col("cnt").as("cnt_b"))), "id_b")
        .agg(lit(1).as("dist"),
          sum(col("cnt_a") * col("cnt_b")).as("n_pairs"),
          count(lit(1)).as("n_name_pairs"))
      d0.unionByName(d1)
    },
    Some("""SELECT levenshtein(a.p_name, b.p_name) AS dist,
        count(*) AS n_pairs,
        count(DISTINCT CASE WHEN a.p_name < b.p_name
          THEN a.p_name || '|' || b.p_name
          ELSE b.p_name || '|' || a.p_name END) AS n_name_pairs
      FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        AND abs(length(a.p_name) - length(b.p_name)) <= 1
        AND levenshtein(a.p_name, b.p_name) <= 1
      GROUP BY 1"""))

  // A27 — ordered funnel (click → signup → purchase): each stage's entry
  // time is the min event time AFTER the previous stage's entry, computed
  // as three chained conditional-min windows over the SAME unordered
  // user partition — one shuffle on user_id, no self-joins, no
  // per-stage scans (the naive formulation joins the fact table once per
  // stage). The final row aggregates stage counts and conversion rates.
  val a27 = Q("a27_funnel",
    (s, d) => {
      val wu = Window.partitionBy(col("user_id"))
      val staged = ev(s, d)
        .withColumn("t1",
          min(when(col("event_type") === "click", col("ts"))).over(wu))
        .withColumn("t2", min(when(col("event_type") === "signup"
          && col("ts") > col("t1"), col("ts"))).over(wu))
        .withColumn("t3", min(when(col("event_type") === "purchase"
          && col("ts") > col("t2"), col("ts"))).over(wu))
      staged.groupBy(col("user_id"))
        .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
        .agg(
          count(col("t1")).as("n_stage1"),
          count(col("t2")).as("n_stage2"),
          count(col("t3")).as("n_stage3"),
          round(count(col("t2")).cast("double") / count(col("t1"))
            + lit(1e-9), 6).as("conv_1_2"),
          round(count(col("t3")).cast("double") / count(col("t2"))
            + lit(1e-9), 6).as("conv_2_3"))
    },
    Some("""WITH s1 AS (SELECT user_id, ts, event_type,
        min(CASE WHEN event_type = 'click' THEN ts END)
          OVER (PARTITION BY user_id) AS t1 FROM events),
      s2 AS (SELECT *, min(CASE WHEN event_type = 'signup' AND ts > t1
          THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM s1),
      s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
          THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM s2),
      per_user AS (SELECT user_id, any_value(t1) AS t1, any_value(t2) AS t2,
        any_value(t3) AS t3 FROM s3 GROUP BY 1)
      SELECT count(t1) AS n_stage1, count(t2) AS n_stage2,
        count(t3) AS n_stage3,
        round(CAST(count(t2) AS DOUBLE) / count(t1) + 1e-9, 6) AS conv_1_2,
        round(CAST(count(t3) AS DOUBLE) / count(t2) + 1e-9, 6) AS conv_2_3
      FROM per_user"""))

  // A28 — weekly cohort retention: cohort = the user's first active week
  // (a min-window over the user partition — no extra join against a
  // first-event frame), offset = weeks since cohort. One shuffle on
  // user_id, one on the (cohort, offset) grid.
  val a28 = Q("a28_cohort_retention",
    (s, d) => {
      val wk = ev(s, d)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
      val withCohort = wk
        .withColumn("cohort_week",
          min(col("week")).over(Window.partitionBy(col("user_id"))))
        .withColumn("week_offset",
          (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      withCohort
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    Some("""WITH wk AS (SELECT user_id,
        CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week
        FROM events),
      c AS (SELECT user_id, week,
        min(week) OVER (PARTITION BY user_id) AS cohort_week FROM wk)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
        count(DISTINCT user_id) AS n_users
      FROM c GROUP BY 1, 2"""))

  // O9 — unpivot/melt: the wide daily pivot (one column per event type)
  // folded back to long form with Dataset.unpivot (Spark's native melt —
  // a generate, not a union of per-column scans). Default null-dropping
  // semantics make pivot→unpivot equal the direct long-form aggregate,
  // which is exactly what the oracle computes.
  val o9 = Q("o9_unpivot_melt",
    (s, d) => {
      val piv = ev(s, d)
        .groupBy(to_date(col("ts")).as("event_date"))
        .pivot(col("event_type"))
        .agg(count(lit(1)))
      piv.unpivot(Array(col("event_date")),
          piv.columns.filterNot(_ == "event_date").map(col).toArray,
          "event_type", "n")
    },
    Some("""SELECT CAST(ts AS DATE) AS event_date, event_type, count(*) AS n
      FROM events GROUP BY 1, 2"""))

  // A29 — incremental aggregation: history and delta are aggregated
  // SEPARATELY (each scanned once, as on successive pipeline runs) and
  // the algebraic states merged key-wise; the oracle is the plain
  // one-shot aggregate — passing proves state(A)⊕state(B) = state(A∪B).
  val a29 = Q("a29_incremental_merge",
    (s, d) => {
      val e = ev(s, d).withColumn("day", to_date(col("ts")))
      val history = e.where(col("day") <= lit("2024-01-15").cast("date"))
      val delta = e.where(col("day") > lit("2024-01-15").cast("date"))
      val merged = IncrementalAgg.merge(
        Seq(IncrementalAgg.state(history, Seq("event_type"), "value"),
          IncrementalAgg.state(delta, Seq("event_type"), "value")),
        Seq("event_type"))
      IncrementalAgg.finish(merged)
        .select(col("event_type"), col("cnt"),
          round(col("sum") + lit(1e-9), 6).as("sum"),
          round(col("min") + lit(1e-9), 6).as("min"),
          round(col("max") + lit(1e-9), 6).as("max"),
          round(col("avg") + lit(1e-9), 6).as("avg"))
    },
    Some("""SELECT event_type, count(value) AS cnt,
        round(sum(value) + 1e-9, 6) AS sum, round(min(value) + 1e-9, 6) AS min,
        round(max(value) + 1e-9, 6) AS max,
        round(sum(value) / count(value) + 1e-9, 6) AS avg
      FROM events GROUP BY 1"""))

  // W13 — sliding 7-day DISTINCT user count. COUNT(DISTINCT) over a
  // moving window is not directly expressible in either engine's window
  // frames; the scalable formulation explodes each distinct (user, day)
  // activity fact to the 7 window-ends it contributes to (bounded ×7
  // expansion of the ALREADY-distinct pairs, not of raw events), then
  // one distinct-count groupBy. The oracle cross-checks with an
  // explicit range join.
  val w13 = Q("w13_sliding_distinct_users",
    (s, d) => ev(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("window_end",
        explode(sequence(col("day"), date_add(col("day"), 6))))
      .groupBy(col("window_end"))
      .agg(countDistinct(col("user_id")).as("n_users_7d")),
    Some("""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events),
      we AS (SELECT DISTINCT day + CAST(i AS INT) AS window_end
        FROM act, unnest(generate_series(0, 6)) AS g(i))
      SELECT we.window_end, count(DISTINCT a.user_id) AS n_users_7d
      FROM we JOIN act a
        ON a.day BETWEEN we.window_end - 6 AND we.window_end
      GROUP BY 1"""))

  // T19 — TF-IDF top term per document: term frequency from one
  // explode+groupBy, document frequency from a second groupBy on the
  // (already doc-distinct) tf frame, corpus size as a 1-row broadcast,
  // argmax per doc via ranked window with a total-order tie-break.
  // Identical float arithmetic (tf · ln(N/df)) on both engines.
  val t19 = Q("t19_tfidf_top_term",
    (s, d) => {
      val tk = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .where(col("term") =!= "")
      val tf = tk.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = tf.agg(countDistinct(col("doc_id")).as("n"))
      val scored = tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * log(col("n") / col("df")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("term").as("top_term"),
          round(col("tfidf") + lit(1e-9), 6).as("top_tfidf"))
    },
    Some("""WITH tk AS (SELECT doc_id,
        unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
        WHERE term <> '' GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
      scored AS (SELECT doc_id, term,
        tf * ln(CAST(n.n AS DOUBLE) / df) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      ranked AS (SELECT doc_id, term, tfidf, row_number()
        OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored)
      SELECT doc_id, term AS top_term, round(tfidf + 1e-9, 6) AS top_tfidf
      FROM ranked WHERE rn = 1"""))

  // J14 — salted join on a deliberately skewed key (event_type has ~5
  // values, so a plain shuffle join funnels 1/5 of the fact table
  // through single reducers): fact rows salt into numSalts subkeys, the
  // small-but-not-broadcastable dim replicates per salt, and the hot
  // keys spread across reducers. The oracle is the PLAIN join — passing
  // proves the salted plan is row-identical.
  val j14 = Q("j14_salted_skew_join",
    (s, d) => {
      val e = ev(s, d)
      val dim = e.groupBy(col("event_type"))
        .agg(avg(col("value")).as("type_avg"))
      Skew.saltedJoin(e, dim, "event_type", numSalts = 8)
        .select(col("event_id"), col("event_type"),
          round(col("type_avg") + lit(1e-9), 6).as("type_avg"),
          round(col("value") - col("type_avg") + lit(1e-9), 6)
            .as("value_vs_type"))
    },
    Some("""WITH dim AS (SELECT event_type, avg(value) AS type_avg
        FROM events GROUP BY 1)
      SELECT e.event_id, e.event_type,
        round(dim.type_avg + 1e-9, 6) AS type_avg,
        round(e.value - dim.type_avg + 1e-9, 6) AS value_vs_type
      FROM events e JOIN dim USING (event_type)"""))

  // A30 — mergeable HLL sketches: per-day user sketches unioned into a
  // weekly distinct estimate WITHOUT re-touching the raw events (the
  // sketch is the state; re-aggregation is sketch-union — the same
  // pattern IncrementalAgg uses for algebraic measures, extended to
  // distinct counts). Driver-gated form: the exact weekly distinct is
  // emitted for the oracle and the sketch estimate reduces to a
  // deterministic 5%-tolerance boolean the oracle asserts TRUE
  // (measured max rel err 0.8% at sf0.1, 0 at sf0.01 — the sketch is
  // in sparse mode at these cardinalities). The estimate VALUE itself
  // is engine-specific (datasketches internals), which is why it is
  // asserted, not hashed.
  val a30 = Q("a30_hll_weekly_union",
    (s, d) => {
      val daily = ev(s, d)
        .withColumn("week", date_trunc("week", col("ts")).cast("date"))
        .groupBy(col("week"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sketch"))
      val est = daily.groupBy(col("week"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
          .as("est_users"))
      val exact = ev(s, d)
        .withColumn("week", date_trunc("week", col("ts")).cast("date"))
        .groupBy(col("week"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exact, "week")
        .select(col("week"), col("exact_users"),
          (abs(col("est_users") - col("exact_users")) / col("exact_users")
            <= 0.05).as("hll_within_5pct"))
    },
    Some("""SELECT date_trunc('week', ts)::DATE AS week,
      count(DISTINCT user_id) AS exact_users, true AS hll_within_5pct
      FROM events GROUP BY 1"""))

  // M12 — grouped vector aggregation: the per-label mean embedding
  // (class prototype / cluster summary), long form. posexplode keeps the
  // whole computation distributed — the shuffle carries (label, pos)
  // partial sums, never whole vectors to one place; output is the
  // labels × dim grid.
  val m12 = Q("m12_label_centroids",
    (s, d) => Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("e").cast("double")) + lit(1e-9), 6).as("centroid")),
    Some("""SELECT label, CAST(i - 1 AS INT) AS pos,
        round(avg(CAST(embedding[i] AS DOUBLE)) + 1e-9, 6) AS centroid
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
      GROUP BY 1, 2"""))

  // M13 — nearest-centroid assignment (classification by class
  // prototype): centroids re-assembled into vectors (sorted
  // struct-collect per label — 10 rows), broadcast against every
  // embedding, cosine ranked with the j12 tie-break convention, and the
  // label × assigned confusion matrix aggregated. The per-vector work
  // is one broadcast nested loop over |labels| centroids — linear in N,
  // no vector ever crosses the wire twice.
  val m13 = Q("m13_nearest_centroid",
    (s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
      val cents = base
        .select(col("label").as("c_label"),
          posexplode(col("vec")).as(Seq("pos", "e")))
        .groupBy(col("c_label"), col("pos"))
        .agg(avg(col("e")).as("c"))
        .groupBy(col("c_label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s2 => s2.getField("c")).as("cvec"))
      val scored = base.crossJoin(broadcast(cents))
        .withColumn("cos", Similarity.fastDot(col("vec"), col("cvec"))
          / (Similarity.l2Norm(col("vec")) * Similarity.l2Norm(col("cvec"))))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("c_label"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("label"), col("c_label").as("assigned_label"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""WITH centl AS (SELECT label AS c_label, i AS pos,
        avg(CAST(embedding[i] AS DOUBLE)) AS c
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
        GROUP BY 1, 2),
      cent AS (SELECT c_label, list(c ORDER BY pos) AS cvec
        FROM centl GROUP BY 1),
      scored AS (SELECT e.vec_id, e.label, c.c_label,
        list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS cos
        FROM embeddings e CROSS JOIN cent c),
      ranked AS (SELECT vec_id, label, c_label, row_number()
        OVER (PARTITION BY vec_id ORDER BY cos DESC, c_label) AS rn
        FROM scored)
      SELECT label, c_label AS assigned_label, count(*) AS n
      FROM ranked WHERE rn = 1 GROUP BY 1, 2"""))

  // W14 — TIME-range window frame (RANGE BETWEEN 6 DAYS PRECEDING):
  // where w2/w3's row frames count the last N ROWS, a range frame
  // covers the last N DAYS regardless of how many rows fall in them —
  // semantically different whenever the series has calendar gaps (here
  // forced deterministically by dropping every third day). Spark
  // expresses the interval frame as rangeBetween over the epoch-seconds
  // of the order key; same one-shuffle window shape as the row frames.
  val w14 = Q("w14_interval_range_frame",
    (s, d) => {
      val daily = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
        .agg(sum(col("value")).as("v"))
        .where(dayofmonth(col("event_date")) % 3 =!= 0)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("event_date").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400L, Window.currentRow)
      daily.select(col("event_type"), col("event_date"),
        round(sum(col("v")).over(w) + lit(1e-9), 6).as("sum_7d"),
        count(lit(1)).over(w).as("n_days_7d"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS event_date,
        sum(value) AS v FROM events GROUP BY 1, 2),
      gappy AS (SELECT * FROM daily WHERE dayofmonth(event_date) % 3 <> 0)
      SELECT event_type, event_date,
        round(sum(v) OVER w + 1e-9, 6) AS sum_7d,
        count(*) OVER w AS n_days_7d
      FROM gappy
      WINDOW w AS (PARTITION BY event_type ORDER BY event_date
        RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)"""))

  // D10 — date-spine gap filling: a dense per-key daily series rebuilt
  // from a sparse fact table (source deterministically gapped by
  // dropping every third day). The spine is one explode of each key's
  // [min, max] date range — rows generated ∝ output size, not a
  // cross join against a global calendar — then a left join fills
  // missing days with zero. The standard shape for "every day must
  // exist" ETL contracts (reporting, forward-fill inputs, ML features).
  val d10 = Q("d10_date_spine",
    (s, d) => {
      val gappy = ev(s, d)
        .withColumn("day", to_date(col("ts")))
        .where(dayofmonth(col("day")) % 3 =!= 0)
      val daily = gappy.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")) + lit(1e-9), 6).as("sum_value"))
      val spine = gappy.groupBy(col("event_type"))
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("day"))
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
    },
    Some("""WITH gappy AS (SELECT event_type, CAST(ts AS DATE) AS day, value
        FROM events WHERE dayofmonth(CAST(ts AS DATE)) % 3 <> 0),
      daily AS (SELECT event_type, day, count(*) AS n,
        round(sum(value) + 1e-9, 6) AS sum_value FROM gappy GROUP BY 1, 2),
      spine AS (SELECT event_type, CAST(unnest(generate_series(lo, hi,
          INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT event_type, min(day) AS lo, max(day) AS hi
          FROM gappy GROUP BY 1))
      SELECT s.event_type, s.day, coalesce(d.n, 0) AS n_events,
        coalesce(d.sum_value, 0.0) AS sum_value
      FROM spine s LEFT JOIN daily d USING (event_type, day)"""))

  // M14 — Welch's two-sample t-test (unequal variances) between the
  // click and purchase value distributions: statistic and
  // Welch–Satterthwaite dof in closed form from ONE conditional
  // aggregate pass over the fact table — no per-group scans.
  val m14 = Q("m14_welch_t",
    (s, d) => {
      val isA = col("event_type") === "click"
      val isB = col("event_type") === "purchase"
      val agg = ev(s, d).where(col("value").isNotNull && (isA || isB))
        .agg(
          avg(when(isA, col("value"))).as("m_a"),
          var_samp(when(isA, col("value"))).as("v_a"),
          count(when(isA, col("value"))).cast("double").as("n_a"),
          avg(when(isB, col("value"))).as("m_b"),
          var_samp(when(isB, col("value"))).as("v_b"),
          count(when(isB, col("value"))).cast("double").as("n_b"))
      val sa = col("v_a") / col("n_a")
      val sb = col("v_b") / col("n_b")
      agg.select(
        round((col("m_a") - col("m_b")) / sqrt(sa + sb) + lit(1e-9), 6)
          .as("t_stat"),
        round(pow(sa + sb, 2)
          / (pow(sa, 2) / (col("n_a") - 1) + pow(sb, 2) / (col("n_b") - 1))
          + lit(1e-9), 6).as("dof"),
        round(col("m_a") - col("m_b") + lit(1e-9), 6).as("mean_diff"))
    },
    Some("""WITH g AS (SELECT
        avg(value) FILTER (WHERE event_type = 'click') AS m_a,
        var_samp(value) FILTER (WHERE event_type = 'click') AS v_a,
        CAST(count(value) FILTER (WHERE event_type = 'click') AS DOUBLE)
          AS n_a,
        avg(value) FILTER (WHERE event_type = 'purchase') AS m_b,
        var_samp(value) FILTER (WHERE event_type = 'purchase') AS v_b,
        CAST(count(value) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
          AS n_b
        FROM events WHERE value IS NOT NULL
          AND event_type IN ('click', 'purchase'))
      SELECT round((m_a - m_b) / sqrt(v_a/n_a + v_b/n_b) + 1e-9, 6)
          AS t_stat,
        round(pow(v_a/n_a + v_b/n_b, 2)
          / (pow(v_a/n_a, 2) / (n_a - 1) + pow(v_b/n_b, 2) / (n_b - 1))
          + 1e-9, 6) AS dof,
        round(m_a - m_b + 1e-9, 6) AS mean_diff
      FROM g"""))

  // T20 — dedup SURVIVORSHIP policy: which copy to keep is a decision,
  // not an accident — here the longest document wins (doc_id breaks
  // ties), per transitive duplicate cluster. Composes the t17 connected
  // components with a ranked window; one row per cluster.
  val t20 = Q("t20_dedup_survivorship",
    (s, d) => {
      val dd = Tables.documents(s, d)
      val cc = Dedup.nearDupClusters(dd, "text", "doc_id")
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      cc.join(dd.select(col("doc_id"), col("n_chars")), "doc_id")
        .withColumn("rn", row_number().over(w))
        .groupBy(col("cluster_id"))
        .agg(min(when(col("rn") === 1, col("doc_id"))).as("keep_doc_id"),
          count(lit(1)).as("cluster_size"),
          sum(col("n_chars")).as("total_chars"))
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
      cc AS (SELECT id AS doc_id, min(m) AS cluster_id FROM reach GROUP BY 1),
      ranked AS (SELECT cc.doc_id, cc.cluster_id, d.n_chars, row_number()
        OVER (PARTITION BY cc.cluster_id
          ORDER BY d.n_chars DESC, cc.doc_id) AS rn
        FROM cc JOIN documents d USING (doc_id))
      SELECT cluster_id,
        min(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
        count(*) AS cluster_size,
        CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM ranked GROUP BY 1"""))

  // M15 — robust outlier detection via median absolute deviation:
  // |x − median| > 3·1.4826·MAD, the resistant alternative to m5's
  // mean/stddev z-score (one corrupted decade of values moves a mean,
  // not a median). Exact medians are order statistics, so the two
  // nesting levels (median, then median of deviations) are inherently
  // two aggregate passes — each a narrow (key, value) scan with the
  // tiny per-key medians broadcast back; the single-pass trade-off at
  // 100 TB is approx_percentile (a1b's pattern).
  val m15 = Q("m15_mad_outliers",
    (s, d) => {
      val e = ev(s, d).where(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      val med = e.groupBy(col("event_type"))
        .agg(percentile(col("value"), lit(0.5)).as("med"))
      val mad = e.join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("med")).as("med"),
          percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
      e.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(
          round(first(col("med")) + lit(1e-9), 6).as("med"),
          round(first(col("mad")) + lit(1e-9), 6).as("mad"),
          sum(when(abs(col("value") - col("med"))
            > lit(3 * 1.4826) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
    },
    Some("""WITH e AS (SELECT event_type, value FROM events
        WHERE value IS NOT NULL),
      med AS (SELECT event_type, median(value) AS med FROM e GROUP BY 1),
      mad AS (SELECT e.event_type, any_value(m.med) AS med,
        median(abs(e.value - m.med)) AS mad
        FROM e JOIN med m USING (event_type) GROUP BY 1)
      SELECT e.event_type, round(any_value(m.med) + 1e-9, 6) AS med,
        round(any_value(m.mad) + 1e-9, 6) AS mad,
        CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * m.mad
          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM e JOIN mad m USING (event_type) GROUP BY 1"""))

  // G1 — PageRank over the customer→supplier interaction graph (edges =
  // distinct (o_custkey, supplier) pairs through orders⋈lineitem; supplier
  // node ids mapped to −(suppkey+1) so the two key spaces can't collide —
  // both key families start at 0, so plain negation would alias 0). Exercises the
  // full power-method formulation: every supplier is dangling (bipartite
  // directed graph), so the dangling-mass redistribution term carries
  // ~half the rank each round — a degenerate-looking but maximally
  // algorithm-exercising topology. 3 iterations here so the unrolled
  // oracle stays readable (the operator defaults to 5); each iteration is
  // ONE shuffle + a broadcast 1-row dangling aggregate, ranks
  // localCheckpoint'd per round — see operators/Graph.scaladoc for the
  // 100 TB partitioning argument.
  val g1 = Q("g1_pagerank",
    (s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (-(col("l_suppkey") + 1)).as("dst"))
      val nodes = Tables.customer(s, d).select(col("c_custkey").as("id"))
        .union(Tables.supplier(s, d).select((-(col("s_suppkey") + 1)).as("id")))
      Graph.pageRank(nodes, "id", edges, "src", "dst", iters = 3)
        .select(col("id"),
          round(col("pagerank") + lit(1e-9), 6).as("pagerank"))
    },
    Some("""WITH nodes AS (SELECT c_custkey AS id FROM customer
        UNION ALL SELECT -(s_suppkey + 1) FROM supplier),
      edges AS (SELECT DISTINCT o_custkey AS src, -(l_suppkey + 1) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes, nn),
      d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
        LEFT JOIN outdeg o ON r0.id = o.src WHERE o.src IS NULL),
      c1 AS (SELECT e.dst AS id, sum(r0.r / o.od) AS c FROM edges e
        JOIN r0 ON r0.id = e.src JOIN outdeg o ON o.src = e.src GROUP BY 1),
      r1 AS (SELECT nodes.id,
          0.15 / nn.n + 0.85 * (coalesce(c1.c, 0) + d1.dm / nn.n) AS r
        FROM nodes LEFT JOIN c1 ON nodes.id = c1.id, nn, d1),
      d2 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
        LEFT JOIN outdeg o ON r1.id = o.src WHERE o.src IS NULL),
      c2 AS (SELECT e.dst AS id, sum(r1.r / o.od) AS c FROM edges e
        JOIN r1 ON r1.id = e.src JOIN outdeg o ON o.src = e.src GROUP BY 1),
      r2 AS (SELECT nodes.id,
          0.15 / nn.n + 0.85 * (coalesce(c2.c, 0) + d2.dm / nn.n) AS r
        FROM nodes LEFT JOIN c2 ON nodes.id = c2.id, nn, d2),
      d3 AS (SELECT coalesce(sum(r), 0) AS dm FROM r2
        LEFT JOIN outdeg o ON r2.id = o.src WHERE o.src IS NULL),
      c3 AS (SELECT e.dst AS id, sum(r2.r / o.od) AS c FROM edges e
        JOIN r2 ON r2.id = e.src JOIN outdeg o ON o.src = e.src GROUP BY 1),
      r3 AS (SELECT nodes.id,
          0.15 / nn.n + 0.85 * (coalesce(c3.c, 0) + d3.dm / nn.n) AS r
        FROM nodes LEFT JOIN c3 ON nodes.id = c3.id, nn, d3)
      SELECT id, round(r + 1e-9, 6) AS pagerank FROM r3"""))

  // M16 — first-order Markov transition matrix over per-user event-type
  // sequences: P(next=dst | cur=src) with counts. ONE user-partitioned
  // shuffle computes every adjacent pair via lead(); the transition
  // matrix is ≤ |event_types|² ≈ 25 cells, so the row-normalizing window
  // rides a trivially small frame. The sequence-model analogue of a27's
  // fixed funnel: order-sensitive, but over ALL transitions.
  val m16 = Q("m16_markov_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, d).where(col("ts").isNotNull)
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .where(col("dst").isNotNull)
        .select(col("event_type").as("src"), col("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(
          col("n") / sum(col("n")).over(Window.partitionBy(col("src")))
            + lit(1e-9), 6))
    },
    Some("""WITH seq AS (SELECT event_type AS src,
        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS dst
        FROM events WHERE ts IS NOT NULL),
      t AS (SELECT src, dst, count(*) AS n FROM seq
        WHERE dst IS NOT NULL GROUP BY 1, 2)
      SELECT src, dst, n,
        round(n / sum(n) OVER (PARTITION BY src) + 1e-9, 6) AS p FROM t"""))

  // T21 — importance-weighted corpus sampling (Efraimidis–Spirakis A-ES,
  // see operators/Sampling.weightedSample): u^(1/w) scoring with a
  // md5-seeded deterministic uniform, w = document length, global top-100.
  // TakeOrdered physical plan (partial per-partition heaps) — no global
  // sort shuffle, O(k) task memory at any corpus size; the seeded draw
  // makes the "random" sample engine- and retry-reproducible, which is
  // what lets the same SQL run in DuckDB as the oracle.
  val t21 = Q("t21_weighted_sample",
    (s, d) => Sampling.weightedSample(
        Tables.documents(s, d)
          .select(col("doc_id"), length(col("text")).cast("double").as("w")),
        "doc_id", "w", k = 100)
      .select(col("doc_id"), col("w").cast("long").as("w"),
        round(col("sample_key") + lit(1e-9), 6).as("skey")),
    Some("""WITH k AS (SELECT doc_id, CAST(len(text) AS DOUBLE) AS w,
        (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
          AS BIGINT) + 0.5) / 72057594037927936.0 AS u
      FROM documents)
      SELECT doc_id, CAST(w AS BIGINT) AS w,
        round(pow(u, 1.0 / w) + 1e-9, 6) AS skey
      FROM k ORDER BY pow(u, 1.0 / w) DESC, doc_id LIMIT 100"""))

  // M17 — population stability index: distribution drift of `value`
  // between the first and second half of the month, per event type, over
  // m10's fixed bins. PSI = Σ (p−q)·ln(p/q) with add-one smoothing so
  // empty bins stay finite. ONE conditional-aggregate scan produces both
  // periods' bin counts (no self-join, no second pass); the per-type
  // normalizing totals ride a window over the ≤ types×bins cell frame.
  // Add-one smoothing is over the OBSERVED bins of each type (a bin
  // empty in one period stays finite; a bin empty in both is absent from
  // the frame and contributes 0 drift on both engines). The drift
  // monitor you run per ingest batch at 100 TB — it costs one
  // map-side-combinable groupBy.
  val m17 = Q("m17_psi_drift",
    (s, d) => {
      val split = lit("2024-01-16").cast("timestamp")
      val cells = ev(s, d).where(col("value").isNotNull)
        .withColumn("bin",
          least(greatest(floor(col("value") / lit(histStep)), lit(0L)),
            lit((histBins - 1).toLong)))
        .groupBy(col("event_type"), col("bin"))
        .agg(sum(when(col("ts") < split, 1L).otherwise(0L)).as("na"),
          sum(when(col("ts") >= split, 1L).otherwise(0L)).as("nb"))
      val w = Window.partitionBy(col("event_type"))
      cells
        .withColumn("p", (col("na") + 1.0)
          / (sum(col("na")).over(w) + count(lit(1)).over(w)))
        .withColumn("q", (col("nb") + 1.0)
          / (sum(col("nb")).over(w) + count(lit(1)).over(w)))
        .groupBy(col("event_type"))
        .agg(round(sum((col("p") - col("q")) * log(col("p") / col("q")))
          + lit(1e-9), 6).as("psi"))
    },
    Some("""WITH cells AS (SELECT event_type,
        CAST(least(greatest(floor(value / 25.0), 0), 19) AS BIGINT) AS bin,
        sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS na,
        sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS nb
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      pq AS (SELECT event_type,
        (na + 1.0) / (sum(na) OVER (PARTITION BY event_type)
          + count(*) OVER (PARTITION BY event_type)) AS p,
        (nb + 1.0) / (sum(nb) OVER (PARTITION BY event_type)
          + count(*) OVER (PARTITION BY event_type)) AS q
        FROM cells)
      SELECT event_type, round(sum((p - q) * ln(p / q)) + 1e-9, 6) AS psi
      FROM pq GROUP BY 1"""))

  // A31 — multi-touch attribution: every purchase's value credited to the
  // channel (props.k mod 8) of the user's FIRST click and of the LAST
  // click preceding it. One user-partitioned window pass computes both
  // carried channels via first/last(..., ignoreNulls) over an unbounded-
  // preceding frame — no self-join, no per-model scan; the two models
  // then unpivot into (model, channel) rows through one explode, so the
  // final aggregate is a single shuffle over purchase rows only.
  // Purchases with no prior click credit channel −1.
  val a31 = Q("a31_attribution",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val clickCh = when(col("event_type") === "click",
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
          .cast("long") % 8)
      ev(s, d).where(col("ts").isNotNull)
        .withColumn("first_ch", first(clickCh, ignoreNulls = true).over(w))
        .withColumn("last_ch", last(clickCh, ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("value"), explode(array(
          struct(lit("first_touch").as("model"),
            coalesce(col("first_ch"), lit(-1L)).as("channel")),
          struct(lit("last_touch").as("model"),
            coalesce(col("last_ch"), lit(-1L)).as("channel")))).as("mc"))
        .groupBy(col("mc.model").as("model"), col("mc.channel").as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("value")) + lit(1e-9), 4).as("attributed_value"))
    },
    Some("""WITH seq AS (SELECT event_type, value,
        first_value(CASE WHEN event_type = 'click'
            THEN CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 8 END
            IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ch,
        last_value(CASE WHEN event_type = 'click'
            THEN CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 8 END
            IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_ch
        FROM events WHERE ts IS NOT NULL),
      p AS (SELECT * FROM seq
        WHERE event_type = 'purchase' AND value IS NOT NULL),
      stacked AS (
        SELECT 'first_touch' AS model, coalesce(first_ch, -1) AS channel,
          value FROM p
        UNION ALL
        SELECT 'last_touch', coalesce(last_ch, -1), value FROM p)
      SELECT model, channel, count(*) AS n_purchases,
        round(sum(value) + 1e-9, 4) AS attributed_value
      FROM stacked GROUP BY 1, 2"""))

  // G2 — bipartite projection of the customer↔supplier graph: supplier
  // pairs weighted by shared-customer count (the co-occurrence graph that
  // feeds item-item similarity / co-purchase analysis). Distinct edges
  // first, then a self-equi-join on the customer key with s1 < s2 — the
  // fan-out per join key is the customer's distinct-supplier degree, so
  // the pair space is Σ deg², NOT |edges|²; at 100 TB you cap hub
  // degrees (drop or sample customers above a degree bound) before
  // projecting — the same guard as t7's df≤100 shingle prune.
  val g2 = Q("g2_cooccurrence_projection",
    (s, d) => {
      val e = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .distinct()
      val a = e.select(col("c"), col("sp").as("s1"))
      val b = e.select(col("c"), col("sp").as("s2"))
      a.join(b, Seq("c")).where(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2"))
        .agg(count(lit(1)).as("shared_customers"))
    },
    Some("""WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      SELECT a.sp AS s1, b.sp AS s2, count(*) AS shared_customers
      FROM e a JOIN e b ON a.c = b.c AND a.sp < b.sp
      GROUP BY 1, 2"""))

  // O10 — slowly-changing-dimension type-2 history build: each user's
  // "tier" attribute (props.k mod 4) becomes versioned rows with
  // [valid_from, valid_to) and an is_current flag. ONE user-partitioned
  // window sort serves both steps: lag() marks change points, rows
  // between changes collapse away in the filter, lead() closes each
  // segment. No self-join, no MERGE loop — the whole dimension history
  // is a single shuffle, which is what makes nightly SCD2 rebuilds
  // feasible on a 100 TB event log (and the incremental form is just
  // the same plan over new days unioned with each key's open segment).
  val o10 = Q("o10_scd2_history",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val seg = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"))
      ev(s, d).where(col("ts").isNotNull)
        .withColumn("tier",
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
            .cast("long") % 4)
        .withColumn("prev_tier", lag(col("tier"), 1).over(w))
        .where(col("prev_tier").isNull || col("prev_tier") =!= col("tier"))
        .select(col("user_id"), col("tier"), col("ts").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(seg))
        .withColumn("is_current", col("valid_to").isNull)
    },
    Some("""WITH t AS (SELECT user_id, ts, event_id,
        CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 4 AS tier
        FROM events WHERE ts IS NOT NULL),
      marked AS (SELECT user_id, tier, ts,
        lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_tier
        FROM t),
      seg AS (SELECT user_id, tier, ts AS valid_from FROM marked
        WHERE prev_tier IS NULL OR prev_tier <> tier)
      SELECT user_id, tier, valid_from,
        lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
          AS valid_to,
        lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
          IS NULL AS is_current
      FROM seg"""))

  // W15 — seasonality-adjusted anomaly detection: each (event_type, day)
  // total scored against the mean/stddev of the SAME WEEKDAY for that
  // type — the deseasonalized z-score that keeps Monday-vs-Sunday level
  // shifts from reading as anomalies. The weekday baseline is an
  // aggregate window over the already-daily frame (≤ types×days rows),
  // so the fact table is scanned once; at 100 TB the baseline would be
  // an incremental per-(type,weekday) state (a29's mergeable pattern).
  // Days with |z| > 2 are flagged.
  val w15 = Q("w15_seasonal_anomaly",
    (s, d) => {
      val daily = ev(s, d).where(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
        .agg(sum(col("value")).as("v"))
        .withColumn("wd", dayofweek(col("event_date")))
      val w = Window.partitionBy(col("event_type"), col("wd"))
      daily
        .withColumn("mu", avg(col("v")).over(w))
        .withColumn("sd", stddev_samp(col("v")).over(w))
        .select(col("event_type"), col("event_date"),
          round(col("v") + lit(1e-9), 6).as("v"),
          round(((col("v") - col("mu")) / col("sd")) + lit(1e-9), 6).as("z"),
          (abs((col("v") - col("mu")) / col("sd")) > 2).as("is_anomaly"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS event_date,
        sum(value) AS v FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      wd AS (SELECT *, dayofweek(event_date) + 1 AS wd FROM daily),
      scored AS (SELECT event_type, event_date, v,
        avg(v) OVER (PARTITION BY event_type, wd) AS mu,
        stddev_samp(v) OVER (PARTITION BY event_type, wd) AS sd
        FROM wd)
      SELECT event_type, event_date, round(v + 1e-9, 6) AS v,
        round((v - mu) / sd + 1e-9, 6) AS z,
        abs((v - mu) / sd) > 2 AS is_anomaly
      FROM scored"""))

  // M18 — Benford's-law conformance of the value column: observed
  // first-significant-digit shares vs the log10(1+1/d) expectation, the
  // classic synthetic/fraudulent-data screen. The leading digit is taken
  // from the decimal string of floor(value·10⁶) — NOT via
  // floor(log10(v)) exponent math, whose power-of-ten boundary rounding
  // (log10(100) ⇒ 1.999…) is engine-dependent; string heads are exact on
  // both engines. One map-side-combinable groupBy; the share-normalizing
  // window rides the ≤9-row digit frame.
  val m18 = Q("m18_benford",
    (s, d) => {
      val digits = ev(s, d)
        .where(col("value").isNotNull && col("value") >= 0.001)
        .select(substring(floor(col("value") * 1e6).cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      digits
        // bounded frame: exactly 9 digit rows — unpartitioned window safe.
        .withColumn("share",
          round(col("n") / sum(col("n")).over(Window.partitionBy())
            + lit(1e-9), 6))
        .withColumn("expected",
          round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
            + lit(1e-9), 6))
    },
    Some("""WITH digits AS (SELECT
        CAST(substr(CAST(CAST(floor(value * 1e6) AS BIGINT) AS VARCHAR),
          1, 1) AS INT) AS digit,
        count(*) AS n
        FROM events WHERE value IS NOT NULL AND value >= 0.001 GROUP BY 1)
      SELECT digit, n,
        round(n / sum(n) OVER () + 1e-9, 6) AS share,
        round(ln(1.0 + 1.0 / digit) / ln(10.0) + 1e-9, 6) AS expected
      FROM digits"""))

  // M19 — Gini concentration coefficient of value per event type, exact
  // via the sorted-rank formula G = Σ(2i−n−1)·xᵢ / (n·Σxᵢ): ONE
  // partitioned sort assigns ranks, then a plain aggregate — no O(n²)
  // pairwise |xᵢ−xⱼ| sum. Tie order between equal values doesn't change
  // the statistic (swapping equal xᵢ across ranks is a no-op in the
  // sum), so the event_id tie-break is for determinism only.
  val m19 = Q("m19_gini",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      ev(s, d).where(col("value").isNotNull && col("value") >= 0)
        .withColumn("i", row_number().over(w).cast("double"))
        .withColumn("nn", count(lit(1))
          .over(Window.partitionBy(col("event_type"))).cast("double"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_values"),
          round(sum((lit(2.0) * col("i") - col("nn") - 1) * col("value"))
            / (count(lit(1)) * sum(col("value"))) + lit(1e-9), 6)
            .as("gini"))
    },
    Some("""WITH ranked AS (SELECT event_type, value,
        CAST(row_number() OVER (PARTITION BY event_type
          ORDER BY value, event_id) AS DOUBLE) AS i,
        count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL AND value >= 0)
      SELECT event_type, count(*) AS n_values,
        round(sum((2.0 * i - n - 1) * value) / (count(*) * sum(value))
          + 1e-9, 6) AS gini
      FROM ranked GROUP BY 1"""))

  // T22 — unigram-LM surprise scoring: every document scored by the mean
  // negative log-probability of its tokens under the corpus's own
  // unigram model — the cheap statistical stand-in for perplexity-based
  // quality filtering (high surprise = rare-token soup, low = boilerplate).
  // Two aggregates: vocabulary counts (map-side combinable), then a
  // vocab⋈tokens equi-join back (AQE broadcasts it when vocab is small)
  // — the corpus is scanned twice but
  // the second scan carries only (doc_id, token). The total-token
  // normalizer is a 1-row aggregate cross-joined back (broadcast): the
  // vocab frame is |vocab| rows (~10⁸ on a web corpus), so an
  // unpartitioned window over it would single-partition a genuinely
  // large frame — the m22 rule, solved here by a scalar instead of a
  // prefix because only the TOTAL is needed.
  val t22 = Q("t22_unigram_surprise",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .where(col("tok") =!= "")
      val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        // feeds the scalar total AND the join — one aggregation,
        // GC-released checkpoint instead of a pinned cache entry
        .localCheckpoint(true)
      val vocab = counts
        .crossJoin(broadcast(counts.agg(sum(col("n")).as("__tot"))))
        .withColumn("p", col("n") / col("__tot"))
      // No broadcast hint on the vocab join: at web-corpus scale the
      // vocab frame is the ~10^8-row side the comment above describes —
      // a forced broadcast (driver collect + per-executor copy) would be
      // the blow-up, not the window it replaced. AQE still picks a
      // broadcast join at runtime whenever vocab is actually small.
      toks.join(vocab.select(col("tok"), col("p")), "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(-log(col("p"))) + lit(1e-9), 6).as("surprise"))
    },
    Some("""WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id,
        unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents) WHERE tok <> ''),
      vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
      tot AS (SELECT sum(n) AS t FROM vocab)
      SELECT doc_id, count(*) AS n_tokens,
        round(avg(-ln(vocab.n / tot.t)) + 1e-9, 6) AS surprise
      FROM toks JOIN vocab USING (tok) CROSS JOIN tot GROUP BY 1"""))

  val all: Seq[Q] = Seq(a26, a27, a28, a29, a30, w11, w12, m10, m11, m11b,
    t18, t19, o9, w13, j14, m12, m13, w14, d10, m14, t20, m15, g1, m16,
    t21, m17, a31, g2, o10, w15, m18, m19, t22)
}
