package graft.analysis

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.etl.EventAggregator
import graft.operators.{Sampling, Stats}

class MiscOperatorsSpec extends SparkSpecBase {

  import spark.implicits._

  test("labelByDateRanges assigns the expert regimes from the dim table") {
    val df = Seq("2021-03-01", "2021-10-01", "2022-07-01", "2023-06-01",
      "2024-05-01", "2019-01-01")
      .toDF("d").select(col("d").cast("date").as("d"))
    val labeled = CycleLabeler.labelByDateRanges(df, "d",
      CycleLabeler.regimeDim(spark))
    val m = labeled.select("d", "regime").as[(java.sql.Date, String)]
      .collect().map { case (d, r) => d.toString -> r }.toMap
    assert(m("2021-03-01") === "discovery")
    assert(m("2021-10-01") === "bull")
    assert(m("2022-07-01") === "crash")
    assert(m("2023-06-01") === "bear")
    assert(m("2024-05-01") === "uncertain")
    assert(m("2019-01-01") === null)
  }

  test("hash splits are stable, disjoint and roughly sized") {
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
    val split = Sampling.withSplit(docs, "doc_id", 10, 10)
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > total * 7 / 10)
    // stability: same assignment on recomputation
    val again = Sampling.withSplit(docs, "doc_id", 10, 10)
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() === 0)
  }

  test("corrMatrix returns each unordered series pair once") {
    val df = Seq(
      ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0),
      ("b", 1, 2.0), ("b", 2, 4.0), ("b", 3, 6.0),
      ("c", 1, 3.0), ("c", 2, 2.0), ("c", 3, 1.0))
      .toDF("series", "k", "v")
    val m = Stats.corrMatrix(df, "series", "k", "v").collect()
    assert(m.length === 3) // ab, ac, bc
    val ab = m.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(math.abs(ab.getAs[Double]("pearson_r") - 1.0) < 1e-9)
    val ac = m.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    assert(math.abs(ac.getAs[Double]("pearson_r") + 1.0) < 1e-9)
  }

  test("a1b catalog query tracks exact a1 within sketch tolerance") {
    val d = sf("sf0.001")
    val exact = graft.SparkEntry.queries("a1_daily_event_stats")(spark, d)
      .select(col("event_date"), col("n_events"), col("n_users"))
    // a1b is now the driver-gated audit form: exact columns + in-plan
    // tolerance booleans. The exact columns must agree with a1, and
    // every boolean must hold.
    val audit = graft.SparkEntry.queries("a1b_daily_stats_approx")(spark, d)
      .select(col("event_date"), col("n_events").as("n_events_a"),
        col("n_users").as("n_users_a"),
        col("hll_within_3sigma"), col("median_in_p40_p60"))
    val joined = exact.join(audit, Seq("event_date")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_events") === r.getAs[Long]("n_events_a"))
      assert(r.getAs[Long]("n_users") === r.getAs[Long]("n_users_a"))
      assert(r.getAs[Boolean]("hll_within_3sigma"),
        s"HLL drift past 3-sigma on ${r.getAs[java.sql.Date]("event_date")}")
      assert(r.getAs[Boolean]("median_in_p40_p60"),
        s"approx median outside exact p40..p60 band on " +
          s"${r.getAs[java.sql.Date]("event_date")}")
    }
  }

  test("approx daily stats track the exact form within sketch tolerance") {
    val events = graft.Tables.events(spark, sf("sf0.01"))
      .withColumn("collection", col("event_type"))
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("price_total_eth", col("value"))
      .withColumn("buyer", col("user_id").cast("string"))
      .withColumn("seller", col("user_id").cast("string"))
      .withColumn("token_id", col("event_id").cast("string"))
    val exact = EventAggregator.dailyCollectionStats(events)
      .select("collection", "event_date", "unique_buyers", "median_price_eth")
    val approx = EventAggregator.dailyCollectionStatsApprox(events)
      .select(col("collection"), col("event_date"),
        col("unique_buyers").as("ub_approx"),
        col("median_price_eth").as("med_approx"))
    val joined = exact.join(approx, Seq("collection", "event_date")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val ub = r.getAs[Long]("unique_buyers").toDouble
      val ua = r.getAs[Long]("ub_approx").toDouble
      assert(math.abs(ua - ub) <= math.max(2.0, ub * 0.1),
        s"distinct drift: $ub vs $ua")
      val me = r.getAs[Double]("median_price_eth")
      val ma = r.getAs[Double]("med_approx")
      if (!me.isNaN) assert(math.abs(ma - me) <= math.max(1.0, me * 0.25))
    }
  }

  test("GraftExtensions registers dot_product in a fresh session") {
    // `spark.sql.extensions` is a STATIC conf: it only takes effect on
    // the JVM's first SparkContext, so the config-string form is not
    // testable once any suite session exists (the test was previously
    // order-dependent on winning that race). The builder's programmatic
    // withExtensions path runs the same GraftExtensions injection at
    // new-session construction — that is what this pins. Clearing the
    // active/default session forces getOrCreate to actually construct
    // a new session (reusing the JVM-wide SparkContext).
    spark // materialize the lazy shared session before clearing
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d))").head()
      assert(r.getDouble(0) === 11.0)
      // kmv_agg registers as a SQL aggregate: 3 distinct values, k=8
      // below capacity => the sketch IS the set
      val k = s2.sql("SELECT kmv_agg(h, 8) FROM VALUES (1L),(2L),(2L),(3L)" +
        " AS t(h)").head().getSeq[Long](0)
      assert(k === Seq(1L, 2L, 3L))
      val m = s2.sql("SELECT kmv_merge_agg(s, 2) FROM VALUES " +
        "(array(1L, 5L)), (array(2L, 9L)) AS t(s)").head().getSeq[Long](0)
      assert(m === Seq(1L, 2L))
    } finally {
      // s2 shares the JVM-wide SparkContext — do NOT stop it; just
      // restore the suite session as active/default.
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
