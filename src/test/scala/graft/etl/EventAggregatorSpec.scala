package graft.etl

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class EventAggregatorSpec extends SparkSpecBase {

  import spark.implicits._

  // (collection, token, type, date, ts, buyer, seller, to, total, each)
  private lazy val clean: DataFrame = Seq(
    ("bayc", "1", "mint", "2023-05-01", 1682935000L, "0xb1", null, "0xb1", 0.0, 0.0),
    ("bayc", "1", "sale", "2023-05-01", 1682935200L, "0xb1", "0xs1", "0xb1", 2.0, 2.0),
    ("bayc", "1", "sale", "2023-05-02", 1683021600L, "0xb2", "0xb1", "0xb2", 4.0, 4.0),
    ("bayc", "2", "sale", "2023-05-01", 1682936000L, "0xb2", "0xs1", "0xb2", 6.0, 6.0),
    ("bayc", "2", "transfer", "2023-05-03", 1683108000L, null, null, "0xb3", 0.0, 0.0),
    ("azuki", "9", "sale", "2023-05-01", 1682937000L, "0xb1", "0xs2", "0xb1", 10.0, 10.0))
    .toDF("collection", "token_id", "event_type", "d", "unix_timestamp",
      "buyer", "seller", "to_address", "price_total_eth", "price_each_eth")
    .withColumn("event_date", to_date(col("d")))
    .withColumn("event_timestamp", timestamp_seconds(col("unix_timestamp")))
    .withColumn("contract_address", lit("0xc"))
    .withColumn("rarity_rank", lit(null).cast("long"))
    .withColumn("rarity_score", lit(null).cast("double"))
    .drop("d")
    .cache()

  test("dailyCollectionStats: one row per (collection, date), fused pivot + price stats") {
    val daily = EventAggregator.dailyCollectionStats(clean)
    val r = daily.where(col("collection") === "bayc" &&
      col("event_date") === Date.valueOf("2023-05-01")).head()
    assert(r.getAs[Long]("event_count") === 3)
    assert(r.getAs[Long]("sale_count") === 2)
    assert(r.getAs[Long]("mint_count") === 1)
    assert(r.getAs[Long]("transfer_count") === 0)
    assert(r.getAs[Double]("volume_eth") === 8.0)
    assert(r.getAs[Double]("avg_price_eth") === 4.0)
    assert(r.getAs[Double]("median_price_eth") === 4.0)
    assert(r.getAs[Long]("unique_buyers") === 2)
  }

  test("tokenStats: mint date, last trade via max_by, volumes") {
    val tok = EventAggregator.tokenStats(clean)
    val r = tok.where(col("token_id") === "1").head()
    assert(r.getAs[Long]("event_count") === 3)
    assert(r.getAs[Date]("first_mint_date") === Date.valueOf("2023-05-01"))
    assert(r.getAs[Date]("last_trade_date") === Date.valueOf("2023-05-02"))
    assert(r.getAs[Double]("last_trade_price_eth") === 4.0)
    assert(r.getAs[Double]("total_volume_eth") === 6.0)
    val t2 = tok.where(col("token_id") === "2").head()
    assert(t2.getAs[Date]("first_mint_date") === null)
  }

  test("collectionSummary quartiles over priced events") {
    val s = EventAggregator.collectionSummary(clean)
    val r = s.where(col("collection") === "bayc").head()
    assert(r.getAs[Long]("priced_events") === 3)
    assert(r.getAs[Double]("median_price_eth") === 4.0)
    assert(r.getAs[Double]("p25_price_eth") === 3.0)
    assert(r.getAs[Double]("p75_price_eth") === 5.0)
  }

  test("walletDimension: full outer + horizontal min/max + HAVING") {
    val w = EventAggregator.walletDimension(clean)
    // 0xb1 buys 3× (mint, bayc sale, azuki sale) and sells once (05-02)
    val b1 = w.where(col("wallet_address") === "0xb1").head()
    assert(b1.getAs[Long]("buy_count") === 3)
    assert(b1.getAs[Long]("sell_count") === 1)
    assert(b1.getAs[Long]("total_transactions") === 4)
    assert(b1.getAs[Date]("first_activity_date") === Date.valueOf("2023-05-01"))
    assert(b1.getAs[Date]("last_activity_date") === Date.valueOf("2023-05-02"))
    // 0xs2 only sells — buy side nulls coalesced to 0
    val s2 = w.where(col("wallet_address") === "0xs2").head()
    assert(s2.getAs[Long]("buy_count") === 0)
    assert(s2.getAs[Long]("sell_count") === 1)
    assert(s2.getAs[Date]("first_activity_date") === Date.valueOf("2023-05-01"))
    // HAVING filter
    assert(EventAggregator.walletDimension(clean, minTransactions = 3)
      .count() === 1)
  }

  test("dailyGlobalSeries: strict 7-day rolling mean is null before 7 rows") {
    val g = EventAggregator.dailyGlobalSeries(clean)
    assert(g.where(col("rolling_avg_7").isNotNull).count() === 0)
    assert(g.count() === 3)
  }
}
