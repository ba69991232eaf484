package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Readers

/** Fixture-driven tests for the 8-step cleaner (FIXTURES.md §A1 dirty
  * cases): defaults, timestamp fallback, address normalization, price
  * fallback, event-type canonicalization, deterministic dedup, schema.
  */
class EventCleanerSpec extends SparkSpecBase {

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_cleaner_fixture").toString
    // file A: full columns, assorted dirty rows
    val a = Seq(
      "chain,collection,identifier,event_type,time_utc,timestamp,tx,seller,buyer,from_address,to_address,quantity,price_total,currency_symbol,contract,token_id,price_each",
      // clean sale
      "ethereum,bayc,1,sale,2023-05-01T10:00:00+00:00,1682935200,0xA1,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,1,1.5,ETH,0xC1,101, 1.5 ",
      // null chain + currency -> defaults; listing variant; price_each empty -> total/qty
      ",bayc,2,LISTING,2023-05-01T11:00:00+00:00,1682938800,0xA2,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,,,,2,3.0,,0xC1,102,",
      // mint from the null address; unparseable time_utc -> epoch fallback
      "ethereum,bayc,3,mint,not-a-time,1682942400,0xA3,,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,0x0000000000000000000000000000000000000000,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,1,0.0,ETH,0xC1,103,",
      // negative price -> dropped
      "ethereum,bayc,4,sale,2023-05-01T12:00:00+00:00,1682946000,0xA4,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,1,-5.0,ETH,0xC1,104,",
      // exact duplicate key of row 1 (same tx/token/type/timestamp)
      "ethereum,bayc,1,sale,2023-05-01T10:00:00+00:00,1682935200,0xA1,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,1,1.5,ETH,0xC1,101,1.5",
      // null quantity -> 1; cancel_listing variant
      "ethereum,azuki,5,cancel_listing,2023-05-02T09:00:00+00:00,1683018000,0xA5,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,,,,,0.0,ETH,0xC2,201,")
      .mkString("\n")
    // file B: column subset (no price_each / rarity), exercises union-by-name
    val b = Seq(
      "chain,collection,identifier,event_type,time_utc,timestamp,tx,seller,buyer,from_address,to_address,quantity,price_total,currency_symbol,contract,token_id",
      "ethereum,azuki,6,transfer,2023-05-02T10:00:00+00:00,1683021600,0xA6,,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12,0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34,1,0.0,ETH,0xC2,202")
      .mkString("\n")
    Files.writeString(Paths.get(s"$dir/a.csv"), a)
    Files.writeString(Paths.get(s"$dir/b.csv"), b)
    dir
  }

  private lazy val raw: DataFrame = Readers.readCsvUnionByName(spark,
    Seq(s"$fixtureDir/a.csv", s"$fixtureDir/b.csv"))

  private lazy val clean: DataFrame = EventCleaner.clean(raw).cache()

  test("dedup + negative-price drop: 7 raw rows -> 5 clean rows") {
    assert(raw.count() === 7)
    assert(clean.count() === 5)
  }

  test("minimal schema matches the declared 20-column StructType") {
    assert(clean.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Schemas.minimalEventSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("defaults: null chain -> ethereum, null currency -> ETH, null qty -> 1") {
    val r = clean.where(col("token_id") === "102").head()
    assert(r.getAs[String]("chain") === "ethereum")
    assert(r.getAs[String]("currency_symbol") === "ETH")
    val r2 = clean.where(col("token_id") === "201").head()
    assert(r2.getAs[Long]("quantity") === 1L)
  }

  test("event-type canonicalization: listing -> list, cancel_listing -> cancel_list") {
    assert(clean.where(col("token_id") === "102").head()
      .getAs[String]("event_type") === "list")
    assert(clean.where(col("token_id") === "201").head()
      .getAs[String]("event_type") === "cancel_list")
  }

  test("price_each fallback = price_total / quantity") {
    val r = clean.where(col("token_id") === "102").head()
    assert(r.getAs[Double]("price_each_eth") === 1.5)
  }

  test("addresses lowercased; mint detected from null address") {
    val r = clean.where(col("token_id") === "101").head()
    val seller = r.getAs[String]("seller")
    assert(seller === seller.toLowerCase)
    assert(seller.startsWith("0xaaa") && seller.endsWith("b12"))
    val mint = clean.where(col("event_type") === "mint").head()
    assert(mint.getAs[String]("from_address") === Schemas.nullAddress)
  }

  test("contract lowercased; null addresses filled with '' (reference parity)") {
    assert(clean.where(col("token_id") === "101").head()
      .getAs[String]("contract_address") === "0xc1")
    // row 102 has empty seller-side addresses in the fixture
    val r = clean.where(col("token_id") === "102").head()
    assert(r.getAs[String]("buyer") === "")
    assert(r.getAs[String]("from_address") === "")
    assert(clean.where(col("seller").isNull || col("buyer").isNull ||
      col("from_address").isNull || col("to_address").isNull).count() === 0)
  }

  test("timestamp fallback: unparseable time_utc uses epoch column") {
    val r = clean.where(col("token_id") === "103").head()
    assert(r.getAs[Long]("unix_timestamp") === 1682942400L)
    assert(r.getAs[java.sql.Date]("event_date").toString === "2023-05-01")
  }

  test("event_id = tx '_' token_id and is unique") {
    val r = clean.where(col("token_id") === "101").head()
    assert(r.getAs[String]("event_id") === "0xA1_101")
    assert(clean.select("event_id").distinct().count() === clean.count())
  }

  test("missing optional columns arrive as typed nulls") {
    assert(clean.where(col("rarity_rank").isNotNull).count() === 0)
    assert(clean.where(col("rarity_score").isNotNull).count() === 0)
  }

  test("cleaning is idempotent on the dedup key") {
    val again = graft.operators.Dedup.dropDuplicatesDeterministic(
      clean, Seq("tx_hash", "token_id", "event_type", "unix_timestamp"),
      col("event_id"))
    assert(again.count() === clean.count())
  }

  test("validator reports the dirty inputs") {
    val report = DataValidator.report(raw)
    assert(report.totalRows === 7)
    assert(report.duplicateKeyCount === 1)
    assert(report.negativePriceCount === 1)
    assert(report.missingColumns.isEmpty)
  }
}
