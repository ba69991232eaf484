package graft.etl

import java.nio.file.{Files, Paths}

import scala.util.Random

import graft.SparkSpecBase

/** Golden-parity run (SURVEY §5.2 item 3; VERDICT r1 "what's missing" #3):
  * the reference ships one committed real run —
  * opensea_pipeline/clean/2025-10-31_02-04-53/{metrics.json,_run.log}
  * (1,563,309 raw → 1,557,807 clean, transfer > sale > mint mix, date
  * range 2021-04-22..2025-10-16). Its raw CSVs are not in the repo, so
  * exact numeric parity is unreproducible by construction; what IS
  * checkable is the committed-golden PATTERN: a generated corpus with
  * planted facts (duplicates, event mix, date range, priced/unpriced
  * split, per-collection counts) must flow through the full pipeline and
  * land in metrics.json with every field of the reference's shape
  * carrying exactly the planted value.
  */
class GoldenParitySpec extends SparkSpecBase {

  // Planted corpus facts — every assertion below derives from these.
  private val collections = Seq( // name -> rows (distinct counts, like the golden file)
    "azuki" -> 3000, "clonex" -> 2500, "pudgypenguins" -> 2000,
    "boredapeyachtclub" -> 1500, "milady" -> 1000, "cool-cats-nft" -> 500,
    "shadow-a" -> 300, "shadow-b" -> 200)
  private val nRows = collections.map(_._2).sum          // 11,000 raw
  private val nDupRows = 400                             // exact-key duplicate rows appended
  private val nNegative = 100                            // negative-price rows appended (dropped)
  private val minDate = "2021-04-22"
  private val maxDate = "2025-10-16"

  private def corpusDir: String = {
    val dir = Files.createTempDirectory("graft_golden").toString
    val rnd = new Random(7)
    val header = "chain,collection,identifier,event_type,time_utc,timestamp,tx," +
      "seller,buyer,from_address,to_address,quantity,price_total," +
      "currency_symbol,contract,token_id,price_each"
    val t0 = java.time.Instant.parse(s"${minDate}T00:00:00Z").getEpochSecond
    val t1 = java.time.Instant.parse(s"${maxDate}T23:00:00Z").getEpochSecond
    var rowId = 0
    def mkRow(coll: String, et: String, priced: Boolean, ts: Long): String = {
      rowId += 1
      val price = if (priced) s"${1 + rowId % 50}.25" else "0.0"
      s"ethereum,$coll,$rowId,$et,,$ts,0xT$rowId," +
        "0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12," +
        "0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34," +
        "0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12," +
        "0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34," +
        s"1,$price,ETH,0xC1,tok${rowId % 97},"
    }
    val body = collections.flatMap { case (coll, n) =>
      (0 until n).map { i =>
        // transfer-heavy mix like the golden run: 4:2:1 + remainder to transfer
        val et = (i % 7) match {
          case 0 | 1 => "sale"
          case 2 => "mint"
          case _ => "transfer"
        }
        // priced iff sale (golden: transactions_with_price < null_prices)
        val ts = t0 + (math.abs(rnd.nextLong()) % (t1 - t0))
        mkRow(coll, et, priced = et == "sale", ts)
      }
    }
    // exact anchor rows pinning the date range ends
    val anchors = Seq(
      mkRow("azuki", "transfer", priced = false, t0),
      mkRow("azuki", "transfer", priced = false, t1))
    // duplicate rows: repeat the first nDupRows body lines verbatim
    // (same tx/token/type/timestamp → dedup key collision)
    val dups = body.take(nDupRows)
    // negative prices: dropped by the cleaner, invisible in metrics —
    // which makes them the carrier for every OTHER planted audit
    // violation (bad timestamps, junk addresses, null collections,
    // unknown event types): the raw-side validation must count each,
    // while the metrics assertions above stay untouched.
    val negatives = (0 until nNegative).map { i =>
      val ts = if (i < 30) 100L + i else t0 + i        // 30 out-of-range
      val seller = if (i >= 30 && i < 60) "JUNK" else "" // 30 bad format
      val coll = if (i >= 60 && i < 80) "" else "azuki"  // 20 null colls
      val et = if (i >= 80) "airdrop" else "sale"        // 20 unknown type
      s"ethereum,$coll,neg$i,$et,,$ts,0xN$i,$seller,,,,1,-5.0,ETH,0xC1,tokneg$i,"
    }
    Files.writeString(Paths.get(s"$dir/events.csv"),
      (header +: (body ++ anchors ++ dups ++ negatives)).mkString("\n"))
    dir
  }

  test("full pipeline reproduces the committed-golden metrics pattern") {
    val dir = corpusDir
    val out = Files.createTempDirectory("graft_golden_out").toString
    val result = OpenSeaPipeline.run(spark,
      OpenSeaPipeline.Config(rawDataDir = dir, cleanBaseDir = out))
    val m = result.metrics
    val expectedClean = nRows + 2 // body + 2 anchors; dups deduped, negatives dropped

    // _run.log / report: raw totals & duplicates (golden _run.log:7-14).
    // The row-local fields travel through the observe path on the
    // clean+write scan — each must carry exactly its planted count.
    assert(result.report.totalRows === nRows + 2 + nDupRows + nNegative)
    assert(result.report.duplicateKeyCount === nDupRows)
    assert(result.report.negativePriceCount === nNegative)
    assert(result.report.outOfRangeTimestampCount === 30)
    assert(result.report.invalidAddressCounts("seller") === 30)
    assert(result.report.invalidAddressCounts("buyer") === 0)
    assert(result.report.nullCounts("collection") === 20)
    assert(result.report.invalidEventTypes === Map("airdrop" -> 20L))
    assert(result.report.priceMismatchCount === 0)

    // metrics.json, field for field in the reference's shape
    assert(m("total_rows") === expectedClean.toLong)
    assert(m("total_collections") === collections.size.toLong)
    assert(m("date_range") ===
      Map[String, Any]("min" -> minDate, "max" -> maxDate))
    val evTypes = m("event_types").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    // count-descending, transfer-heavy like the golden run
    assert(evTypes.map(_("event_type")) === Seq("transfer", "sale", "mint"))
    assert(evTypes.map(_("count").asInstanceOf[Long]).sum === expectedClean.toLong)
    val colls = m("collections").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(colls.map(_("collection")) === collections.map(_._1)) // desc by count
    assert(colls.map(_("count").asInstanceOf[Long]).sum === expectedClean.toLong)
    val priced = m("transactions_with_price").asInstanceOf[Long]
    val unpriced = m("null_prices").asInstanceOf[Long]
    assert(priced + unpriced === expectedClean.toLong)
    assert(priced < unpriced) // golden: 496,976 priced vs 1,060,831 null

    // the metrics.json file itself parses with a REAL JSON parser
    // (Spark's) and carries the nested values — a contains() check would
    // let invalid JSON from a future writeMetricsJson change slip through
    val json = Files.readString(Paths.get(s"${result.outputDir}/metrics.json"))
    import spark.implicits._
    val parsed = spark.read.option("mode", "FAILFAST").option("multiLine", true)
      .json(Seq(json).toDS())
    val row = parsed.selectExpr("total_rows", "total_collections",
      "date_range.min", "date_range.max", "null_prices",
      "transactions_with_price", "size(event_types)", "size(collections)")
      .head()
    assert(row.getLong(0) === expectedClean.toLong)
    assert(row.getLong(1) === collections.size.toLong)
    assert(row.getString(2) === minDate)
    assert(row.getString(3) === maxDate)
    assert(row.getLong(4) + row.getLong(5) === expectedClean.toLong)
    assert(row.getInt(6) === 3 && row.getInt(7) === collections.size)
  }
}
