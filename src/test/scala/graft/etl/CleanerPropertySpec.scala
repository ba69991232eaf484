package graft.etl

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Property-style invariants over randomized dirty inputs (SURVEY §5.2
  * item 1): for any raw frame, the cleaner's outputs satisfy the declared
  * guarantees. Seeded generators keep failures reproducible.
  */
class CleanerPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val addresses = Seq(
    "0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12",
    "0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34",
    "0x0000000000000000000000000000000000000000",
    "JUNK", "", null)
  private val types = Seq("sale", "SALE ", "listing", "cancel_listing",
    "transfer", "mint", "weird_type", null)

  private def randomRaw(seed: Int, n: Int) = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val ts = 1682900000L + rnd.nextInt(1000000)
      (if (rnd.nextBoolean()) "ethereum" else null,
        s"coll${rnd.nextInt(3)}",
        i.toString,
        types(rnd.nextInt(types.size)),
        if (rnd.nextBoolean()) "2023-05-01T10:00:00+00:00" else "garbage",
        ts.toString,
        s"0xT${rnd.nextInt(n / 2 + 1)}",
        addresses(rnd.nextInt(addresses.size)),
        addresses(rnd.nextInt(addresses.size)),
        addresses(rnd.nextInt(addresses.size)),
        addresses(rnd.nextInt(addresses.size)),
        Seq("1", "2", "0", "", "x", null)(rnd.nextInt(6)),
        Seq("1.5", "-2.0", "0.0", "", "abc", null)(rnd.nextInt(6)),
        if (rnd.nextBoolean()) "ETH" else null,
        "0xC1",
        s"tok${rnd.nextInt(n / 2 + 1)}",
        Seq("1.5", " 2.5 ", "", "junk", null)(rnd.nextInt(5)))
    }.toDF("chain", "collection", "identifier", "event_type", "time_utc",
      "timestamp", "tx", "seller", "buyer", "from_address", "to_address",
      "quantity", "price_total", "currency_symbol", "contract", "token_id",
      "price_each")
  }

  for (seed <- Seq(1, 7, 42)) {
    test(s"cleaner invariants hold on random dirty input (seed=$seed)") {
      val raw = randomRaw(seed, 200)
      val clean = EventCleaner.clean(raw).cache()

      // never grows; always yields the declared schema
      assert(clean.count() <= raw.count())
      assert(clean.schema.fieldNames.toSeq ===
        Schemas.minimalEventSchema.fieldNames.toSeq)

      // prices non-negative post-filter
      assert(clean.where(col("price_total_eth") < 0 ||
        col("price_each_eth") < 0).count() === 0)

      // dedup key is unique
      val dups = clean.groupBy("tx_hash", "token_id", "event_type",
        "unix_timestamp").count().where(col("count") > 1).count()
      assert(dups === 0)

      // addresses lowercase (lowercasing is idempotent)
      Seq("seller", "buyer", "from_address", "to_address").foreach { c =>
        assert(clean.where(col(c) =!= lower(col(c))).count() === 0)
      }

      // event-type variants canonicalized away
      assert(clean.where(col("event_type")
        .isin("listing", "cancel_listing", "bid", "cancel_bid"))
        .count() === 0)

      // composite key shape
      assert(clean.where(col("event_id") =!=
        concat_ws("_", col("tx_hash"), col("token_id"))).count() === 0)

      // defaults applied
      assert(clean.where(col("chain").isNull ||
        col("currency_symbol").isNull || col("quantity").isNull)
        .count() === 0)

      clean.unpersist()
    }
  }
}
