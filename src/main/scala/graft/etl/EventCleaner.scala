package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** The 8-step cleaning pipeline (SURVEY §3 E1 step 3; reference
  * opensea_pipeline/pipeline/src/clean_events.py:17-316).
  *
  * Each step is a pure DataFrame => DataFrame, composed lazily — Catalyst
  * sees one plan for all eight, so casts/filters fuse into the scan
  * instead of materializing eight intermediate frames like the eager
  * reference. Divergences from the reference are *defined* semantics
  * (SURVEY §7.4 risk 3): dedup keeps the row with the smallest
  * deterministic row-hash instead of Polars' arbitrary keep-first.
  */
object EventCleaner {

  import Schemas._

  /** Null-on-failure cast — dirty-input tolerance must not depend on the
    * session's ANSI setting (Spark 4 defaults to ANSI, where a plain cast
    * of a malformed string throws).
    */
  private def tryCast(c: Column, t: DataType): Column = c.try_cast(t)

  /** Step 1 — normalize types + defaults (clean_events.py:59-77):
    * chain→'ethereum', currency→'ETH', quantity→1, price_total→0.0.
    */
  def normalizeTypes(df: DataFrame): DataFrame = {
    val withOptional = optionalColumns.foldLeft(df) { case (d, (name, t)) =>
      if (d.columns.contains(name)) d.withColumn(name, tryCast(col(name), t))
      else d.withColumn(name, lit(null).cast(t))
    }
    withOptional
      .withColumn("chain",
        coalesce(col("chain").cast(StringType), lit("ethereum")))
      .withColumn("collection", col("collection").cast(StringType))
      .withColumn("identifier", col("identifier").cast(StringType))
      .withColumn("token_id", col("token_id").cast(StringType))
      .withColumn("tx", col("tx").cast(StringType))
      .withColumn("timestamp", tryCast(col("timestamp"), LongType))
      .withColumn("quantity",
        coalesce(tryCast(col("quantity"), LongType), lit(1L)))
      .withColumn("price_total",
        coalesce(tryCast(col("price_total"), DoubleType), lit(0.0)))
      .withColumn("currency_symbol",
        coalesce(col("currency_symbol").cast(StringType), lit("ETH")))
      .withColumn("contract", col("contract").cast(StringType))
  }

  /** Step 2 — timestamps (clean_events.py:79-109): parse ISO-8601
    * time_utc (null on failure, like strict=False), fall back to the
    * epoch-seconds column; derive event_timestamp/event_date/
    * unix_timestamp. Session TZ is pinned UTC so the tz-strip of the
    * reference (clean_events.py:84-86) is identity. Rows where both
    * sources fail keep a null event_timestamp — the reference does not
    * drop them here (its only row filter is the negative-price one,
    * clean_events.py:177); the validator reports them instead.
    */
  def cleanTimestamps(df: DataFrame): DataFrame = {
    val parsed =
      if (df.columns.contains("time_utc"))
        try_to_timestamp(col("time_utc").cast(StringType),
          lit("yyyy-MM-dd'T'HH:mm:ssXXX"))
      else lit(null).cast(TimestampType)
    df.withColumn("event_timestamp",
        coalesce(parsed, timestamp_seconds(col("timestamp"))))
      .withColumn("event_date", to_date(col("event_timestamp")))
      .withColumn("unix_timestamp",
        coalesce(col("timestamp"),
          unix_timestamp(col("event_timestamp"))))
  }

  /** Step 3 — addresses (clean_events.py:113-136): lowercase+trim the
    * four party addresses plus `contract`, nulls filled with '' (so
    * is_mint is always true/false, never null — matching the reference's
    * fill_null('') before the comparison).
    */
  def cleanAddresses(df: DataFrame): DataFrame = {
    val cleaned =
      Seq("seller", "buyer", "from_address", "to_address", "contract")
        .foldLeft(df) { (d, c) =>
          if (d.columns.contains(c))
            d.withColumn(c,
              coalesce(lower(trim(col(c).cast(StringType))), lit("")))
          else d.withColumn(c, lit("").cast(StringType))
        }
    cleaned.withColumn("is_mint", col("from_address") === lit(nullAddress))
  }

  /** Step 4 — prices (clean_events.py:139-184): price_each arrives as a
    * dirty string (empty/whitespace → null); fall back to
    * price_total / quantity (quantity 0 treated as 1); negative prices
    * drop the row.
    */
  def cleanPrices(df: DataFrame): DataFrame = {
    val rawEach =
      if (df.columns.contains("price_each"))
        tryCast(when(trim(col("price_each").cast(StringType)) === "",
          lit(null)).otherwise(trim(col("price_each").cast(StringType))),
          DoubleType)
      else lit(null).cast(DoubleType)
    val qty = when(col("quantity") <= 0, lit(1L)).otherwise(col("quantity"))
    df.withColumn("price_total_eth", col("price_total"))
      .withColumn("price_each_eth",
        coalesce(rawEach, col("price_total") / qty))
      .where(col("price_total_eth") >= 0 && col("price_each_eth") >= 0)
  }

  /** Step 5 — event types (clean_events.py:187-216): lowercase/trim then
    * canonicalize via the variant map; unknown values pass through (the
    * validator reports them, the cleaner does not invent data).
    */
  def cleanEventTypes(df: DataFrame): DataFrame = {
    val base = lower(trim(col("event_type").cast(StringType)))
    val mapped = eventTypeCanonical.foldLeft(when(lit(false), lit(""))) {
      case (w, (from, to)) => w.when(base === from, to)
    }
    df.withColumn("event_type", coalesce(mapped, base))
  }

  /** Step 6 — deduplicate on (tx, token_id, event_type, timestamp)
    * (clean_events.py:218-231) with a deterministic survivor: the row
    * with the smallest 64-bit hash. Implemented as `min_by(struct(*),
    * hash)` — an algebraic aggregate with map-side partial combine, so
    * the shuffle carries at most one candidate row per (partition, key)
    * instead of every duplicate (the window row_number form sorts full
    * rows; same survivor, ~2× the cost at the 1.5M-row anchor).
    */
  def deduplicate(df: DataFrame): DataFrame = {
    val cols = df.columns
    df.groupBy(dedupKey.map(col): _*)
      .agg(min_by(struct(cols.map(col): _*),
        xxhash64(cols.map(col): _*)).as("__row"))
      .select(cols.map(c => col(s"__row.$c")): _*)
  }

  /** Step 7 — composite key (clean_events.py:233-247):
    * event_id = tx '_' token_id.
    */
  def createKeys(df: DataFrame): DataFrame =
    df.withColumn("event_id", concat_ws("_", col("tx"), col("token_id")))

  /** Step 8 — minimal 20-column schema (clean_events.py:250-289). */
  def toMinimalSchema(df: DataFrame): DataFrame =
    df.select(
      col("event_id"),
      col("chain"),
      col("collection"),
      col("token_id"),
      col("event_type"),
      col("event_date"),
      col("event_timestamp"),
      col("unix_timestamp"),
      col("tx").as("tx_hash"),
      col("seller"),
      col("buyer"),
      col("from_address"),
      col("to_address"),
      col("quantity"),
      col("price_total_eth"),
      col("price_each_eth"),
      col("currency_symbol"),
      col("contract").as("contract_address"),
      col("rarity_rank"),
      col("rarity_score"))

  /** The full pipeline — one lazy plan. */
  def clean(raw: DataFrame): DataFrame = {
    val steps: Seq[DataFrame => DataFrame] = Seq(
      normalizeTypes, cleanTimestamps, cleanAddresses, cleanPrices,
      cleanEventTypes, deduplicate, createKeys, toMinimalSchema)
    steps.foldLeft(raw)((d, f) => f(d))
  }
}
