package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Schemas.validEventTypes

/** Dev-only micro-harness for the E1 aggregate fan-out: times plan
  * variants of the daily aggregate against an already-written fact table
  * (default: the freshest /tmp/anchor_out* run) without paying the whole
  * pipeline per iteration.
  *
  *   runMain graft.etl.AggProbe <factParquetPath>
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val fact = args.headOption.getOrElse {
      throw new IllegalArgumentException("usage: AggProbe <factParquet>")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("agg-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val factCols = Seq("collection", "event_date", "event_type", "buyer",
      "seller", "token_id", "price_total_eth")
    val ev = spark.read.parquet(fact)
      .select(factCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] rows=${ev.count()}")

    def time(name: String, reps: Int = 3)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s median=${ts.sorted.apply(reps / 2)}%.2f s" +
        s"  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val priced = col("price_total_eth") > 0
    val typeCounts = validEventTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"${t}_count"))
    val plainAggs = Seq(
      count(lit(1)).as("event_count")) ++ typeCounts ++ Seq(
      sum(when(priced, col("price_total_eth"))).as("volume_eth"),
      avg(when(priced, col("price_total_eth"))).as("avg_price_eth"),
      min(when(priced, col("price_total_eth"))).as("min_price_eth"),
      max(when(priced, col("price_total_eth"))).as("max_price_eth"))
    val distinctAggs = Seq(
      countDistinct(col("buyer")).as("unique_buyers"),
      countDistinct(col("seller")).as("unique_sellers"),
      countDistinct(col("token_id")).as("unique_tokens"))

    // current shape: multi-distinct main + broadcast median branch
    time("current (full op)") { EventAggregator.dailyCollectionStats(ev) }

    // pieces in isolation
    time("main agg (expand x4)") {
      ev.groupBy(col("collection"), col("event_date"))
        .agg((plainAggs ++ distinctAggs).head,
          (plainAggs ++ distinctAggs).tail: _*)
    }
    time("median branch alone") {
      ev.where(priced).groupBy(col("collection"), col("event_date"))
        .agg(percentile(col("price_total_eth"), lit(0.5)).as("median"))
    }
    time("plain agg (no distinct)") {
      ev.groupBy(col("collection"), col("event_date"))
        .agg(plainAggs.head, plainAggs.tail: _*)
    }
    time("distincts alone (expand x3)") {
      ev.groupBy(col("collection"), col("event_date"))
        .agg(distinctAggs.head, distinctAggs.tail: _*)
    }
    time("plain+percentile (objagg)") {
      ev.groupBy(col("collection"), col("event_date"))
        .agg((plainAggs :+ percentile(when(priced, col("price_total_eth")),
          lit(0.5)).as("median")).head,
          (plainAggs :+ percentile(when(priced, col("price_total_eth")),
            lit(0.5)).as("median")).tail: _*)
    }
    // alternative composition: distincts as the broadcast branch
    time("alt: objagg+bcast distincts") {
      val main = ev.groupBy(col("collection"), col("event_date"))
        .agg((plainAggs :+ percentile(when(priced, col("price_total_eth")),
          lit(0.5)).as("median_price_eth")).head,
          (plainAggs :+ percentile(when(priced, col("price_total_eth")),
            lit(0.5)).as("median_price_eth")).tail: _*)
      val d = ev.groupBy(col("collection"), col("event_date"))
        .agg(distinctAggs.head, distinctAggs.tail: _*)
      main.join(broadcast(d), Seq("collection", "event_date"), "left")
    }
    spark.stop()
  }
}
