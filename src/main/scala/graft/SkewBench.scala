package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (SURVEY §7.4 risk 1): measure the skew operators against
  * their plain forms on a HOT-KEY corpus — one key owning 30% of all
  * rows, the "one token is most of the volume" shape — and pin the
  * crossover guidance in README/scaladoc from measured numbers, not
  * intuition.
  *
  * Two experiments over sf0.1 events (~1M rows), keys remapped so that
  * `pmod(event_id, 10) < 3` lands on the single key "HOT" and the rest
  * spread over 2000 uniform keys:
  *
  *  A. J11 range join: PeerEffects.windowAgg (equi-join on the key,
  *     range residual) vs windowAggBucketed (equi-join on
  *     (key, time-bucket)) — run on the hot corpus AND on a uniform
  *     control, since bucketing pays a constant fan-out that must be
  *     justified.
  *  B. Fact⋈dim equi-join: plain join vs Skew.saltedJoin, with
  *     autoBroadcastJoinThreshold=-1 and AQE off (the static-plan regime
  *     the operator is documented for), plus an AQE-on control showing
  *     runtime skew-splitting making manual salting unnecessary.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, reps: Int = 3)(f: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"[skewbench] $name: ${med}%.2f s median of $reps " +
        f"(rows=${times.head._2})")
    }

    // sf0.1 events is only ~100K rows — far below where skew bites.
    // Replicate ×20 (ids re-uniqued) so the hot key carries ~600K rows.
    // (At ×60 the hot SMJ cell enters the spill regime — the buffered
    // 1.8M-row match array re-streams from disk once per probe row and
    // a single rep runs for MINUTES; ×20 keeps the buffered match array
    // in memory so the bench stays repeatable while the single-reducer
    // pair volume is still ~1.8×10^8.)
    val rep = 20
    val ev = Tables.events(spark, sfDir)
      .withColumn("__r", explode(sequence(lit(0), lit(rep - 1))))
      .withColumn("event_id",
        col("event_id") * rep + col("__r")).drop("__r")
    // 30% of rows on one key; the rest uniform over 2000 keys
    def keyed(hot: Boolean): DataFrame = ev.withColumn("k",
      if (hot) when(pmod(col("event_id"), lit(10)) < 3, lit("HOT"))
        .otherwise(concat(lit("k"), pmod(col("event_id"), lit(2000))))
      else concat(lit("k"), pmod(col("event_id"), lit(2000))))
    // probes: ~0.05% of rows — a batch of lookups against history
    // (modulus co-prime with the hot assignment so ~30% of probes are
    // hot, like the corpus). The hot key's plain-join cell is then
    // |hot probes| x |hot peers| ~ 300 x 600K candidate pairs through
    // ONE reducer; the bucketed form pairs each probe only with the <=2
    // time buckets its window can touch — pruning, not just spreading.
    def probesOf(peers: DataFrame): DataFrame =
      peers.where(pmod(col("event_id"), lit(2001)) === 0)

    // Experiment A runs with broadcast joins and AQE disabled: the regime
    // windowAggBucketed exists for is "probes too large to broadcast"
    // (at 100 TB a day of probes is 10^8 rows) — with a broadcastable
    // probe side there is no shuffle, hence no key skew, and the plain
    // form is already fine (confirmed by the AQE-on control at the end).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // consume the aggregates, not count(): a bare count over the
    // probe-keyed groupBy lets Catalyst eliminate the left join outright
    // (group count = distinct probe ids, matches irrelevant)
    def consume(df: DataFrame): Long =
      df.agg(sum(col("n_peers")),
        sum(col("peer_avg") + col("peer_max"))).head().getLong(0)
    Seq(("hot30", true), ("uniform", false)).foreach { case (label, hot) =>
      val peers = keyed(hot).localCheckpoint(true)
      val probes = probesOf(peers).localCheckpoint(true)
      time(s"A/$label windowAgg(plain SMJ)") {
        consume(operators.PeerEffects.windowAgg(probes, peers, "k", "ts",
          "value", "event_id", windowDays = 7))
      }
      time(s"A/$label windowAggBucketed(7d buckets)") {
        consume(operators.PeerEffects.windowAggBucketed(probes, peers, "k",
          "ts", "value", "event_id", windowDays = 7, bucketDays = 7))
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val hotPeers = keyed(hot = true).localCheckpoint(true)
    val hotProbes = probesOf(hotPeers).localCheckpoint(true)
    time("A/hot30 windowAgg(plain, broadcast+AQE defaults)") {
      consume(operators.PeerEffects.windowAgg(hotProbes, hotPeers, "k",
        "ts", "value", "event_id", windowDays = 7))
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    val fact = keyed(hot = true).localCheckpoint(true)
    val dim = fact.select(col("k")).distinct()
      .withColumn("w", xxhash64(col("k")).cast("double"))
      .localCheckpoint(true)
    def plainJoin() = fact.join(dim, Seq("k")).count()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("B/static plain SMJ (no broadcast, no AQE)")(plainJoin())
    time("B/static saltedJoin(16)") {
      operators.Skew.saltedJoin(fact, dim, "k", numSalts = 16).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("B/AQE-on plain join (runtime skew split)")(plainJoin())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    time("B/default plain join (broadcast eligible)")(plainJoin())

    spark.stop()
  }
}
