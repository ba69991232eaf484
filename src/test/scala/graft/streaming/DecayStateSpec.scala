package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Parity of the mapGroupsWithState decay scorer with its batch closed
  * form (catalog st4), including late/out-of-order arrivals.
  */
class DecayStateSpec extends SparkSpecBase {

  import spark.implicits._

  /** Run decayScores over the parquet at inDir; last update per user
    * wins (update-mode semantics collected via foreachBatch).
    */
  private def runDecay(inDir: String): Map[Long, (Long, Long, Double)] = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val acc = scala.collection.concurrent.TrieMap
      .empty[Long, (Long, Long, Double)]
    val q = Streaming.decayScores(stream, tauDays = 30.0)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          acc(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    acc.toMap
  }

  test("decay state equals the closed form, late arrivals included") {
    // user 1 in-order; user 2 gets a LATE event (09:00 after 12:00):
    // the fold must discount it against the kept frontier, not rewind.
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 2.0),
      (1L, "2024-01-16 10:00:00", 4.0),
      (2L, "2024-01-02 12:00:00", 10.0),
      (2L, "2024-01-01 09:00:00", 3.0))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
      .select("user_id", "ts", "value")
    val dir = Files.createTempDirectory("graft_decay").toString
    rows.write.parquet(s"$dir/in")
    val got = runDecay(s"$dir/in")

    // closed form: sum(v_i * exp(-(T_u - t_i)/tau)), T_u = user max ts
    val tau = 30.0 * 86400000.0
    def expect(evs: Seq[(Long, Double)]): Double = {
      val last = evs.map(_._1).max
      evs.map { case (t, v) => v * math.exp(-(last - t) / tau) }.sum
    }
    val ts = rows.select(col("user_id"), unix_millis(col("ts")),
      col("value")).as[(Long, Long, Double)].collect()
    for (u <- Seq(1L, 2L)) {
      val evs = ts.filter(_._1 == u).map(e => (e._2, e._3)).toSeq
      val (lastMs, n, score) = got(u)
      assert(lastMs === evs.map(_._1).max)
      assert(n === evs.size)
      assert(math.abs(score - expect(evs)) < 1e-9,
        s"user $u: $score vs ${expect(evs)}")
    }
  }

  test("streamed state matches the st4 batch catalog query on testdata") {
    val dir = sf("sf0.001")
    val events = graft.Tables.events(spark, dir)
      .where(col("ts").isNotNull && col("value").isNotNull)
      .select("user_id", "ts", "value")
    val tmp = Files.createTempDirectory("graft_decay_sf").toString
    events.write.parquet(s"$tmp/in")
    val got = runDecay(s"$tmp/in")

    val batch = graft.QueriesJ.st4.fn(spark, dir)
      .select(col("user_id"), col("last_ms"), col("n_events"),
        col("decayed_score"))
      .as[(Long, Long, Long, Double)].collect()
    assert(batch.nonEmpty && batch.length === got.size)
    batch.foreach { case (u, lastMs, n, score) =>
      val (gLast, gN, gScore) = got(u)
      assert(gLast === lastMs && gN === n)
      assert(math.abs(gScore - score) < 1e-5, s"user $u: $gScore vs $score")
    }
  }
}
