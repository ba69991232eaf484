package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.streaming.Streaming

/** Round-15 operator specs: the Louvain local-move round, the q-digest
  * mergeable rank-sketch quantiles, and the stream-stream FULL OUTER
  * interval join.
  */
class PartAASpec extends SparkSpecBase {

  import spark.implicits._

  test("louvainMoveRound: a misassigned barbell node moves to its " +
      "triangle, everyone else stays, gains match the hand algebra") {
    // Two triangles {1,2,3} and {4,5,6} bridged by 3-4 (m = 7 edges);
    // node 3 starts in the WRONG community (20 = the right triangle).
    // Hand algebra: gain(3->10) = 2/7 - 3*4/98 = 0.163265 beats
    // gain(3->20 stay) = 1/7 - 3*7/98 = -0.071429, so 3 moves; every
    // other node's own community wins its argmax.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("s1", "s2")
    val assign = Seq((1L, 10L), (2L, 10L), (3L, 20L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("v", "label")
    val got = Graph.louvainMoveRound(edges, "s1", "s2", assign,
        "v", "label")
      .collect()
      .map(r => r.getAs[Long]("v") ->
        ((r.getAs[Long]("label_old"), r.getAs[Long]("label_new"),
          r.getAs[Long]("n_links"), r.getAs[Double]("delta_q"))))
      .toMap
    assert(got(3L) == ((20L, 10L, 2L, 0.163265)), s"node3: ${got(3L)}")
    Seq(1L, 2L).foreach(v =>
      assert(got(v)._2 == 10L && got(v)._1 == 10L, s"stay $v: ${got(v)}"))
    Seq(4L, 5L, 6L).foreach(v =>
      assert(got(v)._2 == 20L && got(v)._1 == 20L, s"stay $v: ${got(v)}"))
    // the hand-checked stay gains
    assert(got(1L)._4 == 0.102041 && got(4L)._4 == 0.214286 &&
      got(5L)._4 == 0.122449, got.toString)
    // the move strictly improves global modularity (the g17 gate)
    val qOf = (a: Seq[(Long, Long)]) => Graph.modularity(edges, "s1",
        "s2", a.toDF("v", "label"), "v", "label")
      .agg(sum(col("q_contribution"))).head().getDouble(0)
    val before = qOf(Seq(1L -> 10L, 2L -> 10L, 3L -> 20L,
      4L -> 20L, 5L -> 20L, 6L -> 20L))
    val after = qOf(got.toSeq.map { case (v, t) => v -> t._2 })
    assert(after > before, s"Q $before -> $after")
  }

  test("qDigestQuantiles: with all leaf pairs over threshold the " +
      "sketch keeps exact leaves and quantiles are exact bucket edges") {
    // 16 leaves x 2 rows each on [0,16), bits=4, k=32 => thr=1: every
    // sibling pair sums to 4 > 1, so all 16 leaves are retained exactly.
    val df = (0 until 16).flatMap(i => Seq(i + 0.5, i + 0.5)).toDF("x")
    val got = Stats.qDigestQuantiles(df, col("x"), 0.0, 16.0, bits = 4,
        k = 32, phis = Seq(0.25, 0.5, 0.99))
      .collect()
      .map(r => r.getAs[Double]("phi") ->
        ((r.getAs[Long]("rank_target"), r.getAs[Double]("est_value"),
          r.getAs[Long]("n_retained"))))
      .toMap
    assert(got(0.25) == ((8L, 4.0, 16L)), got.toString)
    assert(got(0.5) == ((16L, 8.0, 16L)), got.toString)
    assert(got(0.99) == ((32L, 16.0, 16L)), got.toString)
  }

  test("qDigestQuantiles: compression bounds the sketch, keeps heavy " +
      "leaves exact, and is invariant to input partitioning") {
    // 1000 rows in leaf 0 plus one row in each of leaves 1..15
    // (n = 1015). k=4 => thr=253: the sparse tail compresses into a few
    // internal nodes while the heavy leaf stays exact, so the median
    // (rank 508) still reads leaf 0's upper edge exactly.
    val df = (Seq.fill(1000)(0.25) ++ (1 to 15).map(_ + 0.5)).toDF("x")
    def run(k: Int, parts: Int) = Stats.qDigestQuantiles(
        df.repartition(parts), col("x"), 0.0, 16.0, bits = 4, k = k,
        phis = Seq(0.5, 0.99))
      .collect()
      .map(r => r.getAs[Double]("phi") ->
        ((r.getAs[Long]("rank_target"), r.getAs[Double]("est_value"),
          r.getAs[Long]("n_retained"))))
      .toMap
    val tight = run(4, 3)
    assert(tight(0.5)._2 == 1.0, s"median: $tight") // heavy leaf exact
    assert(tight(0.5)._1 == 508L)
    // sketch size: smaller k => more compression; both under the
    // 2^(bits+1) ceiling
    val loose = run(256, 3)
    assert(tight(0.5)._3 < loose(0.5)._3,
      s"k=4 kept ${tight(0.5)._3} vs k=256 ${loose(0.5)._3}")
    assert(loose(0.5)._3 <= 32L)
    // merge-order invariance: the state is a sum-merged histogram, so
    // partitioning cannot change a single output row
    assert(run(4, 7) == tight && run(4, 1) == tight)
  }

  test("stream-stream FULL OUTER interval join equals the batch full " +
      "join under the two-sided cutoff, all three row kinds present") {
    val raw = Streaming.readEventsStream(spark, sf("sf0.001"))
    val purchases = raw.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = raw.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"))
    val joined = Streaming.intervalJoinFullOuter(purchases, views,
      "user_id", "ts", maxDelayMinutes = 60, watermark = "0 seconds")
    val q = joined.select(col("l.event_id").as("event_id"),
        col("l.ts").as("p_ts"), col("r.ts").as("v_ts"),
        coalesce(col("l.user_id"), col("r.user_id")).as("uid"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st_spec_ssfojoin")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val cutTs = ev.agg(least(
      max(when(col("event_type") === "purchase", col("ts"))),
      max(when(col("event_type") === "view", col("ts")))))
      .head().getTimestamp(0)
    def cutAndCount(df: org.apache.spark.sql.DataFrame) = df
      .where((col("p_ts").isNotNull && col("p_ts") < lit(cutTs)) ||
        (col("p_ts").isNull &&
          col("v_ts") + expr("interval 60 minutes") < lit(cutTs)))
      .groupBy(when(col("p_ts").isNotNull && col("v_ts").isNotNull,
          "matched")
        .when(col("v_ts").isNull, "purchase_only")
        .otherwise("view_only").as("kind"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val got = cutAndCount(spark.table("st_spec_ssfojoin"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val want = cutAndCount(
      p.join(v, col("user_id") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("interval 60 minutes") &&
          col("v_ts") < col("p_ts"), "full")
        .withColumn("uid", coalesce(col("user_id"), col("v_user"))))
    assert(got === want)
    // the two-sided audit is non-vacuous in all three kinds
    assert(Seq("matched", "purchase_only", "view_only")
      .forall(k => want.getOrElse(k, 0L) > 0L), want.toString)
  }
}
