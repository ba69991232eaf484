package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-12 batch-4 operator specs: deterministic walks, business-day
  * arithmetic, odds ratio, channel statistics.
  */
class PartXSpec extends SparkSpecBase {

  import spark.implicits._

  test("deterministicWalks: a path graph forces the only walk; every " +
      "hop is an edge; reruns are byte-identical") {
    // Nodes 1-2 only: walks must alternate 1,2,1,2,... deterministically.
    val path = Seq((1L, 2L)).toDF("s1", "s2")
    val w = Graph.deterministicWalks(path, steps = 4).collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Int]("step")) ->
        r.getAs[Long]("node")).toMap
    assert((0 to 4).map(t => w((1L, t))) == Seq(1L, 2L, 1L, 2L, 1L))
    assert((0 to 4).map(t => w((2L, t))) == Seq(2L, 1L, 2L, 1L, 2L))

    // Triangle: every consecutive (node, next) must be a real edge and
    // two runs must agree exactly.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s1", "s2")
    val run1 = Graph.deterministicWalks(tri, steps = 4)
    val run2 = Graph.deterministicWalks(tri, steps = 4)
    assert(run1.count() == 15) // 3 walks x 5 positions
    assert(run1.exceptAll(run2).count() == 0)
    val edges = Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L))
    val hops = run1.collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Int]("step"),
        r.getAs[Long]("node")))
      .groupBy(_._1).values.flatMap { rows =>
        rows.sortBy(_._2).map(_._3).sliding(2).map(p => (p(0), p(1)))
      }
    assert(hops.forall(edges.contains))
  }

  test("businessDayIndex: weekday spans count Mon-Fri only") {
    // 2024-01-01 is a Monday. Index differences = business days in
    // the half-open interval (a, b].
    val df = Seq(
      ("2024-01-01", "2024-01-05", 4L), // Mon -> Fri: Tue..Fri
      ("2024-01-01", "2024-01-06", 4L), // Sat adds nothing
      ("2024-01-01", "2024-01-07", 4L), // Sun adds nothing
      ("2024-01-01", "2024-01-08", 5L), // next Mon adds one
      ("2024-01-05", "2024-01-08", 1L), // Fri -> Mon: just Mon
      ("2024-01-01", "2024-01-15", 10L), // two full weeks
      ("2024-01-06", "2024-01-07", 0L)) // Sat -> Sun: nothing
      .toDF("a", "b", "expected")
    val got = df.select(
      (graft.QueriesX.businessDayIndex(col("b").cast("date")) -
        graft.QueriesX.businessDayIndex(col("a").cast("date")))
        .as("bdays"), col("expected")).collect()
    got.foreach(r =>
      assert(r.getAs[Long]("bdays") == r.getAs[Long]("expected"),
        s"row $r"))
  }

  test("oddsRatio: hand-computed 2x2 with Wald CI; empty cell -> null") {
    // a=10, b=20, c=5, d=40: OR = 400/100 = 4;
    // se = sqrt(1/10+1/20+1/5+1/40) = sqrt(0.375).
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(20)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(40)((false, false))
    val r = Stats.oddsRatio(rows.toDF("ex", "pos"), col("ex"), col("pos"))
      .head()
    assert(r.getAs[Long]("n_exp_pos") == 10L &&
      r.getAs[Long]("n_unexp_neg") == 40L)
    assert(math.abs(r.getAs[Double]("odds_ratio") - 4.0) < 1e-6)
    val se = math.sqrt(0.375)
    assert(math.abs(r.getAs[Double]("ci_low") -
      math.exp(math.log(4.0) - 1.96 * se)) < 1e-5)
    assert(math.abs(r.getAs[Double]("ci_high") -
      math.exp(math.log(4.0) + 1.96 * se)) < 1e-5)
    // zero cell: no unexposed positives -> undefined, never a throw
    val degenerate = (Seq.fill(5)((true, true)) ++
      Seq.fill(5)((false, false))).toDF("ex", "pos")
    val d = Stats.oddsRatio(degenerate, col("ex"), col("pos")).head()
    assert(d.isNullAt(d.fieldIndex("odds_ratio")))
    assert(d.isNullAt(d.fieldIndex("ci_low")))
  }

  test("channelStats: interleaved constant channels recover exact " +
      "means, zero stddev, and the right dominant channel") {
    // "abc" x 32 = 96 bytes: channel 0 = 'a' (97), 1 = 'b' (98),
    // 2 = 'c' (99) -> channel 2 dominates, all stddevs 0.
    val docs = Seq((7L, "abc" * 32)).toDF("doc_id", "text")
    val got = Multimodal.channelStats(
      Multimodal.toAssets(docs, "doc_id", "text", "image"), nBytes = 96)
      .collect().map(r => r.getAs[Int]("channel") ->
        (r.getAs[Long]("n_px"), r.getAs[Double]("ch_mean"),
          r.getAs[Double]("ch_std"), r.getAs[Long]("is_dominant"))).toMap
    assert(got.keySet == Set(0, 1, 2))
    assert(got(0) == ((32L, 97.0, 0.0, 0L)))
    assert(got(1) == ((32L, 98.0, 0.0, 0L)))
    assert(got(2) == ((32L, 99.0, 0.0, 1L)))
    // short payloads are excluded, not padded
    val shortDoc = Seq((8L, "abc")).toDF("doc_id", "text")
    assert(Multimodal.channelStats(
      Multimodal.toAssets(shortDoc, "doc_id", "text", "image"), 96)
      .count() == 0)
  }
}
