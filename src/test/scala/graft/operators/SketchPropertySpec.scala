package graft.operators

import scala.util.Random

import graft.SparkSpecBase

/** Property tests for the frequency-sketch family: the MG and CMS
  * guarantees must hold for ANY stream shape, not just the hand cases
  * in PartOSpec — seeded random streams across skew profiles,
  * cardinalities, and partition counts. Deterministic (fixed seeds), so
  * failures reproduce.
  */
class SketchPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def stream(seed: Int, distinct: Int, n: Int,
      zipf: Double): Seq[String] = {
    val rnd = new Random(seed)
    // zipf-ish: key i with weight 1/(i+1)^zipf
    val weights = (0 until distinct).map(i => 1.0 / math.pow(i + 1, zipf))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      s"k${cum.indexWhere(u <= _)}"
    }
  }

  test("misra-gries guarantees hold across stream shapes, skews, " +
      "cardinalities, and partitionings") {
    for {
      (seed, distinct, n, zipf) <- Seq((1, 50, 4000, 1.2), (2, 500, 6000, 0.8),
        (3, 10, 3000, 2.0), (4, 200, 5000, 0.0))
      k <- Seq(5, 16)
      parts <- Seq(1, 7)
    } {
      val items = stream(seed, distinct, n, zipf)
      val exact = items.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong }
      val out = HeavyHitters.misraGries(
        spark.createDataset(items).repartition(parts), k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bound = 2.0 * items.size / (k + 1)
      val ctx = s"seed=$seed distinct=$distinct k=$k parts=$parts"
      assert(out.size <= k, s"size>k [$ctx]")
      out.foreach { case (t, est) =>
        assert(est <= exact(t), s"overestimate of $t [$ctx]")
        assert(exact(t) - est <= bound, s"error bound broken on $t [$ctx]")
      }
      exact.filter(_._2 > bound).keys.foreach(t =>
        assert(out.contains(t), s"heavy $t missing [$ctx]"))
    }
  }

  test("count-min guarantees hold and estimates are exactly " +
      "partition-invariant across stream shapes") {
    for ((seed, distinct, n, zipf) <- Seq((5, 300, 4000, 1.0),
        (6, 40, 3000, 1.5))) {
      val items = stream(seed, distinct, n, zipf)
      val exact = items.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong }
      def run(parts: Int): Map[String, Long] = {
        val df = spark.createDataset(items).toDF("item").repartition(parts)
        CountMin.estimate(CountMin.sketch(df, "item", 4, 32), df, "item",
          4, 32).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val a = run(1); val b = run(9)
      assert(a === b, s"partition-dependent estimates [seed=$seed]")
      assert(a.keySet === exact.keySet)
      a.foreach { case (t, est) =>
        assert(est >= exact(t), s"underestimate of $t [seed=$seed]") }
    }
  }

  test("count-min estimates unseen probe items (empty cells count as 0)") {
    // A narrow stream against a wide sketch: most of an unseen item's d
    // cells are empty, so the correct CMS min is 0 — the estimate must
    // return a row (left join) and not inflate to the non-empty cells.
    val df = spark.createDataset(Seq("a", "a", "b")).toDF("item")
    val sk = CountMin.sketch(df, "item", 4, 256)
    val universe = spark.createDataset(
      Seq("a", "b", "never-seen-1", "never-seen-2")).toDF("item")
    val est = CountMin.estimate(sk, universe, "item", 4, 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet ===
      Set("a", "b", "never-seen-1", "never-seen-2"))
    assert(est("a") >= 2L && est("b") >= 1L)
    // 4 hashes into 256 buckets vs 2 occupied cells per row: collision
    // on ALL 4 rows is astronomically unlikely for these fixed strings,
    // and the test is deterministic (md5 hashing), so assert exact 0.
    assert(est("never-seen-1") === 0L)
    assert(est("never-seen-2") === 0L)
  }
}
