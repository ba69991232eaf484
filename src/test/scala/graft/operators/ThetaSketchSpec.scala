package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** KMV/theta sketch invariants that don't depend on the fixture:
  * exactness below capacity, union validity, intersection exactness in
  * the exact regime, and estimator sanity at capacity.
  */
class ThetaSketchSpec extends SparkSpecBase {
  import spark.implicits._

  private val k = 8

  private def sketchOf(values: Seq[Int]): Seq[Long] = {
    val df = values.map(v => ("g", v)).toDF("g", "v")
    ThetaSketch.kmvSketch(df, "g", "v", k)
      .select(col("kmv")).as[Seq[Long]].head()
  }

  test("below capacity the sketch IS the distinct set and estimate is exact") {
    val df = Seq(("a", 1), ("a", 2), ("a", 2), ("a", 3)).toDF("g", "v")
    val sk = ThetaSketch.kmvSketch(df, "g", "v", k)
    val Row(est: Double, sz: Int) = sk.select(
      ThetaSketch.estimate(col("kmv"), k), size(col("kmv"))).head()
    assert(sz == 3 && est == 3.0)
  }

  test("at capacity the sketch holds exactly k ascending hashes and the estimate lands near truth") {
    val n = 500
    val df = (1 to n).map(v => ("a", v)).toDF("g", "v")
    val sk = ThetaSketch.kmvSketch(df, "g", "v", k = 64)
    val Row(kmv: collection.Seq[_], est: Double) = sk.select(
      col("kmv"), ThetaSketch.estimate(col("kmv"), 64)).head()
    val hs = kmv.map(_.asInstanceOf[Long])
    assert(hs.size == 64 && hs == hs.sorted)
    // k=64 KMV RSE ~ 1/sqrt(62) ~ 12.7%; 4 sigma bound
    assert(math.abs(est / n - 1.0) < 0.51, s"est $est vs $n")
  }

  test("union sketch == sketch of the union (k smallest survive the merge)") {
    val a = sketchOf(1 to 30)
    val b = sketchOf(20 to 50)
    val direct = sketchOf(1 to 50)
    val merged = Seq((a, b)).toDF("a", "b")
      .select(ThetaSketch.unionSketch(col("a"), col("b"), k))
      .as[Seq[Long]].head()
    assert(merged == direct)
  }

  test("intersection estimate is EXACT when both sketches are below capacity") {
    val a = sketchOf(Seq(1, 2, 3, 4, 5))
    val b = sketchOf(Seq(4, 5, 6, 7))
    val est = Seq((a, b)).toDF("a", "b")
      .select(ThetaSketch.intersectEstimate(col("a"), col("b"), k))
      .as[Double].head()
    assert(est == 2.0) // {4, 5}
  }

  test("disjoint sets intersect to zero at any capacity") {
    val a = sketchOf(1 to 100)
    val b = sketchOf(1001 to 1100)
    val est = Seq((a, b)).toDF("a", "b")
      .select(ThetaSketch.intersectEstimate(col("a"), col("b"), k))
      .as[Double].head()
    assert(est == 0.0)
  }

  test("sketch build is deterministic and per-group independent") {
    val df = ((1 to 300).map(v => ("a", v)) ++ (1 to 5).map(v => ("b", v)))
      .toDF("g", "v")
    val s1 = ThetaSketch.kmvSketch(df, "g", "v", k).orderBy("g")
      .as[(String, Seq[Long])].collect().toSeq
    val s2 = ThetaSketch.kmvSketch(df, "g", "v", k).orderBy("g")
      .as[(String, Seq[Long])].collect().toSeq
    assert(s1 == s2)
    assert(s1.find(_._1 == "a").get._2.size == k)
    assert(s1.find(_._1 == "b").get._2.size == 5)
    // group b's sketch equals the single-group build of the same values
    assert(s1.find(_._1 == "b").get._2 == sketchOf(1 to 5))
  }
}
