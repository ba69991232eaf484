package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** [[Stats.mannWhitney]] vs a scalar midrank reference on random tied
  * data, plus known closed-form cases.
  */
class MannWhitneySpec extends SparkSpecBase {
  import spark.implicits._

  private def scalarU(a: Seq[Double], b: Seq[Double])
      : (Double, Double) = {
    val all = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    // midranks
    val ranks = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    while (i < all.size) {
      var j = i
      while (j < all.size && all(j)._1 == all(i)._1) j += 1
      val mid = (i + 1 + j) / 2.0 // average of ranks i+1 .. j
      (i until j).foreach(_ => ranks += mid)
      i = j
    }
    val rA = all.zip(ranks).filter(_._1._2).map(_._2).sum
    val (na, nb) = (a.size.toDouble, b.size.toDouble)
    val n = na + nb
    val uA = rA - na * (na + 1) / 2.0
    val ties = all.groupBy(_._1).values.map(_.size.toDouble)
      .map(t => t * t * t - t).sum
    val sig2 = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))
    (uA, (uA - na * nb / 2.0) / math.sqrt(sig2))
  }

  private def run(a: Seq[Double], b: Seq[Double]) = {
    val df = (a.map(("x", _)) ++ b.map(("y", _)))
      .toDF("grp", "value")
    Stats.mannWhitney(df, "value", col("grp") === "x").head()
  }

  test("matches the scalar midrank reference on random tied samples") {
    val rnd = new Random(9)
    (1 to 5).foreach { trial =>
      // coarse grid forces heavy ties
      val a = Seq.fill(40 + rnd.nextInt(60))(rnd.nextInt(12).toDouble)
      val b = Seq.fill(40 + rnd.nextInt(60))(rnd.nextInt(12).toDouble + 1)
      val (uRef, zRef) = scalarU(a, b)
      val r = run(a, b)
      assert(r.getAs[Long]("n_a") === a.size.toLong)
      assert(math.abs(r.getAs[Double]("u_a") - uRef) < 1e-6, s"t$trial U")
      assert(math.abs(r.getAs[Double]("z") -
        math.rint((zRef + 1e-9) * 1e6) / 1e6) < 2e-6, s"t$trial z")
    }
  }

  test("identical samples give U = n_a*n_b/2 and z = 0 (no rejection)") {
    val v = (1 to 30).map(_.toDouble)
    val r = run(v, v)
    assert(r.getAs[Double]("u_a") === 30.0 * 30 / 2)
    assert(r.getAs[Double]("z") === 0.0)
    assert(!r.getAs[Boolean]("reject_h0"))
  }

  test("fully separated samples reject decisively with U at its maximum") {
    val a = (101 to 140).map(_.toDouble)
    val b = (1 to 40).map(_.toDouble)
    val r = run(a, b)
    assert(r.getAs[Double]("u_a") === 1600.0) // every A beats every B
    assert(r.getAs[Boolean]("reject_h0"))
  }
}
