package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** [[Stats.bootstrapMeanCi]] sanity on seeded data: coverage of the
  * point mean, width shrinking with n, weight calibration, and
  * determinism.
  */
class BootstrapSpec extends SparkSpecBase {
  import spark.implicits._

  private def sample(n: Int, seedOffset: Int) = {
    val rnd = new Random(77 + seedOffset)
    (1 to n).map(i => ("g", (seedOffset * 1000000 + i).toLong,
      10.0 + rnd.nextGaussian() * 3.0))
  }

  private def ci(rows: Seq[(String, Long, Double)]) = {
    val r = Stats.bootstrapMeanCi(rows.toDF("grp", "id", "value"),
      "grp", "value", "id", b = 32, lo = 0.025, hi = 0.975).head()
    (r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_hi"))
  }

  test("the point mean sits inside the CI and the band is finite") {
    val (m, lo, hi) = ci(sample(800, 0))
    assert(lo < m && m < hi, s"$lo < $m < $hi")
    assert(hi - lo > 0 && hi - lo < 3.0)
  }

  test("CI width shrinks with sample size (roughly 1/sqrt(n))") {
    val (_, lo1, hi1) = ci(sample(200, 1))
    val (_, lo2, hi2) = ci(sample(3200, 2))
    val (w1, w2) = (hi1 - lo1, hi2 - lo2)
    assert(w2 < w1, s"width $w2 at 3200 should beat $w1 at 200")
    // 16x the data -> ~4x narrower; allow slack for replicate noise
    assert(w2 < w1 / 2.0, s"expected at least 2x shrink: $w1 -> $w2")
  }

  test("Poisson(1) weights are calibrated: replicate totals average ~n") {
    val df = sample(2000, 3).toDF("grp", "id", "value")
    val u = conv(substring(md5(concat_ws(":", col("id").cast("string"),
      col("__b").cast("string"))), 1, 14), 16, 10).cast("double") /
      lit(math.pow(2.0, 56))
    val w = Stats.PoissonCum.zipWithIndex.foldRight(
      lit(8): org.apache.spark.sql.Column) {
      case ((c, k), rest) => when(u < c, lit(k)).otherwise(rest)
    }
    val totals = df.withColumn("__b", explode(sequence(lit(0), lit(31))))
      .groupBy(col("__b")).agg(sum(w).as("t"))
      .agg(avg(col("t"))).head().getDouble(0)
    assert(math.abs(totals / 2000.0 - 1.0) < 0.05,
      s"mean replicate weight total $totals vs n=2000")
  }

  test("the whole surface is deterministic run-to-run") {
    val rows = sample(500, 4)
    assert(ci(rows) === ci(rows))
  }
}
