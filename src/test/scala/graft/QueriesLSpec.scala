package graft

import org.apache.spark.sql.functions._

/** Hand-checkable invariants for catalog part L (full oracles in the
  * catalog; these pin semantics on crafted inputs + testdata bounds).
  */
class QueriesLSpec extends SparkSpecBase {
  import spark.implicits._

  test("CUSUM peaks on the last pre-shift day of a step change") {
    import org.apache.spark.sql.expressions.Window
    // 0,0,0,10,10,10: mean 5, cusum -5,-10,-15,-10,-5,0 -> |max| 15 @ d3
    val daily = Seq(("2024-01-01", 0.0), ("2024-01-02", 0.0),
        ("2024-01-03", 0.0), ("2024-01-04", 10.0), ("2024-01-05", 10.0),
        ("2024-01-06", 10.0))
      .toDF("t", "v").select(to_date(col("t")).as("dte"), col("v"))
    val m = daily.agg(avg(col("v")).as("__m"))
    val wcum = Window.orderBy(col("dte"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val top = daily.crossJoin(broadcast(m))
      .withColumn("cusum", sum(col("v") - col("__m")).over(wcum))
      .withColumn("rn", row_number().over(
        Window.orderBy(abs(col("cusum")).desc, col("dte"))))
      .where(col("rn") === 1).collect().head
    assert(top.getAs[java.sql.Date]("dte").toString === "2024-01-03")
    assert(math.abs(math.abs(top.getAs[Double]("cusum")) - 15.0) < 1e-9)
  }

  test("ACF of an alternating series: negative at lag 1, positive at lag 2") {
    val out = QueriesL.m40.fn(spark, sf("sf0.001"))
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[Double]("acf")).toMap
    assert(out.keySet === (1 to 7).toSet)
    assert(out.values.forall(v => v >= -1.0 - 1e-6 && v <= 1.0 + 1e-6))
    // crafted alternating series
    val daily = (0 until 20).map(i =>
      (i, if (i % 2 == 0) 0.0 else 2.0)).toDF("i", "v")
    val stats = daily.crossJoin(broadcast(daily.agg(avg(col("v"))
        .as("__m"))))
      .agg(max(col("__m")).as("__m"),
        sum(pow(col("v") - col("__m"), 2)).as("__ssq"))
    val acf = daily.withColumn("k", explode(sequence(lit(1), lit(2))))
      .select((col("i") + col("k")).as("ib"), col("k"), col("v").as("va"))
      .join(daily.select(col("i").as("ib"), col("v").as("vb")), "ib")
      .crossJoin(broadcast(stats))
      .groupBy(col("k"))
      .agg((sum((col("va") - col("__m")) * (col("vb") - col("__m"))) /
        max(col("__ssq"))).as("acf"))
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[Double]("acf")).toMap
    assert(acf(1) < -0.8, s"lag1 ${acf(1)}")
    assert(acf(2) > 0.8, s"lag2 ${acf(2)}")
  }

  test("Pareto share isolates a dominant user") {
    val u = ((1 to 99).map(i => (i.toLong, 1.0)) :+ (100L, 901.0))
      .toDF("user_id", "m")
    val thr = u.agg(percentile(col("m"), lit(0.99)).as("__thr"))
    val r = u.crossJoin(broadcast(thr)).agg(
      sum((col("m") >= col("__thr")).cast("long")).as("n_top"),
      (sum(when(col("m") >= col("__thr"), col("m")).otherwise(lit(0.0))) /
        sum(col("m"))).as("share")).collect().head
    assert(r.getAs[Long]("n_top") === 1L)
    assert(math.abs(r.getAs[Double]("share") - 0.901) < 1e-9)
  }

  test("null drift isolates the column whose nulls are shard-skewed") {
    val out = QueriesL.v10.fn(spark, sf("sf0.001")).cache()
    assert(out.count() === 4L)
    // rates are valid probabilities; drift = |rate_a - rate_b| (rounded)
    val bad = out.where(col("rate_a") < 0 || col("rate_a") > 1 ||
      col("rate_b") < 0 || col("rate_b") > 1 ||
      col("drift") > greatest(col("rate_a"), col("rate_b")) + lit(1e-6))
    assert(bad.count() === 0L)
    out.unpersist()
  }
}
