package graft.operators

import graft.SparkSpecBase

/** [[Fan.out]]'s scan-rooted contract is enforced, not advisory: a frame
  * with an exchange-introducing operator below it must fail fast at
  * plan-build time (VERDICT r6 #4) — compiling `.rdd` over such a frame
  * would eagerly execute the exchange stage under AQE.
  */
class FanSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def base = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "s")
  }

  test("Fan.out passes narrow (scan-rooted) frames and widens them") {
    val out = Fan.out(base.select(col("id"), upper(col("s")).as("s"))
      .where(col("id") > 0))
    assert(out.count() === 3)
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("Fan.out allows generate (explode) — still narrow") {
    val out = Fan.out(base.select(col("id"),
      explode(split(col("s"), "")).as("ch")))
    assert(out.count() === 3)
  }

  test("Fan.out fails fast on an aggregate-rooted frame") {
    val agg = base.groupBy(col("s")).agg(count(lit(1)).as("n"))
    val e = intercept[IllegalArgumentException](Fan.out(agg))
    assert(e.getMessage.contains("scan-rooted"))
  }

  test("Fan.out fails fast on an expression subquery (round 8)") {
    // The operator tree here is Filter over a relation — narrow to the
    // node walk — but the filter embeds an IN-subquery whose plan
    // executes its own job when the frame compiles: must be rejected.
    base.createOrReplaceTempView("fan_base")
    val sub = spark.sql(
      "SELECT * FROM fan_base WHERE id IN (SELECT max(id) FROM fan_base)")
    val e = intercept[IllegalArgumentException](Fan.out(sub))
    assert(e.getMessage.contains("scan-rooted"))
    // outIfNarrow must pass it through untouched, not widen it
    assert(Fan.outIfNarrow(sub) eq sub)
  }

  test("Fan.out fails fast on joins, windows, sorts, repartitions") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s")).orderBy(col("id"))
    intercept[IllegalArgumentException](Fan.out(base.join(base, Seq("id"))))
    intercept[IllegalArgumentException](
      Fan.out(base.withColumn("r", row_number().over(w))))
    intercept[IllegalArgumentException](Fan.out(base.orderBy(col("id"))))
    intercept[IllegalArgumentException](Fan.out(base.repartition(2)))
    intercept[IllegalArgumentException](Fan.out(base.distinct()))
  }
}
