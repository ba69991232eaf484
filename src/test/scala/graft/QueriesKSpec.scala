package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Hand-checkable invariants for catalog part K (full oracles live in
  * the catalog; these pin the semantics on crafted inputs).
  */
class QueriesKSpec extends SparkSpecBase {
  import spark.implicits._

  test("activity streaks: islands split exactly on day gaps") {
    // Mirrors w27's plan on a crafted frame: days 1,2,3, 5,6, 9
    // -> streaks of 3, 2, 1; longest 3; 6 active days.
    import org.apache.spark.sql.expressions.Window
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03",
        "2024-01-05", "2024-01-06", "2024-01-09")
      .toDF("t").select(lit(1L).as("user_id"),
        to_date(col("t")).as("dte"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("dte"))
    val streaks = days
      .withColumn("island",
        datediff(col("dte"), lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy(col("user_id"), col("island")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
      .collect().head
    assert(streaks.getAs[Long]("n_active_days") === 6L)
    assert(streaks.getAs[Long]("longest_streak") === 3L)
    assert(streaks.getAs[Long]("n_streaks") === 3L)
  }

  test("Theil-Sen slope shrugs off a single outlier day") {
    // y = 2x for 11 days with one wild outlier: pairwise-slope median
    // stays 2; least squares would not.
    val daily = ((0 to 10).map(i => (i, if (i == 5) 1000.0 else 2.0 * i)))
      .toDF("i", "v")
    val slopes = daily.select(col("i").as("ia"), col("v").as("va"))
      .join(daily.select(col("i").as("ib"), col("v").as("vb")),
        col("ib") > col("ia"))
      .select(((col("vb") - col("va")) / (col("ib") - col("ia")))
        .as("slope"))
    val med = slopes.agg(percentile(col("slope"), lit(0.5)))
      .collect().head.getDouble(0)
    assert(math.abs(med - 2.0) < 1e-9, s"median slope $med")
  }

  test("code-likeness flags symbol-dense text, passes prose") {
    val df = Seq(
      (1L, "def f(x): return (x * 2) + g[0]; // {dense}"),
      (2L, "plain readable prose with no markup at all in sight"))
      .toDF("doc_id", "text")
    val t = col("text")
    val symbolCnt = length(t) -
      length(regexp_replace(t, "[;{}()=<>\\[\\]]", ""))
    val out = df.select(col("doc_id"),
        (symbolCnt.cast("double") / length(t) > 0.05).as("dense"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) && !out(2L))
  }

  test("Cramer's V is 1 on a perfectly associated contingency") {
    import org.apache.spark.sql.expressions.Window
    // x determines y exactly -> V = 1 (2x2, balanced)
    val e = (Seq.fill(50)(("a", 1)) ++ Seq.fill(50)(("b", 2)))
      .toDF("x", "y")
    val cells = e.groupBy("x", "y").agg(count(lit(1)).cast("double").as("cxy"))
    val grid = cells.select(col("x")).distinct()
      .crossJoin(cells.select(col("y")).distinct())
      .join(cells, Seq("x", "y"), "left")
      .withColumn("cxy", coalesce(col("cxy"), lit(0.0)))
    val m = grid
      .withColumn("cx", sum(col("cxy")).over(Window.partitionBy("x")))
      .withColumn("cy", sum(col("cxy")).over(Window.partitionBy("y")))
      .withColumn("n", sum(col("cxy")).over(Window.partitionBy()))
    val v = m.agg(
      sqrt(sum(pow(col("cxy") - col("cx") * col("cy") / col("n"), 2) /
        (col("cx") * col("cy") / col("n"))) /
        (max(col("n")) * (least(countDistinct(col("x")),
          countDistinct(col("y"))) - lit(1))))).collect().head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-9, s"V $v")
  }
}
