package graft

import org.apache.spark.sql.functions._

/** Hand-checkable invariants for catalog part N. */
class QueriesNSpec extends SparkSpecBase {
  import spark.implicits._

  test("new-vs-returning: news sum to the user base, dau = new + returning") {
    val out = QueriesN.a44.fn(spark, sf("sf0.001")).cache()
    val users = Tables.events(spark, sf("sf0.001"))
      .where(col("ts").isNotNull).select("user_id").distinct().count()
    val agg = out.agg(sum(col("new_users")),
      sum(col("dau") - col("new_users") - col("returning"))).collect().head
    assert(agg.getLong(0) === users) // every user is new exactly once
    assert(agg.getLong(1) === 0L)
    out.unpersist()
  }

  test("degree assortativity of a star is -1") {
    val edges = (1 to 5).map(i => (0L, i.toLong)).toDF("s1", "s2")
    val deg = edges.select(col("s1").as("v"))
      .unionAll(edges.select(col("s2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).cast("double").as("deg"))
    val pairs = edges
      .join(deg.select(col("v").as("s1"), col("deg").as("da")), "s1")
      .join(deg.select(col("v").as("s2"), col("deg").as("db")), "s2")
    val r = pairs.select(col("da").as("x"), col("db").as("y"))
      .unionAll(pairs.select(col("db").as("x"), col("da").as("y")))
      .agg(corr(col("x"), col("y"))).collect().head.getDouble(0)
    assert(math.abs(r - (-1.0)) < 1e-9, s"assortativity $r")
  }

  test("runs test: alternating series gives far more runs than expected") {
    // 20 days alternating above/below the median -> n_runs = 20, z > 0;
    // the same values sorted (one block each side) -> n_runs = 2, z < 0.
    def zOf(vs: Seq[Double]): (Long, Double) = {
      val med = vs.sorted.apply(vs.size / 2 - 1) / 2 +
        vs.sorted.apply(vs.size / 2) / 2
      val s = vs.map(v => if (v > med) 1 else 0)
      val runs = 1 + s.sliding(2).count(p => p.size == 2 && p(0) != p(1))
      val n1 = s.sum.toDouble; val n2 = s.size - n1; val n = n1 + n2
      val e = 2 * n1 * n2 / n + 1
      val v = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
      (runs.toLong, (runs - e) / math.sqrt(v))
    }
    val alternating = (1 to 20).map(i => if (i % 2 == 0) 10.0 else 1.0)
    val (rA, zA) = zOf(alternating)
    assert(rA === 20L && zA > 3.0)
    val blocked = alternating.sorted
    val (rB, zB) = zOf(blocked)
    assert(rB === 2L && zB < -3.0)
  }

  test("Markov entropy rate of a deterministic cycle is 0") {
    import org.apache.spark.sql.expressions.Window
    val events = (0 until 20).map(i => (1L, i.toLong,
      new java.sql.Timestamp(1700000000000L + i * 60000L),
      if (i % 2 == 0) "a" else "b")).toDF("user_id", "event_id", "ts",
      "event_type")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cells = events
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("event_type").as("i"), col("nxt").as("j"))
      .agg(count(lit(1)).cast("double").as("c"))
    val h = cells
      .withColumn("ci", sum(col("c")).over(Window.partitionBy("i")))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      .agg(-sum((col("c") / col("n")) * log(col("c") / col("ci"))))
      .collect().head.getDouble(0)
    assert(math.abs(h) < 1e-12, s"entropy $h")
  }
}
