package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Hand-checkable invariants for the part-Q family. */
class PartQSpec extends SparkSpecBase {
  import spark.implicits._

  test("containment catches a verbatim inclusion that Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, s"$filler $small")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "text", "doc_id", n = 3,
      minContainment = 0.9).collect()
    assert(cont.length === 1)
    // every shingle of doc 1 appears in doc 2 -> containment_a = 1.0
    assert(math.abs(cont.head.getDouble(3) - 1.0) < 1e-6)
    // while symmetric Jaccard is far below any dedup threshold
    val jac = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3,
      threshold = 0.0).collect()
    assert(jac.head.getDouble(2) < 0.12)
  }

  test("mase: a perfectly period-7 series scores 0 against its " +
      "seasonal naive") {
    // v(d) = pattern[d % 7] -> v == v7 everywhere, v != v1 somewhere
    val pattern = Seq(10.0, 20.0, 15.0, 30.0, 25.0, 5.0, 40.0)
    val days = (0 until 28).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), pattern(i % 7))
    }.toDF("dte", "v").localCheckpoint(true)
    val base = days
      .join(days.select(date_add(col("dte"), 7).as("dte"),
        col("v").as("v7")), "dte")
      .join(days.select(date_add(col("dte"), 1).as("dte"),
        col("v").as("v1")), "dte")
    val r = base.agg(
      sum(abs(col("v") - col("v7"))).as("s7"),
      sum(abs(col("v") - col("v1"))).as("s1")).collect().head
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) > 0.0)
  }

  test("brier decomposition invariants on the catalog result") {
    val r = graft.QueriesQ.m49.fn(spark, sf("sf0.001")).collect().head
    val (brier, rel, res, unc) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(rel >= 0 && res >= 0, "rel/res are squared-term sums")
    assert(res <= unc + 1e-9, "resolution is bounded by uncertainty")
    // brier_binned = rel - res + unc exactly; raw brier differs only by
    // the non-negative within-bin forecast variance
    assert(brier >= rel - res + unc - 1e-9,
      s"raw brier $brier below its binned lower bound ${rel - res + unc}")
  }

  test("fd audit: key FD holds, behavioral FDs fail with exact surplus") {
    val got = graft.QueriesQ.v11.fn(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(4))).toMap
    assert(got("event_id->user_id") === ((0L, true)))
    val (vUser, hUser) = got("user_id->event_type")
    assert(vUser > 0 && !hUser)
    val (vDte, hDte) = got("dte->event_type")
    assert(vDte > 0 && !hDte)
  }
}
