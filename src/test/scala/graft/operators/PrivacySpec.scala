package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** [[Privacy]] audit semantics on hand-built tables with known class
  * structure: exact class sizes and l-counts, gate booleans, and the
  * finest-rung-that-reaches-k assignment including the -1 floor.
  */
class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  // (nation, region, segment, sensitive)
  private val rows = Seq(
    ("n1", "r1", "AUTO", 1), ("n1", "r1", "AUTO", 2),
    ("n1", "r1", "AUTO", 2),
    ("n2", "r1", "AUTO", 1),
    ("n3", "r2", "AUTO", 3),
    ("n4", "r2", "BIKE", 1), ("n4", "r2", "BIKE", 1))
  private lazy val df = rows.toDF("nation", "region", "segment", "sens")

  test("audit reports exact class sizes, l-counts, and gate booleans") {
    val out = Privacy.kAnonymityAudit(df, Seq("nation", "segment"),
        col("sens"), k = 3, l = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("class_size"), r.getAs[Long]("l_distinct"),
          r.getAs[Boolean]("k_anonymous"), r.getAs[Boolean]("l_diverse"))))
      .toMap
    assert(out(("n1", "AUTO")) === ((3L, 2L, true, true)))
    assert(out(("n2", "AUTO")) === ((1L, 1L, false, false)))
    assert(out(("n3", "AUTO")) === ((1L, 1L, false, false)))
    assert(out(("n4", "BIKE")) === ((2L, 1L, false, false)))
  }

  test("ladder assigns the finest rung reaching k, -1 when none does") {
    val out = Privacy.generalizationLadder(df,
        Seq(Seq("nation", "segment"), Seq("region", "segment"),
          Seq("segment")), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Int]("chosen_rung")).toMap
    assert(out(("n1", "AUTO")) === 0) // size 3 at rung 0
    assert(out(("n2", "AUTO")) === 1) // r1×AUTO = 4 rows
    assert(out(("n3", "AUTO")) === 2) // r2×AUTO = 1, AUTO = 5
    assert(out(("n4", "BIKE")) === -1) // BIKE total 2 < 3 everywhere
  }

  test("ladder rung sizes count rows, not classes") {
    // k = 5: only the segment-level rung for AUTO (5 rows) reaches it
    val out = Privacy.generalizationLadder(df,
        Seq(Seq("nation", "segment"), Seq("region", "segment"),
          Seq("segment")), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Int]("chosen_rung")).toMap
    Seq("n1", "n2", "n3").foreach(n => assert(out((n, "AUTO")) === 2, n))
    assert(out(("n4", "BIKE")) === -1)
  }
}
