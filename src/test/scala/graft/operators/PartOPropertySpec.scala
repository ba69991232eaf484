package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Seeded randomized invariants for the part-O/P operator family —
  * properties that must hold for ANY input, complementing the hand
  * cases in PartOSpec/PartPSpec.
  */
class PartOPropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("snapshot diff statuses partition the key union and match a " +
      "scala brute force") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val oldM = (0 until 200).filter(_ => rnd.nextBoolean())
        .map(k => k.toLong -> rnd.nextInt(3)).toMap
      val newM = (0 until 200).filter(_ => rnd.nextBoolean())
        .map(k => k.toLong -> rnd.nextInt(3)).toMap
      val got = SnapshotDiff.diff(
        oldM.toSeq.toDF("k", "v"), newM.toSeq.toDF("k", "v"),
        Seq("k"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(got.keySet === (oldM.keySet ++ newM.keySet))
      got.foreach { case (k, st) =>
        val want = (oldM.get(k), newM.get(k)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a == b => "unchanged"
          case _ => "changed"
        }
        assert(st === want, s"key $k seed $seed")
      }
    }
  }

  test("quantile map is monotone within every group and lands inside " +
      "the reference range") {
    val rnd = new Random(42)
    val rows = for {
      g <- Seq("r", "a", "b"); i <- 0 until 40
    } yield (g.hashCode.toLong * 1000 + i, g,
      rnd.nextInt(500) + (if (g == "b") 2000 else 0))
    val out = Stats.quantileMap(rows.toDF("id", "grp", "score"),
      "grp", "score", "id", "r", knots = 20)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getDouble(4)))
    val refScores = rows.filter(_._2 == "r").map(_._3)
    val (lo, hi) = (refScores.min.toDouble, refScores.max.toDouble)
    out.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3)).toSeq
      sorted.sliding(2).foreach { w =>
        if (w.size == 2)
          assert(w(0)._3 <= w(1)._3 + 1e-9,
            s"non-monotone in $g: ${w(0)} vs ${w(1)}")
      }
      rs.foreach(r => assert(r._3 >= lo - 1e-6 && r._3 <= hi + 1e-6,
        s"$g mapped ${r._3} outside ref range [$lo,$hi]"))
    }
  }

  test("feature hashing: total absolute weight never exceeds the token " +
      "count and is partition-invariant") {
    val rnd = new Random(7)
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until rnd.nextInt(30) + 1)
        .map(_ => s"tok${rnd.nextInt(80)}").mkString(" "))
    }
    val tokCounts = docs.map { case (id, t) =>
      id -> t.split("\\s+").count(_.nonEmpty).toLong }.toMap
    def run(parts: Int) = FeatureEng.featureHash(
      docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val a = run(1)
    assert(a === run(6), "partition-dependent weights")
    a.groupBy(_._1._1).foreach { case (id, ws) =>
      val absSum = ws.values.map(math.abs).sum
      assert(absSum <= tokCounts(id),
        s"doc $id |weights| $absSum > tokens ${tokCounts(id)}")
      assert((ws.values.map(math.abs).sum - tokCounts(id)) % 2 == 0,
        s"doc $id parity: cancellations remove signs in pairs")
    }
  }
}
