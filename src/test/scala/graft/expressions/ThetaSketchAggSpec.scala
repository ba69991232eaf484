package graft.expressions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.ThetaSketch

/** The custom KMV aggregates must be BIT-EQUAL to the pure-builtin
  * constructions they replace: [[KmvAgg]] vs the distinct+window build,
  * [[KmvMergeAgg]] vs the collect/flatten/dedup/sort/slice chain — on
  * random multi-group data with duplicates, nulls, and groups straddling
  * the capacity boundary. Plus partial-aggregation robustness: results
  * are partitioning-independent.
  */
class ThetaSketchAggSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new Random(123)

  test("KmvAgg == windowed kmvSketch on random grouped data (both regimes)") {
    val k = 8
    // group sizes straddle k: some far below, some far above capacity
    val rows = (1 to 2000).map { _ =>
      val g = s"g${rnd.nextInt(12)}"
      (g, rnd.nextInt(if (g < "g4") 5 else 500))
    }
    val df = rows.toDF("g", "v")
    val win = ThetaSketch.kmvSketch(df, "g", "v", k)
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    val agg = ThetaSketch.kmvSketchAgg(df, "g", "v", k)
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    assert(agg === win)
  }

  test("KmvAgg ignores null hashes and yields empty arrays for all-null groups") {
    val df = Seq(("a", Some(1)), ("a", None), ("b", None))
      .toDF("g", "v")
    val out = spark.createDataFrame(df.rdd, df.schema)
      .groupBy("g")
      .agg(KmvAgg(ThetaSketch.hash56(col("v")), 4).as("kmv"))
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    assert(out.map(_._1) === Seq("a", "b"))
    assert(out.head._2.size === 1 && out(1)._2 === Seq.empty)
  }

  test("KmvMergeAgg == flatten/dedup/sort/slice chain on random sketch frames") {
    val k = 8
    val rows = (1 to 300).map { _ =>
      val g = s"n${rnd.nextInt(9)}"
      val arr = (1 to 1 + rnd.nextInt(k)).map(_ => rnd.nextLong().abs % 10000)
        .distinct.sorted
      (g, arr)
    }
    val df = rows.toDF("g", "kmv")
    val chain = df.groupBy("g")
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col("kmv"))))), 1, k).as("kmv"))
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    val agg = df.groupBy("g")
      .agg(KmvMergeAgg(col("kmv"), k).as("kmv"))
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    assert(agg === chain)
  }

  test("results are partitioning-independent (partial merge correctness)") {
    val k = 6
    val rows = (1 to 1000).map(_ => ("x", rnd.nextInt(200)))
    val df1 = rows.toDF("g", "v").repartition(1)
    val df17 = rows.toDF("g", "v").repartition(17)
    val a = ThetaSketch.kmvSketchAgg(df1, "g", "v", k)
      .as[(String, Seq[Long])].head()
    val b = ThetaSketch.kmvSketchAgg(df17, "g", "v", k)
      .as[(String, Seq[Long])].head()
    assert(a === b && a._2.size === k)
  }
}
