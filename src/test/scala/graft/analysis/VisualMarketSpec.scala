package graft.analysis

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class VisualMarketSpec extends SparkSpecBase {

  test("E2/E4 composition: clusters + cycles + ANOVA over testdata") {
    // lineitem spans multiple years -> monthly momentum produces real
    // quantile cycle labels (events covers only one month)
    val facts = graft.Tables.lineitem(spark, sf("sf0.001"))
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val r = VisualMarketPipeline.run(spark, facts, "l_partkey",
      "l_shipdate", "l_extendedprice", emb, "vec_id", "embedding",
      k = 5, seed = 42)

    // every event of a user with an embedding gets a cluster
    val clustered = r.labeled.where(col("visual_cluster").isNotNull)
    assert(clustered.count() > 0)
    assert(r.labeled.select("visual_cluster").distinct().count() <= 6) // 5 + null

    // grid covers the cluster × cycle cross product actually present
    assert(r.clusterCycle.count() > 0)
    assert(r.clusterCycle.columns.toSeq ===
      Seq("visual_cluster", "cycle", "n", "avg_value", "median_value",
        "std_value"))

    // ANOVA rows carry valid stats
    val a = r.anovaByCluster.collect()
    assert(a.nonEmpty)
    a.foreach { row =>
      assert(row.getAs[Double]("k") >= 1)
      val f = row.getAs[Double]("f_stat")
      assert(f.isNaN || f >= 0)
    }
  }
}
