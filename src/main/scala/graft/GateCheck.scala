package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r15): print the boolean gate rows of the recall-gated
  * queries at each scale factor, so centroid/quantizer changes can be
  * cleared against every fixture before a full verify run.
  * Usage: runMain graft.GateCheck <name> [name...] — checks at
  * sf0.001, sf0.01, sf0.1.
  */
object GateCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("t57_semantic_dedup", "ann2c_ivf_learned", "ann9_pq_topk")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); n <- names) {
      val d = s"/root/testdata/$sf"
      try {
        val rows = SparkEntry.queries(n)(spark, d).collect()
        println(s"[gate] $sf $n -> ${rows.map(_.toString).mkString(" | ")}")
      } catch { case e: Throwable =>
        println(s"[gate] $sf $n ERROR ${e.getMessage}")
      }
    }
    // exact recall margins for the centroid-dependent gates
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.ml.Clustering
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
      val exact = Similarity.exactThresholdPairs(emb, "vec_id",
          "embedding", 0.45)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      val cents = Clustering.kmeansCentroids(emb, "embedding", 8, 7L)
      val blocked = Similarity.clusterBlockedPairs(emb, "vec_id",
          "embedding", 0.45, cents, nprobe = 4)
        .select(col("id_a"), col("id_b"))
      val nE = exact.count()
      val nF = exact.join(blocked, Seq("id_a", "id_b"), "left_semi").count()
      println(f"[margin] $sf t57 recall = ${if (nE == 0) 1.0 else nF.toDouble / nE}%.4f (floor 0.85, pairs $nE)")
      val base = Tables.embeddings(spark, d)
      val k = math.max(4, math.round(math.sqrt(base.count().toDouble)).toInt)
      val c2 = Clustering.kmeansCentroids(base, "embedding", k, 7L)
      val ivf = Similarity.ivfTopK(base, "vec_id", "embedding", 5, c2,
        nprobe = 4).select(col("query_id"), col("neighbor_id"))
      val ex2 = Similarity.bruteForceTopK(base, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val n2 = ex2.count()
      val h2 = ex2.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[margin] $sf ann2c recall = ${h2.toDouble / n2}%.4f (floor 0.35)")
    }
    spark.stop()
  }
}
