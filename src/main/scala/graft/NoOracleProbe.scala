package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the actual approximation quality of the no-oracle
  * queries (LSH/IVF recall, LSH elasticity drift, HLL error) at a given
  * SF, to pin gate-safe tolerance bounds for their oracled forms.
  */
object NoOracleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Similarity

    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val a = approx.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (exact & a).size.toDouble / exact.size
    }
    val lsh = recallOf(Similarity.lshTopK(emb, "vec_id", "embedding", 5,
      numPlanes = 4, numTables = 8, dim = Tables.embeddingDim))
    println(f"[probe] ann1 lshTopK recall: $lsh%.4f")
    // rebuild the learned-IVF top-k directly (ann2c's catalog entry now
    // returns the audit row, not the (query_id, neighbor_id) pairs) and
    // sweep the recall-cost curve: nprobe × cell-count grid
    val sqrtN = math.max(4, math.round(math.sqrt(emb.count().toDouble)).toInt)
    for (kMult <- Seq(1, 2)) {
      val kCells = kMult * sqrtN
      val cents = graft.ml.Clustering.kmeansCentroids(
        emb, "embedding", kCells, seed = 7L)
      for (nprobe <- Seq(2, 4, 8)) {
        val t0 = System.nanoTime()
        val r = recallOf(Similarity.ivfTopK(
          emb, "vec_id", "embedding", 5, cents, nprobe = nprobe))
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[probe] ann2c learned-IVF recall (cells=$kCells%d nprobe=$nprobe%d): $r%.4f in $secs%.2f s")
      }
    }

    val e3 = SparkEntry.queries("e3_peer_effect_elasticity")(spark, sfDir).head()
    val e3d = SparkEntry.queries("e3d_peer_elasticity_lsh")(spark, sfDir).head()
    println(s"[probe] e3 exact: n=${e3.getAs[Long]("n")} slope=${e3.getAs[Double]("slope")} r2=${e3.getAs[Double]("r2")}")
    println(s"[probe] e3d lsh:  n=${e3d.getAs[Long]("n")} slope=${e3d.getAs[Double]("slope")} r2=${e3d.getAs[Double]("r2")}")

    val ev = Tables.events(spark, sfDir)
    val weekly = ev.withColumn("week", date_trunc("week", col("ts")).cast("date"))
      .groupBy(col("week"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))
      .groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .join(ev.withColumn("week", date_trunc("week", col("ts")).cast("date"))
        .groupBy(col("week")).agg(countDistinct(col("user_id")).as("ex")), "week")
      .withColumn("rel", abs(col("est") - col("ex")) / col("ex"))
      .agg(max(col("rel"))).head().getDouble(0)
    println(f"[probe] a30 max weekly HLL rel err: $weekly%.4f")

    val daily = ev.groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("ex"),
        approx_count_distinct(col("user_id")).as("ap"),
        percentile(col("value"), lit(0.4)).as("p40"),
        percentile(col("value"), lit(0.6)).as("p60"),
        approx_percentile(col("value"), lit(0.5), lit(1000)).as("am"))
      .withColumn("rel", abs(col("ap") - col("ex")) / col("ex"))
      .agg(max(col("rel")).as("max_rel"),
        max(when(col("am") < col("p40") || col("am") > col("p60"), 1)
          .otherwise(0)).as("median_out_of_band"))
      .head()
    println(s"[probe] a1b max daily HLL rel err: ${daily.getAs[Double]("max_rel")}, median out of band: ${daily.getAs[Int]("median_out_of_band")}")
    spark.stop()
  }
}
