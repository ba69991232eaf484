package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-level timing of the LSH→CC→rank pipeline (t20's shape)
  * to attribute warm cost between shingling, signatures, banding/verify,
  * connected components, and the ranking stage.
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val dd = Tables.documents(spark, sfDir)
      val sh = time("shingle_hashes")(
        Dedup.shingleHashes(dd, "text", "doc_id", 3).localCheckpoint(true))
      val sig = time("signatures")(
        Dedup.minHashSignatureArrayFromHashes(sh, "doc_id", 32)
          .localCheckpoint(true))
      time("signatures_inline")(
        Dedup.minHashSignatureArrayInline(dd, "text", "doc_id", 3, 32)
          .localCheckpoint(true))
      val pairs = time("lsh_pairs(full)")(
        Dedup.minHashLshPairs(dd, "text", "doc_id", 3, 32, 4, 0.5)
          .localCheckpoint(true))
      val cc = time("connected_components")(
        Dedup.connectedComponents(dd.select("doc_id"), "doc_id",
          pairs, "id_a", "id_b").localCheckpoint(true))
      time("rank+agg") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        cc.join(dd.select(col("doc_id"), col("n_chars")), "doc_id")
          .withColumn("rn", row_number().over(w))
          .groupBy(col("cluster_id"))
          .agg(min(when(col("rn") === 1, col("doc_id"))).as("keep_doc_id"),
            count(lit(1)).as("cluster_size"),
            sum(col("n_chars")).as("total_chars"))
          .count()
      }
    }
    spark.stop()
  }
}
