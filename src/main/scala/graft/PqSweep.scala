package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev tool: measure PQ+rerank recall@5 vs exact brute force across
  * fixtures and configs — pins ann9's gate floor the way IvfSweep pinned
  * ann2's. Usage: `runMain graft.PqSweep [m] [ksub] [shortlist]`.
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val m = if (args.length > 0) args(0).toInt else 8
    val ksub = if (args.length > 1) args(1).toInt else 16
    val shortlist = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq-sweep]   $label: ${1e-9 * (System.nanoTime() - t0)}%.2f s")
      r
    }
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      val pred = pmod(col("vec_id"), lit(10)) === 0
      val exact = t("exact")(Similarity.bruteForceTopKFor(emb,
          emb.where(pred).select(col("vec_id")), "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true))
      val cb = t("codebooks")(Similarity.pqCodebooks(emb, "vec_id",
        "embedding", m, ksub, Tables.embeddingDim, 7L).localCheckpoint(true))
      t("encode")(Similarity.pqEncode(emb, "vec_id", "embedding", cb, m,
        Tables.embeddingDim).count())
      val pq = Similarity.pqTopK(emb, "vec_id", "embedding", pred,
        k = 5, m = m, ksub = ksub, shortlist = shortlist,
        dim = Tables.embeddingDim, seed = 7L)
      t("pq_full")(pq.count())
      val hits = exact.join(pq.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      val nEx = exact.count()
      println(f"[pq-sweep] $sf m=$m ksub=$ksub L=$shortlist " +
        f"recall=${hits.toDouble / nEx}%.4f ($hits/$nEx)")
    }
    spark.stop()
  }
}
