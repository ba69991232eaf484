package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: pin the IVF recall-cost curve (VERDICT r5 #6). The learned-IVF
  * audit (`ann2c`) ships one configuration; a deployed index needs the
  * whole knob surface measured. For each k ∈ {⌈√N⌉, 2⌈√N⌉} coarse cells
  * and nprobe ∈ {2, 4, 8} probed cells this sweeps the sf embeddings,
  * reporting recall@5 against the exact brute-force top-5, the probe-side
  * wall time (fit excluded — the quantizer is built once and amortized),
  * and the scanned-candidate fraction vs the N(N−1) self-excluded pair
  * space (the number that actually predicts cost at 100 TB, where cell id
  * is the partition key and probe cost is Σ|probed cells|).
  *
  * Cell assignment comes from [[operators.Similarity.ivfCellRanks]] — the
  * same code `ivfTopK` plans with — so the reported cand_frac is by
  * construction the fraction the production operator scans (ADVICE r6:
  * a re-implementation here could silently diverge on tie-breaks or
  * zero-vector normalization).
  *
  * Findings land in README's "IVF recall-cost curve" table and set the
  * `ann2c` floor: the floor is the measured nprobe=4 recall minus margin,
  * per VERDICT. Usage: `runMain graft.IvfSweep [sfDir ...]`.
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sfDir <- dirs) {
      val base = Tables.embeddings(spark, sfDir)
      val n = base.count()
      val rootK = math.max(4, math.round(math.sqrt(n.toDouble)).toInt)
      val exact = operators.Similarity
        .bruteForceTopK(base, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val nExact = exact.count().toDouble
      if (nExact == 0) {
        println(s"[ivfsweep] $sfDir N=$n exact_pairs=0 — degenerate " +
          "fixture (recall undefined), skipping")
      } else {
        println(s"[ivfsweep] $sfDir N=$n exact_pairs=${nExact.toLong}")
        for (k <- Seq(rootK, 2 * rootK)) {
          val cents = ml.Clustering.kmeansCentroids(
            base, "embedding", k, seed = 7L).localCheckpoint(true)
          for (nprobe <- Seq(2, 4, 8)) {
            val ivf = operators.Similarity
              .ivfTopK(base, "vec_id", "embedding", 5, cents, nprobe)
              .select(col("query_id"), col("neighbor_id"))
            // warm once, then median of 3 probe-side runs
            ivf.count()
            val times = (1 to 3).map { _ =>
              val t0 = System.nanoTime()
              operators.Similarity
                .ivfTopK(base, "vec_id", "embedding", 5, cents, nprobe)
                .count()
              (System.nanoTime() - t0) / 1e9
            }.sorted
            val hits = exact
              .join(ivf, Seq("query_id", "neighbor_id"), "left_semi")
              .count()
            val recall = hits / nExact
            val candFrac = candidateFraction(base, cents, nprobe)
            println(f"[ivfsweep] k=$k%3d nprobe=$nprobe recall@5=$recall%.3f " +
              f"probe_s=${times(1)}%.2f cand_frac=$candFrac%.4f")
          }
        }
      }
    }
    spark.stop()
  }

  /** Fraction of the N(N−1) exact-search pair space an (k, nprobe)
    * config scans: (Σ_query Σ_{probed cell} |cell| − N) ÷ N(N−1). The
    * −N removes each query's self-pair — its home cell is always rank 1,
    * hence always probed, so the query appears in its own candidate set
    * exactly once, while the recall pipeline's pair space excludes
    * self-pairs (`query_id != neighbor_id`).
    */
  private def candidateFraction(base: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame, nprobe: Int): Double = {
    import operators.Similarity
    val ranked = Similarity.ivfCellRanks(
      base, "vec_id", "embedding", cents, nprobe)
    val home = ranked.where(col("cell_rank") === 1)
      .groupBy(col("cell")).agg(count(lit(1)).as("pop"))
    val probes = ranked.select(col("id"), col("cell"))
    val row = probes.join(home, Seq("cell"))
      .agg(sum(col("pop")).as("cand"), countDistinct(col("id")).as("n"))
      .head()
    val nq = row.getLong(1).toDouble
    (row.getLong(0) - nq) / (nq * (nq - 1))
  }
}
