package graft.operators

import org.apache.spark.sql.DataFrame

/** Small-input parallelism guard for per-row-heavy operators.
  *
  * A single parquet row group is one scan partition, and Spark cannot
  * split below row-group granularity — so a small file (the local test
  * fixtures, or a production dimension/sample extract) runs any
  * downstream CPU-heavy chain (md5 shingling, N×N similarity loops)
  * single-threaded no matter how many cores the cluster has. AQE
  * coalesces partitions that are too many; nothing widens partitions
  * that are too FEW on the scan side.
  *
  * `out` round-robin-repartitions the frame up to `defaultParallelism`
  * ONLY when the compiled scan has fewer partitions — the tiny-input
  * case, where the shuffle moves kilobytes. At cluster scale the scan
  * already carries >= defaultParallelism splits and the frame passes
  * through untouched, so the 100 TB path never pays the shuffle.
  *
  * Contract: call on scan-rooted (narrow) frames only. Compiling the
  * partition count of a frame with an exchange below it would execute
  * that stage eagerly under AQE.
  */
object Fan {
  def out(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
