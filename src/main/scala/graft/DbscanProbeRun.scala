package graft

import org.apache.spark.sql.SparkSession

/** Dev runner for the m53 DBSCAN scale probe alone (the full probe set
  * rides graft.Bench): prints the `m53_dbscan_10x` JSON fragment so the
  * probe can be iterated without a full bench run.
  * Usage: runMain graft.DbscanProbeRun <sfDir> [factor]
  */
object DbscanProbeRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // direct package-private call (ADVICE r11: the old reflective lookup
    // compiled through renames and crashed at startup instead) — still
    // avoids paying every other probe that ScaleProbe.run bundles.
    val emb = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id").cast("long")
        .as("vec_id"), org.apache.spark.sql.functions.col("embedding"))
      .localCheckpoint(true)
    println(ScaleProbe.dbscan10x(spark, emb, factor))
    spark.stop()
  }
}
