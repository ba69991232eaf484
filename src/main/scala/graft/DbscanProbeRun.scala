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
    // reflectively reuse the private probe via the public run? No —
    // keep it honest: call the probe through ScaleProbe.run would pay
    // every probe. The dev runner duplicates only the two-line call.
    val m = classOf[ScaleProbe.type].getDeclaredMethods
      .find(_.getName.endsWith("dbscan10x")).get
    m.setAccessible(true)
    val emb = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id").cast("long")
        .as("vec_id"), org.apache.spark.sql.functions.col("embedding"))
      .localCheckpoint(true)
    println(m.invoke(ScaleProbe, spark, emb,
      Integer.valueOf(factor)).asInstanceOf[String])
    spark.stop()
  }
}
