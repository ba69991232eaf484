package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r15): run a named sample of catalog queries under the
  * Bench methodology (1 warmup + 3 timed reps, count() action, warm
  * table cache) with session confs from env, so config A/B contrasts
  * (AQE on/off, partition counts) can be measured on a representative
  * slice without a full 300-query suite run.
  *
  * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_AQE=false \
  *   runMain graft.SuiteSample <sfDir> <name> [name ...]
  */
object SuiteSample {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).cache().count()
      catch { case _: Throwable => () }
    }
    val qs = SparkEntry.queries
    var total = 0.0
    names.foreach { n =>
      val fn = qs(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      System.gc()
      once() // warmup
      val reps = (1 to 3).map(_ => once()).sorted
      val med = reps(1)
      total += med
      println(f"[sample] $n%-38s $med%7.3f s  (${reps.mkString(",")})")
    }
    println(f"[sample] TOTAL(aqe=$aqe) $total%.3f s over ${names.size} queries")
    spark.stop()
  }
}
