package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.Streaming

/** Dev probe for the st1 drift bisect (VERDICT r12 #5): times the
  * phases of one AvailableNow streaming-agg run — staging copy, plan
  * build, query start→termination — at several shuffle-partition
  * settings, to attribute the fixed per-query cost (state-store delta
  * files + offset/commit log fsyncs scale with partitions, not data).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warmup: one full run
    Streaming.runAvailableNow(spark,
      s2 => Streaming.dailyStats(Streaming.readEventsStream(s2, sfDir)),
      s"probe_warm_${System.nanoTime()}").count()
    for (parts <- Seq(cpus, "8", "2"); rep <- 1 to 3) {
      val (_, tPlan) = t(Streaming.readEventsStream(spark, sfDir))
      val (_, tRun) = t(Streaming.runAvailableNow(spark,
        s2 => Streaming.dailyStats(Streaming.readEventsStream(s2, sfDir)),
        s"probe_${parts}_${rep}_${System.nanoTime()}",
        statePartitions = Some(parts.toInt)).count())
      println(f"[stream-probe] parts=$parts rep=$rep plan=$tPlan%.3f " +
        f"run=$tRun%.3f")
    }
    spark.stop()
  }
}
