package graft
import org.apache.spark.sql.SparkSession
object ProfAgg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(args(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.count()
    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name rep$i: ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    time("daily")(graft.etl.EventAggregator.dailyCollectionStats(ev).count())
    time("tokens")(graft.etl.EventAggregator.tokenStats(ev).count())
    time("dim")(graft.etl.EventAggregator.collectionDimension(ev).count())
    time("summary")(graft.etl.EventAggregator.collectionSummary(ev).count())
    time("metrics")({graft.etl.DataValidator.qualityMetrics(ev); 1L})
    spark.stop()
  }
}
