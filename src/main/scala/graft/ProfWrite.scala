package graft
import org.apache.spark.sql.SparkSession
/** Dev profiler: isolates the E1 write path — raw CSV parse, clean,
  * cache build, and parquet write under different codecs — so the
  * clean+write phase's ~8 s can be attributed. Not part of the library
  * surface. */
object ProfWrite {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rawDir = args(0)
    val paths = new java.io.File(rawDir).listFiles()
      .filter(_.getName.endsWith(".csv")).map(_.getPath).sorted.toSeq
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val raw = graft.sources.Readers.readCsvUnionByName(spark, paths)
      time("raw count (parse only)")(raw.count())
      val clean0 = graft.etl.EventCleaner.clean(raw)
      time("clean count (parse+clean+dedup)")(clean0.count())
      val cleanC = graft.etl.EventCleaner.clean(raw)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("cache build (count)")(cleanC.count())
      time("write zstd from cache")(graft.sources.Writers.writeParquet(
        cleanC, s"/tmp/profwrite/zstd_$rep", "zstd"))
      time("write snappy from cache")(graft.sources.Writers.writeParquet(
        cleanC, s"/tmp/profwrite/snappy_$rep", "snappy"))
      time("write zstd direct (no cache)")(graft.sources.Writers.writeParquet(
        graft.etl.EventCleaner.clean(raw), s"/tmp/profwrite/direct_$rep", "zstd"))
      cleanC.unpersist(true)
    }
    spark.stop()
  }
}
