package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: replicate the driver's smoke check (entry rows > 0,
  * catalog/oracle sizes).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("[smoke] entry rows: " + SparkEntry.entry(spark).count())
    println("[smoke] catalog: " + SparkEntry.queries.size +
      " queries, " + SparkEntry.oracleSql.size + " oracles")
    spark.stop()
  }
}
