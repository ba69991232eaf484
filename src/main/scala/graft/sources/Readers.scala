package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source operators (SURVEY §2.1 S1-S4, S10-S11).
  *
  * The reference reads heterogeneous CSVs per file and concatenates
  * "diagonally" (union by column name, missing columns null —
  * io_utils.py:21-69), with a DuckDB escape hatch for big files
  * (io_utils.py:71-89). Spark subsumes both paths: per-file permissive CSV
  * reads folded with unionByName. At cluster scale each file is split into
  * tasks by the FileSourceScan, so no special "large file" mode exists.
  */
object Readers {

  /** S1/S2: tolerant multi-file CSV scan with union-by-name semantics,
    * mirroring ignore_errors=true.
    *
    * Default is all-columns-as-string: type inference on dirty data is a
    * trap under ANSI mode (an inferred timestamp column with one junk row
    * fails the whole scan), and the cleaner's `try_cast`s are the
    * authoritative typing anyway. `inferSchema = true` is for known-clean
    * inputs.
    */
  def readCsvUnionByName(spark: SparkSession, paths: Seq[String],
      inferSchema: Boolean = false): DataFrame =
    paths.map { p =>
      spark.read
        .option("header", "true")
        .option("inferSchema", inferSchema.toString)
        .option("mode", "PERMISSIVE")
        .csv(p)
    }.reduce(_.unionByName(_, allowMissingColumns = true))

  /** S3: plain parquet scan. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S4: partitioned parquet scan. The reference filters file paths by
    * "k=v" substrings manually (io_utils.py:95-120); Spark's partition
    * discovery + Catalyst partition pruning do this from a plain
    * `.where($"k" === v)` — verify via explain: PartitionFilters.
    */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** S11: multi-line JSON metadata source. */
  def readJsonRecords(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
}
