package graft.sources

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame

/** Sink operators (SURVEY §2.1 S5-S9, S12-S13).
  *
  * zstd parquet is the default at rest (reference io_utils.py:130-145);
  * hive partitioning replaces the reference's DuckDB COPY PARTITION_BY
  * (io_utils.py:147-182). Versioned output dirs reproduce the
  * timestamped-run convention (io_utils.py:192-235).
  */
object Writers {

  /** S5: parquet sink with selectable compression (zstd default). */
  def writeParquet(df: DataFrame, path: String,
      compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).parquet(path)

  /** ORC sink (format breadth beyond the reference's parquet/CSV —
    * columnar interchange with Hive/Trino estates; Spark bundles the
    * ORC reader/writer, same predicate-pushdown and column-pruning
    * story as parquet).
    */
  def writeOrc(df: DataFrame, path: String,
      compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** S6: hive-partitioned parquet sink. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Incremental ingest sink: dynamic partition overwrite — only the
    * partitions PRESENT in `df` are replaced; every other partition of
    * the existing table is left byte-identical. This is the daily-merge
    * pattern at 100 TB: a day's re-ingest rewrites that day's partition
    * directory and touches nothing else (no read-modify-write of the
    * whole table, no driver-side diffing). The mode is set per-write, so
    * the session default (static = truncate-all) stays safe elsewhere.
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String], compression: String = "zstd"): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", compression)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S7/S13: CSV sink (header on). `singleFile` coalesces to one part for
    * small report tables only — never for fact-scale data.
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Range-clustered layout: repartitionByRange + sortWithinPartitions
    * on the filter column(s) before writing, so every output file covers
    * a DISJOINT key range and parquet's per-row-group min/max statistics
    * turn range predicates into file/row-group skips. At 100 TB this is
    * the difference between a range query scanning every file and
    * scanning ~(selectivity × files): the same rows cost the same bytes
    * to store either way, but only the clustered layout lets the reader
    * prove most files irrelevant from footer stats alone. (Bucketing
    * co-locates equi-JOIN keys; range clustering serves range SCANS —
    * complementary layouts.)
    */
  def writeRangeClustered(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int, compression: String = "zstd"): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").option("compression", compression)
      .parquet(path)
  }

  /** Bucketed managed table: pre-shuffling a fact table into N buckets on
    * its join key makes every later equi-join on that key shuffle-free
    * (both sides scan co-located buckets). At 100 TB this converts the
    * recurring join shuffle into a one-time write cost — the Spark
    * analogue of the co-located layouts a native engine would build.
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** S8: versioned output dir (timestamped like the reference's
    * 2025-10-31_02-04-53 runs) + latest-version resolution.
    */
  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetRowsPerFile`-row files. Streaming micro-batches, per-key
    * dynamic partition overwrites, and speculative task retries all leave
    * directories with thousands of KB-sized files; at 100 TB that file
    * count — not the byte count — becomes the bottleneck (NameNode/
    * listing pressure, one scan task per tiny file, per-file footer
    * overhead). The rewrite is one job: count from parquet metadata
    * (row-group footers, not a data scan), `repartition(n)` round-robin
    * for even output sizes, write to a temp sibling, atomic-ish swap.
    * Row-identical by construction; ordering is NOT preserved (parquet
    * dirs are unordered sets — callers needing order sort on read, or
    * use [[writeRangeClustered]] to compact and cluster in one pass).
    *
    * Flat directories ONLY: a hive-partitioned dir is refused up front —
    * compacting it flat would leave the partition subdirectories in
    * place next to the (unpartitioned) compacted files, and a subsequent
    * read would return every row twice with a conflicting schema.
    * Compact each partition directory individually instead.
    *
    * Runs on the Hadoop FileSystem of `path` (HDFS/object store/local
    * alike, matching every other writer here), and the swap is crash-
    * recoverable: originals are RENAMED aside into a `__compact_bak`
    * sibling before the compacted files move in, so no point of failure
    * leaves the directory with rows deleted — a crashed run leaves
    * either the untouched originals or both dirs to reconcile, never a
    * silent partial delete.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetRowsPerFile: Long, compression: String = "zstd"): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(target)
    val partitionDirs = entries.filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    require(partitionDirs.isEmpty,
      s"compact: $path contains subdirectories " +
        s"(${partitionDirs.take(3).mkString(", ")}) — it looks " +
        "hive-partitioned; compact each partition dir individually")
    val df = spark.read.parquet(path)
    val rows = df.count() // metadata-only: COUNT(*) over parquet footers
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val tmp = new Path(path.stripSuffix("/") + "__compact_tmp")
    val bak = new Path(path.stripSuffix("/") + "__compact_bak")
    // A leftover tmp/bak sibling means a previous compact crashed mid-swap
    // and the directory needs manual reconciliation first — proceeding
    // would make the renames below fail or, worse, silently merge two
    // runs' files. (HDFS-style FileSystems signal rename failure by
    // RETURNING FALSE, not throwing — every rename result is checked.)
    require(!fs.exists(bak),
      s"compact: leftover $bak from a previous run — reconcile it first")
    require(!fs.exists(tmp),
      s"compact: leftover $tmp from a previous run — remove it first")
    df.repartition(nFiles).write.mode("overwrite")
      .option("compression", compression).parquet(tmp.toString)
    val compacted = fs.listStatus(tmp).filterNot(_.isDirectory)
      .map(_.getPath.getName)
    require(fs.mkdirs(bak), s"compact: mkdirs failed: $bak")
    entries.filterNot(_.isDirectory).foreach { f =>
      val dst = new Path(bak, f.getPath.getName)
      require(fs.rename(f.getPath, dst),
        s"compact: rename failed: ${f.getPath} -> $dst (originals intact)")
    }
    compacted.foreach { name =>
      val (src, dst) = (new Path(tmp, name), new Path(target, name))
      require(fs.rename(src, dst),
        s"compact: rename failed: $src -> $dst " +
          s"(compacted rows in $tmp, originals in $bak — reconcile)")
    }
    // Destructive steps LAST, and only after verifying every compacted
    // file actually landed in the target: a failed tmp→target move must
    // never be followed by deleting both tmp and bak (that would be the
    // silent data loss the docstring rules out).
    compacted.foreach { name =>
      require(fs.exists(new Path(target, name)),
        s"compact: $name missing from $target after swap — " +
          s"originals preserved in $bak")
    }
    fs.delete(tmp, true)
    fs.delete(bak, true) // originals drop LAST — the only destructive step
  }

  def versionedDir(base: String,
      now: LocalDateTime = LocalDateTime.now()): String = {
    val stamp = now.format(DateTimeFormatter.ofPattern("yyyy-MM-dd_HH-mm-ss"))
    val dir = s"$base/$stamp"
    Files.createDirectories(Paths.get(dir))
    dir
  }

  /** Latest version = lexicographic max of the timestamped subdirs. */
  def latestVersion(base: String): Option[String] = {
    val p = Paths.get(base)
    if (!Files.isDirectory(p)) return None
    val subs = Files.list(p).filter(Files.isDirectory(_)).toArray
      .map(_.toString).sorted
    subs.lastOption
  }

  /** S9: small-aggregate JSON metrics sink (driver-side, like the
    * reference's metrics.json). Only for already-aggregated scalars.
    */
  def writeMetricsJson(metrics: Map[String, Any], path: String): Unit = {
    def render(v: Any): String = v match {
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case m: Map[_, _] =>
        m.map { case (k, x) => "\"" + k.toString + "\": " + render(x) }
          .mkString("{", ", ", "}")
      case seq: Seq[_] => seq.map(render).mkString("[", ", ", "]")
      case other => String.valueOf(other)
    }
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), render(metrics))
  }
}
