package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Pins `kmeansAssignAudit`'s reduction semantics: the audit must return
  * exactly one row with (n_vectors, k_clusters, assign_nearest_ok), the
  * boolean must hold for a well-separated synthetic corpus (where any
  * correct KMeans recovers the planted clusters and assignment IS the
  * nearest centroid), and k_clusters must equal the planted k. The
  * sf-table form of the same audit is the m6 oracle row.
  */
class ClusteringAuditSpec extends SparkSpecBase {

  private def planted(k: Int, perCluster: Int, dim: Int) = {
    import scala.collection.JavaConverters._
    val rnd = new scala.util.Random(7)
    val rows = for {
      c <- 0 until k
      i <- 0 until perCluster
    } yield Row(
      (c * perCluster + i).toLong,
      Seq.tabulate(dim)(j =>
        (if (j % k == c) 10.0 else 0.0) + rnd.nextGaussian() * 0.05))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    spark.createDataFrame(rows.asJava, schema)
  }

  test("audit reduces to one all-green row on planted clusters") {
    val df = planted(k = 4, perCluster = 30, dim = 8)
    val out = Clustering.kmeansAssignAudit(df, "vec_id", "embedding",
      k = 4, seed = 42).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_vectors") == 120L)
    assert(r.getAs[Long]("k_clusters") == 4L)
    assert(r.getAs[Boolean]("assign_nearest_ok"))
  }

  test("audit agrees with kmeansAssign's cluster count") {
    val df = planted(k = 3, perCluster = 20, dim = 6)
    val assigned = Clustering.kmeansAssign(df, "vec_id", "embedding",
      k = 3, seed = 42)
    assert(assigned.select(countDistinct(col("cluster"))).head.getLong(0) == 3L)
    assert(assigned.count() == 60L)
  }
}
