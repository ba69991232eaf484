package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering (SURVEY §2.10 M6). The reference runs sklearn KMeans on an
  * in-memory matrix (prepare_visual_market_data.py:296-304); spark.ml
  * distributes both fit and transform. Centroids won't match sklearn's —
  * tests assert cluster *quality* (inertia, size balance), not identity
  * (SURVEY §7.4 risk 8).
  */
object Clustering {

  /** Fit KMeans on an ARRAY<FLOAT/DOUBLE> column and return (id, cluster)
    * assignments.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long): DataFrame = {
    val feats = df.select(col(idCol),
      array_to_vector(transform(col(vecCol), x => x.cast("double")))
        .as("features"))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cluster")
    model.fit(feats).transform(feats)
      .select(col(idCol), col("cluster"))
  }

  /** Fit spherical-style KMeans (inputs L2-normalized first, the right
    * space for cosine search) and return the learned centroids as a
    * (cell, cent_vec) frame — the coarse quantizer an IVF ANN index
    * partitions on. Centroids are re-normalized to unit length so cell
    * assignment reduces to an argmax of dot products. k × dim doubles
    * live on the driver between fit and frame construction — the same
    * small-model footprint any deployed quantizer has.
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, k: Int,
      seed: Long): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val unit = transform(v, x => x / sqrt(aggregate(v, lit(0.0),
      (acc, u) => acc + u * u)))
    val feats = df.select(array_to_vector(unit).as("features"))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cluster")
    val cents = model.fit(feats).clusterCenters.zipWithIndex.map {
      case (c, i) =>
        val a = c.toArray
        val n = math.sqrt(a.map(x => x * x).sum)
        (i.toLong, a.map(x => if (n > 0) x / n else x).toSeq)
    }
    df.sparkSession.createDataFrame(cents.toSeq)
      .toDF("cell", "cent_vec")
  }
}
