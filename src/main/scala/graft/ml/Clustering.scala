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
}
