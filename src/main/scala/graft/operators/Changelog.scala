package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog (CDC) materialization: turn an ordered stream of
  * insert/update/delete operations into the final table state — the
  * lakehouse MERGE/upsert-apply step, done as ONE window pass instead
  * of a per-batch MERGE loop. Latest-wins per key: the newest op
  * decides (a delete tombstone removes the key, anything else carries
  * the row), so applying a day's changelog is a single shuffle on the
  * key — the same plan at 100 TB, partitioned by key, no driver loop
  * over operations.
  */
object Changelog {

  /** Materialize final state from an op log. `orderCols` must totally
    * order each key's ops (ties would make "latest" ambiguous — pass a
    * unique tiebreaker like the op id last). Keys whose newest op is in
    * `deleteOps` vanish; every other key keeps exactly its newest row.
    */
  def applyLog(log: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], opCol: String,
      deleteOps: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "applyLog: need key and order columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && !col(opCol).isin(deleteOps: _*))
      .drop("__rn")
  }
}
