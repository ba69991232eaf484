package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy governance audits for training-data release: k-anonymity,
  * l-diversity, and a generalization ladder (Sweeney, IJUFKS'02 for
  * k-anonymity; Machanavajjhala et al., ICDE'06 for l-diversity).
  *
  * The reference pipeline ships raw wallet addresses into its analysis
  * tables with no release audit; a corpus pipeline that exports
  * user-adjacent tables needs the audit as a first-class pass. Every
  * computation here is a grouped aggregate over the quasi-identifier
  * projection — map-combinable, one shuffle per rung, no windows — so
  * the audit costs one pass over the table at any scale.
  */
object Privacy {

  /** Equivalence classes over the quasi-identifier columns with their
    * k-anonymity and l-diversity facts: (quasiCols*, class_size,
    * l_distinct, k_anonymous, l_diverse). A released row is
    * re-identifiable when its class fails `k`; attribute-disclosable
    * when its class's sensitive values fail `l`.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, k: Int, l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_distinct"))
      .withColumn("k_anonymous", col("class_size") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)

  /** Generalization ladder: `rungs` is an ordered list of increasingly
    * coarse quasi-identifier projections (rung 0 = finest; each rung's
    * columns must be FUNCTIONS of the row, e.g. a broadcast-joined
    * region for a nation). Every rung-0 class is assigned the finest
    * rung at which its (coarsened) class reaches size >= k — the
    * minimal generalization a release would apply to that class.
    * Returns rung-0 classes + (class_size, chosen_rung), chosen_rung =
    * -1 when even the coarsest rung fails k.
    *
    * One grouped aggregate per rung on a frame that already carries all
    * rung columns; rung frames after the first are tiny (coarser =
    * fewer classes) and broadcast back onto the rung-0 classes.
    */
  def generalizationLadder(df: DataFrame, rungs: Seq[Seq[String]],
      k: Int): DataFrame = {
    require(rungs.nonEmpty, "need at least one rung")
    // coarser rung columns are functions of the rung-0 class, so first()
    // inside the rung-0 aggregate reconstructs them exactly
    val coarseCols = rungs.tail.flatten.distinct
      .filterNot(rungs.head.contains)
    val withCoarse = df
      .groupBy(rungs.head.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        coarseCols.map(c => first(col(c)).as(c)): _*)
    val ladder = rungs.zipWithIndex.drop(1).foldLeft(
      withCoarse.withColumn("chosen_rung",
        when(col("class_size") >= k, lit(0)))) { case (acc, (cols, i)) =>
      val sizes = df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as(s"__sz_$i"))
      acc.join(broadcast(sizes), cols)
        .withColumn("chosen_rung",
          coalesce(col("chosen_rung"),
            when(col(s"__sz_$i") >= k, lit(i))))
        .drop(s"__sz_$i")
    }
    ladder
      .withColumn("chosen_rung", coalesce(col("chosen_rung"), lit(-1)))
      .select((rungs.head.map(col) :+ col("class_size") :+
        col("chosen_rung")): _*)
  }
}
