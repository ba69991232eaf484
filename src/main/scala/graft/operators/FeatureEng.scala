package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-engineering operators for model-training pipelines: K-fold
  * leakage-protected target encoding and the feature-hashing trick.
  * Both are deterministic (md5-derived folds/dims, the engine-portable
  * [[Dedup.md5Hash56]] construction) so their outputs are fully
  * oracle-checkable.
  */
object FeatureEng {

  /** Mean-target encoding with leave-fold-out leakage protection: the
    * encoding a row sees excludes its OWN fold's rows, so the feature
    * never carries the row's own target — the standard K-fold guard
    * against target leakage in gradient-boosting pipelines. Smoothing
    * pulls rare categories toward the global prior:
    * enc(c, f) = (sum_{-f}(y) + m·ȳ) / (n_{-f} + m).
    *
    * Two bounded aggregates (category×fold, then category) + broadcast
    * joins — the fact table is touched once; at any scale the encoding
    * table is |categories|·K rows, broadcast back onto the facts by the
    * caller.
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      foldCol: String, smoothing: Double = 10.0): DataFrame = {
    val cf = df.groupBy(col(catCol), col(foldCol))
      .agg(sum(col(targetCol)).as("__s"), count(lit(1)).as("n_fold"))
    val ct = cf.groupBy(col(catCol))
      .agg(sum(col("__s")).as("__ts"), sum(col("n_fold")).as("__tn"))
    val prior = df.agg(avg(col(targetCol)).as("__prior"))
    cf.join(broadcast(ct), Seq(catCol)).crossJoin(broadcast(prior))
      .select(col(catCol), col(foldCol), col("n_fold"),
        round((col("__ts") - col("__s") + lit(smoothing) * col("__prior"))
          / (col("__tn") - col("n_fold") + lit(smoothing)) + lit(1e-9), 6)
          .as("encoding"))
  }

  /** The hashing trick (Weinberger et al. 2009): tokens mapped into a
    * fixed `dims`-dimensional space by hash, with a second hash choosing
    * the sign so collisions cancel in expectation. Long-form output
    * (id, dim, weight) — array columns don't survive cross-engine hash
    * comparison, and downstream sparse consumers want postings anyway.
    * Pure column arithmetic per token + one (id, dim) aggregate; the
    * output dimensionality is FIXED at any vocabulary size, which is the
    * operator's entire point at 100 TB.
    */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame =
    df.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .select(col(idCol),
        pmod(Dedup.md5Hash56(concat(lit("d:"), col("token"))),
          lit(dims.toLong)).as("dim"),
        when(pmod(Dedup.md5Hash56(concat(lit("s:"), col("token"))),
          lit(2L)) === 0, 1L).otherwise(-1L).as("__sign"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("__sign")).as("weight"))
}
