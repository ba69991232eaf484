package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining (Agrawal et al., SIGMOD'93 —
  * the Apriori support/confidence/lift frame, specialized to 1-item
  * antecedents). The reference has no rules mining; this is a §2.12
  * extension: co-consumption lift drives both recommendation priors and
  * corpus-mixture diagnostics (which sources/types co-occur in a user's
  * history beyond chance).
  */
object Association {

  /** 1 → 1 association rules over (basket, item) rows:
    * for every ordered item pair A→B,
    *   support    = n(A ∧ B) / N          (baskets containing both)
    *   confidence = n(A ∧ B) / n(A)
    *   lift       = confidence / (n(B) / N)
    * filtered at `minSupport` / `minConfidence`.
    *
    * Plan: ONE distinct (basket, item) projection feeds everything —
    * item supports are a groupBy, pair counts a per-basket self-join
    * (equi-join on basket: Σ|basket|² pairs, bounded by basket size ×
    * the item vocabulary, never N²; a heavy-tailed basket column would
    * cap like t7's hub rule), then two broadcast joins of the
    * |items|-row support frame and a 1-row scalar N. Counts are
    * integers and every ratio a single division → fully hash-oracled.
    *
    * Returns (antecedent, consequent, n_both, support, confidence,
    * lift), floats rounded 6dp.
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Double, minConfidence: Double): DataFrame = {
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
      .localCheckpoint(true) // feeds N, supports, and both pair sides
    val n = items.agg(countDistinct(col("__b")).cast("double").as("__n"))
    val sup = items.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val pairs = items.select(col("__b"), col("__i").as("antecedent"))
      .join(items.select(col("__b"), col("__i").as("consequent")), "__b")
      .where(col("antecedent") =!= col("consequent"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sup.select(col("__i").as("antecedent"),
        col("__ni").as("__na"))), "antecedent")
      .join(broadcast(sup.select(col("__i").as("consequent"),
        col("__ni").as("__nb"))), "consequent")
      .crossJoin(broadcast(n)) // 1-row scalar basket count
      .withColumn("support", col("n_both") / col("__n"))
      .withColumn("confidence", col("n_both").cast("double") / col("__na"))
      .where(col("support") >= minSupport &&
        col("confidence") >= minConfidence)
      .select(col("antecedent"), col("consequent"), col("n_both"),
        round(col("support") + lit(1e-9), 6).as("support"),
        round(col("confidence") + lit(1e-9), 6).as("confidence"),
        round(col("confidence") * col("__n") / col("__nb") + lit(1e-9), 6)
          .as("lift"))
  }
}
