package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches with theta-style SET
  * ALGEBRA — the mergeable distinct-count family that, unlike HLL
  * (X22 `IncrementalAgg.hllSketch` consumers), supports INTERSECTION
  * and can therefore answer "how many users did BOTH of these"
  * without a pre-aggregated pair rollup.
  *
  * Reference relative: the reference's audience-overlap questions are
  * answered by exact pair scans (scripts/trait_analysis.py:61's
  * value_counts over merged frames); at 100 TB the per-segment
  * distinct sets don't fit anywhere, which is exactly the regime
  * KMV/theta sketches (Beyer et al., SIGMOD'07 "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations"; the
  * DataSketches theta family) were built for.
  *
  * Everything here is DETERMINISTIC — the hash is the engine-portable
  * 56-bit md5 prefix ([[Dedup.md5Hash56]]'s construction), so sketch
  * contents, estimates, and set-operation results reproduce bit-for-bit
  * in any engine with md5 (the DuckDB oracle recomputes them exactly;
  * no tolerance gate needed, unlike HLL whose murmur-based registers
  * are engine-private).
  *
  * Estimator (1-indexed k): with fewer than k distinct hashes the
  * sketch IS the set (exact count); at capacity the classic unbiased
  * KMV estimate (k−1)/θ where θ = h_(k) / 2^56 — the k-th smallest
  * hash read as a uniform [0,1) coordinate. RSE ≈ 1/√(k−2).
  *
  * Plan shape of [[kmvSketch]]: one map-combinable distinct on
  * (group, hash) — the only full-data shuffle — then a per-group
  * ordered window keeps the k smallest (partitioned by group, never
  * global; heavy groups stream+spill in WindowExec, and a skewed
  * deployment composes the X78 salted two-phase top-K instead).
  * Sketches are k longs per group: thin enough to broadcast, union,
  * and diff downstream without touching the facts again — the same
  * merge-don't-rescan contract as X19/X22.
  */
object ThetaSketch {

  /** md5Hash56 range is [0, 2^56): exactly representable in a Double. */
  val HashSpace: Double = math.pow(2.0, 56)

  /** 56-bit deterministic hash of a value (cast to string first so the
    * bytes md5 sees are engine-independent). */
  def hash56(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 14), 16, 10).cast("long")

  /** Per-group KMV sketch: the k smallest DISTINCT 56-bit hashes of
    * `valueCol`, as an ascending `array<long>` column `kmv`. */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val hashed = df
      .select(col(groupCol), hash56(col(valueCol)).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    hashed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
  }

  /** PRODUCTION KMV build: one map-combinable custom aggregate
    * ([[graft.expressions.KmvAgg]], a `TypedImperativeAggregate`) — each
    * input partition forwards at most k longs per group, with no global
    * distinct and no window stage anywhere. Provably equivalent to
    * [[kmvSketch]] (k smallest distinct values are merge-order
    * independent; `ThetaSketchAggSpec` pins bit-equality), which remains
    * as the pure-builtin fallback and the oracle's mental model. At
    * 100 TB the difference is shuffling |groups|·k longs per partition
    * vs every distinct (group, hash) pair in the corpus.
    */
  def kmvSketchAgg(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.expressions.KmvAgg(hash56(col(valueCol)), k).as("kmv"))

  /** Distinct-count estimate from a KMV array: exact below capacity,
    * (k−1)·2^56/h_(k) at capacity. */
  def estimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(kmv, k).cast("double"))

  /** KMV union: k smallest of the merged hash sets — a valid k-KMV of
    * A∪B because every hash below the merged k-th minimum is below both
    * inputs' own thresholds, hence present in them. */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(sort_array(array_distinct(concat(a, b))), 1, k)

  /** Sketch's theta as a RAW hash threshold: h_(k) at capacity, else
    * 2^56 (the sketch is the whole set — θ = 1). */
  private def thetaRaw(kmv: Column, k: Int): Column =
    when(size(kmv) < k, lit(HashSpace)).otherwise(
      element_at(kmv, k).cast("double"))

  /** Theta-style intersection estimate: both sketches are complete
    * below θ = min(θ_a, θ_b), so the shared hashes under θ are an exact
    * sample of A∩B at inclusion probability θ — estimate = |shared|/θ.
    * Exact (zero-error) whenever both sketches are below capacity. */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val theta = least(thetaRaw(a, k), thetaRaw(b, k))
    val common = size(filter(array_intersect(a, b),
      h => h.cast("double") < theta))
    common.cast("double") * lit(HashSpace) / theta
  }
}
