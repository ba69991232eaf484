package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting.
  *
  * Training pipelines need samples and train/val/test splits that are (a)
  * stable across runs and engines, (b) consistent for the same key (a
  * document keeps its split forever, regardless of partitioning), and
  * (c) free of coordination — no global sort or sampling pass. A
  * content-keyed md5 bucket gives all three; `df.sample()`'s RNG gives
  * none of them.
  */
object Sampling {

  /** Bucket in [0, buckets) derived from the key's md5 — engine-portable
    * (same value in the DuckDB oracle).
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(Dedup.md5Hash56(key.cast("string")), lit(buckets.toLong))

  /** Keep ~(keep/buckets) of rows, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, buckets: Int,
      keep: Int): DataFrame =
    df.where(hashBucket(col(keyCol), buckets) < keep)

  /** Assign train/val/test by hash bucket: [0, valPct) → val,
    * [valPct, valPct+testPct) → test, rest → train. Percentages in
    * buckets of 100.
    */
  def withSplit(df: DataFrame, keyCol: String, valPct: Int, testPct: Int,
      outCol: String = "split"): DataFrame = {
    val b = hashBucket(col(keyCol), 100)
    df.withColumn(outCol,
      when(b < valPct, "val")
        .when(b < valPct + testPct, "test")
        .otherwise("train"))
  }

  /** Deterministic shard assignment for training-data packing: shard =
    * md5 bucket of the key. The assignment is a pure column (same shard
    * for a document on any run, any engine, any partitioning) and
    * doubles as a coordination-free global shuffle — md5 ordering is
    * uncorrelated with ingest order, so a sequential read of shard files
    * is an unbiased sample stream, with no sort and no RNG state.
    */
  def withShard(df: DataFrame, keyCol: String, numShards: Int,
      outCol: String = "shard"): DataFrame =
    df.withColumn(outCol, hashBucket(col(keyCol), numShards))

  /** Physically pack into `numShards` shard files: one output partition
    * per shard, rows ordered by key within a shard (stable, resumable
    * reads). repartition-by-column is a hash shuffle on the shard id —
    * at 100 TB each task writes exactly one shard, no driver involvement.
    * Write with Writers.writePartitioned(..., Seq("shard")) or straight
    * parquet — files-per-shard stays 1 either way.
    */
  def packShards(df: DataFrame, keyCol: String, numShards: Int): DataFrame =
    withShard(df, keyCol, numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))

  /** Efraimidis–Spirakis weighted sampling without replacement (A-ES):
    * each row draws a deterministic uniform u ∈ (0,1) from md5(key) and
    * scores u^(1/w); the k largest scores ARE a weight-proportional
    * sample. `orderBy.limit(k)` compiles to TakeOrdered — per-partition
    * partial top-k heaps merged once — NOT a global sort shuffle, so
    * memory is O(k) per task at any corpus size. The md5-seeded draw
    * makes the sample identical across engines, runs, and task retries —
    * the reproducibility a 100 TB sampling job needs to be resumable.
    * Weights must be strictly positive.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame =
    df.withColumn("__u",
        (Dedup.md5Hash56(col(keyCol).cast("string")).cast("double") + 0.5)
          / lit(math.pow(2.0, 56)))
      .withColumn("sample_key", pow(col("__u"), lit(1.0) / col(weightCol)))
      .orderBy(col("sample_key").desc, col(keyCol))
      .limit(k)
      .drop("__u")

  /** Temperature-scaled mixture sampling — the multilingual/multi-source
    * data-mixing rule LLM corpora are built with: group g's share of the
    * mixture is proportional to n_g^alpha (alpha < 1 flattens the
    * distribution, upsampling rare groups relative to their raw share;
    * alpha = 1 is natural sampling). Each group's keep-rate is
    *
    *   rate_g = min(1, targetFrac · N · (n_g^alpha / Σ n^alpha) / n_g)
    *
    * and rows are kept by the same md5-bucket rule as [[hashSample]] —
    * deterministic per key, engine-portable, coordination-free. Plan:
    * one map-side-combinable groupBy for the group counts (a ≤|groups|
    * frame), rates broadcast back onto the corpus, one codegen'd filter.
    * Nothing scales with N except the single scan. The kept frame
    * carries `mix_rate` so downstream audits can report achieved vs
    * target shares without recomputing the rate.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
      alpha: Double, targetFrac: Double): DataFrame = {
    val micro = 1000000L
    val ng = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__ng"))
    val tot = ng.agg(sum(pow(col("__ng"), lit(alpha))).as("__z"),
      sum(col("__ng")).cast("double").as("__n"))
    val rates = ng.crossJoin(broadcast(tot))
      .select(col(groupCol),
        least(lit(1.0), lit(targetFrac) * col("__n")
          * pow(col("__ng"), lit(alpha)) / col("__z") / col("__ng"))
          .as("mix_rate"))
    df.join(broadcast(rates), groupCol)
      .where(pmod(Dedup.md5Hash56(col(keyCol).cast("string")), lit(micro))
        < floor(col("mix_rate") * micro))
  }

  /** Per-group cap — domain balancing for a training corpus: keep at most
    * `cap` rows per group, chosen by a deterministic md5-of-key order so
    * the survivor set is reproducible across runs, engines, and task
    * retries (NOT "first cap rows seen", which depends on scan order).
    * One shuffle on the group key. A mega-domain (web crawl dominating
    * the mix) makes that partition hot; because the order key is a
    * uniform hash, the scale remedy is a map-side pre-filter: estimate
    * each big domain's cap-th md5 quantile from a sample, filter
    * `md5 <= threshold·(1+ε)` before the shuffle, then run this exact
    * operator on the survivors — same result, bounded partition size.
    */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= cap)
  }

  /** Deterministic source-interleaved training order: every document
    * gets a sortable `interleave_pos` such that reading the corpus in
    * that order round-robins across sources — the ordering guard
    * against source-correlated gradient drift (a corpus written
    * source-by-source trains on months of one distribution at a time;
    * training-order interleaving is the standard fix, done here as a
    * pure column computation instead of a physical shuffle-rewrite).
    *
    * Construction: within each source, docs rank by the engine-portable
    * md5 of their key (a seeded permutation, uncorrelated with ingest
    * order — `withShard`'s hash discipline); sources get a dense index
    * from the tiny distinct-source frame; then
    * `interleave_pos = (src_rank−1)·n_sources + (source_idx−1)` —
    * injective, and consecutive positions cycle through sources until
    * a source exhausts (positions of exhausted sources simply skip:
    * it's an ORDER, not a contiguous enumeration). Per-source windows
    * partition by source; the only unpartitioned structure is the
    * |sources|-row index frame. Fully deterministic → hash-oracled.
    */
  def interleaveBySource(df: DataFrame, sourceCol: String,
      keyCol: String): DataFrame = {
    val wSrc = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    // bounded frame: one row per distinct source
    val wIdx = Window.orderBy(col(sourceCol))
    val srcIdx = df.select(col(sourceCol)).distinct()
      .withColumn("__src_idx", row_number().over(wIdx))
      .withColumn("__n_src", count(lit(1)).over(
        Window.partitionBy()))
    df.withColumn("src_rank", row_number().over(wSrc))
      .join(broadcast(srcIdx), Seq(sourceCol))
      .withColumn("interleave_pos",
        (col("src_rank") - 1).cast("long") * col("__n_src")
          + (col("__src_idx") - 1))
      .drop("__src_idx", "__n_src")
  }

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar, ToN'98) — the shard function an INCREMENTALLY GROWN
    * corpus store needs: with plain `hash(key) mod N`, going N → N+1
    * reassigns ~N/(N+1) of all keys (nearly everything moves, every
    * derived per-shard artifact rebuilds); with rendezvous hashing each
    * key goes to argmax_s h(key, s), so adding shard N+1 moves ONLY the
    * ~1/(N+1) of keys whose new hash wins — the minimal-disruption
    * property consistent hashing promises, in a stateless column form
    * (no ring metadata to store or look up).
    *
    * h = the engine-portable 56-bit md5 of "key:shard"; the argmax is a
    * plan-time `greatest` over N (hash, shard) structs — pure column
    * algebra, no join, no shuffle, embarrassingly parallel at any
    * scale. Ties (2⁻⁵⁶ each) break toward the higher shard id
    * (`greatest` on the struct), mirrored exactly in the oracle.
    */
  def rendezvousShard(df: DataFrame, keyCol: String, numShards: Int,
      shardName: String = "shard"): DataFrame = {
    require(numShards >= 1, s"need numShards >= 1; got $numShards")
    val candidates = (0 until numShards).map { s =>
      struct(
        conv(substring(md5(concat(col(keyCol).cast("string"),
          lit(s":$s"))), 1, 14), 16, 10).cast("long").as("h"),
        lit(s).as("s"))
    }
    val best =
      if (candidates.size == 1) candidates.head
      else greatest(candidates: _*)
    df.withColumn(shardName, best.getField("s"))
  }

  /** Neyman-allocation stratified sampling: split a total budget of
    * `nTotal` rows across strata proportional to N_h·σ_h (population
    * size × population stddev of `valueCol`) — the allocation that
    * minimizes the variance of the stratified mean estimator at fixed
    * budget, vs plain proportional allocation that over-samples large
    * homogeneous strata. Draws are deterministic: rank by
    * md5(key) within each stratum (the t9 hash-sample convention) and
    * keep the top n_h, so two runs — or two engines — pick byte-identical
    * samples. Plan: one stats aggregate (|strata| rows), one 1-row
    * scalar broadcast for the denominator, one stratum-partitioned rank
    * window over the data, one ledger aggregate. Zero-variance or
    * singleton strata get allocation 0 and keep their ledger row.
    * Returns the per-stratum ledger: population size, σ, allocated and
    * actually-sampled counts, and the sampled-id checksum the oracle
    * re-derives.
    */
  def neymanAllocation(df: DataFrame, stratumCol: String,
      valueCol: String, keyCol: String, nTotal: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nTotal >= 1, s"need nTotal >= 1; got $nTotal")
    val st = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_pop"),
        coalesce(stddev_pop(col(valueCol).cast("double")), lit(0.0))
          .as("__sigma"))
    val denom = st.agg(sum(col("n_pop") * col("__sigma")).as("__den"))
    val alloc = st.crossJoin(broadcast(denom)) // 1-row scalar
      .withColumn("n_alloc", least(col("n_pop"),
        round(lit(nTotal) * col("n_pop") * col("__sigma") / col("__den")
          + lit(1e-9), 0).cast("long")))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val sampled = df
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(alloc.select(col(stratumCol), col("n_alloc"))),
        stratumCol)
      .where(col("__rn") <= col("n_alloc"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col(keyCol).cast("long")).as("id_checksum"))
    alloc.join(sampled, Seq(stratumCol), "left")
      .na.fill(0L, Seq("n_sampled", "id_checksum"))
      .select(col(stratumCol), col("n_pop"),
        round(col("__sigma") + lit(1e-9), 6).as("sigma"),
        col("n_alloc"), col("n_sampled"), col("id_checksum"))
  }
}
