package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical operators (SURVEY §2.10 M1-M5): Pearson correlation, OLS
  * regression in closed form, one-way ANOVA. The reference computes these
  * with sklearn/SciPy on a driver-side matrix; here every one is a pure
  * aggregate plan (one shuffle, partial+final), so they run on the full
  * fact table, not a sample that fits in one process.
  */
object Stats {

  /** Simple OLS y = a + b·x per group, closed form from sufficient
    * statistics: b = cov(x,y)/var(x), a = ȳ − b·x̄,
    * R² = corr(x,y)² (M3: analyze_peer_effects.py:206-236).
    */
  def olsByGroup(df: DataFrame, groupCols: Seq[String],
      x: Column, y: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      (covar_samp(x, y) / var_samp(x)).as("slope"),
      (avg(y) - covar_samp(x, y) / var_samp(x) * avg(x)).as("intercept"),
      (corr(x, y) * corr(x, y)).as("r2"))

  /** Pairwise Pearson correlation per group (M1). */
  def corrByGroup(df: DataFrame, groupCols: Seq[String],
      x: Column, y: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), corr(x, y).as("pearson_r"))

  /** One-way ANOVA across the distinct values of `groupCol` (M4:
    * analyze_visual_cycles.py:162-231). Two aggregation passes over tiny
    * intermediate state: per-group (n, mean, var) → F, η².
    * The p-value needs an F-distribution CDF — a driver-side scalar
    * (commons-math3, on Spark's classpath); the distributed part ends at
    * the sufficient statistics this returns.
    */
  def anova(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("n_g"),
      avg(col(valueCol)).as("mean_g"),
      var_samp(col(valueCol)).as("var_g"))
    g.agg(
        sum(col("n_g")).as("n"),
        count(lit(1)).cast("double").as("k"),
        (sum(col("n_g") * col("mean_g")) / sum(col("n_g"))).as("grand_mean"),
        sum(col("n_g") * col("mean_g") * col("mean_g")).as("sum_n_mean2"),
        sum((col("n_g") - 1) * col("var_g")).as("ssw"))
      .withColumn("ssb",
        col("sum_n_mean2") - col("n") * col("grand_mean") * col("grand_mean"))
      .withColumn("df_between", col("k") - 1)
      .withColumn("df_within", col("n") - col("k"))
      .withColumn("f_stat",
        (col("ssb") / col("df_between")) / (col("ssw") / col("df_within")))
      .withColumn("eta_squared", col("ssb") / (col("ssb") + col("ssw")))
      .select("n", "k", "f_stat", "eta_squared", "df_between", "df_within")
  }

  /** ANOVA with the p-value surfaced IN the plan via the FDistCdf
    * expression (one interpreted special-function call on the single
    * aggregated row — no UDF, no driver-side post-step).
    */
  def anovaWithP(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    anova(df, groupCol, valueCol).withColumn("p_value",
      graft.expressions.FDistCdf.fPValue(
        col("f_stat"), col("df_between"), col("df_within")))

  /** p-value for an F statistic — driver-side scalar on ANOVA output. */
  def fPValue(fStat: Double, dfBetween: Double, dfWithin: Double): Double = {
    val dist = new org.apache.commons.math3.distribution.FDistribution(
      dfBetween, dfWithin)
    1.0 - dist.cumulativeProbability(fStat)
  }

  /** p-value for a chi-square statistic — driver-side scalar twin of the
    * in-plan `ChiSquareCdf` expression (spec cross-check).
    */
  def chi2PValue(x: Double, dof: Double): Double = {
    val dist =
      new org.apache.commons.math3.distribution.ChiSquaredDistribution(dof)
    1.0 - dist.cumulativeProbability(x)
  }

  /** Correlation matrix in long form: Pearson r between the `valueCol`
    * series of every pair of `seriesCol` values, aligned on `keyCol`
    * (M2: cross-collection daily-price correlation). The self-join is on
    * the already-aggregated per-key series (one row per (series, key)),
    * so both sides are small; pairs are deduplicated by series name order.
    */
  /** Mergeable equi-width histogram sketch: the quantile analogue of the
    * HLL pattern (a30) — per-period bin counts are ALGEBRAIC state
    * (merge = summing bins), so day sketches roll up to week/month/all-
    * time without revisiting the facts, and two clusters' sketches merge
    * with a union. Values clamp into [lo, hi) across `bins` equal bins;
    * accuracy is ±width/2 per quantile, a FIXED, explainable bound —
    * unlike GK/t-digest sketches the state is deterministic, so results
    * are bit-identical across engines, runs, and merge orders (which is
    * why this variant gets a full SQL oracle — a30's HLL can't).
    * One shuffle on (period, bin); state = periods × bins rows.
    */
  def histogramState(df: DataFrame, periodCol: Column, valueCol: Column,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((valueCol - lo) / width).cast("int"), lit(0)), lit(bins - 1))
    df.groupBy(periodCol.as("period"), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimate quantiles from (merged) histogram state by linear
    * interpolation within the target bin. Windows ride the tiny state
    * frame (periods × bins), never the facts.
    */
  def histogramQuantiles(state: DataFrame, lo: Double, hi: Double,
      bins: Int, ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = (hi - lo) / bins
    val w = Window.partitionBy(col("period")).orderBy(col("bin"))
    val wAll = Window.partitionBy(col("period"))
    val cum = state
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(wAll))
    cum.withColumn("p", explode(array(ps.map(lit(_)): _*)))
      .withColumn("target", col("p") * col("total"))
      .where(col("cum") >= col("target") &&
        (col("cum") - col("cnt")) < col("target"))
      .select(col("period"), col("p"),
        round(lit(lo) + lit(width) * (col("bin") +
          (col("target") - (col("cum") - col("cnt"))) / col("cnt"))
          + lit(1e-9), 6).as("q_est"))
  }

  /** Mergeable RANK-sketch quantiles: a canonical q-digest (Shrivastava
    * et al., SenSys'04; the deterministic entry in Agarwal et al.'s
    * "Mergeable Summaries" quantile family) over values quantized to a
    * 2^bits dyadic universe on [lo, hi). [[histogramState]]/m20 is the
    * FIXED-BIN form — its rank error is unbounded when mass piles into
    * one bin; the q-digest is the mergeable-rank form a 100 TB
    * percentile actually runs: leaf resolution where the data is dense,
    * coarse internal nodes where it is sparse, and a PROVEN rank bound.
    *
    * Among mergeable rank sketches this is the one with DETERMINISTIC,
    * merge-order-invariant results — the property the oracle gate
    * needs: KLL gets better constants but compacts by coin flip, and a
    * t-digest's centroids depend on merge order, so neither can carry a
    * cross-engine exact oracle. Here the sketch STATE is the exact
    * level-0 bucket histogram (≤ 2^bits rows, sum-mergeable — the merge
    * IS a groupBy, map-side combinable), and compression is a
    * deterministic bottom-up pass: a sibling pair whose combined count
    * fits under n/k rolls up into its parent; an over-threshold pair's
    * children are retained with their residual counts. Every retained
    * INTERNAL node therefore carries ≤ n/k mass (it was formed by a
    * sub-threshold merge), at most one retained node straddles any
    * query point per level, and the rank error is ≤ bits·n/k; retained
    * leaves are exact. Retained size ≤ min(2^(bits+1), O(k·bits)) —
    * bounded by the universe tree, independent of N.
    *
    * Plan: ONE data-sized shuffle (the leaf histogram groupBy); the
    * `bits` compression waves and the quantile readout run on the
    * ≤ 2^bits-row sketch frame (per-level localCheckpoint keeps the
    * loop's plan depth flat). Quantile φ reads the first node with
    * cumulative count ≥ max(1, ⌈φ·n⌉) in (upper-bound, level) order and
    * reports that node's upper bucket edge. All arithmetic is integer
    * counts under IEEE exactly-rounded division, so two engines agree
    * bit-for-bit. Returns (phi, rank_target, est_value, n_retained).
    */
  def qDigestQuantiles(df: DataFrame, valueCol: Column, lo: Double,
      hi: Double, bits: Int, k: Int, phis: Seq[Double]): DataFrame = {
    require(bits >= 2 && bits <= 16, s"need 2 <= bits <= 16; got $bits")
    require(k >= 2, s"need k >= 2; got $k")
    require(hi > lo, s"need hi > lo; got [$lo, $hi)")
    require(phis.nonEmpty, "need at least one quantile")
    import org.apache.spark.sql.expressions.Window
    val u = 1L << bits
    val leaf = least(greatest(
      floor((valueCol - lit(lo)) / lit(hi - lo) * lit(u.toDouble))
        .cast("long"), lit(0L)), lit(u - 1))
    val hist = df.groupBy(leaf.as("idx")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // the one data-sized pass; feeds every level
    val tot = hist.agg(sum(col("cnt")).as("__n"),
      greatest(lit(1L),
        floor(sum(col("cnt")) / lit(k.toDouble)).cast("long")).as("__thr"))
    var live = hist
    var retained = Seq.empty[DataFrame]
    (0 until bits).foreach { l =>
      val par = live.groupBy(shiftright(col("idx"), 1).as("pidx"))
        .agg(sum(col("cnt")).as("__s"))
        .crossJoin(broadcast(tot.select(col("__thr")))) // 1-row scalar
        .localCheckpoint(true) // sketch-sized; feeds both split sides
      retained :+= live
        .join(par.where(col("__s") > col("__thr")).select(col("pidx")),
          shiftright(col("idx"), 1) === col("pidx"))
        .select(col("idx"), col("cnt"), lit(l).as("lvl"),
          ((col("idx") + 1) * lit(1L << l) - 1).as("ub"))
      live = par.where(col("__s") <= col("__thr"))
        .select(col("pidx").as("idx"), col("__s").as("cnt"))
    }
    retained :+= live.select(col("idx"), col("cnt"),
      lit(bits).as("lvl"), ((col("idx") + 1) * lit(u) - 1).as("ub"))
    val nodes = retained.reduce(_.unionByName(_)).localCheckpoint(true)
    val nret = nodes.agg(count(lit(1)).as("n_retained"))
    // postorder sweep: (ub, lvl) is a unique total order on the
    // retained set — the unpartitioned window rides the ≤ 2^(bits+1)-row
    // sketch frame, never the facts (WindowAuditSpec entry)
    val wCum = Window.orderBy(col("ub"), col("lvl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = nodes.withColumn("__cum", sum(col("cnt")).over(wCum))
    val width = (hi - lo) / u
    val cand = withCum
      .crossJoin(broadcast(tot.select(col("__n")))) // 1-row scalar
      .withColumn("phi", explode(array(phis.map(lit(_)): _*)))
      .withColumn("__r", greatest(lit(1L), ceil(col("phi") * col("__n"))))
      .where(col("__cum") >= col("__r"))
    val wSel = Window.partitionBy(col("phi")).orderBy(col("ub"), col("lvl"))
    cand.withColumn("__rn", row_number().over(wSel))
      .where(col("__rn") === 1)
      .crossJoin(broadcast(nret)) // 1-row scalar attach
      .select(col("phi"), col("__r").as("rank_target"),
        round(lit(lo) + (col("ub") + 1).cast("double") * lit(width)
          + lit(1e-9), 6).as("est_value"),
        col("n_retained"))
  }

  /** Scalable global running sum (X57 scale form): inclusive prefix sums
    * over the frame ordered by `orderCols`, WITHOUT an unpartitioned
    * window — the plan that survives a distinct-key count ≈ N (a
    * continuous CDF sweep key, per-row ranks) where `Window.orderBy`
    * alone would collapse to one partition.
    *
    * Two passes, same algebra as the sequential sweep:
    *  1. `repartitionByRange(numParts, orderCols)` puts contiguous key
    *     ranges in separate partitions; a pid-partitioned window computes
    *     each partition's LOCAL prefix (parallel across `numParts`).
    *  2. Per-partition totals (a `numParts`-row frame) turn into
    *     cumulative offsets via a window over that BOUNDED frame
    *     (≤ numParts rows — bounded by the partition count, never N) and
    *     broadcast-join back; global prefix = local prefix + offset.
    *
    * For each `(src, dst)` in `sums` the result carries `dst` (inclusive
    * prefix) and `${dst}_total` (the global sum, replacing the
    * `sum(...) over ()` scan the sequential form needs). Exclusive
    * prefixes are `dst - src`.
    *
    * The range-shuffled frame is materialized ONCE via an eager
    * `localCheckpoint`: range boundaries come from sampling, so the two
    * consumers (local prefix, per-partition totals) must see one
    * materialization or pids could disagree between recomputations —
    * and the checkpoint bakes the pid column into stored blocks, which
    * a recompute-on-miss cache cannot guarantee. Unlike `persist()`,
    * checkpoint blocks hold no CacheManager entry and are released by
    * the ContextCleaner as soon as the frame is unreachable (next GC),
    * so repeated calls in a long-lived session do not accumulate pinned
    * copies of the frame. Callers should treat `orderCols` as a unique key
    * (pre-aggregate to distinct values first — the m22/m24/m27 pattern)
    * so ROWS and RANGE framing coincide; sum sources should be integral
    * for bit-exact parity with a sequential sweep (longs add
    * associatively, doubles don't).
    */
  def rangePrefixSum(df: DataFrame, orderCols: Seq[String],
      sums: Seq[(String, String)], numParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sums.nonEmpty, "rangePrefixSum: at least one (src, dst) sum")
    val reserved = "__pid" +: sums.flatMap { case (_, dst) =>
      Seq(s"__t_$dst", s"__o_$dst", s"${dst}_total") }
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"rangePrefixSum: input columns ${clash.mkString(", ")} collide " +
        "with internal/emitted names (__pid, __t_*, __o_*, <dst>_total)")
    val oc = orderCols.map(col)
    val parted = df.repartitionByRange(numParts, oc: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val localW = Window.partitionBy(col("__pid")).orderBy(oc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(parted) { case (acc, (src, dst)) =>
      acc.withColumn(dst, sum(col(src)).over(localW))
    }
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val allW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perPart = parted.groupBy(col("__pid")).agg(
      sums.head match { case (src, dst) => sum(col(src)).as(s"__t_$dst") },
      sums.tail.map { case (src, dst) => sum(col(src)).as(s"__t_$dst") }: _*)
    val offsets = sums.foldLeft(perPart) { case (acc, (_, dst)) =>
      acc
        .withColumn(s"__o_$dst", coalesce(sum(col(s"__t_$dst")).over(offW),
          lit(0)))
        .withColumn(s"${dst}_total", sum(col(s"__t_$dst")).over(allW))
    }.select(col("__pid") +: sums.flatMap { case (_, dst) =>
      Seq(col(s"__o_$dst"), col(s"${dst}_total")) }: _*)
    sums.foldLeft(local.join(broadcast(offsets), "__pid")) {
      case (acc, (_, dst)) =>
        acc.withColumn(dst, col(dst) + col(s"__o_$dst"))
          .drop(s"__o_$dst")
    }.drop("__pid")
  }

  def corrMatrix(df: DataFrame, seriesCol: String, keyCol: String,
      valueCol: String): DataFrame = {
    val a = df.select(col(seriesCol).as("series_a"), col(keyCol),
      col(valueCol).as("v_a"))
    val b = df.select(col(seriesCol).as("series_b"), col(keyCol),
      col(valueCol).as("v_b"))
    a.join(b, Seq(keyCol))
      .where(col("series_a") < col("series_b"))
      .groupBy("series_a", "series_b")
      .agg(count(lit(1)).as("n_aligned"), corr(col("v_a"), col("v_b")).as("pearson_r"))
  }

  /** Kaplan-Meier product-limit survival estimator with right-censoring:
    * `df` is one row per subject with a `durCol` (time observed) and an
    * `eventCol` (1 = the terminal event happened, 0 = censored — the
    * subject was still alive when observation ended). Output is one row
    * per distinct duration that carries at least one terminal event:
    * at-risk count, events, censored, and the running survival estimate
    * S(t) = Π_{t_i<=t} (1 − d_i/n_i).
    *
    * One groupBy on duration reduces subjects to the duration grid, so
    * the ordered window that forms the cumulative product runs over at
    * most |distinct durations| rows — calendar-bounded here (events span
    * 30 days), which is what keeps the unpartitioned window safe (see
    * WindowAuditSpec's allowlist). The 1e-300 guard keeps ln() finite
    * when the last duration's events exhaust the risk set (S(t) = 0);
    * after 6-dp rounding the guarded value is exactly 0 on both engines.
    */
  def kaplanMeier(df: DataFrame, durCol: String, eventCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = df.groupBy(col(durCol).as("dur"))
      .agg(count(lit(1)).as("n_total"),
        sum(col(eventCol).cast("long")).as("n_events"))
      .withColumn("n_censored", col("n_total") - col("n_events"))
    val n = df.agg(count(lit(1)).as("__n"))
    val prior = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(n)
      .withColumn("n_at_risk",
        col("__n") - coalesce(sum(col("n_total")).over(prior), lit(0L)))
      .withColumn("__f", greatest(
        lit(1.0) - col("n_events").cast("double") / col("n_at_risk"),
        lit(1e-300)))
      .withColumn("survival",
        round(exp(sum(log(col("__f"))).over(upto)) + lit(1e-9), 6))
      .where(col("n_events") > 0)
      .select(col("dur"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("survival"))
  }

  /** Interpolated quantile mapping of a per-group score onto a reference
    * group's distribution (histogram matching / distribution
    * harmonization — how multi-source quality scores are put on one
    * scale before a corpus-wide threshold is applied). Each row gets its
    * within-group percent_rank (ties broken by `idCol`, so the rank is
    * deterministic), then reads the reference group's interpolated
    * quantile at that rank from a B-knot quantile table computed in ONE
    * aggregate and broadcast as a single array row — no join keyed on
    * rank, no per-row search: `mapped = q[j] + frac·(q[j+1] − q[j])`
    * with `j = min(floor(rank·B), B−1)` is pure column algebra.
    *
    * The rank window is partitioned by `groupCol` (bounded by the
    * largest single group, never the corpus); the quantile knots are
    * exact `percentile` (linear interpolation, the percentile_cont
    * semantics DuckDB's quantile_cont shares, which is what makes the
    * op oracle-checkable).
    */
  def quantileMap(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, refGroup: String, knots: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = array((0 to knots).map(j => lit(j.toDouble / knots)): _*)
    val ref = df.where(col(groupCol) === refGroup)
      .agg(percentile(col(scoreCol).cast("double"), ps).as("__qs"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    val j = least(floor(col("__pr") * knots), lit(knots - 1)).cast("int")
    df.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("__pr", percent_rank().over(w))
      .crossJoin(broadcast(ref))
      .withColumn("__j", j)
      .withColumn("__q0", element_at(col("__qs"), col("__j") + 1))
      .withColumn("__q1", element_at(col("__qs"), col("__j") + 2))
      .withColumn("mapped_score", round(
        col("__q0") + (col("__pr") * knots - col("__j")) *
          (col("__q1") - col("__q0")) + lit(1e-9), 6))
      .withColumn("pct_rank", round(col("__pr") + lit(1e-9), 6))
      .select(col(idCol), col(groupCol), col(scoreCol), col("pct_rank"),
        col("mapped_score"))
  }

  /** Mann-Whitney U rank-sum test (two-sided, normal approximation with
    * tie correction, no continuity correction) — the nonparametric
    * two-sample location test the ANOVA/t family can't give when the
    * value distribution is skewed. Rows where `isGroupA` is true form
    * sample A; the rest form B.
    *
    * Scale shape: midranks need a GLOBAL prefix over the value order —
    * computed on the DISTINCT-value frame (bounded by value cardinality,
    * not row count) via [[rangePrefixSum]], the same range-partitioned
    * two-pass prefix m22/m24/m27 ride — never a corpus-wide
    * unpartitioned window. All rank arithmetic stays INTEGRAL
    * (2·R_A = Σ na_v·(2·C_v + t_v + 1) avoids the half-integer
    * midranks), so the statistic is bit-exact cross-engine and the
    * whole row hash-oracles; the decision brackets |z| against the
    * two-sided α=0.05 normal critical value (m4b's decision-oracle
    * pattern, no CDF needed).
    *
    * Returns one row: (n_a, n_b, r2_a — twice A's rank sum, u_a, z,
    * reject_h0).
    */
  def mannWhitney(df: DataFrame, valueCol: String,
      isGroupA: Column): DataFrame = {
    val dv = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(count(when(isGroupA, 1)).as("__na"),
        count(when(!isGroupA, 1)).as("__nb"))
      .withColumn("__t", col("__na") + col("__nb"))
    val pref = rangePrefixSum(dv, Seq("__v"), Seq(("__t", "__ct")))
    val agg = pref.agg(
      sum(col("__na")).as("n_a"),
      sum(col("__nb")).as("n_b"),
      sum(col("__na") * (lit(2) * (col("__ct") - col("__t")) +
        col("__t") + 1)).as("r2_a"),
      sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__ties"))
    val n = col("n_a") + col("n_b")
    val uA = (col("r2_a") - col("n_a") * (col("n_a") + 1)) / lit(2.0)
    val mu = col("n_a") * col("n_b") / lit(2.0)
    val sig2 = col("n_a") * col("n_b") / lit(12.0) *
      ((n + 1) - col("__ties") / (n * (n - lit(1.0))))
    val z = (uA - mu) / sqrt(sig2)
    agg.select(col("n_a"), col("n_b"), col("r2_a"),
      round(uA + lit(1e-9), 6).as("u_a"),
      round(z + lit(1e-9), 6).as("z"),
      (abs(z) > lit(1.959964)).as("reject_h0"))
  }

  /** Poisson(1) cumulative probabilities for the bootstrap's inverse-CDF
    * draw — identical literals on the oracle side make the weights
    * engine-exact. Residual mass above k=7 maps to 8 (P ≈ 1e-5).
    */
  val PoissonCum: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** POISSONIZED bootstrap confidence interval for the per-group mean —
    * the bootstrap form that distributes (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google TR 2012; the
    * resampling engine under bag-of-little-bootstraps): instead of
    * multinomial resampling (which needs the global N per replicate),
    * each row enters replicate b with weight ~ Poisson(1), drawn by
    * inverse CDF from the md5-uniform of (row id, b) — one explode +
    * one grouped aggregate, no per-replicate pass over the data, and
    * every weight reproduces bit-for-bit in any engine with md5.
    * The CI is the [lo, hi] quantile_cont band over the B replicate
    * means (exact linear-interpolation percentile ≡ DuckDB
    * quantile_cont, the a11 equivalence).
    *
    * Returns (groupCol, n, mean, ci_lo, ci_hi), rounded 6dp. Shuffle
    * cost: B·rows through ONE map-combinable (group, b) aggregate, then
    * a |groups|·B-row percentile frame — flat per-replicate state, the
    * reason this form scales where resample-materialization doesn't.
    */
  def bootstrapMeanCi(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, b: Int, lo: Double, hi: Double): DataFrame = {
    require(b >= 8 && lo < hi, s"need b >= 8 and lo < hi; got $b, $lo, $hi")
    val u = conv(substring(md5(concat_ws(":",
        col(idCol).cast("string"), col("__b").cast("string"))), 1, 14),
      16, 10).cast("double") / lit(math.pow(2.0, 56))
    val w = PoissonCum.zipWithIndex.foldRight(lit(8): Column) {
      case ((c, k), rest) => when(u < c, lit(k)).otherwise(rest)
    }
    val reps = df
      .where(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .groupBy(col(groupCol), col("__b"))
      .agg((sum(w * col(valueCol)) / sum(w)).as("__m"))
    val point = df
      .where(col(valueCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(avg(col(valueCol)) + lit(1e-9), 6).as("mean"))
    val ci = reps.groupBy(col(groupCol))
      .agg(round(percentile(col("__m"), lit(lo)) + lit(1e-9), 6)
          .as("ci_lo"),
        round(percentile(col("__m"), lit(hi)) + lit(1e-9), 6).as("ci_hi"))
    point.join(ci, Seq(groupCol))
  }

  /** k-fold cross-validated simple OLS via COMPLEMENT aggregates: fold
    * assignment is the engine-portable 56-bit md5 of the row id (mod k),
    * per-fold sufficient statistics (n, Σx, Σy, Σx², Σxy) are ONE
    * map-combinable aggregate, and each fold's TRAINING coefficients
    * come from total−fold arithmetic on the k-row frame — no k
    * re-scans of the data, no per-fold training jobs. The held-out
    * evaluation joins the k-row coefficient frame back (broadcast) and
    * reduces per fold. Two shuffles total at any k and any table size;
    * this is why closed-form learners cross-validate for free on an
    * engine while iterative ones don't.
    *
    * Returns per fold: (fold, n_train, n_test, slope, intercept, rmse,
    * mae), floats rounded 6dp.
    */
  def kFoldOlsCv(df: DataFrame, idCol: Column, xCol: Column, yCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 folds; got $k")
    // r16 (guide §1.2): checkpoint the HASHED BASE, not the fold stats —
    // the md5 fold assignment + casts ran twice (once into the fold
    // aggregate, once into the residual pass); materialized once, both
    // consumers read it and the k-row fold frame is cheap to leave lazy
    // (its two readers re-aggregate the checkpointed rows). Measured
    // 2.15 -> 1.20 s at sf0.1, rows exactly equal.
    val base = df.select(idCol.as("__rid"), xCol.cast("double").as("__x"),
        yCol.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("fold", pmod(ThetaSketch.hash56(col("__rid")), lit(k)))
      .localCheckpoint(true)
    val folds = base.groupBy(col("fold"))
      .agg(count(lit(1)).cast("double").as("fn"),
        sum(col("__x")).as("fx"), sum(col("__y")).as("fy"),
        sum(col("__x") * col("__x")).as("fxx"),
        sum(col("__x") * col("__y")).as("fxy"))
    val tot = folds.agg(sum(col("fn")).as("tn"), sum(col("fx")).as("tx"),
      sum(col("fy")).as("ty"), sum(col("fxx")).as("txx"),
      sum(col("fxy")).as("txy"))
    val n = col("tn") - col("fn")
    val sx = col("tx") - col("fx")
    val sy = col("ty") - col("fy")
    val sxx = col("txx") - col("fxx")
    val sxy = col("txy") - col("fxy")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val coef = folds.crossJoin(tot) // k rows × 1 scalar row
      .select(col("fold"), n.cast("long").as("n_train"),
        slope.as("__b"), ((sy - slope * sx) / n).as("__a"))
    val res = col("__y") - (col("__a") + col("__b") * col("__x"))
    base.join(broadcast(coef), Seq("fold"))
      .groupBy(col("fold"))
      .agg(max(col("n_train")).as("n_train"),
        count(lit(1)).as("n_test"),
        round(max(col("__b")) + lit(1e-9), 6).as("slope"),
        round(max(col("__a")) + lit(1e-9), 6).as("intercept"),
        round(sqrt(avg(res * res)) + lit(1e-9), 6).as("rmse"),
        round(avg(abs(res)) + lit(1e-9), 6).as("mae"))
  }

  /** Per-group chi-square uniformity tests with Benjamini–Hochberg FDR
    * control (Benjamini & Hochberg, JRSS-B'95) — the multiple-testing
    * correction a battery of per-segment drift/uniformity gates needs:
    * at 50 segments, unadjusted α=0.05 expects 2.5 false alarms per
    * healthy snapshot; BH bounds the FALSE DISCOVERY RATE at q across
    * however many segments the data has.
    *
    * Stage 1 (per group): χ² against a uniform distribution over
    * `nCats` categories via the zero-cell-safe algebraic form
    * Σ(o−e)²/e = nCats·Σo²/N − N (absent categories contribute 0 to
    * Σo², exactly their (0−e)²/e = e term after expansion) — one
    * (group, cat) count aggregate + one per-group reduce, no category
    * scaffold join. Stage 2: p-values in-plan via [[graft.expressions.ChiSquareCdf]],
    * BH step-up on the TEST frame (one row per group — the only window
    * is over that bounded frame, m11's allowlisted shape): reject all
    * ranks ≤ max{i : p₍ᵢ₎ < q·i/m}. Decisions are oracle-checkable as
    * critical-value brackets (p₍ᵢ₎ < q·i/m ⇔ stat₍ᵢ₎ > crit(q·i/m; dof),
    * the m4b/m11b pattern).
    *
    * Returns per group: (groupCol, n, chi2, dof, p_rank, bh_threshold,
    * rejected_bh, sig_unadjusted).
    */
  def chiSquareUniformityBH(df: DataFrame, groupCol: String,
      catCol: Column, nCats: Int, q: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nCats >= 2 && q > 0 && q < 1, s"need nCats >= 2, 0 < q < 1")
    val counts = df.groupBy(col(groupCol), catCol.as("__cat"))
      .agg(count(lit(1)).cast("double").as("__o"))
    val tests = counts.groupBy(col(groupCol))
      .agg(sum(col("__o")).as("__n"),
        (lit(nCats) * sum(col("__o") * col("__o")) / sum(col("__o"))
          - sum(col("__o"))).as("__chi2"))
      .withColumn("__p", graft.expressions.ChiSquareCdf.chi2PValue(
        col("__chi2"), lit((nCats - 1).toDouble)))
    // bounded frame: one row per GROUP (the tests, not the facts) —
    // the BH sort is over segment count, never data size. Rank by
    // (chi2 desc, group asc) rather than p asc: monotone-equivalent at
    // fixed dof (p is strictly decreasing in chi2) but immune to
    // p-value underflow — at chi2 ≳ 700 the CDF saturates and several
    // groups tie at p = 0.0, where a p-ordered rank could diverge from
    // an oracle ranking by the statistic (ADVICE r11).
    val wAll = Window.orderBy(col("__chi2").desc, col(groupCol).asc)
    val wSet = Window.partitionBy()
    val ranked = tests
      .withColumn("p_rank", row_number().over(wAll))
      .withColumn("__m", count(lit(1)).over(wSet))
      .withColumn("__thr", lit(q) * col("p_rank") / col("__m"))
      .withColumn("__ok", col("__p") < col("__thr"))
    ranked
      .withColumn("__max_ok",
        max(when(col("__ok"), col("p_rank"))).over(wSet))
      .select(col(groupCol), col("__n").cast("long").as("n"),
        round(col("__chi2") + lit(1e-9), 6).as("chi2"),
        lit((nCats - 1).toLong).as("dof"), col("p_rank"),
        round(col("__thr") + lit(1e-9), 6).as("bh_threshold"),
        (col("p_rank") <= coalesce(col("__max_ok"), lit(0)))
          .as("rejected_bh"),
        (col("__p") < 0.05).as("sig_unadjusted"))
  }

  /** Split-conformal prediction intervals (Papadopoulos et al., ECML'02;
    * Lei et al., JASA'18) for simple OLS: a deterministic hash split
    * into train / calibration / test, closed-form fit on train, the
    * ⌈(n_cal+1)(1−α)⌉-th smallest absolute calibration residual as the
    * interval half-width q̂, and empirical coverage of ŷ ± q̂ measured
    * on the held-out test rows — the distribution-free guarantee
    * (coverage ≥ 1−α in expectation) audited on the same row.
    *
    * The order statistic comes from [[rangePrefixSum]] ranks (range
    * partition + per-partition window + subtotal offsets), never a
    * global sort or an unpartitioned data-sized window; the fit and q̂
    * are 1-row scalar broadcasts. Fully deterministic → hash-oracled.
    *
    * Returns one row: (n_train, n_cal, n_test, alpha, q_hat, coverage,
    * mean_width).
    */
  def splitConformal(df: DataFrame, idCol: Column, xCol: Column,
      yCol: Column, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1; got $alpha")
    val base = df.select(idCol.as("__rid"), xCol.cast("double").as("__x"),
        yCol.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("__bucket", pmod(ThetaSketch.hash56(col("__rid")), lit(10)))
      .withColumn("__split",
        when(col("__bucket") <= 5, "train")
          .when(col("__bucket") <= 7, "cal").otherwise("test"))
      .localCheckpoint(true)
    val fit = base.where(col("__split") === "train")
      .agg(count(lit(1)).cast("double").as("n"), sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__x") * col("__y")).as("sxy"))
      .select(col("n").as("__n_train"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("__b"),
        col("sx"), col("sy"), col("n"))
      .select(col("__n_train"), col("__b"),
        ((col("sy") - col("__b") * col("sx")) / col("n")).as("__a"))
    val scored = base.crossJoin(broadcast(fit)) // 1-row scalar fit
      .withColumn("__absres",
        abs(col("__y") - (col("__a") + col("__b") * col("__x"))))
      .localCheckpoint(true)
    val calRanked = rangePrefixSum(
      scored.where(col("__split") === "cal")
        .select(col("__rid"), col("__absres"), lit(1L).as("__one")),
      orderCols = Seq("__absres", "__rid"), sums = Seq(("__one", "rk")))
    val qHat = calRanked
      .where(col("rk") ===
        least(ceil((col("rk_total") + 1) * lit(1.0 - alpha)),
          col("rk_total")))
      .agg(max(col("__absres")).as("__q"),
        max(col("rk_total")).as("__n_cal"))
    scored.where(col("__split") === "test")
      .crossJoin(broadcast(qHat)) // 1-row scalar q̂
      .groupBy(col("__n_cal"))
      .agg(max(col("__n_train")).cast("long").as("n_train"),
        count(lit(1)).as("n_test"),
        round(max(col("__q")) + lit(1e-9), 6).as("q_hat"),
        round(avg(when(col("__absres") <= col("__q"), 1.0).otherwise(0.0))
          + lit(1e-9), 6).as("coverage"),
        // width doubles the RAW order statistic (doubling the rounded
        // q_hat composes two roundings and can land one 6dp grid cell
        // off the oracle's round(2·q_raw))
        round(lit(2.0) * max(col("__q")) + lit(1e-9), 6).as("mean_width"))
      .select(col("n_train"), col("__n_cal").as("n_cal"), col("n_test"),
        lit(alpha).as("alpha"), col("q_hat"), col("coverage"),
        col("mean_width"))
  }

  /** Cohen's kappa (Cohen, EPM'60) — chance-corrected agreement between
    * two categorical raters over the same items: κ = (p_o − p_e)/(1 − p_e)
    * with p_o the observed agreement rate and p_e the agreement expected
    * from the raters' marginal distributions alone. THE labeled-data QA
    * statistic: raw agreement between two annotators (or two heuristic
    * quality classifiers) reads high whenever one class dominates; κ
    * strips that illusion (κ≈0 = no better than chance), which is what
    * an annotation-pipeline gate has to threshold on.
    *
    * Plan: ONE hash aggregate to the k×k contingency grid (map-side
    * combined — the only pass over the items), then marginals, the
    * diagonal, and p_e are bounded-frame algebra over ≤k² rows; the two
    * scalar frames meet in a 1-row crossJoin (broadcast, allowlisted
    * shape). Exact rational arithmetic until the final rounding → fully
    * hash-oracled. Returns one row:
    * (n_items, n_agree, p_o, p_e, kappa).
    */
  def cohensKappa(df: DataFrame, rater1: Column, rater2: Column)
      : DataFrame = {
    val cells = df.select(rater1.cast("long").as("__a"),
        rater2.cast("long").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint(true) // ≤ k² rows; 3 consumers below
    val totals = cells.agg(sum(col("__c")).as("__n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0.0))
        .as("__agree"))
    val m1 = cells.groupBy(col("__a")).agg(sum(col("__c")).as("__ca"))
    val m2 = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__cb"))
    val peNum = m1.join(m2, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0.0)).as("__pen2"))
    totals.crossJoin(broadcast(peNum)) // 1-row scalar
      .select(col("__n").cast("long").as("n_items"),
        col("__agree").cast("long").as("n_agree"),
        round(col("__agree") / col("__n") + lit(1e-9), 6).as("p_o"),
        round(col("__pen2") / (col("__n") * col("__n")) + lit(1e-9), 6)
          .as("p_e"),
        round((col("__agree") / col("__n") -
          col("__pen2") / (col("__n") * col("__n"))) /
          (lit(1.0) - col("__pen2") / (col("__n") * col("__n")))
          + lit(1e-9), 6).as("kappa"))
  }

  /** Jarque–Bera normality screen per group: population central moments
    * from a two-pass plan (group means broadcast back, then one moment
    * aggregate), skewness g1 = m3/m2^1.5, kurtosis g2 = m4/m2²,
    * JB = n/6·(g1² + (g2−3)²/4). At dof 2 the χ² survival function is
    * EXACTLY exp(−JB/2), so unlike the F/χ²(k) batteries the p-value
    * here is closed-form and fully cross-engine checkable — no CDF
    * expression, no bracket oracle. Two shuffles total (means, moments),
    * both on the group key; the broadcast is |groups| rows. The screen
    * long-tailed value columns fail before a Gaussian-assuming monitor
    * (z-score, CUSUM) is pointed at them.
    */
  def jarqueBera(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val x = col(valueCol).cast("double")
    val means = df.where(x.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__n"), avg(x).as("__mu"))
    val d = col(valueCol).cast("double") - col("__mu")
    val m = df.where(x.isNotNull)
      .join(broadcast(means), groupCol)
      .groupBy(col(groupCol))
      .agg(first(col("__n")).as("__n"),
        avg(d * d).as("__m2"),
        avg(d * d * d).as("__m3"),
        avg(d * d * d * d).as("__m4"))
    val skew = col("__m3") / pow(col("__m2"), 1.5)
    val kurt = col("__m4") / (col("__m2") * col("__m2"))
    val jb = col("__n") / 6.0 *
      (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    m.select(col(groupCol),
      col("__n").cast("long").as("n"),
      round(skew + lit(1e-9), 6).as("skewness"),
      round(kurt + lit(1e-9), 6).as("kurtosis"),
      round(jb + lit(1e-9), 4).as("jb_stat"),
      round(exp(-jb / 2.0) + lit(1e-9), 6).as("p_value"))
  }

  /** Brown–Forsythe test (Levene's test with group MEDIANS): equality
    * of variances across groups, robust to the non-normality jarqueBera
    * flags. z = |x − median_g| per row, then the one-way ANOVA F on z is
    * the W statistic. Plan: one exact-percentile aggregate per group
    * (|groups| rows, broadcast back), one scan for deviations, then the
    * existing [[anova]] sufficient-statistics aggregate — no row ever
    * leaves its group's partition twice. The variance-equality verdict
    * gates pooled-variance tests (m14 Welch vs pooled t) and
    * homoscedastic OLS reads.
    */
  def leveneBrownForsythe(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val med = df.where(x.isNotNull)
      .groupBy(col(groupCol))
      .agg(percentile(x, lit(0.5)).as("__med"))
    val z = df.where(x.isNotNull)
      .join(broadcast(med), groupCol)
      .select(col(groupCol), abs(x - col("__med")).as("__z"))
    anova(z, groupCol, "__z")
      .select(col("n").cast("long").as("n"),
        col("k").cast("long").as("k"),
        round(col("f_stat") + lit(1e-9), 6).as("w_stat"),
        col("df_between").cast("long").as("df_between"),
        col("df_within").cast("long").as("df_within"))
  }

  /** First-order partial correlation r(x,y | z), closed form from the
    * three pairwise Pearson correlations in ONE aggregate pass:
    * (r_xy − r_xz·r_yz) / sqrt((1−r_xz²)(1−r_yz²)). The collider/
    * confounder screen for metric dashboards — "does price still track
    * quantity once discount is held fixed" — without materializing
    * residuals. Scales as any corr: partial+final aggregation only.
    */
  def partialCorr(df: DataFrame, xCol: Column, yCol: Column, zCol: Column)
      : DataFrame = {
    val rxy = col("__rxy"); val rxz = col("__rxz"); val ryz = col("__ryz")
    df.agg(count(lit(1)).as("n"),
        corr(xCol, yCol).as("__rxy"),
        corr(xCol, zCol).as("__rxz"),
        corr(yCol, zCol).as("__ryz"))
      .select(col("n"),
        round(rxy + lit(1e-9), 6).as("r_xy"),
        round(rxz + lit(1e-9), 6).as("r_xz"),
        round(ryz + lit(1e-9), 6).as("r_yz"),
        // undefined when either control correlation is ±1 (z collinear
        // with x or y): surface null, never an ANSI divide-by-zero
        round(when(
          (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz) > 0.0,
          (rxy - rxz * ryz) /
            sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)))
          + lit(1e-9), 6).as("r_xy_given_z"))
  }

  /** Cumulative gains / lift table over a ranked scoring: rank every row
    * by `orderCols` (score desc first — caller negates), cut into
    * `buckets` equal-depth bins, and report per-bin and CUMULATIVE
    * positive capture plus lift vs the base rate. The model-free "is
    * the top of the ranking worth paying for" read behind every
    * curation threshold. Ranks come from [[rangePrefixSum]] — never an
    * unpartitioned data-sized window — and the bin id is pure integer
    * algebra ((rk·B + n − 1) div n), so both engines bin identically.
    * Cumulative counts need no second window: within a bin the MAX of
    * the inclusive prefix IS the cumulative count at the bin edge.
    */
  def cumulativeGains(df: DataFrame, orderCols: Seq[String],
      relCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2; got $buckets")
    val ranked = rangePrefixSum(
      df.withColumn("__one", lit(1L))
        .withColumn("__rel", col(relCol).cast("long")),
      orderCols, Seq("__one" -> "__rk", "__rel" -> "__cum_pos"))
    ranked
      .withColumn("bucket",
        floor((col("__rk") * buckets + col("__rk_total") - 1L)
          .cast("double") / col("__rk_total")).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__rel")).as("n_pos"),
        max(col("__rk")).as("cum_rows"),
        max(col("__cum_pos")).as("cum_pos"),
        first(col("__rk_total")).as("__n"),
        first(col("__cum_pos_total")).as("__p"))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        col("cum_rows"), col("cum_pos"),
        round(col("cum_pos").cast("double") / col("__p") + lit(1e-9), 6)
          .as("gain"),
        round((col("cum_pos").cast("double") / col("cum_rows")) /
          (col("__p").cast("double") / col("__n")) + lit(1e-9), 6)
          .as("lift"))
  }

  /** Odds ratio with a 95% Wald confidence interval from a 2×2
    * exposure/outcome table — the standard A/B readout when the metric
    * is a rate: OR = (a·d)/(b·c), CI = exp(ln OR ± 1.96·√(1/a + 1/b +
    * 1/c + 1/d)). One conditional-aggregate pass builds the table; the
    * interval is closed-form scalar algebra on that single row. Any
    * empty cell makes the Wald interval undefined — those surface null
    * (use an exact test at that point), never a divide-by-zero.
    */
  def oddsRatio(df: DataFrame, exposed: Column, outcome: Column)
      : DataFrame = {
    val cell = (e: Boolean, o: Boolean) =>
      sum(when(exposed === e && outcome === o, 1L).otherwise(0L))
    val a = col("__a"); val b = col("__b")
    val c = col("__c"); val dd = col("__d")
    val or = (a * dd) / (b * c)
    val se = sqrt(lit(1.0) / a + lit(1.0) / b + lit(1.0) / c +
      lit(1.0) / dd)
    val defined = a > 0L && b > 0L && c > 0L && dd > 0L
    df.agg(cell(true, true).as("__a"), cell(true, false).as("__b"),
        cell(false, true).as("__c"), cell(false, false).as("__d"))
      .select(a.as("n_exp_pos"), b.as("n_exp_neg"),
        c.as("n_unexp_pos"), dd.as("n_unexp_neg"),
        round(when(defined, or) + lit(1e-9), 6).as("odds_ratio"),
        round(when(defined, exp(log(or) - lit(1.96) * se)) + lit(1e-9), 6)
          .as("ci_low"),
        round(when(defined, exp(log(or) + lit(1.96) * se)) + lit(1e-9), 6)
          .as("ci_high"))
  }
}
