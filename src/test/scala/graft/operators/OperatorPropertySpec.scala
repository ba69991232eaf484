package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Property-style invariants over randomized inputs for the operator
  * layer (the CleanerPropertySpec pattern): seeded generators, declared
  * guarantees checked for every sample.
  */
class OperatorPropertySpec extends SparkSpecBase {

  import spark.implicits._

  // ---- range-partitioned prefix sum ----------------------------------

  test("rangePrefixSum ≡ sequential window sweep: inclusive prefixes, " +
      "totals, negative values, duplicates across the key space") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new Random(11)
    // keys deliberately collide and interleave; values include negatives
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(400).toDouble / 7.0, rnd.nextInt(21).toLong - 10,
        rnd.nextInt(5).toLong)
    }
    // pre-aggregate to distinct keys (the documented contract)
    val df = rows.toDF("k", "a", "b").groupBy("k")
      .agg(sum("a").as("a"), sum("b").as("b"))

    val got = Stats.rangePrefixSum(df, Seq("k"),
        Seq("a" -> "cum_a", "b" -> "cum_b"), numParts = 8)
      .select("k", "cum_a", "cum_b", "cum_a_total", "cum_b_total")
      .as[(Double, Long, Long, Long, Long)].collect().sortBy(_._1)

    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val want = df
      .withColumn("cum_a", sum(col("a")).over(w))
      .withColumn("cum_b", sum(col("b")).over(w))
      .withColumn("cum_a_total", sum(col("a")).over(wAll))
      .withColumn("cum_b_total", sum(col("b")).over(wAll))
      .select("k", "cum_a", "cum_b", "cum_a_total", "cum_b_total")
      .as[(Double, Long, Long, Long, Long)].collect().sortBy(_._1)

    assert(got.length === want.length)
    got.zip(want).foreach { case (g, e) => assert(g === e) }
  }

  test("rangePrefixSum: single row, single partition, and " +
      "fewer rows than partitions all degrade gracefully") {
    val one = Seq((1.0, 5L)).toDF("k", "v")
    val g1 = Stats.rangePrefixSum(one, Seq("k"), Seq("v" -> "cum"),
      numParts = 16).select("cum", "cum_total").as[(Long, Long)].collect()
    assert(g1.toSeq === Seq((5L, 5L)))

    val three = Seq((3.0, 1L), (1.0, 2L), (2.0, 3L)).toDF("k", "v")
    val g3 = Stats.rangePrefixSum(three, Seq("k"), Seq("v" -> "cum"),
        numParts = 16)
      .orderBy("k").select("cum").as[Long].collect()
    assert(g3.toSeq === Seq(2L, 5L, 6L)) // ordered by k: 1.0, 2.0, 3.0
  }

  // ---- sampling / splits / shards ------------------------------------

  test("sampling algebra: buckets in range, splits exhaustive and " +
      "order-independent, shards preserve the row multiset") {
    val rnd = new Random(7)
    val ids = (1 to 500).map(_ => rnd.nextLong() % 100000)
    val df = ids.toDF("id")

    val buckets = df.select(Sampling.hashBucket(col("id"), 17).as("b"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 17))

    val splits = Sampling.withSplit(df, "id", valPct = 10, testPct = 15)
    assert(splits.count() === df.count()) // no row lost or duplicated
    assert(splits.where(!col("split").isin("val", "test", "train"))
      .count() === 0)
    // same key -> same split, independent of row order/partitioning
    val a = splits.select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.withSplit(df.orderBy(rand(99)).repartition(7), "id",
        valPct = 10, testPct = 15)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a === b)

    val packed = Sampling.packShards(df, "id", numShards = 5)
    assert(packed.select(Sampling.hashBucket(col("id"), 5) =!= col("shard"))
      .as[Boolean].collect().forall(_ == false))
    // multiset of ids preserved exactly
    val before = ids.groupBy(identity).view.mapValues(_.size).toMap
    val after = packed.select("id").as[Long].collect()
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(after === before)
  }

  // ---- PII redaction --------------------------------------------------

  test("redactPii is idempotent and leaves no matchable PII behind") {
    val rnd = new Random(23)
    val words = Seq("alpha", "beta", "a@b.io", "x.y+z@mail-host.org",
      "+1 555 123 4567", "+44 20-7946-0958", "0x" + "aB3f" * 10,
      "plain", "0xshort", "semi@nodot", "+12", "end.")
    val docs = (1L to 120L).map { i =>
      (i, (1 to 1 + rnd.nextInt(12))
        .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")

    val once = TextAnalysis.redactPii(docs, "text")
      .select(col("doc_id"), col("text_redacted"), col("n_redactions"))
    // 1. no residual matches of any PII pattern in the output
    val residual = TextAnalysis.piiPatterns.map { case (p, _) =>
      once.where(col("text_redacted").rlike(p)).count()
    }.sum
    assert(residual === 0L)
    // 2. idempotent: redacting the redacted text changes nothing
    val twice = TextAnalysis.redactPii(
        once.withColumnRenamed("text_redacted", "text"), "text")
      .select(col("doc_id"), col("text_redacted"), col("n_redactions"))
    assert(twice.where(col("n_redactions") =!= 0).count() === 0)
    assert(twice.select("doc_id", "text_redacted")
      .except(once.select("doc_id", "text_redacted"))
      .count() === 0)
  }

  // ---- sessionization -------------------------------------------------

  test("batch sessions partition non-null events; inter-session gaps " +
      "exceed the threshold; spans are consistent") {
    val rnd = new Random(5)
    val gapMin = 30
    val rows = (1 to 400).map { _ =>
      val user = rnd.nextInt(8).toLong
      val ts = new java.sql.Timestamp(
        1700000000000L + rnd.nextInt(5000) * 60000L)
      (user, ts, rnd.nextDouble())
    }.toDF("user_id", "ts", "value")

    val sessions = Sessionize.batchSessions(rows, "user_id", "ts", "value",
      gapMinutes = gapMin).cache()

    // every event lands in exactly one session
    assert(sessions.agg(sum("n_events")).as[Long].head() === 400L)
    // spans are well-formed
    assert(sessions.where(col("session_end_ms") < col("session_start_ms"))
      .count() === 0)
    // per user: sessions ordered by start are separated by > gap and
    // never overlap
    val byUser = sessions
      .select("user_id", "session_start_ms", "session_end_ms")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).values
    byUser.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, prevEnd), (_, nextStart, _)) =>
          assert(nextStart - prevEnd > gapMin * 60000L,
            s"sessions closer than gap: end=$prevEnd next=$nextStart")
        case _ => ()
      }
    }
  }

  // ---- EWMA -----------------------------------------------------------

  test("ewma closed form equals the sequential recurrence") {
    val rnd = new Random(31)
    for (alpha <- Seq(0.1, 0.3, 0.7)) {
      val series = (1 to 150).map(i => (1L, i, rnd.nextDouble() * 100 - 20))
      val df = series.toDF("k", "i", "x")
      val got = TimeSeries.ewma(df, Seq("k"), "i", col("i"), "x", alpha,
          "y").select("i", "y").as[(Int, Double)].collect().toMap
      var y = series.head._3
      series.foreach { case (_, i, x) =>
        y = if (i == 1) x else alpha * x + (1 - alpha) * y
        assert(math.abs(got(i) - y) <= 1e-9 * math.max(1.0, math.abs(y)),
          s"alpha=$alpha i=$i got=${got(i)} want=$y")
      }
    }
  }

  // ---- salted join ----------------------------------------------------

  test("saltedJoin is row-identical to the plain join for inner and " +
      "left semantics, including unmatched fact keys") {
    val rnd = new Random(47)
    // skewed fact: 80% of rows on one key; some keys missing from dim
    val fact = (1 to 500).map { i =>
      val k = if (rnd.nextInt(5) > 0) "hot" else s"k${rnd.nextInt(8)}"
      (i.toLong, k, rnd.nextDouble())
    }.toDF("id", "k", "v")
    val dim = Seq(("hot", 1.0), ("k1", 2.0), ("k2", 3.0), ("k3", 4.0))
      .toDF("k", "w")

    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, Seq("k"), jt)
        .select("id", "k", "v", "w")
        .as[(Long, String, Double, Option[Double])].collect().sorted
      val salted = Skew.saltedJoin(fact, dim, "k", numSalts = 7, joinType = jt)
        .select("id", "k", "v", "w")
        .as[(Long, String, Double, Option[Double])].collect().sorted
      assert(salted === plain, s"joinType=$jt")
    }
  }

  // ---- HLL sketch union ----------------------------------------------

  test("a30: unioned daily HLL sketches estimate weekly distincts " +
      "within 5% of exact") {
    val out = graft.QueriesF.a30.fn(spark, "/root/testdata/sf0.001")
      .select("exact_users", "hll_within_5pct")
      .as[(Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (exact, ok) =>
      assert(ok, s"HLL estimate drifted >5% from exact=$exact")
    }
  }

  // ---- chi-square p-value expression ---------------------------------

  test("m11b: in-plan ChiSquareCdf p-value equals the commons-math3 " +
      "driver-side computation and lies in [0, 1]") {
    // m11b itself now ships DECISIONS (sig_05/sig_01, oracled against
    // critical-value brackets); the raw p-value identity vs
    // commons-math3 is pinned here by re-deriving it in-plan from m11.
    val row = graft.QueriesF.m11.fn(spark, "/root/testdata/sf0.001")
      .withColumn("p_value", graft.expressions.ChiSquareCdf.chi2PValue(
        col("chi2"), col("dof").cast("double")))
      .head()
    val p = row.getAs[Double]("p_value")
    val expected = Stats.chi2PValue(row.getAs[Double]("chi2"),
      row.getAs[Long]("dof").toDouble)
    assert(p >= 0.0 && p <= 1.0)
    assert(math.abs(p - expected) < 1e-12,
      s"expression p=$p vs driver-side p=$expected")
    val dec = graft.QueriesF.m11b.fn(spark, "/root/testdata/sf0.001").head()
    assert(dec.getAs[Boolean]("sig_05") == (p < 0.05) &&
      dec.getAs[Boolean]("sig_01") == (p < 0.01),
      "m11b decisions disagree with the in-plan p-value")
  }

  // ---- semantic dedup block index ------------------------------------

  test("clusterBlockedPairs: subset of the exact pair set at any " +
      "config, exact-equal when every cell is probed, and recall " +
      "complete on well-separated synthetic clusters") {
    val rnd = new Random(53)
    // 4 well-separated direction clusters in 8-d, 30 vectors each, plus
    // small within-cluster jitter: near-dup pairs (cos >= 0.9) exist
    // only within a cluster, and k-means at k=4 recovers the clusters
    val centers = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0, 1.0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0, 0, 0), Array(0, 0, 0, 1.0, 0, 0, 0, 0))
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.exactThresholdPairs(
        vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val cents = graft.ml.Clustering.kmeansCentroids(
      vecs, "embedding", 4, 13L)
    for (nprobe <- Seq(1, 2, 4)) {
      val blocked = Similarity.clusterBlockedPairs(
          vecs, "vec_id", "embedding", 0.9, cents, nprobe)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(blocked.subsetOf(exact),
        s"nprobe=$nprobe produced a non-exact pair")
      if (nprobe == 4) assert(blocked === exact,
        "probing every cell must recover the full exact pair set")
    }
    // separated clusters: even home-cell-only blocking is complete
    val home = Similarity.clusterBlockedPairs(
        vecs, "vec_id", "embedding", 0.9, cents, 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(home === exact,
      "well-separated clusters should need no cross-cell probes")
    // the exposed candidate set is what the pair generator scans: every
    // emitted pair is a candidate, candidates are normalized+distinct
    val cand = Similarity.clusterBlockedCandidatePairs(
        vecs, "vec_id", "embedding", cents, 2)
      .as[(Long, Long)].collect()
    assert(cand.length === cand.distinct.length &&
      cand.forall { case (a, b) => a < b })
    val blocked2 = Similarity.clusterBlockedPairs(
        vecs, "vec_id", "embedding", 0.9, cents, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked2.subsetOf(cand.toSet),
      "scored pairs must come from the exposed candidate set")
  }

  test("cellsForCorpus: occupancy-constant self-sizing — k grows " +
      "linearly with the corpus, floors at 1, ceil on remainders") {
    import graft.ml.Clustering.cellsForCorpus
    assert(cellsForCorpus(2000, 250) === 8)
    assert(cellsForCorpus(20000, 250) === 80) // 10x corpus -> 10x cells
    assert(cellsForCorpus(2001, 250) === 9) // partial cell rounds UP
    assert(cellsForCorpus(5, 1000) === 1) // tiny corpus floors at one cell
    assert(cellsForCorpus(100, 0) === 100) // degenerate occupancy guarded
    val ks = Seq(1000L, 10000L, 100000L, 1000000L)
      .map(cellsForCorpus(_, 128))
    assert(ks === ks.sorted && ks.distinct === ks, "monotone in N")
  }

  // ---- DSIR importance log-ratio -------------------------------------

  test("importanceLogRatio equals a scalar add-one-smoothed unigram LM " +
      "reference; target docs and empty docs emit no row") {
    val docsRows = Seq(
      (0L, "spark scan table", true), (1L, "spark spark merge", true),
      (2L, "scan scan table row", false), (3L, "merge row spark", false),
      (4L, "   ", false), (5L, "table", false), (6L, "", true))
    val df = docsRows.toDF("doc_id", "text", "tgt")
    val got = TextAnalysis.importanceLogRatio(df, "text", "doc_id",
        col("tgt"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // scalar reference
    def toks(t: String) = t.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).toSeq
    val tTok = docsRows.filter(_._3).flatMap(r => toks(r._2))
    val rTok = docsRows.filterNot(_._3).flatMap(r => toks(r._2))
    val vocab = (tTok ++ rTok).distinct
    val (tt, tr, v) = (tTok.size, rTok.size, vocab.size)
    def pT(w: String) = (tTok.count(_ == w) + 1.0) / (tt + v)
    def pR(w: String) = (rTok.count(_ == w) + 1.0) / (tr + v)
    val expected = docsRows.filterNot(_._3)
      .map { case (id, text, _) => id -> toks(text) }
      .filter(_._2.nonEmpty)
      .map { case (id, ws) =>
        id -> (ws.size.toLong,
          ws.map(w => math.log(pT(w) / pR(w))).sum / ws.size)
      }.toMap
    assert(got.keySet === expected.keySet,
      "raw docs with tokens, and only those, must be scored")
    expected.foreach { case (id, (n, score)) =>
      val (_, gn, gs) = got(id)
      assert(gn === n)
      assert(math.abs(gs - score) < 1e-6,
        s"doc $id: got $gs want $score")
    }
  }

  test("importanceLogRatioHashed: bucketed LM is bounded by construction, " +
      "collision-free bucketing reproduces the exact scores, and the " +
      "hashed scores track the exact scores on the real fixture") {
    // (a) with FAR more buckets than distinct tokens, collisions are
    // absent (verified below) and hashed ≡ exact except for the
    // smoothing denominator — so compare against a scalar reference
    // built over the bucket space, same construction as the t58 spec
    val docsRows = Seq(
      (0L, "spark scan table", true), (1L, "spark spark merge", true),
      (2L, "scan scan table row", false), (3L, "merge row spark", false),
      (4L, "   ", false), (5L, "table", false), (6L, "", true))
    val df = docsRows.toDF("doc_id", "text", "tgt")
    val buckets = 4096
    val got = TextAnalysis.importanceLogRatioHashed(df, "text", "doc_id",
        col("tgt"), buckets)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def toks(t: String) = t.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).toSeq
    val tTok = docsRows.filter(_._3).flatMap(r => toks(r._2))
    val rTok = docsRows.filterNot(_._3).flatMap(r => toks(r._2))
    // the fixture's tokens must not collide at this bucket count, or the
    // scalar reference below is wrong by construction
    val vocab = (tTok ++ rTok).distinct
    val bucketOf = vocab.map { w =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      w -> (java.lang.Long.parseLong(h.take(14), 16) % buckets)
    }.toMap
    assert(bucketOf.values.toSeq.distinct.size === vocab.size,
      "fixture tokens collide; pick a different bucket count")
    val (tt, tr) = (tTok.size, rTok.size)
    def pT(w: String) = (tTok.count(_ == w) + 1.0) / (tt + buckets)
    def pR(w: String) = (rTok.count(_ == w) + 1.0) / (tr + buckets)
    docsRows.filterNot(_._3)
      .map { case (id, text, _) => id -> toks(text) }
      .filter(_._2.nonEmpty)
      .foreach { case (id, ws) =>
        val (_, gn, gs) = got(id)
        val want = ws.map(w => math.log(pT(w) / pR(w))).sum / ws.size
        assert(gn === ws.size.toLong)
        assert(math.abs(gs - want) < 1e-6, s"doc $id: got $gs want $want")
      }

    // (b) on the real fixture at a REAL bucket count (64, the catalog
    // config — vocab >> buckets, collisions everywhere), the hashed
    // scores must still rank like the exact scores: DSIR's resample
    // consumes relative weights, so rank agreement is the property the
    // hashing trick must preserve
    val real = graft.Tables.documents(spark, sf("sf0.001"))
    val tgt = col("source") === "src0"
    val exact = TextAnalysis.importanceLogRatio(real, "text", "doc_id", tgt)
      .select(col("doc_id"), col("dsir_logratio").as("x"))
    val hashed = TextAnalysis.importanceLogRatioHashed(
        real, "text", "doc_id", tgt, 64)
      .select(col("doc_id"), col("dsir_logratio").as("y"))
    val joined = exact.join(hashed, "doc_id")
    assert(joined.count() === exact.count(),
      "hashed variant must score exactly the docs the exact variant does")
    val r = joined.agg(corr(col("x"), col("y"))).head().getDouble(0)
    assert(r > 0.8,
      f"hashed scores decorrelated from exact scores: pearson=$r%.3f")
  }

  // ---- incremental aggregation ---------------------------------------

  test("IncrementalAgg: merging per-batch states equals the one-shot " +
      "aggregate for any split, any batch count, any order") {
    val rnd = new Random(29)
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(6).toString,
        if (rnd.nextInt(10) == 0) null
        else java.lang.Double.valueOf(rnd.nextDouble() * 100 - 30))
    }.toDF("k", "v")
    val oneShot = IncrementalAgg.state(rows, Seq("k"), "v")
      .select("k", "cnt", "sum", "min", "max")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    for (nBatches <- Seq(2, 3, 5)) {
      val parts = rows.withColumn("b", pmod(xxhash64(col("k"), col("v")),
        lit(nBatches)))
      val states = (0 until nBatches).map(i =>
        IncrementalAgg.state(parts.where(col("b") === i).drop("b"),
          Seq("k"), "v"))
      val merged = IncrementalAgg.merge(rnd.shuffle(states), Seq("k"))
        .select("k", "cnt", "sum", "min", "max")
        .as[(String, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      assert(merged.keySet === oneShot.keySet)
      merged.foreach { case (k, (_, cnt, s, mn, mx)) =>
        val (_, cnt0, s0, mn0, mx0) = oneShot(k)
        assert(cnt === cnt0, s"cnt k=$k nB=$nBatches")
        assert(math.abs(s - s0) <= 1e-9 * math.max(1.0, math.abs(s0)))
        assert(mn === mn0 && mx === mx0)
      }
    }
  }

  test("IncrementalAgg: merged-state variance equals var_samp; " +
      "histogram sketch merge equals the directly built sketch") {
    val rnd = new Random(31)
    val rows = (1 to 600).map { _ =>
      (rnd.nextInt(4).toString, rnd.nextDouble() * 100)
    }.toDF("k", "v")
    // Variance through a 3-way split/merge vs Spark's var_samp.
    val parts = rows.withColumn("b", pmod(xxhash64(col("v")), lit(3)))
    val merged = IncrementalAgg.finish(IncrementalAgg.merge(
      (0 until 3).map(i => IncrementalAgg.state(
        parts.where(col("b") === i).drop("b"), Seq("k"), "v")), Seq("k")))
      .select("k", "variance").as[(String, Double)].collect().toMap
    val direct = rows.groupBy("k").agg(var_samp(col("v")).as("v"))
      .as[(String, Double)].collect().toMap
    assert(merged.keySet === direct.keySet)
    merged.foreach { case (k, v) =>
      assert(math.abs(v - direct(k)) <= 1e-8 * math.max(1.0, direct(k)),
        s"variance mismatch k=$k: $v vs ${direct(k)}")
    }
    // Histogram sketch: building per-batch states and summing bins must
    // equal the sketch built from all rows at once (algebraic merge).
    val weekAll = Stats.histogramState(rows, col("k"), col("v"), 0, 100, 20)
    val batchStates = (0 until 3).map(i => Stats.histogramState(
      parts.where(col("b") === i).drop("b"), col("k"), col("v"), 0, 100, 20))
    val mergedHist = batchStates.reduce(_.unionByName(_))
      .groupBy("period", "bin").agg(sum("cnt").as("cnt"))
    val a = weekAll.orderBy("period", "bin")
      .as[(String, Int, Long)].collect().toSeq
    val b = mergedHist.orderBy("period", "bin")
      .as[(String, Int, Long)].collect().toSeq
    assert(a === b)
    // And the interpolated median of uniform[0,100) data is near 50.
    val q = Stats.histogramQuantiles(weekAll, 0, 100, 20, Seq(0.5))
      .select("q_est").as[Double].collect()
    q.foreach(m => assert(m > 35 && m < 65, s"median $m implausible"))
  }

  // ---- connected components ------------------------------------------

  test("connectedComponents matches a sequential union-find on random " +
      "graphs, including isolated vertices and multi-hop chains") {
    val rnd = new Random(17)
    for (trial <- 1 to 3) {
      val n = 120
      val nodes = (1L to n.toLong).toDF("id")
      // sparse random edges plus a deliberate long chain (diameter test)
      val randomEdges = (1 to 60).map { _ =>
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1)
      }.filter { case (a, b) => a != b }
      val chain = (100L until 115L).map(i => (i, i + 1))
      val edges = (randomEdges ++ chain).toDF("a", "b")

      val got = Dedup.connectedComponents(nodes, "id", edges, "a", "b",
          maxIters = 40)
        .as[(Long, Long)].collect().toMap

      // sequential union-find reference
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      (randomEdges ++ chain).foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (1 to n).map { i =>
        // canonical label = min id in component
        val root = find(i)
        val minId = (1 to n).filter(j => find(j) == root).min
        i.toLong -> minId.toLong
      }.toMap
      assert(got === want, s"trial $trial")
    }
  }

  // ---- time-weighted interpolation -----------------------------------

  test("interpolateTime matches a sequential nearest-neighbor reference: " +
      "leading nulls stay null, trailing nulls forward-fill, interior " +
      "nulls are time-weighted between neighbors") {
    val rnd = new Random(41)
    val rows = (1 to 300).map { i =>
      val user = rnd.nextInt(6).toLong
      val ts = new java.sql.Timestamp(1700000000000L + i * 60000L)
      val v: java.lang.Double =
        if (rnd.nextInt(4) == 0) null else rnd.nextDouble() * 50
      (i.toLong, user, ts, v)
    }
    val df = rows.toDF("id", "user_id", "ts", "v")
    val got = TimeSeries.interpolateTime(df, Seq("user_id"), "ts",
        col("id"), "v", "out")
      .select("id", "out").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    rows.groupBy(_._2).values.foreach { series =>
      val s = series.sortBy(r => (r._3.getTime, r._1))
      s.indices.foreach { i =>
        val (id, _, ts, v) = s(i)
        val want: Option[Double] =
          if (v != null) Some(v.doubleValue)
          else {
            val prev = s.take(i).reverse.find(_._4 != null)
            val next = s.drop(i + 1).find(_._4 != null)
            (prev, next) match {
              case (None, _) => None
              case (Some((_, _, _, pv)), None) => Some(pv.doubleValue)
              case (Some((_, _, pt, pv)), Some((_, _, nt, nv))) =>
                if (nt.getTime == pt.getTime) Some(pv.doubleValue)
                else Some(pv.doubleValue + (nv.doubleValue - pv.doubleValue) *
                  (ts.getTime - pt.getTime).toDouble /
                  (nt.getTime - pt.getTime).toDouble)
            }
          }
        (got(id), want) match {
          case (None, None) => ()
          case (Some(g), Some(w)) =>
            assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)),
              s"id=$id got=$g want=$w")
          case other => fail(s"id=$id mismatch: $other")
        }
      }
    }
  }

  // ---- deterministic dedup -------------------------------------------

  test("deterministic dedup: unique keys, survivors from input, " +
      "invariant under repartition/shuffle") {
    val rnd = new Random(13)
    val rows = (1 to 300).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(5), rnd.nextDouble())
    }.toDF("k", "sub", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.dropDuplicatesDeterministic(df, Seq("k"),
          xxhash64(col("k"), col("sub"), col("v")))
        .select("k", "sub", "v").as[(Long, Int, Double)].collect().toSet

    val out = run(rows)
    assert(out.size === rows.select("k").distinct().count().toInt)
    val inputSet = rows.as[(Long, Int, Double)].collect().toSet
    assert(out.subsetOf(inputSet))
    // same survivors whatever the physical layout
    assert(run(rows.orderBy(rand(3)).repartition(13)) === out)
    assert(run(rows.coalesce(1)) === out)
  }
}
