package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r15 optimization): time the sub-phases of the most
  * expensive catalog queries under the Bench session config so the
  * per-query seconds can be attributed to components (guide §1 —
  * measure first, noop sink, labelled jobs). Not part of the driver
  * surface; results land in OPTIMIZATION_r15.md.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.ProfTop <sfDir> [probe ...]
  */
object ProfTop {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).cache().count()
      catch { case _: Throwable => () }
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      if (which.nonEmpty && !which.exists(name.startsWith)) return
      // one throwaway + 2 timed
      spark.sparkContext.setJobDescription(name)
      try {
        f
        val reps = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[proftop] $name%-42s ${reps.min}%8.3f s  (reps ${reps.map(r => f"$r%.3f").mkString(",")})")
      } catch { case e: Throwable =>
        println(s"[proftop] $name ERROR ${e.getMessage}")
      }
      spark.sparkContext.setJobDescription(null)
    }

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))

    // ---- ann9 components -------------------------------------------------
    import graft.operators.Similarity
    time("ann9/codebooks") {
      noop(Similarity.pqCodebooks(emb, "vec_id", "embedding",
        m = 16, ksub = 16, dim = Tables.embeddingDim, seed = 7L))
    }
    time("ann9/pqTopK-full(product)") {
      noop(Similarity.pqTopK(emb, "vec_id", "embedding",
        pmod(col("vec_id"), lit(10)) === 0, k = 5, m = 16, ksub = 16,
        shortlist = 100, dim = Tables.embeddingDim, seed = 7L))
    }
    time("ann9/bruteforce-exact") {
      noop(Similarity.bruteForceTopKFor(emb,
        emb.where(pmod(col("vec_id"), lit(10)) === 0).select(col("vec_id")),
        "vec_id", "embedding", 5))
    }

    // ---- ann9 sub-components --------------------------------------------
    time("ann9sub/subs-window-init") {
      // the pqCodebooks init path alone: explode into subspaces + the
      // per-sub hash-ordered seed window
      import org.apache.spark.sql.expressions.Window
      val subDim = Tables.embeddingDim / 16
      val v = transform(col("embedding"), x => x.cast("double"))
      val unitv = transform(v, x => x / sqrt(aggregate(v, lit(0.0),
        (acc, u) => acc + u * u)))
      val subs = emb.select(col("vec_id").as("id"), unitv.as("vec"))
        .select(col("id"), explode(sequence(lit(0), lit(15))).as("sub"),
          col("vec"))
        .select(col("id"), col("sub"),
          slice(col("vec"), col("sub") * subDim + 1, lit(subDim)).as("sv"))
      val wInit = Window.partitionBy(col("sub"))
        .orderBy(xxhash64(col("id"), lit(7L)), col("id"))
      noop(subs.withColumn("__rn", row_number().over(wInit))
        .where(col("__rn") <= 16))
    }
    if (which.isEmpty || which.exists("ann9sub/encode-given-cb".startsWith)) {
      val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        m = 16, ksub = 16, dim = Tables.embeddingDim, seed = 7L)
        .localCheckpoint(true) // built ONCE, outside the timed reps
      time("ann9sub/encode-given-cb") {
        noop(Similarity.pqEncode(emb, "vec_id", "embedding", cb,
          m = 16, dim = Tables.embeddingDim))
      }
    }

    // ---- t57 components --------------------------------------------------
    import graft.ml.Clustering
    import graft.operators.Dedup
    time("t57/exactThresholdPairs") {
      noop(Similarity.exactThresholdPairs(emb, "vec_id", "embedding", 0.45))
    }
    time("t57/kmeansCentroids") {
      noop(Clustering.kmeansCentroids(emb, "embedding", k = 8, seed = 7L))
    }
    time("t57/clusterBlockedPairs") {
      val cents = Clustering.kmeansCentroids(emb, "embedding", k = 8, seed = 7L)
      noop(Similarity.clusterBlockedPairs(emb, "vec_id", "embedding", 0.45,
        cents, nprobe = 4))
    }
    time("t57/cc-on-exact") {
      val exact = Similarity.exactThresholdPairs(emb, "vec_id", "embedding",
          0.45).select(col("id_a"), col("id_b")).localCheckpoint(true)
      noop(Dedup.connectedComponents(emb.select(col("vec_id")), "vec_id",
        exact, "id_a", "id_b"))
    }

    // ---- m71 components --------------------------------------------------
    time("m71/full") {
      noop(Clustering.hdbscanLevels(
        emb.select(col("vec_id"), col("embedding")(0).as("x"),
          col("embedding")(1).as("y")),
        "vec_id", "x", "y", minPts = 5, lambdas = Seq(0.02, 0.04)))
    }

    // ---- graph family ----------------------------------------------------
    import graft.operators.Graph
    time("g/backbone-count") {
      noop(QueriesG.backbone(spark, sfDir))
    }
    time("g17/full") {
      val backbone = QueriesG.backbone(spark, sfDir)
      noop(Graph.modularity(backbone, "s1", "s2",
        Graph.labelPropagationAssign(backbone, rounds = 3), "v", "label"))
    }
    time("g17/lpa-only") {
      val backbone = QueriesG.backbone(spark, sfDir)
      noop(Graph.labelPropagationAssign(backbone, rounds = 3))
    }
    time("g1/pagerank") {
      noop(SparkEntry.queries("g1_pagerank")(spark, sfDir))
    }
    time("g16/full") {
      noop(SparkEntry.queries("g16_label_propagation")(spark, sfDir))
    }

    // ---- lazy-vs-eager iteration experiment (LPA 3 rounds) --------------
    time("exp/lpa-eager(current)") {
      val backbone = QueriesG.backbone(spark, sfDir).localCheckpoint(true)
      noop(Graph.labelPropagationAssign(backbone, rounds = 3))
    }
    time("exp/lpa-lazy-chain") {
      import org.apache.spark.sql.expressions.Window
      val backbone = QueriesG.backbone(spark, sfDir).localCheckpoint(true)
      val e = backbone.select(col("s1"), col("s2"))
      val adj = e.select(col("s1").as("v"), col("s2").as("nb"))
        .unionAll(e.select(col("s2").as("v"), col("s1").as("nb")))
        .localCheckpoint(true)
      var labels = adj.select(col("v")).distinct()
        .withColumn("label", col("v"))
      (1 to 3).foreach { _ =>
        val w = Window.partitionBy(col("v"))
          .orderBy(col("cnt").desc, col("label").asc)
        labels = adj
          .join(labels.select(col("v").as("nb"), col("label")), "nb")
          .groupBy(col("v"), col("label")).agg(count(lit(1)).as("cnt"))
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .select(col("v"), col("label"))
      }
      noop(labels)
    }

    // ---- peer effects ----------------------------------------------------
    time("e3e/full") {
      noop(SparkEntry.queries("e3e_peer_grid")(spark, sfDir))
    }
    time("m53/full") {
      noop(SparkEntry.queries("m53_dbscan_grid")(spark, sfDir))
    }
    time("ann2c/full") {
      noop(SparkEntry.queries("ann2c_ivf_learned")(spark, sfDir))
    }
    time("ann15/full") {
      noop(SparkEntry.queries("ann15_mmr_rerank")(spark, sfDir))
    }
    time("t56/full") {
      noop(SparkEntry.queries("t56_containment_pairs")(spark, sfDir))
    }
    time("t62/full") {
      noop(SparkEntry.queries("t62_scrub_pipeline")(spark, sfDir))
    }

    // ---- r16 probes ------------------------------------------------------
    time("r16/ann9-full-catalog") {
      noop(SparkEntry.queries("ann9_pq_topk")(spark, sfDir))
    }
    time("r16/t57-full-catalog") {
      noop(SparkEntry.queries("t57_semantic_dedup")(spark, sfDir))
    }
    time("r16/ann2c-kmeans-k45") {
      val base = Tables.embeddings(spark, sfDir)
      val k = math.max(4,
        math.round(math.sqrt(base.count().toDouble)).toInt)
      noop(Clustering.kmeansCentroids(base, "embedding", k, seed = 7L))
    }
    if (which.isEmpty || which.exists("r16/ann2c-arms".startsWith)) {
      val base = Tables.embeddings(spark, sfDir)
      val k = math.max(4,
        math.round(math.sqrt(base.count().toDouble)).toInt)
      val cents = Clustering.kmeansCentroids(base, "embedding", k, seed = 7L)
        .localCheckpoint(true)
      time("r16/ann2c-arms/ivf-given-cents") {
        noop(Similarity.ivfTopK(base, "vec_id", "embedding", 5, cents,
          nprobe = 4))
      }
      time("r16/ann2c-arms/bruteforce") {
        noop(Similarity.bruteForceTopK(base, "vec_id", "embedding", 5))
      }
    }
    time("r16/g1-pagerank-i1") {
      val edges = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (-(col("l_suppkey") + 1)).as("dst"))
      val nodes = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("id"))
        .union(Tables.supplier(spark, sfDir)
          .select((-(col("s_suppkey") + 1)).as("id")))
      noop(Graph.pageRank(nodes, "id", edges, "src", "dst", iters = 1))
    }
    time("r16/g1-full") {
      noop(SparkEntry.queries("g1_pagerank")(spark, sfDir))
    }
    time("r16/g7-full") {
      noop(SparkEntry.queries("g7_personalized_pagerank")(spark, sfDir))
    }
    time("r16/g13-full") {
      noop(SparkEntry.queries("g13_hits")(spark, sfDir))
    }
    time("r16/st1-full") {
      noop(SparkEntry.queries("st1_streaming_daily_stats")(spark, sfDir))
    }
    time("r16/st7-full") {
      noop(SparkEntry.queries("st7_stream_static_enrich")(spark, sfDir))
    }
    time("r16/st8-full") {
      noop(SparkEntry.queries("st8_stream_interval_left_outer")(spark, sfDir))
    }
    time("r16/st9-full") {
      noop(SparkEntry.queries("st9_stream_interval_full_outer")(spark, sfDir))
    }
    spark.stop()
  }
}
