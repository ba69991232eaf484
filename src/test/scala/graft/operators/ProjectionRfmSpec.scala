package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueriesJ, SparkSpecBase, Tables}

/** Invariants for catalog part J (the DuckDB oracles carry the
  * arithmetic; these pin the semantic claims).
  */
class ProjectionRfmSpec extends SparkSpecBase {
  import spark.implicits._

  test("signProject: dPrime rows per id, identical vectors project identically") {
    val df = Seq(
      (1L, Array(0.5f, -0.25f, 1.0f, 0.0f)),
      (2L, Array(0.5f, -0.25f, 1.0f, 0.0f)), // exact copy of 1
      (3L, Array(-1.0f, 0.0f, 0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val p = Similarity.signProject(df, "vec_id", "embedding", 8)
    assert(p.groupBy("id").count().collect().forall(_.getLong(1) === 8L))
    // copies must land on the exact same projection, bit for bit
    val d = p.where(col("id") === 1L).select(col("j"), col("p"))
      .except(p.where(col("id") === 2L).select(col("j"), col("p")))
    assert(d.count() === 0L)
  }

  test("JL audit: projected cosine tracks original cosine on testdata") {
    val out = QueriesJ.ann7.fn(spark, sf("sf0.001"))
    val errs = out.agg(avg(col("abs_err")), max(col("abs_err")))
      .collect().head
    // 32-dim sign projection: mean distortion well under the ~1/sqrt(32)
    // JL scale; max bounded away from "projection is noise"
    assert(errs.getDouble(0) < 0.15, s"mean abs_err ${errs.getDouble(0)}")
    assert(errs.getDouble(1) < 0.5, s"max abs_err ${errs.getDouble(1)}")
  }

  test("RFM segments partition the user base with buckets in 1..5") {
    val dir = sf("sf0.001")
    val out = QueriesJ.a40.fn(spark, dir).cache()
    val users = Tables.events(spark, dir)
      .where(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id")).distinct().count()
    val agg = out.agg(sum(col("n_users")), min(least(col("r_q"),
      col("f_q"), col("m_q"))), max(greatest(col("r_q"), col("f_q"),
      col("m_q")))).collect().head
    assert(agg.getLong(0) === users)
    assert(agg.getInt(1) >= 1 && agg.getInt(2) <= 5)
    out.unpersist()
  }

  test("entity resolution: one golden record per cluster, clusters partition names") {
    val dir = sf("sf0.001")
    val out = QueriesJ.er1.fn(spark, dir).cache()
    val names = Tables.load(spark, dir, "part")
      .select(col("p_name")).distinct().count()
    assert(out.count() === names) // every name resolved exactly once
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(when(col("is_golden"), 1L).otherwise(0L)).as("g"))
    assert(perCluster.where(col("g") =!= 1L).count() === 0L)
    // the golden record carries the cluster's max record count
    val bad = out.where(col("is_golden"))
      .select(col("cluster_id"), col("n_records").as("gr"))
      .join(out.groupBy(col("cluster_id"))
        .agg(max(col("n_records")).as("mx")), "cluster_id")
      .where(col("gr") =!= col("mx"))
    assert(bad.count() === 0L)
    out.unpersist()
  }

  test("two-proportion z: halves cover every timestamped event") {
    val dir = sf("sf0.001")
    val r = QueriesJ.m36.fn(spark, dir).collect().head
    val total = Tables.events(spark, dir)
      .where(col("ts").isNotNull).count()
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") === total)
    assert(!r.getAs[Double]("z").isNaN)
  }
}
