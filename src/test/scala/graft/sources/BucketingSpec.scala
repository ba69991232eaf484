package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Co-located bucketed join: the join on the bucket key must plan with NO
  * shuffle exchange on either side.
  */
class BucketingSpec extends SparkSpecBase {

  test("bucketed tables join without a shuffle and match the plain join") {
    val li = graft.Tables.lineitem(spark, sf("sf0.001"))
    val ord = graft.Tables.orders(spark, sf("sf0.001"))
    Writers.writeBucketedTable(li, "li_bucketed", "l_orderkey", 8)
    Writers.writeBucketedTable(ord, "orders_bucketed", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val plan = j.queryExecution.executedPlan.toString
      val joinSubtree = plan.split("HashAggregate").last
      assert(joinSubtree.contains("SortMergeJoin") ||
        plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the only exchange allowed is the one feeding the final aggregate,
      // never below the join
      val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!belowJoin.contains("Exchange"),
        s"join inputs must be shuffle-free:\n$plan")

      // results identical to the unbucketed join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority").collect()
      assert(j.orderBy("o_orderpriority").collect() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}
