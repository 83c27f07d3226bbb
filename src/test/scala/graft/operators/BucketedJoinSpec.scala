package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Bucketing = the amortized-shuffle path for repeated big-big equi-joins
  * (SURVEY.md §7.1 "co-located joins via bucketing"): both sides written
  * bucketed on the join key join WITHOUT an Exchange — at 100 TB the
  * one-time bucketed write replaces a shuffle on every subsequent join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables equi-join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf()).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf()).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")

      // and it is still correct
      val want = Tables.orders(spark, sf())
        .join(Tables.lineitem(spark, sf()),
          col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() === want.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
