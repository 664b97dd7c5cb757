package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins: pre-bucketing both sides on the join key
  * removes the shuffle entirely — the 100 TB answer to repeated
  * fact-to-fact joins (orders ⋈ lineitem on orderkey) that are too big to
  * broadcast. Asserts the physical plan has NO shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem joins without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      Tables.orders(spark, sf()).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, sf()).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scan alignment: the join itself requires no shuffle; the
      // only acceptable exchange would be none at all pre-aggregation
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf())
        .select("l_orderkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
