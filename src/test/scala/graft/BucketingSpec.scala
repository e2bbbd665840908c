package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join strategy for repeated fact⋈fact joins
  * at scale: both sides pre-hashed into the same bucket layout on the
  * join key means the sort-merge join needs NO shuffle exchange. This
  * spec proves the property on the real tables: bucketed lineitem⋈orders
  * plans without an Exchange; the unbucketed plan has them. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.spark

  test("bucketed fact-fact join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, dir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, dir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // disable broadcast + AQE coalescing so the join strategy is the
    // bucket-aware sort-merge, and exchanges would be visible if required
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must be exchange-free: the only allowed exchange is
      // the one feeding the final aggregation
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join should not shuffle on the join key:\n$plan")
      assert(plan.contains("SortMergeJoin"))

      // control: same join on raw parquet shuffles both sides
      val raw = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")))
      raw.collect()
      val rawPlan = raw.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange hashpartitioning(l_orderkey") ||
        rawPlan.contains("Exchange hashpartitioning(o_orderkey"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
