package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranking

/** The two-pass global dense rank must be bit-identical to the
  * single-partition window AND keep every WindowExec partitioned (the
  * whole point of the rewrite — SURVEY §7 risk 2). */
class RankingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 500 rows over 37 distinct values — dense ties across partitions.
  private def data = (1 to 500).map(i => (i.toLong, (i % 37) * 1.5)).toDF("id", "v")

  test("globalDenseRank (desc) matches dense_rank window exactly") {
    val expected = data
      .withColumn("r", dense_rank().over(Window.orderBy(col("v").desc)))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val got = Ranking.globalDenseRank(data, "v", "r", parts = 7)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == expected)
  }

  test("globalDenseRank (asc) matches dense_rank window exactly") {
    val expected = data
      .withColumn("r", dense_rank().over(Window.orderBy(col("v").asc)))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val got = Ranking.globalDenseRank(data, "v", "r", ascending = true, parts = 7)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == expected)
  }

  test("q05 executes with no unpartitioned WindowExec") {
    val df = SparkEntry.queries("q05_rank_orders_by_price")(
      spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    // an unpartitioned window renders windowspecdefinition(<sort> ASC/DESC
    // …) — partitioned ones lead with the partition column(s) then a comma
    val unpartitioned = """windowspecdefinition\([^,]*(ASC|DESC)""".r
    assert(unpartitioned.findFirstIn(plan).isEmpty,
      s"single-partition window found:\n$plan")
  }
}
