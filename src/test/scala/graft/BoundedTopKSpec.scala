package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** [[graft.plans.BoundedTopK]] vs the window `row_number` formulation it
  * replaces: identical rows AND ranks on tied and untied scores, both
  * orderings; and the quantizedTopK plan it serves must show the bounded
  * aggregate with no Window operator (the pair shuffle is gone). */
class BoundedTopKSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  // 2000 rows, 37 keys, quantized scores (ties guaranteed), unique ids
  private def df = spark.range(2000).select(
    (col("id") % 37).as("k"),
    (((col("id") * 2654435761L) % 97) / 7.0).as("score"),
    col("id"))

  private def windowed(desc: Boolean) = {
    val ord = if (desc) col("score").desc else col("score").asc
    val w = Window.partitionBy(col("k")).orderBy(ord, col("id"))
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("k"), col("id"), col("rnk"))
  }

  private def bounded(desc: Boolean) =
    df.groupBy(col("k"))
      .agg(graft.plans.GraftExtensions.boundedTopK(
        struct(col("score"), col("id")), 5, descFirst = desc).as("top"))
      .select(col("k"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("k"), col("t.id").as("id"), (col("pos") + 1).as("rnk"))

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("equals window row_number, score descending") {
    assert(rows(bounded(desc = true)) == rows(windowed(desc = true)))
  }

  test("equals window row_number, score ascending (distance mode)") {
    assert(rows(bounded(desc = false)) == rows(windowed(desc = false)))
  }

  test("groups smaller than k keep all rows, still ranked") {
    val tiny = spark.range(3).select(lit(0L).as("k"),
      col("id").cast("double").as("score"), col("id"))
    val got = tiny.groupBy(col("k"))
      .agg(graft.plans.GraftExtensions.boundedTopK(
        struct(col("score"), col("id")), 10, descFirst = true).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.id"), (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(got == Seq((0L, 3), (1L, 2), (2L, 1)))
  }

  test("quantizedTopK plan: bounded aggregate present, Window gone") {
    val plan = Similarity.quantizedTopK(Tables.embeddings(spark, dir),
      col("vec_id") < 5, 3).queryExecution.executedPlan.toString
    assert(plan.contains("bounded_topk"), s"no bounded_topk in:\n$plan")
    assert(!plan.contains("Window"), s"Window survived in:\n$plan")
  }
}
