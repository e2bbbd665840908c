package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: the Morton math and the claim that matters — range
  * partitioning on the z-value keeps BOTH interleaved columns' per-file
  * min/max narrow (what parquet row-group skipping prunes on), where a
  * hash layout leaves every file spanning everything. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("morton2 interleaves bits (hand-checked values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.morton2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5) = x bits 0,1 -> bits 0,2 ; y bits 0,2 -> bits 1,5 = 1+4+2+32
    assert(out == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("z-order range layout tightens BOTH columns' per-partition spans") {
    val grid: DataFrame = spark.range(4096)
      .select((col("id") % 64).as("x"), expr("id DIV 64").as("y"))
    def spans(d: DataFrame, c: String): Long = d
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max(col(c)) - min(col(c))).as("r"))
      .agg(sum("r")).collect()(0).getLong(0)
    val hash = grid.repartition(8)
    val z = Layout.zorderRepartition(grid, col("x"), col("y"), 8)
    assert(z.rdd.getNumPartitions == 8)
    // same rows, new layout
    assert(z.count() == 4096)
    assert(spans(z, "x") < (spans(hash, "x") * 7) / 10,
      s"x spans: z=${spans(z, "x")} hash=${spans(hash, "x")}")
    assert(spans(z, "y") < (spans(hash, "y") * 7) / 10,
      s"y spans: z=${spans(z, "y")} hash=${spans(hash, "y")}")
  }
}
