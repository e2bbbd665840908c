package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The native dot_i64 expression vs the aggregate∘zip_with HOF chain it
  * replaces in the quantized ANN path: bit-identical BIGINT sums, SQL
  * registration, and the HOF's null semantics (null array → null, null
  * element → null, mismatched lengths → null via zip_with's null pad). */
class DotI64Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  private val rnd = new scala.util.Random(7)
  private val codes = (0L until 200L).map { i =>
    (i, Seq.fill(64)(rnd.nextInt(255).toLong - 127L))
  }.toDF("id", "c")

  test("bit-identical to the HOF dot on 200 int8-range pairs") {
    val paired = codes.as("a").join(codes.as("b"),
        col("a.id") + 1 === col("b.id"))
      .select(col("a.c").as("x"), col("b.c").as("y"))
    val diff = paired.select(
        hofDot(col("x"), col("y")).as("hof"),
        GraftExtensions.dotI64(col("x"), col("y")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff == 0)
  }

  test("registered as SQL function dot_i64 via extension") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT dot_i64(array(1L, 2L, 3L), array(4L, 5L, 6L))")
      .head.getLong(0)
    assert(r == 4 + 10 + 18)
  }

  test("null semantics match the HOF chain exactly") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),          // 11
      (None, Some(Seq(1L))),                            // null array
      (Some(Seq(1L, 2L)), Some(Seq(3L)))                // length mismatch
    ).toDF("x", "y")
    val out = df.select(
        hofDot(col("x"), col("y")).as("hof"),
        GraftExtensions.dotI64(col("x"), col("y")).as("native"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    assert(out(0).getLong(1) == 11L)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
    // null ELEMENT: HOF nulls the running sum; native matches
    val withNullElem = spark.sql(
      """SELECT dot_i64(array(1L, CAST(NULL AS BIGINT)), array(2L, 3L)) AS d,
        |       aggregate(zip_with(array(1L, CAST(NULL AS BIGINT)), array(2L, 3L),
        |                 (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS h
        |""".stripMargin).head
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("empty arrays dot to 0, like the HOF fold's initial value") {
    val r = spark.sql(
      """SELECT dot_i64(CAST(array() AS ARRAY<BIGINT>),
        |               CAST(array() AS ARRAY<BIGINT>))""".stripMargin).head
    assert(!r.isNullAt(0) && r.getLong(0) == 0L)
  }
}
