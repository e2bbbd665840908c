package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq
import graft.plans.GraftExtensions

/** The native l2sq expression vs the HOF dot-of-differences chain it
  * replaces in the PQ hot loop: bit-identical doubles, SQL
  * registration, HOF null semantics. */
class L2SqSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(17)
  private val vecs = (0L until 200L).map { i =>
    (i, Seq.fill(32)(rnd.nextDouble() * 4 - 2))
  }.toDF("id", "v")

  test("bit-identical to the HOF formulation on 200 pairs") {
    val paired = vecs.as("a").join(vecs.as("b"),
        col("a.id") + 1 === col("b.id"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
    val diff = paired.select(
        Pq.l2sqHof(col("x"), col("y")).as("hof"),
        GraftExtensions.l2sq(col("x"), col("y")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff == 0)
  }

  test("registered as SQL function l2sq; exact on integers") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT l2sq(array(1.0D, 2.0D), array(4.0D, 6.0D))").head.getDouble(0)
    assert(r == 9.0 + 16.0)
  }

  test("null array, null element, length mismatch all yield null") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT l2sq(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS a,
        |       l2sq(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS b,
        |       l2sq(array(1.0D), array(1.0D, 2.0D)) AS c,
        |       l2sq(CAST(array() AS ARRAY<DOUBLE>),
        |            CAST(array() AS ARRAY<DOUBLE>)) AS d""".stripMargin).head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(rows.getDouble(3) == 0.0) // empty arrays: distance 0
  }
}
