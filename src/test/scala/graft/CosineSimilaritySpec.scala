package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.plans.GraftExtensions

/** The native cosine_sim expression vs the HOF formulation: bit-identical
  * results (same index-ascending accumulation), SQL registration via
  * session extension, and edge semantics. */
class CosineSimilaritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(99)
  private val vecs = (0L until 200L).map { i =>
    (i, Seq.fill(64)(rnd.nextDouble() - 0.5))
  }.toDF("id", "v")

  test("native expression is bit-identical to the HOF cosine on 200 pairs") {
    val paired = vecs.as("a").join(vecs.as("b"),
        col("a.id") + 1 === col("b.id"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
    val diff = paired.select(
        Similarity.cosine(col("x"), col("y")).as("hof"),
        GraftExtensions.cosineSim(col("x"), col("y")).as("native"))
      .filter(col("hof") =!= col("native")) // bitwise: double equality
      .count()
    assert(diff == 0)
  }

  test("registered as SQL function cosine_sim via extension") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("vt")
    val r = spark.sql(
      """SELECT cosine_sim(a.v, a.v) AS c FROM vt a WHERE a.id = 0""")
      .head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("null array -> null; zip-truncates length mismatch like zip_with") {
    GraftExtensions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0, 9.0))),
      (None, Some(Seq(1.0)))
    ).toDF("x", "y")
    val rows = df.select(GraftExtensions.cosineSim(col("x"), col("y")).as("c"))
      .collect()
    assert(rows(0).getDouble(0) == 1.0) // third element ignored
    assert(rows(1).isNullAt(0))
  }

  test("zero-norm and empty arrays yield null, not NaN") {
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),   // zero vector
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("x", "y")
    val rows = df.select(GraftExtensions.cosineSim(col("x"), col("y")).as("c"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
    // and therefore a zero vector can never win a descending cosine rank
    val ranked = vecs.limit(5)
      .union(Seq((999L, Seq.fill(64)(0.0))).toDF("id", "v"))
      .select(col("id"),
        GraftExtensions.cosineSim(col("v"),
          typedLit(Seq.fill(64)(0.5))).as("c"))
      .orderBy(col("c").desc_nulls_last)
      .collect()
    assert(ranked.last.getLong(0) == 999L)
  }

  test("interpreted path agrees with codegen path") {
    val x = Seq.fill(16)(rnd.nextDouble())
    val y = Seq.fill(16)(rnd.nextDouble())
    val df = Seq((x, y)).toDF("x", "y")
    val viaCodegen = df.select(
      GraftExtensions.cosineSim(col("x"), col("y"))).head.getDouble(0)
    val expected = {
      val dot = x.zip(y).map { case (a, b) => a * b }.sum
      dot / math.sqrt(x.map(a => a * a).sum * y.map(b => b * b).sum)
    }
    assert(math.abs(viaCodegen - expected) < 1e-12)
  }
}
