package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Embeddings

class EmbeddingsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // corpus spread along the (1,1,0,0)/√2 axis, tiny off-axis noise
  private val emb = Seq(
    0L -> Seq(2f, 2f, 0f, 0f),
    1L -> Seq(1f, 1f, 0f, 0f),
    2L -> Seq(-1f, -1f, 0f, 0f),
    3L -> Seq(-2f, -2f, 0f, 0f),
    4L -> Seq(0f, 0f, 0.1f, 0f)
  ).toDF("vec_id", "embedding")

  test("power iteration recovers the dominant axis (up to sign)") {
    val w = Embeddings.dominantComponent(emb, iters = 4, dim = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(math.abs(w(0)) - math.sqrt(0.5)) < 1e-3)
    assert(math.abs(w(0) - w(1)) < 1e-9)      // symmetric dims identical
    assert(math.abs(w(2)) < 0.05)             // noise axis suppressed
    assert(math.abs(w(3)) < 1e-9)             // untouched dim exactly ~0
    // unit norm (sequential-fold arithmetic)
    val n = w.values.map(x => x * x).sum
    assert(math.abs(n - 1.0) < 1e-9)
  }

  test("component scores are the centered 1-D projections, sign-consistent") {
    val s = Embeddings.componentScores(emb, iters = 4, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // projections along ±(1,1)/√2 of centered x-coords (2,1,-1,-2 each dim)
    assert(math.abs(s(0) + s(3)) < 1e-2)      // symmetric ends cancel
    assert(math.abs(s(1) + s(2)) < 1e-2)
    assert(math.abs(s(0)) > math.abs(s(1)))   // magnitude ordering holds
    assert(s(0) * s(1) > 0 && s(0) * s(2) < 0) // sides of the axis split
  }
}
