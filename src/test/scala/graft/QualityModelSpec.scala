package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and that is that"),
    (1L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
    (2L, "a solid paragraph of prose with the usual function words in it " * 4),
    (3L, "x"),
    (4L, "numbers 123 456 789 with some words and the odd comma, here and there"),
    (5L, "short but clean text with the and of")
  ).toDF("doc_id", "text")

  test("GD distillation reduces MSE against the heuristic target") {
    val feat = QualityModel.features(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getSeq[Double](1), r.getDouble(2)))
    val w = QualityModel.distillWeights(docs, col("doc_id"), col("text"),
        iters = 8, rate = 0.1)
      .collect().map(_.getDouble(1))
    assert(w.length == QualityModel.nFeatures && w.forall(v => !v.isNaN))
    def mse(wv: Array[Double]) = feat.map { case (x, y) =>
      val p = x.zip(wv).map { case (a, b) => a * b }.sum
      (p - y) * (p - y)
    }.sum / feat.length
    val before = mse(Array.fill(QualityModel.nFeatures)(0.0))
    val after = mse(w)
    assert(after < before * 0.5) // the fit is real, not a no-op
  }

  test("distilled scores track the heuristic ordering at the extremes") {
    val fitted = QualityModel.distillScores(docs, col("doc_id"), col("text"),
        iters = 8, rate = 0.1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // prose-heavy doc 2 must outscore the all-punctuation doc 1
    assert(fitted(2L) > fitted(1L))
  }
}
