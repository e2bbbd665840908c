package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hybrid

/** Reciprocal-rank fusion, hand-computed: a doc present in BOTH lists
  * outranks docs present in one, and the fused scores are the exact
  * 1/(60+r) sums. Fixture (query = doc 0, n = 2 per list):
  *  - keyword list: d1 (overlap 2) then d2 (overlap 1); d3 shares none
  *  - vector list:  d3 (cos ≈ 1) then d1 (cos ≈ 0.8); d2 orthogonal
  * RRF: d1 = 1/61 + 1/62 (both lists), d3 = 1/61, d2 = 1/62. */
class HybridSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b"),     // the query
    (1L, "a b"),     // overlap 2
    (2L, "a x"),     // overlap 1
    (3L, "z")        // overlap 0 -> absent from keyword list
  ).toDF("doc_id", "text")

  private val emb = Seq(
    (0L, Seq(1.0, 0.0)),
    (1L, Seq(0.8, 0.6)),   // cos 0.8
    (2L, Seq(0.0, 1.0)),   // cos 0
    (3L, Seq(1.0, 0.1))    // cos ≈ 0.995 -> vector rank 1
  ).toDF("vec_id", "embedding")

  test("fusion: both-list doc first, exact 1/(60+r) sums") {
    val out = Hybrid.rrfTopK(docs, col("doc_id"), col("text"), emb,
        col("doc_id") === 0, col("vec_id") === 0, k = 3, n = 2)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    assert(out(0).getDouble(3) == 1.0 / 61 + 1.0 / 62)
    assert(out(1).getDouble(3) == 1.0 / 61)
    assert(out(2).getDouble(3) == 1.0 / 62)
  }

  test("keywordRanks: overlap counts and deterministic rank") {
    val kw = Hybrid.keywordRanks(docs, col("doc_id"), col("text"),
        col("doc_id") === 0, n = 5)
      .orderBy("kr").collect()
    assert(kw.map(r => (r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 1), (2L, 2)))
  }
}
