package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextAnalysis}

/** Known-answer specs for the r10 text-evaluation wave: fixed-point
  * token entropy, CCNet perplexity buckets, and the nDCG/MRR retrieval
  * eval. */
class TextEvalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("tokenEntropy: hand-computed fixed-point micro-nats") {
    // "a a b": counts {a:2, b:1}, n=3 →
    // h_fp = ⌊ln3·1e6+½⌋ − (2·⌊ln2·1e6+½⌋ + 1·0) DIV 3
    //      = 1098612 − 1386294 DIV 3 = 1098612 − 462098 = 636514
    val df = Seq((1L, "a a b"), (2L, "x x x x")).toDF("doc_id", "text")
    val rows = TextAnalysis.tokenEntropy(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) == ((3L, 2L, 636514L)))
    // uniform single token → zero entropy exactly
    assert(rows(2L) == ((4L, 1L, 0L)))
  }

  test("retrievalEval: score order == relevance order -> ndcg 1, rr 1e6") {
    // d1 holds both query terms, d2 one, d3 none (absent from the BM25
    // ranking entirely — tf rows exist only for hits). BM25 must rank
    // d1 over d2, matching the ideal relevance order exactly.
    val df = Seq((1L, "table hash join"), (2L, "table scan scan"),
      (3L, "other words only")).toDF("doc_id", "text")
    val rows = TextAnalysis.retrievalEval(df, col("doc_id"), col("text"),
        Seq(7 -> Seq("table", "hash")), 10)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getInt(0) == 7)
    assert(r.getLong(1) == r.getLong(2), "DCG must equal ideal DCG")
    assert(r.getDouble(3) == 1.0)
    assert(r.getLong(4) == 1000000L)
  }

  test("pplBuckets: thirds split, rate-monotone buckets") {
    // 9 docs: three clean (common bigrams), three mixed, three noisy —
    // the bucket boundaries must respect the rate ordering.
    val docs = (1 to 9).map { i =>
      val text =
        if (i <= 3) "the cat sat the cat sat the cat sat"
        else if (i <= 6) s"the cat sat odd$i pair$i the cat sat"
        else s"odd$i a$i b$i c$i d$i e$i f$i g$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val rows = Sampling.pplBuckets(docs, col("doc_id"), col("text"),
        minP = 0.05)
      .select(col("doc_id"), col("rate_fp"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 9)
    assert(rows.map(_._3).groupBy(identity).view.mapValues(_.size).toMap ==
      Map(0L -> 3, 1L -> 3, 2L -> 3), "buckets must be exact thirds")
    // monotone: every head rate ≤ every middle rate ≤ every tail rate
    def ratesOf(b: Long) = rows.filter(_._3 == b).map(_._2)
    assert(ratesOf(0L).max <= ratesOf(1L).min)
    assert(ratesOf(1L).max <= ratesOf(2L).min)
  }
}
