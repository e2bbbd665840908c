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

  test("chunkDocuments: coverage, overlap, tail, and reconstruction invariants") {
    val budget = 8
    val overlap = 3
    val stride = budget - overlap
    // docs spanning the edge cases: empty, whitespace-only, shorter than
    // the budget, exactly the budget, budget+1 (tail chunk), and a long
    // one with a non-stride-aligned tail
    val docs = Seq(
      1L -> "",
      2L -> "   ",
      3L -> "a b c",
      4L -> (1 to budget).map("t" + _).mkString(" "),
      5L -> (1 to budget + 1).map("u" + _).mkString(" "),
      6L -> (1 to 37).map("w" + _).mkString(" "))
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, col("doc_id"), col("text"),
        budget, overlap)
      .orderBy(col("doc_id"), col("chunk_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // empty / whitespace-only docs produce NO chunks
    assert(!byDoc.contains(1L) && !byDoc.contains(2L))
    // n <= budget -> exactly one chunk carrying the whole document
    assert(byDoc(3L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 3, "a b c")))
    assert(byDoc(4L).size == 1 && byDoc(4L).head._3 == budget)
    // budget+1 tokens -> two chunks; the second starts at stride and
    // carries the clamped tail of budget+1-stride tokens
    assert(byDoc(5L).size == 2 && byDoc(5L)(1)._3 == budget + 1 - stride)
    for ((_, chunks) <- byDoc; c <- chunks)
      assert(c._3 <= budget && c._3 == c._4.split(" ").length)
    // consecutive chunks overlap by exactly `overlap` tokens (tail may
    // be shorter but still starts stride past its predecessor), and
    // dropping each chunk's first `overlap` tokens after chunk 0
    // reconstructs the document exactly — nothing lost, nothing doubled
    for ((id, chunks) <- byDoc) {
      val orig = docs.toMap.apply(id).toLowerCase.split(" ")
        .filter(_.nonEmpty).toSeq
      val rebuilt = chunks.head._4.split(" ").toSeq ++
        chunks.tail.toSeq.flatMap(_._4.split(" ").drop(overlap).toSeq)
      assert(rebuilt == orig, s"doc $id reconstruction")
      for (Array(a, b) <- chunks.sliding(2) if chunks.size > 1)
        assert(a._4.split(" ").drop(stride).toSeq ==
          b._4.split(" ").take(a._3 - stride).toSeq,
          s"doc $id chunks ${a._2}/${b._2} overlap")
      // chunk count matches the ceil arithmetic
      val n = orig.size
      val expect = math.ceil(math.max(n - overlap, 1).toDouble / stride).toInt
      assert(chunks.size == expect, s"doc $id chunk count")
    }
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
