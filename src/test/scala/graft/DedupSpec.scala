package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and keeps running far away"

  private val docs = Seq(
    (0L, base),
    (1L, base + " tail"),                         // near-dup of 0
    (2L, base.replace("quick", "quiet")),         // near-dup of 0
    (3L, "completely different content about spark catalyst optimizer rules"),
    (4L, base),                                   // exact dup of 0
    (5L, "another unrelated string with its own vocabulary entirely")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per content hash") {
    val kept = Dedup.exact(docs, col("text"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 5L)) // 4 collapses into 0
  }

  test("minhash LSH pipeline finds planted near-dups and no false pairs") {
    val pairs = Dedup.nearDupPairs(docs, col("doc_id"), col("text"),
        shingleN = 8, k = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))              // exact dup always collides
    assert(pairs.intersect(Set((0L, 1L), (0L, 2L), (1L, 2L))).nonEmpty)
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L || a == 5L || b == 5L })
  }

  test("exact jaccard all-pairs agrees with hand computation") {
    val two = Seq((0L, "abcdefghijkl"), (1L, "abcdefghijkl"), (2L, "zzzzzzzzzzzz"))
      .toDF("doc_id", "text")
    val pairs = Dedup.exactJaccardPairs(two, col("doc_id"), col("text"),
        shingleN = 4, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs == Map((0L, 1L) -> 1.0))
  }

  test("simhash: identical docs share fingerprint, disjoint docs differ") {
    val fp = Dedup.simHash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(4L))
    assert(fp(0L) != fp(3L))
    assert(java.lang.Long.bitCount(fp(0L) ^ fp(1L)) <
      java.lang.Long.bitCount(fp(0L) ^ fp(3L))) // near-dup closer in hamming
  }

  test("decontamination flags exactly the docs sharing a quarantine gram") {
    // quarantine doc 100 holds a distinctive 12-gram; corpus doc 0 embeds
    // it verbatim, doc 1 shares 13 chars (two overlapping 12-grams), doc 2
    // is clean. Matches count DISTINCT grams and quarantine docs.
    val quarantine = Seq(
      (100L, "the secret benchmark answer key aaa"),
      (101L, "another eval set document entirely bbb")).toDF("q_id", "text")
    val corpus = Seq(
      (0L, "prefix text then secret benchmark materials"),
      (1L, "also contains secret benchmarks somewhere"),
      (2L, "completely unrelated training content")).toDF("doc_id", "text")
    val out = graft.operators.Decontaminate.flagged(
        corpus, col("doc_id"), col("text"),
        quarantine, col("q_id"), col("text"), n = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.contains(0L), "doc embedding a quarantine 12-gram not flagged")
    assert(out(0L)._2 == 1L) // one quarantine doc touched
    assert(!out.contains(2L), "clean doc was flagged")
    // every flagged doc has >= 1 matched gram by construction
    assert(out.values.forall(_._1 >= 1L))
  }

  test("duplicateSpans merges overlapping and adjacent repeated windows") {
    val corpus = Seq(
      (0L, "a b c d e f g h"),                       // shares "a b c d e" with 1
      (1L, "x y a b c d e q r s"),
      (2L, "m n o p m n o p"),                       // within-doc repeat
      (3L, "unique tokens only here nothing repeats at all"),
      (4L, "a b c z1 z2 z3 z4 z5 m n o p")           // two separated spans
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, col("doc_id"), col("text"), winLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq(
      (0L, 0L, 4L, 5L),   // windows 0..2 ("a b c".."c d e") merge
      (1L, 2L, 6L, 5L),
      (2L, 0L, 7L, 8L),   // adjacent repeat halves fuse into one span
      (4L, 0L, 2L, 3L),   // "a b c"
      (4L, 8L, 11L, 4L))) // "m n o p" — island break across the z-gap
  }

  test("cutSpans removes duplicated ranges, keeps span-free docs whole") {
    val corpus = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y a b c d e q r s"),
      (2L, "m n o p m n o p"),                     // fully duplicated -> dropped
      (3L, "unique tokens only here nothing repeats at all"),
      (4L, "a b c z1 z2 z3 z4 z5 m n o p")
    ).toDF("doc_id", "text")
    val out = Dedup.cutSpans(corpus, col("doc_id"), col("text"), winLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      0L -> ((8L, 3L, "f g h")),
      1L -> ((10L, 5L, "x y q r s")),
      3L -> ((8L, 8L, "unique tokens only here nothing repeats at all")),
      4L -> ((12L, 5L, "z1 z2 z3 z4 z5"))))
    assert(!out.contains(2L)) // every token inside a span
  }
}
