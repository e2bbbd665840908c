package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Hand-computed BPE training on a tiny corpus.
  *
  * Words: aaab ×3, ab ×2. Symbols: [a,a,a,b,</w>] and [a,b,</w>].
  * Round 1 pair counts: (a,a)=6 (two ADJACENT but non-overlapping
  * occurrences per aaab — greedy counts positions, and so do we via the
  * position explode), (a,b)=5, (b,</w>)=5 → merge (a,a).
  * Round 2: aaab→[aa,a,b,</w>] gives (aa,a)=3,(a,b)=3,(b,</w>)=3;
  * ab adds (a,b)=2,(b,</w>)=2 → tie at 5 breaks by a asc → (a,b).
  * Round 3: aaab→[aa,ab,</w>], ab→[ab,</w>] → (ab,</w>)=5 wins over
  * (aa,ab)=3.
  * Vocab after 3: aa×3, ab</w>×5.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq("aaab aaab ab", "aaab ab").toDF("text")

  test("learned merge table matches the hand-run") {
    val m = Bpe.train(docs, col("text"), merges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "a", 6L)))
    assert(m(1) == ((2, "a", "b", 5L)))
    assert(m(2) == ((3, "ab", "</w>", 5L)))
  }

  test("sub-word vocabulary after training matches the hand-run") {
    val v = Bpe.subwordVocab(docs, col("text"), merges = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("aa" -> 3L, "ab</w>" -> 5L))
  }

  test("encode: per-doc sub-word counts under the learned segmentation") {
    // after 3 merges: aaab -> [aa, ab</w>] (2), ab -> [ab</w>] (1)
    val byDoc = Bpe.encode(
        Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(byDoc.length == 2)
    assert(byDoc(0).getLong(1) == 3 && byDoc(0).getLong(2) == 2 + 2 + 1)
    assert(byDoc(1).getLong(1) == 2 && byDoc(1).getLong(2) == 2 + 1)
  }

  test("merge application is greedy left-to-right (aaa + (a,a) -> [aa, a])") {
    // 'aaa' alone: round-1 counts (a,a)=2 from the position explode but
    // greedy application must produce [aa, a], never [a, aa] or [aa, aa]
    val one = Seq("aaa").toDF("text")
    val v = Bpe.subwordVocab(one, col("text"), merges = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("aa" -> 1L, "a" -> 1L, "</w>" -> 1L))
  }
}
