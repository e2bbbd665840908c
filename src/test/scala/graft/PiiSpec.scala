package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Pii, TextAnalysis}

/** Hand-computed answers for the PII scrub, the bigram LM estimation,
  * and containment near-dup pairs. */
class PiiSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("scrub redacts url/email/ip/phone with stage-wise counts") {
    val df = Seq(
      (1L, "see https://a.b/x?u=1 or mail bob@x.co and 10.0.0.1 call +12345678"),
      (2L, "nothing here"),
      (3L, "two mails a@b.io c@d.org one ip 1.2.3.4"),
      // email embedded in a URL counts once, as the URL
      (4L, "https://u:pw@host.com/path only")
    ).toDF("doc_id", "text")
    val out = Pii.scrub(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1 &&
      out(0).getInt(3) == 1 && out(0).getInt(4) == 1)
    assert(out(0).getString(5) ==
      "see <URL> or mail <EMAIL> and <IP> call <PHONE>")
    assert(out(1).getString(5) == "nothing here" &&
      (1 to 4).forall(i => out(1).getInt(i) == 0))
    assert(out(2).getInt(2) == 2 && out(2).getInt(3) == 1)
    assert(out(2).getString(5) == "two mails <EMAIL> <EMAIL> one ip <IP>")
    assert(out(3).getInt(1) == 1 && out(3).getInt(2) == 0,
      s"URL-embedded email must count as URL only: ${out(3)}")
    assert(out(3).getString(5) == "<URL> only")
  }

  test("bigramLm: MLE conditionals sum to 1 per left context") {
    val df = Seq("a b a b", "a c", "x").toDF("text")
    val out = TextAnalysis.bigramLm(df, col("text"))
      .orderBy("a", "b").collect()
    // bigrams: (a,b)x2 from doc1, (b,a) from doc1, (a,c) from doc2
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(byPair(("a", "b")) == ((2L, 3L, 2.0 / 3)))
    assert(byPair(("a", "c")) == ((1L, 3L, 1.0 / 3)))
    assert(byPair(("b", "a")) == ((1L, 1L, 1.0)))
    assert(out.length == 3) // single-token doc "x" contributes nothing
    // per-context probabilities are a distribution
    val sums = out.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(4)).sum)
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("keywords: rare term outranks frequent common term") {
    val df = Seq(
      (1L, "common common common rare"),   // 'common' df=3, 'rare' df=1
      (2L, "common other"),
      (3L, "common stuff")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.keywords(df, col("doc_id"), col("text"), k = 2)
      .orderBy("doc_id", "rnk").collect()
    // doc 1: rare tf=1 df=1 -> 1*3/1=3.0; common tf=3 df=3 -> 3*3/3=3.0
    // exact tie -> token asc: common first
    assert(out(0).getString(1) == "common" && out(0).getDouble(4) == 3.0)
    assert(out(1).getString(1) == "rare" && out(1).getDouble(4) == 3.0)
    // doc 2: other (1*3/1=3.0) beats common (1*3/3=1.0)
    assert(out(2).getString(1) == "other" && out(3).getString(1) == "common")
  }

  test("invertedIndex: df/tf/sorted capped postings") {
    val df = Seq(
      (3L, "b a a"), (1L, "a x"), (2L, "a")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(df, col("doc_id"), col("text"),
        postingCap = 2)
      .orderBy("token").collect()
    val a = out(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 3 && a.getLong(2) == 4)
    assert(a.getString(3) == "1,2") // sorted, capped at 2 of 3
    assert(out(1).getString(0) == "b" && out(1).getString(3) == "3")
    assert(out(2).getString(0) == "x" && out(2).getString(3) == "1")
  }

  test("lmSurprise flags rare transitions, NULL rate on empty docs") {
    val df = Seq(
      (1L, "a b a b a c"),  // transitions: ab,ba,ab,ba,ac
      (2L, "x"),            // no bigrams
      (3L, "a b")
    ).toDF("doc_id", "text")
    // corpus LM: from a: b 3/4, c 1/4; from b: a 2/2
    // minP=0.3 -> rare iff P < 0.3: only (a,c) at 0.25
    val out = TextAnalysis.lmSurprise(df, col("doc_id"), col("text"), 0.3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 5 && out(0).getLong(2) == 1 &&
      out(0).getDouble(3) == 0.2)
    assert(out(1).getLong(1) == 0 && out(1).getLong(2) == 0 &&
      out(1).isNullAt(3))
    assert(out(2).getLong(1) == 1 && out(2).getLong(2) == 0 &&
      out(2).getDouble(3) == 0.0)
  }

  test("containment finds an embedded doc that Jaccard misses") {
    val long = ("the quick brown fox jumps over the lazy dog while the " +
      "band plays on and the crowd cheers loudly for hours") * 3
    val short = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, long), (2L, short), (3L, "completely different text"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, col("doc_id"), col("text"),
      shingleN = 8, threshold = 0.9).collect()
    assert(cont.length == 1 &&
      cont(0).getLong(0) == 1L && cont(0).getLong(1) == 2L)
    // the same pair is invisible at the equivalent Jaccard threshold:
    // union is dominated by the long doc
    val jac = Dedup.exactJaccardPairs(df, col("doc_id"), col("text"),
      shingleN = 8, threshold = 0.9).collect()
    assert(jac.isEmpty)
  }
}
