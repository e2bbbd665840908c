package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns.{md5Hash54, shingles}
import graft.operators.Dedup
import graft.plans.GraftExtensions

/** The native minhash_sig expression vs the composable HOF formulation:
  * bit-identical minima on real documents, SQL registration, and the
  * short/NULL-document edge (NULL signature, like array_min(empty)). */
class MinHashSignatureSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val n = 8
  private val k = 8

  /** The pre-expression formulation, kept verbatim as the semantic oracle:
    * distinct shingles → md5-derived 54-bit hash → k xor/mul/mask minima. */
  private def hofSignature(text: org.apache.spark.sql.Column) = {
    val harr = transform(shingles(lower(text), n), s => md5Hash54(s))
    (0 until k).map { i =>
      array_min(transform(harr,
        h => ((h.bitwiseXOR(lit(Dedup.saltXor(i)))) * lit(Dedup.saltMul(i)))
          .bitwiseAND(lit(Dedup.hashMask)))).as(s"hof$i")
    }
  }

  test("native minima are bit-identical to the HOF formulation on documents") {
    val docs = Tables.documents(spark, dir)
    val both = docs.select(
      Seq(col("doc_id"),
        GraftExtensions.minhashSig(lower(col("text")), n, k).as("sig")) ++
        hofSignature(col("text")): _*)
    val mismatched = both.filter(
      (0 until k).map(i =>
        !(element_at(col("sig"), i + 1) <=> col(s"hof$i"))).reduce(_ || _))
    assert(mismatched.count() == 0)
    // and the corpus genuinely exercised the path
    assert(both.count() > 0)
  }

  test("multi-byte text matches the HOF path (character-based shingles)") {
    val df = Seq(
      (1L, "héllo wörld — ünïcode döcument body padding"),
      (2L, "ασδφ γηξκλ ζχψω βνμ θωερτ υθιοπ ςδφγη")).toDF("doc_id", "text")
    val both = df.select(
      Seq(GraftExtensions.minhashSig(lower(col("text")), n, k).as("sig")) ++
        hofSignature(col("text")): _*)
    both.collect().foreach { r =>
      val sig = r.getSeq[Long](0)
      (0 until k).foreach(i => assert(sig(i) == r.getLong(i + 1)))
    }
  }

  test("short and NULL documents yield NULL minima, like array_min(empty)") {
    val df = Seq((1L, Some("tiny")), (2L, None), (3L, Some("exactly8")))
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        GraftExtensions.minhashSig(lower(col("text")), n, k).as("sig"))
      .orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1)) // 4 chars < n
    assert(rows(1).isNullAt(1)) // NULL text
    assert(!rows(2).isNullAt(1) && rows(2).getSeq[Long](1).size == k)
  }

  test("registered as SQL function minhash_sig via extension") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").createOrReplaceTempView("mh_t")
    val viaSql = spark.sql(s"SELECT minhash_sig(lower(text), $n, $k) AS s FROM mh_t")
      .head.getSeq[Long](0)
    val viaCol = spark.table("mh_t")
      .select(GraftExtensions.minhashSig(lower(col("text")), n, k))
      .head.getSeq[Long](0)
    assert(viaSql == viaCol)
  }
}
