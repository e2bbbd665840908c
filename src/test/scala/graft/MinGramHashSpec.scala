package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns.{md5Hash54, shingles}
import graft.plans.GraftExtensions

/** The native min_gram_hash expression vs the composable HOF formulation
  * it replaced in TextAnalysis.fingerprint: bit-identical on real and
  * multi-byte documents, SQL registration, and the short/NULL edge. */
class MinGramHashSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val n = 8

  /** The pre-expression formulation, kept verbatim as the semantic
    * oracle: 8-gram windows → md5-derived hash → minimum. */
  private def hofMin(text: org.apache.spark.sql.Column) =
    array_min(transform(shingles(lower(text), n), g => md5Hash54(g)))

  test("native minimum is bit-identical to the HOF form on documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(col("doc_id"),
      GraftExtensions.minGramHash(lower(col("text")), n).as("native"),
      hofMin(col("text")).as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() == 0)
    assert(both.count() > 0)
  }

  test("multi-byte text matches (character windows, not byte windows)") {
    val df = Seq(
      (1L, "héllo wörld — ünïcode döcument body padding"),
      (2L, "ασδφ γηξκλ ζχψω βνμ θωερτ υθιοπ ςδφγη")).toDF("doc_id", "text")
    df.select(GraftExtensions.minGramHash(lower(col("text")), n).as("native"),
        hofMin(col("text")).as("hof"))
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("short and NULL documents yield NULL, like array_min(empty)") {
    val df = Seq((1L, Some("tiny")), (2L, None), (3L, Some("exactly8")))
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        GraftExtensions.minGramHash(lower(col("text")), n).as("h"))
      .orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1)) // 4 chars < n
    assert(rows(1).isNullAt(1)) // NULL text
    assert(!rows(2).isNullAt(1)) // exactly one window
  }

  test("registered as SQL function min_gram_hash via extension") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").createOrReplaceTempView("mgh_t")
    val viaSql = spark.sql(s"SELECT min_gram_hash(lower(text), $n) AS h FROM mgh_t")
      .head.getLong(0)
    val viaCol = spark.table("mgh_t")
      .select(GraftExtensions.minGramHash(lower(col("text")), n))
      .head.getLong(0)
    assert(viaSql == viaCol)
  }
}
