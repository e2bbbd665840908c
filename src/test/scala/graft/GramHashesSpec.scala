package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns.{md5Hash54, shingles}
import graft.plans.GraftExtensions

class GramHashesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val n = 12
  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "aaaaaaaaaaaaaaaaaaaaaaaa"),            // heavy in-doc duplicates
    (2L, "héllo wörld — ünïcode text with füll windows here"), // non-ASCII path
    (3L, "short"),                                // < n chars -> no rows
    (4L, "")                                      // empty -> no rows
  ).toDF("doc_id", "text")

  private def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("gram_hashes is set-equal to the HOF shingle->md5Hash54 chain") {
    val hof = sets(docs
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .select(col("doc_id"), explode(shingles(col("lt"), n)).as("g"))
      .select(col("doc_id"), md5Hash54(col("g")).as("gh")))
    val native = sets(docs.select(col("doc_id"),
      explode(GraftExtensions.gramHashes(lower(col("text")), n)).as("gh")))
    assert(native == hof)
    assert(!native.contains(3L) && !native.contains(4L)) // short/empty drop
    assert(native(1L).size < 13)  // duplicates collapsed
  }
}
