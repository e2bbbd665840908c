package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.operators.{Dedup, SkewJoin}
import graft.pipeline.{Enrichment, Warehouse}

/** Property-style invariants (SURVEY §5.3) over seeded random inputs:
  * normalization idempotence, salting result-transparency, LSH soundness
  * (found pairs ⊆ exact pairs), dim-upsert idempotence + key stability,
  * display-name parse laws. Seeded generators rather than a ScalaCheck
  * driver: one Spark job per property, many cases per job. */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)
  private def randStr(n: Int): String = {
    val chars = "abcXYZ 123!@#,.\néü世"
    (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  test("normalise is idempotent and case/punct-insensitive (200 random strings)") {
    val strs = (0 until 200).map(_ => randStr(1 + rnd.nextInt(40))).toDF("s")
    val bad = strs.select(
        TextFns.normalise(col("s")).as("once"),
        TextFns.normalise(TextFns.normalise(col("s"))).as("twice"),
        TextFns.normalise(upper(col("s"))).as("upper"))
      .filter(col("once") =!= col("twice") || col("once") =!= col("upper"))
    assert(bad.count() == 0)
  }

  test("salted join equals plain join; salted sum equals plain sum") {
    val big = (0 until 5000).map { i =>
      // heavy skew: 80% of rows hit key 0
      (i.toLong, if (rnd.nextInt(5) < 4) 0L else rnd.nextInt(20).toLong,
        rnd.nextInt(1000).toDouble)
    }.toDF("row_id", "k", "v")
    val small = (0L until 20L).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = big.join(small, "k").groupBy("name")
      .agg(sum("v").as("t"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", col("row_id"), 8)
      .groupBy("name").agg(sum("v").as("t"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
    val plainSum = big.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val saltedSum = SkewJoin.saltedSum(big, "k", col("v"), col("row_id"), 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(saltedSum.keySet == plainSum.keySet)
    saltedSum.foreach { case (k, v) =>
      assert(math.abs(v - plainSum(k)) < 1e-6 * math.max(1.0, math.abs(v)))
    }
  }

  test("LSH near-dup pairs are a subset of exact-jaccard pairs at the same threshold") {
    val base = (0 until 12).map(_ => randStr(60))
    val docs = (0 until 60).map { i =>
      val t = if (i % 3 == 0) base(i % 12) + randStr(3) else randStr(60)
      (i.toLong, t.replace("\n", " "))
    }.toDF("doc_id", "text")
    val lsh = Dedup.nearDupPairs(docs, col("doc_id"), col("text"), 8, 8, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.exactJaccardPairs(docs, col("doc_id"), col("text"), 8, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty && lsh.nonEmpty) // planted clusters found
  }

  test("upsertDim is idempotent and never remints existing keys") {
    val d0 = Seq.empty[(Int, String)].toDF("k", "name")
    val in1 = Seq("b", "a", "c").toDF("name")
    val d1 = Warehouse.upsertDim(d0, in1, "k", Seq("name"))
    val d2 = Warehouse.upsertDim(d1, in1, "k", Seq("name"))        // replay
    val d3 = Warehouse.upsertDim(d2, Seq("c", "d").toDF("name"), "k", Seq("name"))
    assert(d1.collect().map(r => (r.getString(1), r.getInt(0))).toSet ==
      Set(("a", 1), ("b", 2), ("c", 3)))
    assert(d2.collect().toSet == d1.collect().toSet)
    assert(d3.filter(col("name") === "d").head.getInt(0) == 4)
    assert(d3.count() == 4)
  }

  test("parseDisplayName handles comma, multi-token, and single-token forms") {
    val parsed = Seq("Curie, Marie", "Marie Sklodowska Curie", "Plato", " Doe ,  Jane ")
      .toDF("n")
      .select(Enrichment.parseDisplayName(col("n")).as("p"))
      .select(col("p.family"), col("p.given")).collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(parsed(0) == ("Curie", Some("Marie")))
    assert(parsed(1) == ("Curie", Some("Marie Sklodowska")))
    assert(parsed(2) == ("Plato", None))
    assert(parsed(3) == ("Doe", Some("Jane")))
  }
}
