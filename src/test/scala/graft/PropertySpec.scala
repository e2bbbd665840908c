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

  test("asofJoin equals the naive latest-at-or-before subquery (random)") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val right = (0 until 120).map(_ => (rnd.nextInt(10).toLong,
        ts(rnd.nextInt(100).toLong)))
      .distinct.zipWithIndex
      .map { case ((k, t), i) => (k, t, s"v$i") }
      .toDF("user_id", "t", "v")
    val left = (0 until 300).map(i =>
        (i.toLong, rnd.nextInt(12).toLong, ts(rnd.nextInt(110).toLong)))
      .toDF("event_id", "user_id", "t")
    val got = operators.TemporalJoins
      .asofJoin(left, right, "user_id", "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    val naive = left.join(right
          .select(col("user_id").as("rk"), col("t").as("rt"), col("v")),
        col("user_id") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy(col("event_id"))
      // when() nulls the struct for unmatched rows — max ignores nulls;
      // a bare struct(null, null) would be a NON-null struct and win
      .agg(max(when(col("rt").isNotNull, struct(col("rt"), col("v")))).as("m"))
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some(r.getStruct(1).getString(1)))
      }.toMap
    assert(got == naive)
  }

  test("rangeJoinBinned equals the naive inequality join (random bins)") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // window spans 1..1500 s across 600 s bins: 1-, 2-, and 3-bin cases
    val windows = (0 until 60).map { i =>
      val start = rnd.nextInt(3000).toLong
      (i.toLong, ts(start), ts(start + 1 + rnd.nextInt(1500)))
    }.toDF("win_id", "w_start", "w_end")
    val points = (0 until 400).map(i =>
      (i.toLong, ts(rnd.nextInt(4000).toLong))).toDF("p_id", "p_t")
    val got = operators.TemporalJoins
      .rangeJoinBinned(windows, points, "p_t", 600L)
      .select(col("win_id"), col("p_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = windows.join(points,
        col("p_t") >= col("w_start") && col("p_t") < col("w_end"))
      .select(col("win_id"), col("p_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.sameElements(naive.sorted)) // incl. multiplicity
  }

  test("two-pass global ranks equal their windows on random ties+nulls") {
    import org.apache.spark.sql.expressions.Window
    val data = (0 until 400).map(i => (i.toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(25) * 0.5)))
      .toDF("id", "v")
    spark.conf.set("spark.graft.globalRankRewrite", "false")
    val (denseExp, rankExp) = try {
      (data.withColumn("r", dense_rank().over(Window.orderBy(col("v").desc)))
         .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap,
       data.withColumn("r", rank().over(Window.orderBy(col("v").desc)))
         .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap)
    } finally spark.conf.set("spark.graft.globalRankRewrite", "true")
    val denseGot = operators.Ranking.globalDenseRankCols(data, Seq("v"), "r")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rankGot = operators.Ranking.globalRankCols(data, Seq("v"), "r")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(denseGot == denseExp)
    assert(rankGot == rankExp)
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
