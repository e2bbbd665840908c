package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextAnalysis}

/** The dataset-mixing and repetition gates: hand-computed answers plus
  * the properties a mixing gate must hold (determinism, rate-nesting). */
class PipelineGatesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("stratified sampling: deterministic, nested under rate increase") {
    val rows = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    def keep(rates: Map[String, Double]) =
      Sampling.stratified(rows, col("id"), col("s"), rates, "t1")
        .collect().map(_.getLong(0)).toSet
    val half = keep(Map("a" -> 0.5, "b" -> 0.0))
    // determinism: the same call keeps the same rows
    assert(keep(Map("a" -> 0.5, "b" -> 0.0)) == half)
    // stratum b at rate 0 contributes nothing; a-rate 0.5 keeps roughly half
    assert(half.forall(_ % 2 == 0))
    assert(half.size > 60 && half.size < 140, s"rate far off: ${half.size}/200")
    // nesting: raising a rate with the same salt keeps a superset
    val more = keep(Map("a" -> 0.8, "b" -> 0.0))
    assert(half.subsetOf(more))
    // unknown strata drop
    assert(keep(Map("zz" -> 1.0)).isEmpty)
  }

  test("packSequences matches the single-window form, no global window") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 300L).map(i => (i, (i % 7) + 1)).toDF("id", "n")
    val expected = df.withColumn("so", coalesce(
        sum(col("n")).over(Window.orderBy(col("id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val packed = graft.operators.Packing.packSequences(df, "id", "n",
      budget = 10, parts = 7)
    val got = packed.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("stream_offset"), r.getAs[Long]("seq_id")))
      .toMap
    assert(got.view.mapValues(_._1).toMap == expected)
    assert(got.forall { case (_, (so, seq)) => seq == so / 10 })
    // the whole point: the two-pass plan never builds an unpartitioned
    // window (same assert as RankingSpec's)
    val plan = packed.queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    assert("""windowspecdefinition\([^,]*(ASC|DESC)""".r
      .findFirstIn(plan).isEmpty, s"global window in plan:\n$plan")
  }

  test("bm25TopK matches the closed-form score and ranks tf/idf sanely") {
    // 5 docs; 'x' rare (df=1), 'y'/'z' df=2 (positive idf at n=5);
    // doc 1 has the most x's, docs 2/3 differ only in length
    val docs = Seq(
      (1L, "x x x y pad pad"),
      (2L, "z pad pad pad"),
      (3L, "z pad pad pad pad pad"),
      (4L, "pad pad pad"),
      (5L, "y pad")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("x", "y", "z"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // scala reference of the same exact-grid arithmetic
    val n = 5L; val dltot = 6L + 4L + 6L + 3L + 2L
    def idfFp(df: Long): Long =
      math.floor(math.log((2 * n - 2 * df + 1).toDouble /
        (2 * df + 1).toDouble) * 1e6 + 0.5).toLong
    def cFp(tf: Long, dl: Long, df: Long): Long =
      math.floor((idfFp(df).toDouble / 1e6) *
        ((22L * tf * dltot).toDouble /
          (10L * tf * dltot + 3L * dltot + 9L * dl * n).toDouble) *
        1e6 + 0.5).toLong
    val expected = Map(
      1L -> (cFp(3, 6, 1) + cFp(1, 6, 2)),
      2L -> cFp(1, 4, 2),
      3L -> cFp(1, 6, 2),
      5L -> cFp(1, 2, 2))
    assert(out.toMap == expected)
    // rare high-tf doc on top; doc 4 (no query terms) absent
    assert(out.head._1 == 1L)
    assert(!out.exists(_._1 == 4L))
    // shorter doc outranks longer at equal tf/df (length normalization)
    val byId = out.toMap
    assert(byId(2L) > byId(3L))
  }

  test("vocabulary top-k and OOV rate match hand computation") {
    val df = Seq(
      (1L, "a a a b b c"), // freq: a=3 b=2(+1 doc3) c=1(+1 doc3)
      (2L, ""),            // empty doc: 0 tokens, NULL rate
      (3L, "b c d")        // d is rank 4 -> OOV at k=3
    ).toDF("doc_id", "text")
    // corpus freq: a=3, b=3, c=2, d=1 -> top-3 = {a, b, c}
    val vocab = TextAnalysis.vocabulary(df, col("text"), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("a" -> 3L, "b" -> 3L, "c" -> 2L))
    val out = TextAnalysis.oovRate(df, col("doc_id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 6 && out(0).getLong(2) == 0 &&
      out(0).getDouble(3) == 0.0)
    assert(out(1).getLong(1) == 0 && out(1).getLong(2) == 0 &&
      out(1).isNullAt(3))
    assert(out(2).getLong(1) == 3 && out(2).getLong(2) == 1 &&
      math.abs(out(2).getDouble(3) - 1.0 / 3) < 1e-12)
    // tie at the k-th boundary breaks by token asc: k=2 keeps {a, b}
    val v2 = TextAnalysis.vocabulary(df, col("text"), 2)
      .collect().map(_.getString(0)).toSet
    assert(v2 == Set("a", "b"))
  }

  test("repetition signals match hand computation") {
    val df = Seq(
      (1L, "a b a b a"), // bigrams: ab,ba,ab,ba -> dup 0.5, top 0.5
      (2L, "x"),         // no bigrams -> 0 counts, NULL fractions
      (3L, "a a a")      // aa,aa -> dup 0.5, top 1.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4 && out(0).getLong(2) == 2)
    assert(out(0).getDouble(3) == 0.5 && out(0).getDouble(4) == 0.5)
    assert(out(1).getLong(1) == 0 && out(1).getLong(2) == 0)
    assert(out(1).isNullAt(3) && out(1).isNullAt(4))
    assert(out(2).getLong(1) == 2 && out(2).getLong(2) == 1)
    assert(out(2).getDouble(3) == 0.5 && out(2).getDouble(4) == 1.0)
  }

  test("temperature sampling: thresholds are sqrt(n_min/n_l), zh keeps all") {
    // 80/16/4 docs across en/de/zh: the alpha=1/2 boost rescaled to pure
    // downsampling reduces to thr_l = round(1e4 * sqrt(n_min / n_l))
    val docs = ((0 until 80).map(i => (i.toLong, "en")) ++
        (80 until 96).map(i => (i.toLong, "de")) ++
        (96 until 100).map(i => (i.toLong, "zh"))).toDF("doc_id", "lang")
    val rates = graft.operators.Sampling.temperatureRates(docs, col("lang"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rates == Map("en" -> ((80L, 2236L)), "de" -> ((16L, 5000L)),
      "zh" -> ((4L, 10000L))))
    val kept = graft.operators.Sampling.temperatureSample(docs,
        col("doc_id"), col("lang"), "t")
      .collect().map(r => r.getLong(0)).toSet
    // thr 10000 keeps every zh doc; en is downsampled hardest
    assert((96L until 100L).forall(kept.contains))
    val enKept = kept.count(_ < 80)
    assert(enKept > 0 && enKept < 40) // ~22% expected of 80
  }

  test("reservoir: deterministic smallest-hash k per stratum, stable across runs") {
    val docs = ((0 until 50).map(i => (i.toLong, "en")) ++
        (50 until 53).map(i => (i.toLong, "zh"))).toDF("doc_id", "lang")
    val r1 = graft.operators.Sampling.reservoir(docs, col("doc_id"),
        col("lang"), k = 5, "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val r2 = graft.operators.Sampling.reservoir(docs, col("doc_id"),
        col("lang"), k = 5, "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(r1.toSeq == r2.toSeq)                        // reproducible
    assert(r1.count(_._1 == "en") == 5)                 // bounded per stratum
    assert(r1.count(_._1 == "zh") == 3)                 // under-full stratum keeps all
    assert(r1.filter(_._1 == "zh").map(_._2).toSet == Set(50L, 51L, 52L))
    // a different salt draws a different en-sample
    val r3 = graft.operators.Sampling.reservoir(docs, col("doc_id"),
        col("lang"), k = 5, "other")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(r3 != r1.map(t => (t._1, t._2)).toSet)
  }

  test("curriculum: balanced phases, richest doc in phase 0") {
    val docs = (0 until 20).map(i =>
        (i.toLong, (0 to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val c = Sampling.curriculum(docs, col("doc_id"), col("text"), phases = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.get(2).toString.toLong, r.get(3).toString.toLong))).toMap
    // 20 docs / 4 phases = 5 per phase, scores strictly decreasing with id
    val sizes = c.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes == Map(0L -> 5, 1L -> 5, 2L -> 5, 3L -> 5))
    assert(c(19L) == ((1L, 0L)))  // richest doc: rank 1, phase 0
    assert(c(0L)._2 == 3L)        // poorest doc: last phase
  }

  test("trigram LM: conditionals sum to 1 per context, mixture in (0,1]") {
    val docs = Seq((1L, "a b c a b d"), (2L, "a b c")).toDF("doc_id", "text")
    val lm = TextAnalysis.trigramLm(docs, col("text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(4), r.getDouble(7)))
    // Σ_c P(c|a,b) ≤ 1 per context (mass missing only where the bigram
    // (a,b) ends a document and so has no continuation), and exactly 1
    // for (a,b), whose 3 corpus occurrences all continue (→ c twice, d).
    lm.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
      assert(g.map(_._4).sum <= 1.0 + 1e-12)
    }
    val ab = lm.filter(t => t._1 == "a" && t._2 == "b")
    assert(math.abs(ab.map(_._4).sum - 1.0) < 1e-12)
    assert(ab.map(_._3).toSet == Set("c", "d"))
    lm.foreach { t => assert(t._5 > 0.0 && t._5 <= 1.0) }
  }
}
