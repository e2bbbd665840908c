package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnalyticsQueries

class AnalyticsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct stays inside the 4·rsd bound per event type") {
    val rows = AnalyticsQueries.queries("sketch_approx_distinct")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"${r.getString(0)}: exact=${r.getLong(1)} outside 4·rsd bound")
    }
    // exact_users must really be the exact distinct count
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("deterministic HLL: sane estimates, exact column exact, reruns identical") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("g" + (i % 2), "user" + (i % 300)))
      .toDF("event_type", "user_id")
    def run() = graft.operators.Sketches
      .hllDistinct(df, col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(5)))
      .sortBy(_._1).toSeq
    val rows = run()
    rows.foreach { case (g, exact, est) =>
      // m=64 rsd ≈ 13%; 3σ envelope
      assert(math.abs(est - exact) <= exact * 0.4,
        s"$g: est $est vs exact $exact")
    }
    assert(rows == run(), "HLL estimate must be bit-identical across runs")
    // tiny cardinality lands in linear-counting mode and stays tight
    val one = graft.operators.Sketches
      .hllDistinct(Seq(("g", "u1")).toDF("event_type", "user_id"),
        col("event_type"), col("user_id")).head
    assert(math.abs(one.getDouble(5) - 1.0) < 0.1)
  }

  test("HLL registers merge associatively: shard-merge == whole-corpus") {
    import spark.implicits._
    import graft.operators.Sketches
    val df = (1 to 600).map(i => ("g" + (i % 2), "user" + (i % 250)))
      .toDF("event_type", "user_id")
    // split into 3 overlapping shards (overlap is the hard case — max
    // absorbs duplicates, a counter-based sketch would double-count)
    val shards = (0 until 3).map(k => df.filter(col("user_id").isNotNull)
      .where(expr(s"pmod(crc32(user_id), 4) <= ${k + 1}")))
    val whole = shards.reduce(_ unionByName _)
    val direct = Sketches
      .estimateFromRegisters(Sketches.registers(whole,
        col("event_type"), col("user_id")))
      .collect().map(r => (r.getString(0), r.getDouble(3))).sortBy(_._1).toSeq
    val merged = Sketches
      .estimateFromRegisters(Sketches.mergeRegisters(shards.map(s =>
        Sketches.registers(s, col("event_type"), col("user_id")))))
      .collect().map(r => (r.getString(0), r.getDouble(3))).sortBy(_._1).toSeq
    assert(direct.nonEmpty && direct == merged,
      "merged shard registers must estimate identically to the union")
  }

  test("count-min merge is exact: shard-merged cells == whole-corpus cells") {
    import spark.implicits._
    import graft.operators.Sketches
    val df = (1 to 600).map(i => ("g" + (i % 2), (i % 97).toLong))
      .toDF("event_type", "user_id")
    // DISJOINT shards: counters sum, so merge == build-on-union exactly
    val shards = (0 until 3).map(k => df.where(expr(s"user_id % 3 = $k")))
    val whole = shards.reduce(_ unionByName _)
    def cells(regs: org.apache.spark.sql.DataFrame) = regs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val direct = cells(Sketches.cmRegisters(whole,
      col("event_type"), col("user_id")))
    val merged = cells(Sketches.cmMerge(shards.map(s =>
      Sketches.cmRegisters(s, col("event_type"), col("user_id")))))
    assert(direct.nonEmpty && direct == merged,
      "CM cell counts must merge to exactly the union's cells")
  }

  test("count-min estimates are one-sided: estimate >= exact, bounded overcount") {
    val rows = AnalyticsQueries.queries("sketch_cm_exact")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val n = Tables.events(spark, dir).count()
    rows.foreach { r =>
      val (exact, est) = (r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CM must never undercount: $r")
      // ε = e/w per the CM bound; 2n/w is a generous deterministic check
      assert(est - exact <= 2 * n / graft.operators.Sketches.CmWidth,
        s"CM overcount implausibly large: $r (n=$n)")
    }
  }

  test("Misra-Gries: estimates one-sided within the bound; merge keeps it; heavy keys never drop") {
    import spark.implicits._
    import graft.operators.Sketches
    // zipf-ish: key j appears ~600/j times — real heavy hitters up top,
    // a long flat tail underneath
    val rows = (1 to 60).flatMap(j => Seq.fill(600 / j)(("g", j.toLong)))
    val df = rows.toDF("event_type", "user_id")
    val n = rows.size.toLong
    val exact = rows.groupBy(_._2).map { case (k, v) => k.toString -> v.size.toLong }
    val k1 = (Sketches.MgK + 1).toLong

    // build: ≤ k counters, est ∈ [f − n/(k+1), f], f > n/(k+1) present
    val built = Sketches.mgSummary(df, col("event_type"), col("user_id"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(built.nonEmpty && built.size <= Sketches.MgK)
    built.foreach { case (key, est) =>
      val f = exact(key)
      assert(est <= f && est >= f - n / k1, s"MG bound broken: $key est=$est f=$f")
    }
    exact.filter(_._2 * k1 > n).keys.foreach(key =>
      assert(built.contains(key), s"guaranteed heavy key $key dropped"))

    // merge of 3 disjoint shards: counters within the summed-shards
    // bound, guaranteed keys still never drop
    val shards = (0 until 3).map(s => df.where(expr(s"user_id % 3 = $s")))
    val merged = Sketches.mgMerge(shards.map(s =>
        Sketches.mgSummary(s, col("event_type"), col("user_id"))))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(merged.nonEmpty && merged.size <= Sketches.MgK)
    merged.foreach { case (key, est) =>
      val f = exact(key)
      // Σ nᵢ = n, and the merge re-trim adds one more λ' ≤ n/(k+1)
      assert(est <= f && est >= f - 2 * n / k1,
        s"MG merge bound broken: $key est=$est f=$f")
    }
    exact.filter(_._2 * k1 > 2 * n).keys.foreach(key =>
      assert(merged.contains(key), s"heavy key $key dropped by merge"))

    // weighted form: one row per key with weight 600/j — the same skew
    // by MEASURE SUM; bounds scale by total weight W
    val wdf = (1 to 60).map(j => ("g", j.toLong, (600 / j).toLong))
      .toDF("event_type", "user_id", "w")
    val totalW = (1 to 60).map(j => (600 / j).toLong).sum
    val wBuilt = Sketches.mgWeightedSummary(wdf, col("event_type"),
        col("user_id"), col("w"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(wBuilt.nonEmpty && wBuilt.size <= Sketches.MgK)
    wBuilt.foreach { case (key, est) =>
      val s = (600 / key.toInt).toLong
      assert(est <= s && est >= s - totalW / k1,
        s"weighted MG bound broken: $key est=$est s=$s")
    }
    (1 to 60).filter(j => (600L / j) * k1 > totalW).foreach(j =>
      assert(wBuilt.contains(j.toString),
        s"guaranteed heavy-weight key $j dropped"))
  }

  test("Bloom: merge == build-on-union exactly; no false negatives") {
    import spark.implicits._
    import graft.operators.Sketches
    val df = (1 to 600).map(i => ("g" + (i % 2), ((i * 7) % 350).toLong))
      .toDF("event_type", "user_id")
    // overlapping shards (the hard case for a counter sketch; the bloom's
    // distinct-union merge is idempotent so overlap must be a no-op)
    val shards = (0 until 3).map(k =>
      df.where(expr(s"pmod(crc32(CAST(user_id AS STRING)), 4) <= ${k + 1}")))
    val whole = shards.reduce(_ unionByName _)
    def bits(regs: org.apache.spark.sql.DataFrame) = regs.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = bits(Sketches.bfRegisters(whole,
      col("event_type"), col("user_id")))
    val merged = bits(Sketches.bfMerge(shards.map(s =>
      Sketches.bfRegisters(s, col("event_type"), col("user_id")))))
    assert(direct.nonEmpty && direct == merged,
      "bloom bit sets must merge to exactly the union's bits")
    // no false negatives on the oracle query's own output
    val rows = AnalyticsQueries.queries("sketch_bloom")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mc, member) = (r.getBoolean(2), r.getBoolean(3))
      assert(mc || !member, s"bloom false negative: $r")
    }
  }

  test("Bloom semi-join prune: transparent result, probe rows actually dropped") {
    import graft.operators.Sketches
    val probe = Tables.orders(spark, dir)
    val build = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
    val exact = probe.join(
        build.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val viaBloom = Sketches
      .bloomSemiJoin(probe, "o_custkey", build, "c_custkey")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact, "bloom prune must be semantically transparent")
    // the A/B the prune exists for: the bloom alone keeps a superset of
    // the true matches but drops a real share of the probe side
    val regs = Sketches.bfRegisters(build, lit(0L), col("c_custkey"))
      .select(col("b"))
    val total = probe.count()
    val surviving = Sketches.bloomPrune(probe, "o_custkey", regs).count()
    assert(surviving >= exact.size.toLong,
      "prune may never drop a true match")
    assert(surviving < total,
      s"bloom prune dropped nothing ($surviving of $total probe rows kept)")
  }

  test("Bloom semi-join: saturated filter skips the prune, result unchanged") {
    // ADVICE r12: at k·n >> m the filter's fill fraction → 1 and the
    // prune keeps ~everything while still paying BfK broadcast joins;
    // bloomSemiJoin now probes the fill and skips the prune past
    // BfMaxFill. Observable in the plan: the pruned shape carries
    // 1 + BfK joins, the saturated shape exactly 1 (the exact semi).
    import graft.operators.Sketches
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    val probe = spark.range(0, 4000).toDF("k")
    // 50k distinct build keys: fill ≈ 1 − e^(−4·50000/65536) ≈ 0.95
    val saturated = spark.range(0, 50000).toDF("bk")
    val sat = Sketches.bloomSemiJoin(probe, "k", saturated, "bk")
    assert(joins(sat) == 1, "saturated filter must skip the bloom prune")
    assert(sat.count() == 4000) // all probe keys < 50000 really join
    // small build side: prune runs (1 exact + BfK bloom semis)
    val small = spark.range(0, 100).toDF("bk")
    val pruned = Sketches.bloomSemiJoin(probe, "k", small, "bk")
    assert(joins(pruned) == 1 + Sketches.BfK,
      "unsaturated filter must keep the bloom prune")
    assert(pruned.count() == 100)
  }

  test("priority sample: key-disjoint shard merge == whole-corpus sample; estimates one-sided") {
    import spark.implicits._
    import graft.operators.Sketches
    // 300 keys across 2 groups with skewed weights — more keys than
    // PsK, so the trim and the threshold row are both exercised
    val df = (1 to 3000).map { i =>
      ("g" + (i % 2), (i % 300).toLong, ((i % 7) + 1L) * (i % 300 + 1L))
    }.toDF("grp_in", "key_in", "w_in")
    def sample(d: org.apache.spark.sql.DataFrame) =
      Sketches.psSample(d, col("grp_in"), col("key_in"), col("w_in"))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // key-disjoint shards (the JACM model: each item once) — the merge
    // must equal the whole-corpus sample EXACTLY, state row for state row
    val shards = (0 until 3).map(k => df.where(col("key_in") % 3 === k))
    val whole = rows(sample(df))
    val merged = rows(Sketches.psMerge(shards.map(sample)))
    assert(whole.nonEmpty && whole == merged,
      "key-disjoint shard merge must equal the whole-corpus sample")
    // state is (k+1)-bounded per group; estimates expose k rows
    assert(whole.keys.groupBy(_._1).values.forall(_.size <= Sketches.PsK + 1))
    val est: Seq[((String, String), Long, Double)] =
      Sketches.psEstimates(sample(df)).collect().toIndexedSeq
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(3)))
    assert(est.map(_._1).groupBy(_._1).values.forall(_.size <= Sketches.PsK))
    // one-sided: ŵ = max(w, τ) ≥ w for every sampled key
    est.foreach { case (gk, w, e) =>
      assert(e >= w.toDouble, s"estimate below true weight for $gk")
    }
    // a group with ≤ PsK distinct keys has no threshold row: exact
    val tiny = (1 to 200).map(i => ("t", (i % 10).toLong, 5L))
      .toDF("grp_in", "key_in", "w_in")
    Sketches.psEstimates(sample(tiny)).collect().foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble,
        "under-k group must estimate exactly")
    }
  }

  test("VarOpt sample: ~k rows, heavy exact, light at tau >= w, subset sums near-unbiased") {
    import spark.implicits._
    import graft.operators.Sketches
    // 300 keys across 2 groups, skewed — well above VoK, so the
    // heavy/light split and the systematic pick both bind
    val df = (1 to 3000).map { i =>
      ("g" + (i % 2), (i % 300).toLong, ((i % 7) + 1L) * (i % 300 + 1L))
    }.toDF("grp_in", "key_in", "w_in")
    val s = Sketches.varOptSample(df, col("grp_in"), col("key_in"),
        col("w_in")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byGrp = s.groupBy(_._1)
    // ~k rows per group (grid rounding can move the pick count by ±1)
    byGrp.values.foreach(rows => assert(
      rows.size >= Sketches.VoK - 1 && rows.size <= Sketches.VoK + 1,
      s"sample size ${rows.size} not ~VoK"))
    // every estimate is >= its weight (heavy: est == w; light: est == τ,
    // and only w <= τ keys are light)
    s.foreach { case (g, k, w, e) =>
      assert(e >= w.toDouble - 1e-9, s"estimate below weight for ($g,$k)") }
    // τ is a single value per group: the distinct non-exact estimates
    byGrp.foreach { case (g, rows) =>
      val taus = rows.collect { case (_, _, w, e) if e != w.toDouble => e }
      assert(taus.distinct.size <= 1, s"light estimates in $g must share τ")
    }
    // near-unbiasedness of the one deterministic draw: Σŵ within 10% of
    // the true total per group (systematic pick ⇒ deviation ≤ ~2τ)
    val tot = df.groupBy(col("grp_in"))
      .agg(org.apache.spark.sql.functions.sum(col("w_in")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byGrp.foreach { case (g, rows) =>
      val est = rows.map(_._4).sum
      assert(math.abs(est - tot(g)) <= 0.1 * tot(g),
        s"subset-sum estimate off >10% in $g: $est vs ${tot(g)}")
    }
    // a group with <= VoK keys is kept whole, exactly
    val tiny = (1 to 200).map(i => ("t", (i % 10).toLong, 5L))
      .toDF("grp_in", "key_in", "w_in")
    val ts = Sketches.varOptSample(tiny, col("grp_in"), col("key_in"),
      col("w_in")).collect()
    assert(ts.length == 10)
    ts.foreach(r => assert(r.getDouble(3) == r.getLong(2).toDouble,
      "under-k group must be kept exactly"))
  }

  test("KMV: merge is a semilattice (shard-merge == whole-corpus), Jaccard estimator sane") {
    import spark.implicits._
    import graft.operators.Sketches
    val df = (1 to 900).map(i => ("g" + (i % 3), ((i * 13) % 400).toLong))
      .toDF("event_type", "user_id")
    // OVERLAPPING shards — the hard case for a merge (k-smallest-of-union
    // must absorb duplicates, a counter merge would not)
    val shards = (0 until 3).map(k =>
      df.where(expr(s"pmod(crc32(CAST(user_id AS STRING)), 4) <= ${k + 1}")))
    val whole = shards.reduce(_ unionByName _)
    def regSet(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    val direct = regSet(Sketches.kmvRegisters(whole,
      col("event_type"), col("user_id")))
    val merged = regSet(Sketches.kmvMerge(shards.map(s =>
      Sketches.kmvRegisters(s, col("event_type"), col("user_id")))))
    assert(direct.nonEmpty && direct == merged,
      "k smallest of merged shards must equal the whole corpus's registers")
    // distinct estimate within the KMV rsd envelope (~1/sqrt(k-2) ≈ 13%)
    Sketches.kmvDistinct(whole, col("event_type"), col("user_id"))
      .collect().foreach { r =>
        val (exact, est) = (r.getLong(1), r.getDouble(4))
        assert(math.abs(est - exact) <= exact * 0.5,
          s"KMV distinct estimate implausible: $r")
      }
    // Jaccard estimate within a generous minwise-sampling envelope, and
    // the exact columns really exact
    Sketches.kmvJaccard(whole, col("event_type"), col("user_id"))
      .collect().foreach { r =>
        val (jEst, jExact) = (r.getDouble(4), r.getDouble(7))
        assert(math.abs(jEst - jExact) <= 0.35,
          s"KMV Jaccard estimate implausible: $r")
        assert(r.getLong(5) <= r.getLong(6),
          s"intersection exceeds union: $r")
      }
  }

  test("q-digest: one-sided estimates within the published rank bound, merge holds it too") {
    import spark.implicits._
    import graft.operators.Sketches
    // skewed integer distribution with a heavy value and a long tail
    val vals = ((1 to 3000).map(_ => 5000L) ++
      (1 to 3000).map(i => (i * 37 % 100000).toLong))
      .zipWithIndex.map { case (v, i) => ("g" + (i % 2), v) }
    val df = vals.toDF("grp_in", "v_in")
    val qs = Seq((1, 4), (1, 2), (9, 10))
    val est = Sketches.qdigestQuantiles(df, col("grp_in"), col("v_in"), qs)
      .collect()
    assert(est.length == qs.size * 2)
    val byGrp = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def trueRankUpTo(g: String, x: Long) = byGrp(g).count(_ <= x).toLong
    // duplicates at the answer value all share its rank interval, so the
    // overshoot bound is on the STRICTLY-below count: some rank position
    // in [rank, rank+εn] must hold the answer value
    def trueRankBelow(g: String, x: Long) = byGrp(g).count(_ < x).toLong
    est.foreach { r =>
      val (g, rank, e, exact) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      val n = byGrp(g).size.toLong
      assert(e >= exact, s"q-digest answer must not undershoot the rank: $r")
      // the value's rank interval starts within εn of the target rank
      assert(trueRankBelow(g, e) - (rank - 1) <=
        Sketches.QdL.toLong * n / Sketches.QdK + 1,
        s"rank error beyond the q-digest bound: $r")
    }
    // merge two disjoint halves: counts sum, recompress under combined n,
    // and the merged digest must satisfy the same bound on the union
    val halves = (0 until 2).map(k => df.where(expr(s"v_in % 2 = $k")))
    def leavesAndTot(h: org.apache.spark.sql.DataFrame) = {
      val v = h.select(col("grp_in").as("grp"), col("v_in").as("id"))
      (v.groupBy(col("grp"), col("id")).agg(count(lit(1)).as("cnt"))
        .select(col("grp"), lit(0).cast("int").as("lvl"), col("id"), col("cnt")),
        v.groupBy(col("grp")).agg(count(lit(1)).as("n")))
    }
    val parts = halves.map(leavesAndTot)
    val mergedDigest = Sketches.qdMerge(parts.map(p =>
      Sketches.qdCompress(p._1, p._2)), parts.map(_._2))
    val totAll = df.groupBy(col("grp_in").as("grp"))
      .agg(count(lit(1)).as("n"))
    val mergedEst = Sketches.qdQuantiles(mergedDigest, totAll, qs).collect()
    assert(mergedEst.length == qs.size * 2)
    mergedEst.foreach { r =>
      val (g, q, e) = (r.getString(0), r.getString(1), r.getLong(2))
      val n = byGrp(g).size.toLong
      val Array(num, den) = q.split("/").map(_.toLong)
      val rank = (n * num + den - 1) / den
      assert(trueRankUpTo(g, e) >= rank,
        s"merged q-digest undershoots rank $rank: grp=$g q=$q est=$e")
      assert(trueRankBelow(g, e) - (rank - 1) <=
        2 * Sketches.QdL.toLong * n / Sketches.QdK + 2,
        s"merged q-digest beyond the 2-merge rank bound: grp=$g q=$q est=$e")
    }
  }

  test("exact p90 crossing on a hand-built distribution") {
    import spark.implicits._
    // 10 values 1..10 in one group: k = ⌈0.9·10⌉ = 9 → p90 = 9
    val orders = (1 to 10).map(i => ("G", i.toDouble))
      .toDF("o_orderstatus", "o_totalprice")
    val hist = orders.groupBy(col("o_orderstatus"), col("o_totalprice"))
      .agg(count(lit(1)).as("c"))
    val byS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
    val w = byS.orderBy(col("o_totalprice"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val p90 = hist.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(byS))
      .withColumn("k", expr("(9 * n + 9) DIV 10"))
      .filter(col("cum") - col("c") < col("k") && col("k") <= col("cum"))
      .select(col("o_totalprice")).head.getDouble(0)
    assert(p90 == 9.0)
  }

  test("qdCompress single-pass == per-round reference semantics (r17)") {
    // The r17 in-memory collapse must reproduce the r11 distributed
    // loop's rounds EXACTLY — checked against an independent per-round
    // reference implementation here, on a MERGE-shaped input (level-0
    // leaves plus pre-existing parents at several levels, two groups
    // with different thresholds).
    import spark.implicits._
    import graft.operators.Sketches
    val rnd = new scala.util.Random(7)
    val nodes = (for {
      g <- Seq("a", "b")
      i <- 1 to 300
    } yield {
      val lvl = if (i % 5 == 0) 1 + rnd.nextInt(4) else 0
      (g, lvl, rnd.nextInt(1 << (Sketches.QdL - lvl)).toLong,
        1L + rnd.nextInt(9))
    }).toDF("grp", "lvl", "id", "cnt")
      .groupBy("grp", "lvl", "id").agg(sum("cnt").as("cnt"))
    val tot = Seq(("a", 900L), ("b", 64L)).toDF("grp", "n")
    val got = Sketches.qdCompress(nodes, tot)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    // reference: the original round-by-round collapse, plain Scala
    val in = nodes.collect().map(r => (r.getString(0), r.getInt(1),
      r.getLong(2), r.getLong(3)))
    val ref = Seq("a", "b").flatMap { g =>
      val n = Map("a" -> 900L, "b" -> 64L)(g)
      val t = math.max(1L, n / Sketches.QdK)
      var active = in.filter(r => r._1 == g && r._2 == 0)
        .map(r => (r._3, r._4)).toBuffer
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, Long)]
      for (l <- 0 until Sketches.QdL) {
        val pmap = in.filter(r => r._1 == g && r._2 == l + 1)
          .map(r => r._3 -> r._4).toMap
        val fam = active.groupBy(_._1 >> 1)
        val next = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        (fam.keySet ++ pmap.keySet).toSeq.sorted.foreach { pid =>
          val children = fam.getOrElse(pid, Seq.empty)
          val fsum = children.map(_._2).sum + pmap.getOrElse(pid, 0L)
          if (fsum > t) {
            children.foreach { case (id, c) => out += ((g, l, id, c)) }
            pmap.get(pid).foreach(pc => next += ((pid, pc)))
          } else next += ((pid, fsum))
        }
        active = next
      }
      active.foreach { case (id, c) => out += ((g, Sketches.QdL, id, c)) }
      out
    }.sorted
    assert(got == ref)
  }

  test("voStateSharded slices == independent per-shard voState (r17)") {
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, dir)
    val sharded = Sketches.voStateSharded(li,
        pmod(col("l_orderkey"), lit(2)), col("l_returnflag"),
        col("l_suppkey"), floor(col("l_extendedprice")).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val separate = Seq(0L, 1L).flatMap { p =>
      Sketches.voState(
          li.filter(pmod(col("l_orderkey"), lit(2)) === p),
          col("l_returnflag"), col("l_suppkey"),
          floor(col("l_extendedprice")).cast("long"))
        .collect()
        .map(r => (p, r.getString(0), r.getString(1), r.getLong(2)))
    }.toSet
    assert(sharded == separate)
  }

  test("rollup produces leaf+subtotal+grand-total levels") {
    val rows = AnalyticsQueries.queries("rollup_orders")(spark, dir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getLong(2) == Tables.orders(spark, dir).count())
    assert(subtotals.nonEmpty)
    // each year subtotal equals the sum of its leaves
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    subtotals.foreach { st =>
      val y = st.getInt(0)
      val leafSum = leaves.filter(_.getInt(0) == y).map(_.getLong(2)).sum
      assert(st.getLong(2) == leafSum, s"year $y subtotal")
    }
  }
}
