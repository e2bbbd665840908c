package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.streaming.StreamingSketches

/** The r11 mergeable sketches maintained BY a stream: per-micro-batch
  * register sets, batch-id-keyed idempotent commits, corpus-wide
  * estimates by register merge — asserted equal to the batch-at-once
  * sketch across a mid-stream restart. */
class StreamingSketchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def obs(seed: Int, n: Int) =
    (1 to n).map(i => ("g" + (i % 2), ((i * seed) % 97).toLong))
      .toDF("grp", "key")

  test("streamed sketch registers == batch-at-once across a mid-stream restart") {
    val src = Files.createTempDirectory("sk-src").toString
    val ck = Files.createTempDirectory("sk-ck").toString
    val state = Files.createTempDirectory("sk-state").toString
    val w1 = obs(7, 300)
    // wave 2 carries a genuinely heavy key (60 hits vs the ≤6 ambient)
    // so the MG assertions below are non-vacuous
    val w2 = obs(11, 400)
      .unionByName(Seq.fill(60)(("g0", 999L)).toDF("grp", "key"))

    w1.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.run(spark, src, ck, state)
    // mid-stream restart: wave 2 lands, SAME checkpoint — the source
    // resumes past wave 1's files
    w2.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.run(spark, src, ck, state)

    val whole = w1.unionByName(w2)
    val probes = whole.select(col("grp"), col("key").cast("string").as("key"))
      .distinct().filter(col("key").cast("long") % 10 === 0)

    // CM: sum-merged per-batch cells must equal the batch-at-once sketch
    // EXACTLY (cell for cell ⇒ estimate for estimate)
    val streamedCm = StreamingSketches.cmEstimateNow(spark, state, probes)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batchCm = Sketches.cmEstimate(
        Sketches.cmRegisters(whole, col("grp"), col("key")), probes)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamedCm.nonEmpty && streamedCm == batchCm,
      "streamed CM estimates must equal the batch-at-once sketch")

    // HLL: max-merged registers ⇒ identical estimate
    val streamedHll = StreamingSketches.hllEstimateNow(spark, state)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val batchHll = Sketches.estimateFromRegisters(
        Sketches.registers(whole, col("grp"), col("key")))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(streamedHll.nonEmpty && streamedHll == batchHll,
      "streamed HLL estimates must equal the batch-at-once sketch")

    // q-digest (r12): the streamed per-batch digests, merged, must equal
    // the SAME merge built in batch over the two waves — node for node,
    // estimate for estimate (the merge is deterministic; the rank-bound
    // contract vs exact is AnalyticsSpec's job)
    val qs = Seq((1, 4), (1, 2), (9, 10))
    val streamedQd = StreamingSketches.qdQuantilesNow(spark, state, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val (d1, t1) = Sketches.qdBuild(w1, col("grp"), col("key"))
    val (d2, t2) = Sketches.qdBuild(w2, col("grp"), col("key"))
    val tot = t1.unionByName(t2).groupBy(col("grp")).agg(sum(col("n")).as("n"))
    val batchQd = Sketches.qdQuantiles(
        Sketches.qdMerge(Seq(d1, d2), Seq(t1, t2)), tot, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamedQd.nonEmpty && streamedQd == batchQd,
      "streamed q-digest quantiles must equal the batch-built merge")

    // bloom (r12): distinct-union-merged streamed bits == batch-at-once
    // bits EXACTLY (idempotent merge), so verdicts match too
    val streamedBf = StreamingSketches
      .bloomMightContainNow(spark, state, probes)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    val batchBf = Sketches.bfMightContain(
        Sketches.bfRegisters(whole, col("grp"), col("key")), probes)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(streamedBf.nonEmpty && streamedBf == batchBf,
      "streamed bloom verdicts must equal the batch-at-once sketch")

    // Misra–Gries (r12): the streamed per-batch summaries, merged, must
    // equal the SAME merge built in batch over the two waves — counter
    // for counter (the merge is deterministic; the heavy-hitter bound
    // vs exact counts is AnalyticsSpec's job on skewed data), and every
    // surviving estimate is one-sided within the stream-degraded bound
    val n = whole.count()
    val k1 = (Sketches.MgK + 1).toLong
    val exactCnt = whole.groupBy(col("grp"), col("key").cast("string").as("k"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val mgNow = StreamingSketches.mgHeavyHittersNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val mgBatch = Sketches.mgMerge(Seq(w1, w2).map(w =>
        Sketches.mgSummary(w, col("grp"), col("key"))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mgNow == mgBatch,
      "streamed MG summary must equal the batch-built merge")
    assert(mgNow.contains(("g0", "999")),
      "the planted heavy key must survive the streamed merge")
    assert(mgNow.keys.groupBy(_._1).values.forall(_.size <= Sketches.MgK))
    mgNow.foreach { case (gk, est) =>
      val f = exactCnt(gk)
      assert(est <= f && est >= f - 2 * n / k1,
        s"streamed MG bound broken: $gk est=$est f=$f")
    }

    // priority sample (r13): the streamed per-batch samples, merged,
    // must equal the SAME merge built in batch over the two waves (the
    // merge is deterministic); per-key weight never exceeds the exact
    // occurrence count (one-sided under the MG-style λ trade)
    val psNow = StreamingSketches.psEstimatesNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val psBatch = Sketches.psEstimates(Sketches.psMerge(Seq(w1, w2).map(w =>
        Sketches.psSample(w, col("grp"), col("key"), lit(1L)))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(psNow.nonEmpty && psNow == psBatch,
      "streamed priority sample must equal the batch-built merge")
    psNow.foreach { case (gk, w) =>
      assert(w <= exactCnt(gk), s"sampled weight above exact count: $gk")
    }
    assert(psNow.keys.groupBy(_._1).values.forall(_.size <= Sketches.PsK))

    // VarOpt (r15): the streamed per-batch shard states, merged, must
    // equal the SAME merge built in batch over the two waves (the
    // grid-snapped merge is deterministic), and the subset-sum totals
    // stay within a whisker of the exact group totals (VarOpt preserves
    // the total; the 1e-6 grid is the only slack)
    val voNow = StreamingSketches.voEstimatesNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val voBatch = Sketches.voMerge(Seq(w1, w2).map(w =>
        Sketches.voState(w, col("grp"), col("key"), lit(1L))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(voNow.nonEmpty && voNow == voBatch,
      "streamed VarOpt sample must equal the batch-built merge")
    val exactTot = exactCnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    voNow.groupBy(_._1._1).foreach { case (g, ests) =>
      val tot = ests.values.sum
      assert(math.abs(tot - exactTot(g)) <= 0.05 * exactTot(g),
        s"VarOpt subset-sum total drifted: $g est=$tot exact=${exactTot(g)}")
    }

    // state really is per-batch register sets, each d·w-bounded
    val cmBatches = new java.io.File(s"$state/cm").listFiles()
      .filter(_.getName.startsWith("batch_id=")).toSeq
    assert(cmBatches.size == 2, s"expected 2 batch dirs, got $cmBatches")
    val worst = cmBatches.map(d =>
      spark.read.parquet(d.getPath).count()).max
    assert(worst <= 2L * Sketches.CmDepth * Sketches.CmWidth,
      "per-batch CM registers exceeded the d*w bound per group")
  }

  test("compaction: estimates register-identical, dirs bounded, mid-compaction restart converges") {
    // VERDICT r13 #2: the un-windowed accumulator grew one dir per
    // micro-batch forever. compact() must fold committed batch dirs
    // into ONE compact dir per sketch with estimates EXACTLY unchanged
    // (the compact stores the untrimmed associative sum; the single
    // trim/recompress stays at read time), and a crash at any point of
    // the compaction must converge on replay.
    val src = Files.createTempDirectory("skc-src").toString
    val ck = Files.createTempDirectory("skc-ck").toString
    val state = Files.createTempDirectory("skc-state").toString
    val w1 = obs(7, 300)
    val w2 = obs(11, 400)
      .unionByName(Seq.fill(60)(("g0", 999L)).toDF("grp", "key"))
    val w3 = obs(13, 500)
    val qs = Seq((1, 4), (1, 2), (9, 10))
    val probes = w1.unionByName(w2).unionByName(w3)
      .select(col("grp"), col("key").cast("string").as("key"))
      .distinct().filter(col("key").cast("long") % 10 === 0)

    def dirsOf(sketch: String) =
      new java.io.File(s"$state/$sketch").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
    // every family's full estimate surface in one comparable value
    def snap() = (
      StreamingSketches.hllEstimateNow(spark, state)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap,
      StreamingSketches.cmEstimateNow(spark, state, probes)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      StreamingSketches.qdQuantilesNow(spark, state, qs)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      StreamingSketches.bloomMightContainNow(spark, state, probes)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap,
      StreamingSketches.mgHeavyHittersNow(spark, state)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      StreamingSketches.psEstimatesNow(spark, state)
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap,
      StreamingSketches.voEstimatesNow(spark, state)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap)

    w1.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.run(spark, src, ck, state)
    w2.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.run(spark, src, ck, state)
    val families =
      Seq("hll", "cm", "qd", "qdtot", "bloom", "mg", "ps", "vo")
    val before = snap()

    // keep the pre-compaction batch dirs around to fake the crash below
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(from)
      try walk.iterator().asScala.foreach { p =>
        val t = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally walk.close()
    }
    val snapshot = Files.createTempDirectory("skc-snap")
    copyTree(java.nio.file.Paths.get(state), snapshot)

    StreamingSketches.compact(spark, state, 1)
    assert(snap() == before,
      "estimates must be register-identical across compaction")
    for (sk <- families)
      assert(dirsOf(sk) == Set("compact_upto=1"),
        s"$sk must hold exactly the compact dir after compaction")

    // crash AFTER the compact write, BEFORE cleanup: the superseded
    // batch dirs reappear next to the compact — readers must ignore
    // them (merging both would double-count the SUM families), and the
    // replayed compaction must delete them
    for (sk <- families; id <- Seq(0, 1))
      copyTree(snapshot.resolve(s"$sk/batch_id=$id"),
        java.nio.file.Paths.get(s"$state/$sk/batch_id=$id"))
    assert(snap() == before,
      "readers must ignore batch dirs superseded by the compact")
    StreamingSketches.compact(spark, state, 1)  // the replay
    assert(snap() == before)
    for (sk <- families) assert(dirsOf(sk) == Set("compact_upto=1"))

    // a partial compact (crash mid-write: no _SUCCESS) is ignored by
    // readers and swept by the next compaction
    val partial = java.nio.file.Paths.get(s"$state/hll/compact_upto=0")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.writeString(partial.resolve("garbage"), "x")
    assert(snap() == before, "an uncommitted compact must be invisible")

    // new batches land NEXT TO the compact and merge exactly: wave 3
    // streams in, then run() with compactEvery folds it in
    w3.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.run(spark, src, ck, state)
    assert(dirsOf("cm") == Set("compact_upto=1", "batch_id=2"))
    val whole = w1.unionByName(w2).unionByName(w3)
    val cmNow = StreamingSketches.cmEstimateNow(spark, state, probes)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cmBatch = Sketches.cmEstimate(
        Sketches.cmRegisters(whole, col("grp"), col("key")), probes)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cmNow == cmBatch,
      "compact + live batches must still equal the batch-at-once sketch")
    val psNow = StreamingSketches.psEstimatesNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val psBatch = Sketches.psEstimates(Sketches.psMerge(Seq(w1, w2, w3).map(w =>
        Sketches.psSample(w, col("grp"), col("key"), lit(1L)))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(psNow == psBatch,
      "trimmed families must merge exactly through the compact")

    // the wired path: run(compactEvery = 1) processes wave 4 as batch 3
    // and compacts up to batch 2 inside the stream
    obs(17, 200).coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.run(spark, src, ck, state, compactEvery = 1)
    for (sk <- families)
      assert(dirsOf(sk) == Set("compact_upto=2", "batch_id=3"),
        s"$sk: run(compactEvery) must fold committed batches in-stream")
    assert(!java.nio.file.Files.exists(partial),
      "the partial compact must be swept by the in-stream compaction")
    val hllNow = StreamingSketches.hllEstimateNow(spark, state)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val hllBatch = Sketches.estimateFromRegisters(Sketches.registers(
        whole.unionByName(obs(17, 200)), col("grp"), col("key")))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(hllNow == hllBatch)
  }

  test("trimmed compaction: MG/ps compact truly sketch-sized under key churn, estimates within the published bound") {
    // VERDICT r14 #4 / ADVICE r14: the untrimmed compact's MG/ps row
    // count grows with every key that ever entered a batch top-k —
    // unbounded over a churning stream. compact(trim = true) must
    // bound the compact at ≤ k (MG) / ≤ k+1 (ps) rows per group while
    // keeping estimates inside the published mergeable one-sided bound,
    // and must not touch the structurally-bounded families.
    val src = Files.createTempDirectory("skt-src").toString
    val ck = Files.createTempDirectory("skt-ck").toString
    val state = Files.createTempDirectory("skt-state").toString
    // full churn: each wave draws from a DISJOINT key range, plus one
    // heavy key (60 hits/wave — far above n/(k+1)) present in every wave
    def churn(wave: Int, n: Int) =
      ((1 to n).map(i => ("g" + (i % 2), (wave * 100000 + i).toLong)) ++
        Seq.fill(60)(("g0", 999L))).toDF("grp", "key")
    val waves = Seq(churn(1, 300), churn(2, 400), churn(3, 350))
    for (w <- waves) {
      w.coalesce(1).write.mode("append").parquet(src)
      StreamingSketches.run(spark, src, ck, state)
    }
    StreamingSketches.compact(spark, state, 2, trim = true)

    def compactRows(sk: String) = spark.read
      .parquet(s"$state/$sk/compact_upto=2")
    // without the trim the compact would hold every churned key that
    // made a batch top-k (3 batches × up to k per grp); trimmed it is
    // truly sketch-sized
    val mgPerGrp = compactRows("mg").groupBy(col("grp")).count()
      .collect().map(_.getLong(1))
    assert(mgPerGrp.nonEmpty && mgPerGrp.forall(_ <= Sketches.MgK),
      s"trimmed MG compact must hold <= k rows per group, got ${mgPerGrp.toSeq}")
    val psPerGrp = compactRows("ps").groupBy(col("grp")).count()
      .collect().map(_.getLong(1))
    assert(psPerGrp.nonEmpty && psPerGrp.forall(_ <= Sketches.PsK + 1),
      s"trimmed ps compact must hold <= k+1 rows per group, got ${psPerGrp.toSeq}")
    val voPerGrp = compactRows("vo").groupBy(col("grp")).count()
      .collect().map(_.getLong(1))
    assert(voPerGrp.nonEmpty && voPerGrp.forall(_ <= Sketches.VoK + 2),
      s"trimmed vo compact must hold ~k rows per group, got ${voPerGrp.toSeq}")

    val whole = waves.reduce(_ unionByName _)
    val exactCnt = whole.groupBy(col("grp"), col("key").cast("string").as("k"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nPerGrp = whole.groupBy(col("grp")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k1 = (Sketches.MgK + 1).toLong
    // the published mergeable-MG bound survives the trim-at-compaction:
    // one-sided, est within [f − n/(k+1) (accumulated over the merge
    // tree), f]; the heavy key (f >> n/(k+1)) is GUARANTEED present
    val mgNow = StreamingSketches.mgHeavyHittersNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mgNow.contains(("g0", "999")),
      "the heavy key must survive the trimmed compaction (f > n/(k+1))")
    mgNow.foreach { case (gk, est) =>
      val f = exactCnt(gk)
      assert(est <= f && f - est <= 2 * nPerGrp(gk._1) / k1,
        s"trimmed MG bound broken: $gk est=$est f=$f n=${nPerGrp(gk._1)}")
    }
    // ps: one-sided — no sampled weight above the exact count, the
    // never-trimmed heavy key exact
    val psNow = StreamingSketches.psEstimatesNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    psNow.foreach { case (gk, w) =>
      assert(w <= exactCnt(gk), s"sampled weight above exact count: $gk")
    }
    assert(psNow(("g0", "999")) == 180L,
      "a key inside every batch top-(k+1) carries its exact total through the trim")
    // vo through the trimmed compact: the total is preserved (VarOpt's
    // invariant — dropped keys' mass moves into tau, unlike MG's trim)
    val voNow = StreamingSketches.voEstimatesNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    voNow.groupBy(_._1._1).foreach { case (g, ests) =>
      val tot = ests.values.sum
      assert(math.abs(tot - nPerGrp(g)) <= 0.05 * nPerGrp(g),
        s"VarOpt total drifted through the trimmed compact: $g est=$tot exact=${nPerGrp(g)}")
    }

    // the structurally-bounded families are untouched by the trim:
    // identical to the batch-at-once sketch, exactly as without it
    val probes = whole.select(col("grp"), col("key").cast("string").as("key"))
      .distinct().filter(col("key").cast("long") % 10 === 0)
    val cmNow = StreamingSketches.cmEstimateNow(spark, state, probes)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cmBatch = Sketches.cmEstimate(
        Sketches.cmRegisters(whole, col("grp"), col("key")), probes)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cmNow == cmBatch, "CM must be exact through a trimmed compaction")
    val hllNow = StreamingSketches.hllEstimateNow(spark, state)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val hllBatch = Sketches.estimateFromRegisters(
        Sketches.registers(whole, col("grp"), col("key")))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(hllNow == hllBatch, "HLL must be exact through a trimmed compaction")
  }

  test("compaction fails loudly (state intact) when the committer writes no _SUCCESS marker") {
    // ADVICE r14: with mapreduce.fileoutputcommitter.marksuccessfuljobs
    // =false (common on object stores) every compact would be INVISIBLE
    // to liveDirs/readers while its inputs were deleted — silent,
    // permanent loss of all sketch state. compact() must detect the
    // missing marker after its own write and abort BEFORE any cleanup.
    val src = Files.createTempDirectory("sks-src").toString
    val ck = Files.createTempDirectory("sks-ck").toString
    val state = Files.createTempDirectory("sks-state").toString
    for (seed <- Seq(7, 11)) {
      obs(seed, 300).coalesce(1).write.mode("append").parquet(src)
      StreamingSketches.run(spark, src, ck, state)
    }
    def estNow() = StreamingSketches.hllEstimateNow(spark, state)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val before = estNow()
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val saved = hc.get(key)
    try {
      hc.set(key, "false")
      val e = intercept[IllegalStateException] {
        StreamingSketches.compact(spark, state, 1)
      }
      assert(e.getMessage.contains("_SUCCESS"))
    } finally {
      if (saved == null) hc.unset(key) else hc.set(key, saved)
    }
    // state intact: both batch dirs still live, estimates unchanged
    val dirs = new java.io.File(s"$state/hll").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(dirs == Set("batch_id=0", "batch_id=1"),
      "the aborted compaction must not have deleted any input")
    assert(estNow() == before, "estimates must be unchanged by the abort")
    // with a marker-writing committer the SAME compaction succeeds
    StreamingSketches.compact(spark, state, 1)
    assert(estNow() == before)
  }

  test("live readers survive a concurrent compaction deleting just-listed directories") {
    // ADVICE r14: liveDirs lists the batch dirs, an in-stream compaction
    // deletes them before the read — the *Now call used to die with
    // FileNotFoundException every compactEvery batches on a concurrently
    // queried deployment. readLive must re-resolve once and answer from
    // the superseding compact.
    val src = Files.createTempDirectory("skr-src").toString
    val ck = Files.createTempDirectory("skr-ck").toString
    val state = Files.createTempDirectory("skr-state").toString
    val w1 = obs(7, 300)
    val w2 = obs(11, 400)
    for (w <- Seq(w1, w2)) {
      w.coalesce(1).write.mode("append").parquet(src)
      StreamingSketches.run(spark, src, ck, state)
    }
    // the race, made deterministic: compaction runs AFTER the listing
    // and BEFORE the reads (the readLive test seam)
    val raced = Sketches.estimateFromRegisters(Sketches.mergeRegisters(
        StreamingSketches.readLive(spark, state, "hll", raceHook =
          n => if (n == 1) StreamingSketches.compact(spark, state, 1))))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val batch = Sketches.estimateFromRegisters(Sketches.registers(
        w1.unionByName(w2), col("grp"), col("key")))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(raced == batch,
      "a reader racing the compaction must still answer exactly")
    // the compaction really did run (the dirs the reader listed first
    // are gone), so the retry path — not a lucky interleaving — passed
    val dirs = new java.io.File(s"$state/hll").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("compact_upto=1"))
  }

  test("live readers survive TWO back-to-back compactions racing the bounded retry loop") {
    // ADVICE r15: the old single retry still died if a SECOND compaction
    // deleted directories between the retry's listing and its pin. Land
    // a different-horizon compaction on each of the first two attempts —
    // the bounded loop's third attempt must answer exactly.
    val src = Files.createTempDirectory("skr2-src").toString
    val ck = Files.createTempDirectory("skr2-ck").toString
    val state = Files.createTempDirectory("skr2-state").toString
    val waves = Seq(obs(7, 300), obs(11, 400), obs(13, 350))
    for (w <- waves) {
      w.coalesce(1).write.mode("append").parquet(src)
      StreamingSketches.run(spark, src, ck, state)
    }
    val hooks = scala.collection.mutable.ArrayBuffer.empty[Int]
    val raced = Sketches.estimateFromRegisters(Sketches.mergeRegisters(
        StreamingSketches.readLive(spark, state, "hll", raceHook = { n =>
          hooks += n
          if (n <= 2) StreamingSketches.compact(spark, state, n.toLong)
        })))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val batch = Sketches.estimateFromRegisters(Sketches.registers(
        waves.reduce(_ unionByName _), col("grp"), col("key")))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(raced == batch,
      "a reader racing two compactions must still answer exactly")
    assert(hooks.toSeq == Seq(1, 2, 3),
      s"expected exactly three attempts (two raced, one clean): $hooks")
    val dirs = new java.io.File(s"$state/hll").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("compact_upto=2"))
  }

  test("every *Now reader answers (empty) on a fresh, never-populated state dir") {
    // ADVICE r15: voEstimatesNow on an empty state dir threw
    // UnsupportedOperationException: empty.reduce — and every reader
    // shared the latent pattern. A monitoring query racing the FIRST
    // micro-batch is a legitimate caller, not a contract violation:
    // empty state must read as an empty estimate.
    val state = Files.createTempDirectory("sk-empty").toString
    val probes = Seq(("g0", 1L), ("g1", 2L)).toDF("grp", "key")
    assert(StreamingSketches.hllEstimateNow(spark, state).count() == 0)
    assert(StreamingSketches.mgHeavyHittersNow(spark, state).count() == 0)
    assert(StreamingSketches.psEstimatesNow(spark, state).count() == 0)
    assert(StreamingSketches.voEstimatesNow(spark, state).count() == 0)
    assert(StreamingSketches.qdQuantilesNow(spark, state,
      Seq((1, 2), (1, 4))).count() == 0)
    // probe-shaped readers: no sketch mass ⇒ zero counts, no membership
    val cm = StreamingSketches.cmEstimateNow(spark, state, probes).collect()
    assert(cm.forall(r => r.isNullAt(r.fieldIndex("cm_estimate")) ||
      r.getLong(r.fieldIndex("cm_estimate")) == 0L),
      s"empty CM state must estimate 0 for every probe: ${cm.mkString(",")}")
    val bf = StreamingSketches.bloomMightContainNow(spark, state, probes)
      .collect()
    assert(bf.forall(r => !r.getBoolean(r.fieldIndex("might_contain"))),
      s"an empty bloom filter must reject every probe: ${bf.mkString(",")}")
  }

  test("windowed streaming q-digest: per-hour quantiles equal the batch build") {
    val src = Files.createTempDirectory("wq-src").toString
    val ck = Files.createTempDirectory("wq-ck").toString
    val state = Files.createTempDirectory("wq-state").toString
    // two waves spanning two hours, one wave straddling both — the
    // additive merge must still land every row in its own hour's digest
    def tsObs(seed: Int, n: Int, hourOf: Int => Int) =
      (1 to n).map { i =>
        ("g" + (i % 2), ((i * seed) % 97).toLong,
          java.sql.Timestamp.valueOf(f"2026-08-15 ${hourOf(i)}%02d:${i % 60}%02d:00"))
      }.toDF("grp", "key", "ts")
    val w1 = tsObs(7, 300, i => 10 + (i % 2))  // hours 10 and 11
    val w2 = tsObs(11, 400, _ => 11)           // hour 11 only
    w1.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.runWindowed(spark, src, ck, state)
    w2.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.runWindowed(spark, src, ck, state)

    val qs = Seq((1, 2), (9, 10))
    val streamed = StreamingSketches.qdQuantilesNow(spark, state, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // batch twin: same hour|grp keying, same per-wave build + merge
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select(
      concat(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH"),
        lit("|"), col("grp")).as("grp"), col("key"))
    val (d1, t1) = Sketches.qdBuild(keyed(w1), col("grp"), col("key"))
    val (d2, t2) = Sketches.qdBuild(keyed(w2), col("grp"), col("key"))
    val tot = t1.unionByName(t2).groupBy(col("grp")).agg(sum(col("n")).as("n"))
    val batch = Sketches.qdQuantiles(
        Sketches.qdMerge(Seq(d1, d2), Seq(t1, t2)), tot, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty && streamed == batch,
      "windowed streamed quantiles must equal the batch-built merge")
    // both hours really have digests (the straddling wave split)
    assert(streamed.keys.map(_._1.split('|').head.takeRight(2)).toSet == Set("10", "11"))
  }

  test("windowed q-digest state: closed-window batch dirs swept, survivors' estimates unchanged") {
    // VERDICT r12 #3: batch dirs behind the event-time horizon must be
    // deleted (qd + qdtot in lockstep) while open windows keep answering
    // with their full mass.
    val src = Files.createTempDirectory("ws-src").toString
    val ck = Files.createTempDirectory("ws-ck").toString
    val state = Files.createTempDirectory("ws-state").toString
    def tsObs(seed: Int, n: Int, hour: Int) =
      (1 to n).map { i =>
        ("g" + (i % 2), ((i * seed) % 97).toLong,
          java.sql.Timestamp.valueOf(f"2026-08-15 $hour%02d:${i % 60}%02d:00"))
      }.toDF("grp", "key", "ts")
    val qs = Seq((1, 2), (9, 10))
    def dirsOf(sketch: String) =
      new java.io.File(s"$state/$sketch").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    def estNow() = StreamingSketches.qdQuantilesNow(spark, state, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val w1 = tsObs(7, 300, 10)    // hour 10
    // hour 11 carries a planted heavy key for the per-hour MG check
    val w2 = tsObs(11, 400, 11).unionByName(
      (1 to 60).map(i => ("g0", 999L,
        java.sql.Timestamp.valueOf("2026-08-15 11:30:00")))
        .toDF("grp", "key", "ts"))
    val w3 = tsObs(13, 500, 20)   // hour 20 — 9 h later, horizon 2 h
    w1.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.runWindowed(spark, src, ck, state)
    w2.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.runWindowed(spark, src, ck, state)
    // hour 11's high-water leaves hour 10 inside the horizon: no sweep
    assert(dirsOf("qd") == Set("batch_id=0", "batch_id=1"))
    assert(estNow().keys.map(_._1.take(13)).toSet
      == Set("2026-08-15 10", "2026-08-15 11"))
    // r13: per-hour heavy hitters from the SAME state dir — the hour
    // prefix is just another group to the un-windowed reader, and the
    // planted key surfaces in ITS hour only
    val mg = StreamingSketches.mgHeavyHittersNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mg.contains(("2026-08-15 11|g0", "999")),
      "planted heavy key must surface in its own hour's MG summary")
    assert(!mg.keys.exists { case (g, k) => g.startsWith("2026-08-15 10") && k == "999" })
    // per-hour membership: the planted key is a member of hour 11, and
    // the filter (no false negatives) must say so
    val bfProbe = Seq(("2026-08-15 11|g0", "999"), ("2026-08-15 10|g0", "999"))
      .toDF("grp", "key")
    val bf = StreamingSketches.bloomMightContainNow(spark, state, bfProbe)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(bf("2026-08-15 11|g0"), "bloom false negative on the planted key")

    // r14: the per-hour priority sample rides the same keying — the
    // planted key's 60 occurrences surface in ITS hour's sample only,
    // with weight == the exact count (it never straddles a trim)
    val ps = StreamingSketches.psEstimatesNow(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ps(("2026-08-15 11|g0", "999")) == 60L,
      "planted heavy key must carry its full weight in its hour's sample")
    assert(!ps.keys.exists { case (g, k) => g.startsWith("2026-08-15 10") && k == "999" })

    w3.coalesce(1).write.mode("append").parquet(src)
    StreamingSketches.runWindowed(spark, src, ck, state)
    // hour 20's high-water closes hours 10 and 11 (window ends 11:00 and
    // 12:00 ≤ 20:xx − 2 h): both dirs swept whole, every sketch in lockstep
    for (sk <- Seq("qd", "qdtot", "mg", "bloom", "ps", "vo"))
      assert(dirsOf(sk) == Set("batch_id=2"),
        s"closed-window $sk batch dirs must be deleted")
    // the surviving window answers with its full mass: identical to the
    // batch build over its own rows
    val keyed = w3.select(
      concat(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH"),
        lit("|"), col("grp")).as("grp"), col("key"))
    val (d3, t3) = Sketches.qdBuild(keyed, col("grp"), col("key"))
    val batch = Sketches.qdQuantiles(d3, t3, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val after = estNow()
    assert(after == batch,
      "surviving window's estimates must be unchanged by the sweep")
    assert(after.keys.map(_._1.take(13)).toSet == Set("2026-08-15 20"))
  }
}
