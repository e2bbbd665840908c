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
    val w1 = obs(7, 300); val w2 = obs(11, 400)

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

    // state really is per-batch register sets, each d·w-bounded
    val cmBatches = new java.io.File(s"$state/cm").listFiles()
      .filter(_.getName.startsWith("batch_id=")).toSeq
    assert(cmBatches.size == 2, s"expected 2 batch dirs, got $cmBatches")
    val worst = cmBatches.map(d =>
      spark.read.parquet(d.getPath).count()).max
    assert(worst <= 2L * Sketches.CmDepth * Sketches.CmWidth,
      "per-batch CM registers exceeded the d*w bound per group")
  }
}
