package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Sketches

/** Mergeable sketches maintained BY a stream — the deployment shape the
  * r11–r13 sketch family exists for: a 100 TB corpus arrives
  * incrementally, each micro-batch reduces to a bounded register set
  * (64 HLL buckets, d·w count–min cells, ≤3k q-digest nodes, ≤m bloom
  * bits, ≤k MG counters, ≤k+1 priority-sample rows per group), and the
  * corpus-wide estimate is a register MERGE (max / sum / sum+recompress
  * / or / sum+re-trim), never a rescan.
  *
  * Exactly-once without relying on sink transactions: each micro-batch
  * writes its OWN register set to `stateDir/<sketch>/batch_id=<id>` with
  * idempotent overwrite — a replayed batch (restart before the
  * checkpoint commit) re-derives the identical registers and supersedes
  * its directory verbatim, so the SUM-merged count–min cells never
  * double-count (the same pattern the warehouse dead-letter path uses;
  * HLL's max-merge is idempotent even without it, CM's sum-merge is the
  * one that needs the batch keying). This holds under the SAME
  * checkpoint — the contract of a restart; discarding the checkpoint
  * means reprocessing from scratch and pairs with a fresh `stateDir`,
  * exactly as it does for any non-transactional sink. The live estimate is
  * [[cmEstimateNow]]/[[hllEstimateNow]] over the union of batch
  * directories — register sets are d·w-bounded per batch, so reading
  * them all back is O(batches · d·w), not O(corpus). */
object StreamingSketches {

  /** Input schema: one (grp, key) observation per line of the staged
    * JSON/parquet batches. */
  val obsSchema: StructType = StructType(Seq(
    StructField("grp", StringType),
    StructField("key", LongType)))

  /** Fold a parquet observation stream into per-batch HLL + CM register
    * sets under `stateDir`, AvailableNow semantics. Restart-safe: the
    * checkpoint skips committed batches; a replayed batch overwrites its
    * own register directories. */
  def run(spark: SparkSession, srcDir: String, checkpointDir: String,
      stateDir: String): Unit = {
    val stream = spark.readStream.schema(obsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketches.registers(batch, col("grp"), col("key"))
          .write.mode("overwrite")
          .parquet(s"$stateDir/hll/batch_id=$batchId")
        Sketches.cmRegisters(batch, col("grp"), col("key"))
          .write.mode("overwrite")
          .parquet(s"$stateDir/cm/batch_id=$batchId")
        // r12: the quantile and membership sketches stream the same way
        // — q-digest nodes merge by SUM + one recompress at read time
        // (the one merge that needs the totals alongside), bloom bits by
        // distinct union (idempotent, so batch keying is belt-and-braces
        // the way it is for HLL)
        val (qd, qdTot) = Sketches.qdBuild(batch, col("grp"), col("key"))
        qd.write.mode("overwrite")
          .parquet(s"$stateDir/qd/batch_id=$batchId")
        qdTot.write.mode("overwrite")
          .parquet(s"$stateDir/qdtot/batch_id=$batchId")
        Sketches.bfRegisters(batch, col("grp"), col("key"))
          .write.mode("overwrite")
          .parquet(s"$stateDir/bloom/batch_id=$batchId")
        // Misra–Gries: ≤ k counters per (grp, batch); the read-time
        // merge re-trims, and the published bound degrades by one
        // λ ≤ nᵢ/(k+1) per shard — the price of enumerating heavy
        // hitters from a stream with bounded state
        Sketches.mgSummary(batch, col("grp"), col("key"))
          .write.mode("overwrite")
          .parquet(s"$stateDir/mg/batch_id=$batchId")
        // r13 — priority sample: ≤ k+1 weighted rows per (grp, batch);
        // the read-time merge re-sums weights per key and re-trims. A
        // key trimmed from SOME batch re-enters with only its surviving
        // mass, so streamed estimates degrade ONE-SIDEDLY vs
        // batch-at-once (the MG λ-per-shard trade stated above —
        // bounded state from an unbounded stream); a key inside the
        // top-(k+1) of every batch carries its exact total. Weight =
        // occurrence count here, the streaming analog of the batch
        // sketch's SUM(w).
        Sketches.psSample(batch, col("grp"), col("key"), lit(1L))
          .write.mode("overwrite")
          .parquet(s"$stateDir/ps/batch_id=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
  }

  private def batchDirs(stateDir: String, sketch: String): Seq[String] = {
    val d = new java.io.File(s"$stateDir/$sketch")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getPath).toSeq
  }

  /** Corpus-wide HLL distinct estimates from the accumulated per-batch
    * registers: per-bucket MAX merge, then the standard estimator. */
  def hllEstimateNow(spark: SparkSession, stateDir: String): DataFrame =
    Sketches.estimateFromRegisters(Sketches.mergeRegisters(
      batchDirs(stateDir, "hll").map(spark.read.parquet(_))))

  /** Corpus-wide CM frequency estimates for `probes(grp, key)` from the
    * accumulated per-batch registers: per-cell SUM merge, then min-of-d. */
  def cmEstimateNow(spark: SparkSession, stateDir: String,
      probes: DataFrame): DataFrame =
    Sketches.cmEstimate(Sketches.cmMerge(
      batchDirs(stateDir, "cm").map(spark.read.parquet(_))), probes)

  /** Corpus-wide φ-quantile estimates from the accumulated per-batch
    * digests: per-node SUM merge + one recompress under the combined
    * totals, then the standard rank pick — the published one-sided rank
    * bound holds through the merge (AnalyticsSpec). */
  def qdQuantilesNow(spark: SparkSession, stateDir: String,
      qs: Seq[(Int, Int)]): DataFrame = {
    val tots = batchDirs(stateDir, "qdtot").map(spark.read.parquet(_))
    val merged = Sketches.qdMerge(
      batchDirs(stateDir, "qd").map(spark.read.parquet(_)), tots)
    val tot = tots.reduce(_ unionByName _)
      .groupBy(col("grp")).agg(sum(col("n")).as("n"))
    Sketches.qdQuantiles(merged, tot, qs)
  }

  /** Corpus-wide membership verdicts for `probes(grp, key)` from the
    * accumulated per-batch bloom registers: distinct-union merge, then
    * the all-k-bits test — merge-then-test == test-of-union exactly. */
  def bloomMightContainNow(spark: SparkSession, stateDir: String,
      probes: DataFrame): DataFrame =
    Sketches.bfMightContain(Sketches.bfMerge(
      batchDirs(stateDir, "bloom").map(spark.read.parquet(_))), probes)

  /** Corpus-wide heavy hitters from the accumulated per-batch MG
    * summaries: counter SUM + one re-trim (Agarwal et al.'s mergeable
    * MG) — ≤ k counters whatever the batch count, estimates within
    * [f − Σnᵢ/(k+1) − λ', f]. */
  def mgHeavyHittersNow(spark: SparkSession, stateDir: String): DataFrame =
    Sketches.mgMerge(
      batchDirs(stateDir, "mg").map(spark.read.parquet(_)))

  /** Corpus-wide weighted-sample estimates from the accumulated
    * per-batch priority samples: weight re-sum per key + one re-trim,
    * then ŵ = max(w, τ). Exact for keys that survived every batch's
    * top-(k+1); one-sided under-count otherwise (see `run`'s note). */
  def psEstimatesNow(spark: SparkSession, stateDir: String): DataFrame =
    Sketches.psEstimates(Sketches.psMerge(
      batchDirs(stateDir, "ps").map(spark.read.parquet(_))))

  // ---- event-time windowed quantiles --------------------------------

  /** Input schema for the WINDOWED variant: (grp, key, ts). */
  val tsObsSchema: StructType = StructType(Seq(
    StructField("grp", StringType),
    StructField("key", LongType),
    StructField("ts", org.apache.spark.sql.types.TimestampType)))

  /** Per-WINDOW sketch maintenance (the streaming shape a metrics
    * pipeline runs): the sketch GROUP is `<hour>|<grp>`, so
    * [[qdQuantilesNow]] answers per-hour quantiles, [[mgHeavyHittersNow]]
    * per-hour heavy hitters, and [[bloomMightContainNow]] per-hour
    * membership — all from this state dir with the un-windowed readers
    * (r13: the hour prefix is just another group). No watermark is
    * needed for CORRECTNESS — the per-batch states merge additively, so
    * a late row lands in its hour's sketch through whichever batch
    * carries it.
    *
    * State is BOUNDED (VERDICT r12 #3 — batch dirs used to accumulate
    * one per micro-batch forever, and reads merged all of them): each
    * batch dir carries a `_MAXTS` marker (epoch ms of its newest row),
    * and after every batch, prior dirs whose newest row's WINDOW has
    * closed — window end ≤ event-time high-water − `horizonHours` — are
    * deleted whole, qd/qdtot/mg/bloom in lockstep (the
    * runStreamingNearDup discipline: marker-only reads, O(#dirs) sweep,
    * no footer scans).
    * The window-end refinement matters: a marker merely OLDER than the
    * cutoff could still sit in an hour that newer batches keep feeding;
    * sweeping only fully-closed windows means an open window's mass is
    * never split. Retention semantics follow the watermark contract:
    * [[qdQuantilesNow]] answers windows inside the horizon; a closed
    * window's final quantiles must be consumed before its state ages
    * out, and a straggler beyond the horizon re-opens its window with
    * only its own mass — exactly a watermark-expired late row. Window
    * ends are computed on UTC hour boundaries (the session default);
    * deployments in a non-hour-offset zone should widen `horizonHours`
    * by one to cover the drift. */
  def runWindowed(spark: SparkSession, srcDir: String,
      checkpointDir: String, stateDir: String,
      horizonHours: Long = 2L): Unit = {
    import java.nio.file.{Files, Paths}
    val stream = spark.readStream.schema(tsObsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keyed = batch.select(
          concat(date_format(date_trunc("hour", col("ts")),
            "yyyy-MM-dd HH"), lit("|"), col("grp")).as("grp"),
          col("key"))
        val (qd, qdTot) = Sketches.qdBuild(keyed, col("grp"), col("key"))
        qd.write.mode("overwrite")
          .parquet(s"$stateDir/qd/batch_id=$batchId")
        qdTot.write.mode("overwrite")
          .parquet(s"$stateDir/qdtot/batch_id=$batchId")
        // r13: per-hour heavy hitters and membership ride the same
        // hour|grp keying — [[mgHeavyHittersNow]]/[[bloomMightContainNow]]
        // over this state dir answer per-window directly, no new readers
        Sketches.mgSummary(keyed, col("grp"), col("key"))
          .write.mode("overwrite")
          .parquet(s"$stateDir/mg/batch_id=$batchId")
        Sketches.bfRegisters(keyed, col("grp"), col("key"))
          .write.mode("overwrite")
          .parquet(s"$stateDir/bloom/batch_id=$batchId")
        // bounded scalar action (the EventStream.scala:138 pattern)
        val maxTs = batch.agg(max(col("ts"))).collect()(0).getTimestamp(0)
        if (maxTs != null) {
          val hwMs = maxTs.toInstant.toEpochMilli
          Files.writeString(
            Paths.get(s"$stateDir/qd/batch_id=$batchId/_MAXTS"),
            hwMs.toString)
          val cutoffMs = hwMs - horizonHours * 3600000L
          batchDirs(stateDir, "qd").foreach { d =>
            val f = new java.io.File(d)
            val id = f.getName.stripPrefix("batch_id=").toLongOption
            val marker = Paths.get(d, "_MAXTS")
            if (id.exists(_ < batchId) && Files.exists(marker)) {
              val m = Files.readString(marker).trim.toLong
              val windowEndMs = (m / 3600000L + 1L) * 3600000L
              if (windowEndMs <= cutoffMs) {
                rmTree(Paths.get(d))
                Seq("qdtot", "mg", "bloom").foreach(s =>
                  rmTree(Paths.get(s"$stateDir/$s/${f.getName}")))
              }
            }
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete(_))
      finally walk.close()
    }
  }
}
