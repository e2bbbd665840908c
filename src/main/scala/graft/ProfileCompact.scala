package graft
import org.apache.spark.sql.functions._

/** Puts numbers on the streaming-sketch compaction win (VERDICT r14 #8):
  * live-estimate read latency as a function of state-directory count,
  * before and after [[graft.streaming.StreamingSketches.compact]], at
  * ×1/×8 dir counts (32 vs 256 batch dirs ≈ 2 vs 17 hours of a 4-minute
  * micro-batch cadence). Batches use DISJOINT key ranges — full churn,
  * the worst case for the untrimmed compact's row count, so the printed
  * mg compact size is the upper bound the trim option exists for.
  * Results go to BASELINE.md. Dev-only main, not part of Verify/Bench. */
object ProfileCompact {
  // Generator shape, shared by the batch writer and the printed
  // mergeable-MG bound (ADVICE r16: the bound must DERIVE from the
  // generator — repeating the literals let a generator edit silently
  // falsify the published bound).
  private val RowsPerBatch = 2000L
  private val NGroups = 4L

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-compact")
    import graft.operators.Sketches
    import graft.streaming.StreamingSketches
    def t(l: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[compact] $l%-38s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    for (n <- Seq(32, 256)) {
      val state =
        java.nio.file.Files.createTempDirectory(s"prof-compact-$n").toString
      // twin state dir with IDENTICAL batches for the trim=true pass
      // (r16) — written up front, before the untrimmed compaction
      // deletes the originals
      val stateT =
        java.nio.file.Files.createTempDirectory(s"prof-compact-t-$n").toString
      (0 until n).foreach { i =>
        // skewed multiplicities (counts 1,3,5,… per key — uniform
        // singletons would make every MG summary empty, λ = 1 trims
        // all); the i-offset keeps batches key-DISJOINT (full churn)
        val batch = spark.range(i * RowsPerBatch, (i + 1) * RowsPerBatch)
          .select((col("id") % NGroups).cast("string").as("grp"),
            (lit(i * 100000L) + floor(sqrt(
              (col("id") - lit(i * RowsPerBatch)).cast("double"))).cast("long"))
              .as("key"))
        for (st <- Seq(state, stateT)) {
          Sketches.registers(batch, col("grp"), col("key"))
            .write.mode("overwrite").parquet(s"$st/hll/batch_id=$i")
          Sketches.mgSummary(batch, col("grp"), col("key"))
            .write.mode("overwrite").parquet(s"$st/mg/batch_id=$i")
        }
      }
      def readBoth(tag: String): Unit = {
        t(s"hll estimate $tag (dirs=$n)") {
          StreamingSketches.hllEstimateNow(spark, state).collect(); () }
        t(s"mg heavy-hitters $tag (dirs=$n)") {
          StreamingSketches.mgHeavyHittersNow(spark, state).collect(); () }
      }
      readBoth("pre-compact cold")
      readBoth("pre-compact warm")
      t(s"compact itself (dirs=$n)") {
        StreamingSketches.compact(spark, state, n - 2L)
      }
      readBoth("post-compact cold") // 1 compact + 1 live batch dir
      readBoth("post-compact warm")
      val mgRows = spark.read.parquet(s"$state/mg/compact_upto=${n - 2}")
        .count()
      println(s"[compact] mg compact rows at full churn (dirs=$n): $mgRows" +
        s" (trim=true bound would be ${4 * Sketches.MgK})")

      // r16 (VERDICT r15 #6): the SAME batch dirs under trim=true, so
      // the retention trade has numbers on both sides — read latency of
      // the sketch-sized compact, its row count against the ≤ k·|grp|
      // bound, and the measured one-sided estimate degradation vs the
      // untrimmed (exact-merge) estimates against the published
      // mergeable-MG bound (Σnᵢ/(k+1) over the folded batches).
      val exact = StreamingSketches.mgHeavyHittersNow(spark, state)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      t(s"compact trim=true itself (dirs=$n)") {
        StreamingSketches.compact(spark, stateT, n - 2L, trim = true)
      }
      t(s"hll estimate post-trim warm (dirs=$n)") {
        StreamingSketches.hllEstimateNow(spark, stateT).collect(); () }
      t(s"mg heavy-hitters post-trim warm (dirs=$n)") {
        StreamingSketches.mgHeavyHittersNow(spark, stateT).collect(); () }
      val mgRowsT = spark.read.parquet(s"$stateT/mg/compact_upto=${n - 2}")
        .count()
      val trimmed = StreamingSketches.mgHeavyHittersNow(spark, stateT)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      // Under FULL churn no key is globally heavy (every f ≤ n/(k+1)),
      // so the mergeable-MG guarantee is vacuous and the trim is ALLOWED
      // to discard everything — the degradation to measure is
      // ENUMERATION COVERAGE (how many of the untrimmed read's keys the
      // trimmed state still surfaces) plus the per-key estimate delta on
      // the intersection. Deltas can be NEGATIVE (trimmed HIGHER): a
      // live-batch key pays only its small read-time λ where the
      // untrimmed merge subtracts the global one — both stay valid
      // lower bounds of f.
      val common = trimmed.keySet & exact.keySet
      val maxDrop = common.map(k => exact(k) - trimmed(k))
        .maxOption.getOrElse(0L)
      val perBatchN = RowsPerBatch / NGroups // rows per (grp, batch)
      val bound = (n - 1) * perBatchN / (Sketches.MgK + 1)
      println(s"[compact] mg trim=true rows (dirs=$n): $mgRowsT " +
        s"(bound ${4 * Sketches.MgK} + live batch); untrimmed-read keys " +
        s"${exact.size} -> trimmed-read keys ${trimmed.size} " +
        s"(${common.size} shared); max estimate drop on shared keys: " +
        s"$maxDrop (published one-sided bound ≤ $bound)")
    }
    spark.stop()
  }
}
