package graft
import org.apache.spark.sql.functions._

/** Measures the WINDOWED sketch families' live state-directory
  * footprint (VERDICT r15 #6, second option — the `_MAXTS` sweep bounds
  * directories by the event-time horizon, so the open question is only
  * HOW MANY stay live at a realistic cadence: measure and document
  * rather than build a windowed compactor).
  *
  * Simulation: a 4-minute micro-batch cadence (15 batches/hour) over 4
  * hours of event time = 60 one-file batches, `horizonHours = 2`.
  * Closed-form expectation: the sweep deletes a batch dir once its
  * newest row's WINDOW has fully closed (window end ≤ high-water −
  * horizon), so live dirs ≈ cadence · (horizon + 1..2 hours) + the
  * current batch — here the last two whole hours stay open-or-inside-
  * horizon plus the partially-aged third hour. Results → BASELINE.md.
  * Dev-only main, not part of Verify/Bench. */
object ProfileWindowedDirs {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-windowed-dirs")
    import graft.streaming.StreamingSketches
    val src = java.nio.file.Files.createTempDirectory("pwd-src").toString
    val ck = java.nio.file.Files.createTempDirectory("pwd-ck").toString
    val state = java.nio.file.Files.createTempDirectory("pwd-state").toString
    val batches = 60 // 4 h of a 4-min cadence
    val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
    (0 until batches).foreach { i =>
      spark.range(200)
        .select((col("id") % 4).cast("string").as("grp"),
          (col("id") % 97).as("key"),
          timestamp_millis(lit(t0 + i * 240000L)
            + (col("id") % 60) * 1000L).as("ts"))
        .coalesce(1).write.mode("append").parquet(src)
      ()
    }
    val w0 = System.nanoTime()
    StreamingSketches.runWindowed(spark, src, ck, state, horizonHours = 2)
    println(f"[wdirs] 60-batch windowed run: ${(System.nanoTime() - w0) / 1e9}%.1fs")
    for (fam <- Seq("qd", "qdtot", "mg", "bloom", "ps", "vo")) {
      val dirs = new java.io.File(s"$state/$fam").listFiles()
      println(s"[wdirs] live dirs $fam: ${
        if (dirs == null) 0 else dirs.count(_.isDirectory)}")
    }
    val q0 = System.nanoTime()
    val n = StreamingSketches.qdQuantilesNow(spark, state,
      Seq((1, 2), (9, 10))).count()
    println(f"[wdirs] qdQuantilesNow over live dirs: " +
      f"${(System.nanoTime() - q0) / 1e9}%.2fs ($n window-group rows)")
    spark.stop()
  }
}
