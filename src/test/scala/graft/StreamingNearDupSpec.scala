package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Streaming LSH near-dup ([[EventStream.runStreamingNearDup]]): a
  * near-duplicate (NOT byte-equal) document arriving in a later batch is
  * flagged against the accumulated signature state; unrelated docs are
  * not; and state directories wholly behind the watermark horizon are
  * swept. */
class StreamingNearDupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private val baseText = ("the quick brown fox jumps over the lazy dog " +
    "while seventy shades of autumn light settle across the river valley " +
    "and every migrating bird follows the same ancient corridor south") * 2

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("event_id", "ts_s", "props")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        lit(0L).as("user_id"), lit("doc").as("event_type"),
        lit(0.0).as("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(dir)

  test("cross-batch near-dup flagged; unrelated not; horizon sweeps state") {
    val src = tmp("nd-src"); val state = tmp("nd-state")
    val out = tmp("nd-out")
    // batch 1: the original doc + an unrelated doc
    writeDocs(src, Seq(
      (1L, "2024-01-01 00:00:00", baseText),
      (2L, "2024-01-01 00:00:00", "completely different content about " +
        "compiler construction, register allocation and graph coloring " * 4)))
    // batch 2 (inside horizon): a NEAR-dup of doc 1 — same text with a
    // small edit, so content hashes differ but shingles mostly agree
    writeDocs(src, Seq(
      (3L, "2024-01-01 01:00:00", baseText + " trailing edit")))
    // batch 3 (far beyond the 2h horizon): forces the state sweep
    writeDocs(src, Seq(
      (4L, "2024-01-02 12:00:00", "fresh unrelated text long after " * 8)))

    EventStream.runStreamingNearDup(spark, src, tmp("nd-ck"), state, out)

    val pairs = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)),
      s"near-dup (1,3) not flagged; got $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"unrelated doc 2 flagged: $pairs")
    // the flagged pair is not byte-equal
    assert(baseText != baseText + " trailing edit")
    // batch 3's cutoff (2024-01-02 10:00) is past batches 0-2's max ts —
    // their state dirs must be gone; batch 3's own state dir remains
    val stateDirs = Option(new java.io.File(state).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("batch_id="))
      .map(_.getName).toSet
    assert(stateDirs == Set("batch_id=2"),
      s"horizon sweep left $stateDirs")
  }

  test("replaying a batch overwrites instead of duplicating") {
    val src = tmp("nd-src2"); val state = tmp("nd-state2")
    val out = tmp("nd-out2")
    writeDocs(src, Seq((1L, "2024-01-01 00:00:00", baseText)))
    writeDocs(src, Seq((2L, "2024-01-01 00:30:00", baseText + " v2")))
    EventStream.runStreamingNearDup(spark, src, tmp("nd-ck2"), state, out)
    val first = spark.read.parquet(out).count()
    // fresh checkpoint replays both batches against existing state/out
    EventStream.runStreamingNearDup(spark, src, tmp("nd-ck3"), state, out)
    assert(spark.read.parquet(out).count() == first)
  }
}
