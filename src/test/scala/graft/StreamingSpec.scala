package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStream, ParquetUpsertTable}

/** Structured Streaming semantics vs the batch twins: windowed counts via
  * AvailableNow equal the batch aggregation; foreachBatch upsert is
  * incremental and idempotent; invalid rows dead-letter. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def writeEvents(dir: String, part: Int, rows: Seq[(Long, String, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(dir)

  private val batch1 = Seq(
    (0L, "2024-01-01 00:10:00", 1L, "view", 1.0, "{}"),
    (1L, "2024-01-01 00:50:00", 1L, "click", 2.0, "{}"),
    (2L, "2024-01-01 01:10:00", 2L, "view", 3.0, "{}"))
  private val batch2 = Seq(
    (3L, "2024-01-01 01:20:00", 1L, "view", 4.0, "{}"),
    (4L, "2024-01-01 02:05:00", 2L, "view", 5.0, "{}"))

  test("AvailableNow windowed counts equal the batch twin") {
    val src = tmp("ev-src")
    writeEvents(src, 1, batch1)
    writeEvents(src, 2, batch2)
    val got = EventStream.runWindowedAvailableNow(
        spark, src, tmp("ev-ckpt"), "win_sink")
      .orderBy("window_start", "event_type").collect()
    val want = EventStream.windowedCounts(
        spark.read.schema(EventStream.eventSchema).parquet(src))
      .orderBy("window_start", "event_type").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    assert(got.length == 4) // (00h view, 00h click, 01h view, 02h view)
  }

  test("foreachBatch incremental upsert accumulates across batches, replay-safe") {
    val src = tmp("ev-src2")
    val tableDir = tmp("ev-table")
    val table = new ParquetUpsertTable(spark, tableDir, "user_id",
      Seq("n_events", "sum_value"))
    writeEvents(src, 1, batch1)
    EventStream.runIncrementalUserStats(spark, src, tmp("ev-ck2"), table)
    val after1 = table.current.get.orderBy("user_id").collect()
    assert(after1.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L)))

    writeEvents(src, 2, batch2)
    EventStream.runIncrementalUserStats(spark, src, tmp("ev-ck3"), table)
    // The fresh checkpoint re-reads file 1 as batch 0 again — the table's
    // version guard makes that replay a no-op, and only file 2's delta
    // (batch 1 -> v1) lands. Totals: user1 = 2+1 events (1+2+4 value),
    // user2 = 1+1 events (3+5 value).
    val fin = table.current.get.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fin == Seq((1L, 3L, 7.0), (2L, 2L, 8.0)))
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    val src = tmp("ev-src4")
    writeEvents(src, 1, batch1)
    writeEvents(src, 2, batch2)
    val fin = graft.streaming.StatefulCounts
      .run(spark, src, tmp("ev-ck5"), "state_sink")
      .orderBy("userId").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // user1: events 0,1,3 -> n=3, sum=1+2+4; user2: events 2,4 -> n=2, sum=8
    assert(fin == Seq((1L, 3L, 7.0), (2L, 2L, 8.0)))
  }

  test("flatMapGroupsWithState sessionization: gap closes in-data, timeout closes via watermark") {
    val src = tmp("ev-sess-src")
    // file 1: user1 has two events 2 min apart (one session)
    writeEvents(src, 1, Seq(
      (0L, "2024-01-01 00:10:00", 1L, "view", 1.0, "{}"),
      (1L, "2024-01-01 00:12:00", 1L, "click", 1.0, "{}")))
    // file 2: user1 reappears 48 min later (> 30-min gap -> closes the
    // first session IN-DATA and opens a second)
    writeEvents(src, 2, Seq(
      (2L, "2024-01-01 01:00:00", 2L, "view", 1.0, "{}"),
      (3L, "2024-01-01 01:00:00", 1L, "view", 1.0, "{}")))
    // file 3: only user2 activity at 01:45 -> watermark (01:35) passes
    // user1's timeout (01:00 + 30 min) and the TIMEOUT closes session 2
    writeEvents(src, 3, Seq(
      (4L, "2024-01-01 01:45:00", 2L, "view", 1.0, "{}")))
    val out = graft.streaming.StreamingSessions
      .run(spark, src, tmp("ev-sess-ck"), "sess_sink", gapSeconds = 1800L)
      .orderBy("user_id", "session_start_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user1 session 1: 00:10-00:12, 2 events (closed by the in-data gap)
    // user1 session 2 AND user2's 01:00 session: closed by the
    // event-time TIMEOUT once the watermark (01:35) passes 01:30
    // user2's 01:45 session is still OPEN state -> absent from output
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00").getTime / 1000
    assert(out.toSeq == Seq(
      (1L, t0, t0 + 120, 2L),
      (1L, t0 + 3000, t0 + 3000, 1L),
      (2L, t0 + 3000, t0 + 3000, 1L)))
  }

  test("batched client fetches in <=batchSize groups inside partitions") {
    import spark.implicits._
    val ids = (0 until 137).map(i => s"id$i").toDS().repartition(3)
    val got = graft.sources.BatchedClient.fetchBatched(ids, 50) { group =>
      assert(group.size <= 50 && group.nonEmpty)
      group.map(id => id -> s"payload-of-$id")
    }.collect()
    assert(got.length == 137)
    assert(got.forall(r => r.getString(1) == s"payload-of-${r.getString(0)}"))
  }

  test("streaming dedup drops within-watermark duplicate content") {
    val src = tmp("ev-dd-src")
    writeEvents(src, 1, Seq(
      (0L, "2024-01-01 00:10:00", 1L, "view", 1.0, "A"),
      (1L, "2024-01-01 00:11:00", 2L, "view", 1.0, "B"),
      (2L, "2024-01-01 00:12:00", 3L, "view", 1.0, "A"))) // in-batch dup
    writeEvents(src, 2, Seq(
      (3L, "2024-01-01 00:20:00", 4L, "view", 1.0, "B"),  // cross-batch dup
      (4L, "2024-01-01 00:21:00", 5L, "view", 1.0, "C")))
    val out = EventStream.runDedupAvailableNow(
      spark, src, tmp("ev-dd-ck"), tmp("ev-dd-out"))
    val kept = out.select(col("props")).collect().map(_.getString(0)).sorted
    assert(kept.toSeq == Seq("A", "B", "C"))
  }

  test("dead-letter split: invalid rows land in failures") {
    val src = tmp("ev-src3")
    val out = tmp("ev-out")
    writeEvents(src, 1, batch1 ++ Seq(
      (9L, "2024-01-01 03:00:00", 3L, null.asInstanceOf[String], 1.0, "{}"),
      (10L, "2024-01-01 03:01:00", 3L, "view", -5.0, "{}")))
    EventStream.runWithDeadLetter(spark, src, tmp("ev-ck4"), out)
    val clean = spark.read.parquet(s"$out/clean").count()
    val failed = spark.read.parquet(s"$out/failures").count()
    assert(clean == 3 && failed == 2)
  }
}
