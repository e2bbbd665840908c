package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextPipelineQueries
import graft.streaming.StreamingTextPipeline

/** Streamed == batch for THE training-data pipeline
  * ([[StreamingTextPipeline]], VERDICT r8 #6): the sf0.001 documents
  * corpus split into 3 arrival batches must produce BIT-IDENTICAL final
  * output to the batch `pipe_end_to_end` — including cross-batch near-dup
  * drops, quarantine decontamination, and packing offsets — because both
  * run the same stage functions over (accumulated state vs the full
  * table). */
class StreamingTextPipelineSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("3-batch streamed pipeline equals batch pipe_end_to_end bit-for-bit") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    val src = tmp("stp-src")
    // three arrival batches (one file each; maxFilesPerTrigger=1)
    (0 until 3).foreach { i =>
      docs.filter(col("doc_id") % 3 === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val out = tmp("stp-out")
    StreamingTextPipeline.run(spark, src, tmp("stp-ck"), tmp("stp-state"), out)

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "n_tokens", "stream_offset", "seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
      .toSeq

    val streamed = rows(spark.read.parquet(out))
    val batch = rows(SparkEntry.queries("pipe_end_to_end")(spark, sfDir))
    assert(streamed.nonEmpty, "streamed pipeline produced no rows")
    assert(streamed == batch)
  }

  test("graft-api connector -> pipeline equals batch across a mid-stream restart") {
    // VERDICT r9 #4: the two r9 streaming wins composed — the SAME
    // incremental stages driven from spark.readStream.format("graft-api")
    // over a 3-batch landing journal, with a restart after batch 1. The
    // landing-journal offset must resume past consumed files (no doc
    // processed twice) and the final view must equal batch
    // pipe_end_to_end bit-for-bit.
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    val rows = docs
      .select(col("doc_id"), to_json(struct(docs.columns.map(col): _*))
        .as("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val landed = tmp("cstp-land")
    var seq = 0
    // monotonically-named files — the landing-zone contract the
    // connector's file-count offset assumes
    def land(batchNo: Int): Unit = {
      rows.filter(_._1 % 3 == batchNo).foreach { case (_, payload) =>
        Files.writeString(
          java.nio.file.Paths.get(landed, f"$seq%06d.json"), payload)
        seq += 1
      }
    }
    val out = tmp("cstp-out"); val ck = tmp("cstp-ck")
    val state = tmp("cstp-state")
    land(0)
    StreamingTextPipeline.runFromConnector(spark, landed, ck, state, out)
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0, "first connector run produced no rows")
    // mid-stream restart: two more landing waves, SAME checkpoint
    land(1); land(2)
    StreamingTextPipeline.runFromConnector(spark, landed, ck, state, out)

    // exactly-once: each doc appears in exactly one per-doc state batch
    val perDoc = spark.read.parquet(s"$state/perdoc")
    val dupes = perDoc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dupes == 0, s"$dupes doc(s) processed more than once")
    assert(perDoc.select(col("doc_id")).distinct().count() == rows.length)

    def proj(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "n_tokens", "stream_offset", "seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
      .toSeq
    val streamed = proj(spark.read.parquet(out))
    val batch = proj(SparkEntry.queries("pipe_end_to_end")(spark, sfDir))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("re-running the stream over the same checkpoint is a no-op") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 120)
    val src = tmp("stp2-src")
    (0 until 2).foreach { i =>
      docs.filter(col("doc_id") % 2 === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val out = tmp("stp2-out"); val ck = tmp("stp2-ck")
    val state = tmp("stp2-state")
    StreamingTextPipeline.run(spark, src, ck, state, out)
    val first = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    // same checkpoint, no new files: AvailableNow finds nothing to do and
    // the view must be byte-identical (retry/restart safety)
    StreamingTextPipeline.run(spark, src, ck, state, out)
    val second = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(first.nonEmpty && first == second)
  }
}
