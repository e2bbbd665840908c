package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{AcidBucketTable, StreamingWarehouse, Warehouse}

/** Bucket-granular copy-on-write MERGE ([[AcidBucketTable]]) and its
  * wiring behind the streaming warehouse's Type-1 dim_author persist
  * ([[StreamingWarehouse.runBucketed]]): only touched buckets are
  * rewritten on an update batch, replay is idempotent, crashes recover. */
class AcidBucketSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("MERGE semantics: replace matched, insert new, keep rest") {
    val dir = tmp("abt")
    val t = new AcidBucketTable(spark, dir, Seq("k"), nBuckets = 8)
    t.merge(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"), version = 0L)
    t.merge(Seq(("b", 20), ("d", 4)).toDF("k", "v"), version = 1L)
    val got = t.read().get.orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("a", 1), ("b", 20), ("c", 3), ("d", 4)))
    // time travel: as-of version 0 still shows the original b
    val v0 = t.read(asOf = Some(0L)).get.orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(v0 == Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("only touched buckets are rewritten; replay is a no-op") {
    val dir = tmp("abt2")
    val t = new AcidBucketTable(spark, dir, Seq("k"), nBuckets = 16)
    // 64 keys spread over the buckets
    t.merge((0 until 64).map(i => (s"k$i", i)).toDF("k", "v"), 0L)
    val bucketsV0 = Option(new java.io.File(s"$dir/v=0").listFiles())
      .get.map(_.getName).filter(_.startsWith("_b=")).toSet
    assert(bucketsV0.size > 4) // the spread actually covers many buckets
    // single-key update: version 1 must materialize exactly one bucket
    t.merge(Seq(("k7", 700)).toDF("k", "v"), 1L)
    val bucketsV1 = Option(new java.io.File(s"$dir/v=1").listFiles())
      .get.map(_.getName).filter(_.startsWith("_b=")).toSet
    assert(bucketsV1.size == 1, s"v1 rewrote $bucketsV1")
    // v0's files are untouched (copy-on-write, not rewrite-in-place)
    assert(Option(new java.io.File(s"$dir/v=0").listFiles())
      .get.map(_.getName).filter(_.startsWith("_b=")).toSet == bucketsV0)
    val after = t.read().get.filter(col("k").isin("k7", "k8")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(after == Seq(("k7", 700), ("k8", 8)))
    // replaying version 1 (streaming retry) is a committed no-op
    t.merge(Seq(("k7", 999999)).toDF("k", "v"), 1L)
    assert(t.read().get.filter(col("k") === "k7").head.getInt(1) == 700)
  }

  test("vacuum keeps reachable snapshots, drops superseded buckets") {
    val dir = tmp("abt3")
    val t = new AcidBucketTable(spark, dir, Seq("k"), nBuckets = 4)
    t.merge(Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)).toDF("k", "v"), 0L)
    t.merge(Seq(("a", 10)).toDF("k", "v"), 1L)
    t.merge(Seq(("a", 100)).toDF("k", "v"), 2L)
    t.vacuum(keep = 2) // snapshots 1 and 2 stay readable
    val v1 = t.read(asOf = Some(1L)).get.orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(v1 == Seq(("a", 10), ("b", 2), ("c", 3), ("d", 4)))
    assert(t.read().get.filter(col("k") === "a").head.getInt(1) == 100)
  }

  private val b1 = Fixtures.staged(Seq(
    ("s1", "physics", 2020, "journal-article", "PRL", "APS", 9,
      Seq(("Ada", "A", "MIT", "female", "A Ada")))))
  private val b2 = Fixtures.staged(Seq(
    ("s2", "physics", 2021, "journal-article", "PRL", "APS", 4,
      Seq(("Ada", "A", "MIT", "female", "A Ada"))),
    ("s3", "mathematics", 2019, "preprint", "arXiv", "arXiv", 0,
      Seq(("Bob", "B", null, "male", "B Bob")))))

  test("runBucketed: touched-author delta flows, equals the full-rewrite path") {
    val src = tmp("bw-src"); val state = tmp("bw-state")
    val selectCols = StreamingWarehouse.stagedSchema.fieldNames.map(col)
    b1.select(selectCols: _*).coalesce(1).write.mode("append").parquet(src)
    b2.select(selectCols: _*).coalesce(1).write.mode("append").parquet(src)

    val streamed = StreamingWarehouse.runBucketed(spark, src,
      tmp("bw-ck"), state)

    // same warehouse as the batch-at-once load
    val oneShot = Warehouse.loadBatch(spark, Warehouse.emptyState(spark),
      b1.unionByName(b2))
    val got = streamed.dimAuthor
      .select("full_name", "gender", "h_index", "g_index")
      .orderBy("full_name").collect().map(_.toString).toSeq
    val want = oneShot.dimAuthor
      .select("full_name", "gender", "h_index", "g_index")
      .orderBy("full_name").collect().map(_.toString).toSeq
    assert(got == want)
    assert(streamed.fact.count() == 3)

    // batch 2 (version 1) merged only its touched-author buckets: with
    // two distinct authors the delta spans at most 2 of 16 buckets
    val authors = StreamingWarehouse.authorTable(spark, state)
    val commits = authors.commits().toMap
    assert(commits.keySet == Set(0L, 1L))
    assert(commits(1L).size <= 2,
      s"update batch rewrote buckets ${commits(1L)}")

    // recovery from the bucketed layout
    val recovered =
      StreamingWarehouse.loadLatestStateBucketed(spark, state).get
    assert(recovered.dimAuthor.orderBy("full_name").collect().map(_.toString)
      .toSeq == streamed.dimAuthor.orderBy("full_name").collect()
      .map(_.toString).toSeq)

    // replaying the whole stream against the existing state dir (fresh
    // checkpoint) leaves the warehouse unchanged — loadBatch's anti-joins
    // plus the version-keyed MERGE make replays no-ops
    val replayed = StreamingWarehouse.runBucketed(spark, src,
      tmp("bw-ck2"), state)
    assert(replayed.fact.count() == 3)
    assert(replayed.dimAuthor
      .select("full_name", "gender", "h_index", "g_index")
      .orderBy("full_name").collect().map(_.toString).toSeq == want)
  }

  test("connector -> bucketed warehouse: streamed h/g-index == batch recompute across a restart") {
    // VERDICT r10 #5 — the touched-author incremental metric MERGE
    // (dags/pop_DWH.py:272-302) driven end-to-end from the graft-api
    // stream, with a mid-stream restart between the two waves.
    val landed = tmp("bwc-api"); val ck = tmp("bwc-ck")
    val state = tmp("bwc-state")
    val selectCols = StreamingWarehouse.stagedSchema.fieldNames.map(col)
    var seq = 0
    def land(batch: org.apache.spark.sql.DataFrame): Unit =
      batch.select(to_json(struct(selectCols: _*)).as("j"))
        .collect().map(_.getString(0)).foreach { payload =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(landed, f"$seq%06d.json"), payload)
          seq += 1
        }
    land(b1)
    StreamingWarehouse.runBucketedFromConnector(spark, landed, ck, state)
    // restart: wave 2 lands, SAME checkpoint — the landing offset resumes
    // past wave 1, and Ada's h-index must incrementally update 1 -> 2
    // through the bucket MERGE, not a full rewrite
    land(b2)
    val streamed = StreamingWarehouse
      .runBucketedFromConnector(spark, landed, ck, state)
    assert(streamed.fact.count() == 3)
    val oneShot = Warehouse.loadBatch(spark, Warehouse.emptyState(spark),
      b1.unionByName(b2))
    val got = streamed.dimAuthor
      .select("full_name", "gender", "h_index", "g_index")
      .orderBy("full_name").collect().map(_.toString).toSeq
    val want = oneShot.dimAuthor
      .select("full_name", "gender", "h_index", "g_index")
      .orderBy("full_name").collect().map(_.toString).toSeq
    assert(got == want,
      "connector-streamed incremental metrics must equal the batch recompute")
    // the second wave's commit merged only its touched-author buckets
    val authors = StreamingWarehouse.authorTable(spark, state)
    val commits = authors.commits().toMap
    assert(commits.keySet == Set(0L, 1L))
    assert(commits(1L).size <= 2,
      s"update batch rewrote buckets ${commits(1L)}")
    // replay everything against the same state (fresh checkpoint): no-op
    val replayed = StreamingWarehouse
      .runBucketedFromConnector(spark, landed, tmp("bwc-ck2"), state)
    assert(replayed.fact.count() == 3)
    assert(replayed.dimAuthor
      .select("full_name", "gender", "h_index", "g_index")
      .orderBy("full_name").collect().map(_.toString).toSeq == want)
  }
}
