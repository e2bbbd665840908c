package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "hello world", "en", "srcA", 11L),
    (1L, "a" * 200, "en", "srcA", 200L),
    (2L, "bits and bytes", "en", "srcB", 14L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("toMedia produces binary payload + typed metadata") {
    val m = Multimodal.toMedia(docs).collect()
    assert(m.length == 3)
    val r0 = m.find(_.getLong(0) == 0L).get
    assert(r0.getString(1) == "image")
    assert(new String(r0.getAs[Array[Byte]](2), "UTF-8") == "hello world")
    val meta = r0.getStruct(3)
    assert(meta.getInt(0) == 11 && meta.getLong(2) == 440L)
  }

  test("decodeFeatures is deterministic, distributed, and batch-shaped") {
    val m = Multimodal.toMedia(docs.repartition(2))
    val f1 = Multimodal.mediaFeatures(spark, docs).orderBy("doc_id").collect()
    val f2 = Multimodal.mediaFeatures(spark, docs.repartition(3)).orderBy("doc_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq) // partition-invariant
    val r1 = f1(1)
    assert(r1.getInt(2) == 200)                   // byte_len
    assert(r1.getString(1) == "audio")
    assert(r1.getInt(4) == (200 * 40) / 20)       // audio stub frames
    val feat = f1(0).getAs[scala.collection.Seq[Float]]("feature")
    assert(feat.length == 8 && feat.forall(v => v >= 0f && v <= 1f))
  }

  test("media type cycles image/audio/video by doc_id") {
    val types = Multimodal.toMedia(docs).orderBy("doc_id")
      .select("media_type").collect().map(_.getString(0)).toSeq
    assert(types == Seq("image", "audio", "video"))
  }
}
