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

  test("imageRoundtrip: decoded PNG sums equal the closed-form grid") {
    val stats = Multimodal.imageRoundtrip(spark, docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(stats.size == 3)
    for (id <- 0L to 2L) {
      val (w, h) = (Multimodal.gridW(id), Multimodal.gridH(id))
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += Multimodal.gridR(id, x, y)
        sg += Multimodal.gridG(id, x, y)
        sb += Multimodal.gridB(id, x, y)
      }
      assert(stats(id) == ((w, h, sr, sg, sb)),
        s"doc $id: codec roundtrip diverged from closed form")
    }
  }

  test("jpegRoundtrip: real lossy codec path — dims exact, means within tolerance, deterministic") {
    def run() = Multimodal.jpegRoundtrip(spark, docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getBoolean(3), r.getBoolean(4))).sortBy(_._1).toSeq
    val stats = run()
    assert(stats.size == 3)
    stats.foreach { case (id, w, h, nonEmpty, meansOk) =>
      assert(w == Multimodal.gridW(id) && h == Multimodal.gridH(id),
        s"doc $id: JPEG decode changed dimensions")
      assert(nonEmpty, s"doc $id: empty JPEG bitstream")
      assert(meansOk, s"doc $id: channel means drifted beyond the DC bound")
    }
    // the same JVM's encoder is deterministic — reruns identical
    assert(stats == run())
  }

  test("decodeOne: real ImageIO path for decodable images, stub otherwise") {
    // a genuine 3x2 PNG payload routed through media_type=image
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00); img.setRGB(2, 0, 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val realDocs = Seq((0L, bos.toByteArray)).toDF("doc_id", "png")
    import spark.implicits._
    val media = realDocs.select(col("doc_id"), lit("image").as("media_type"),
      col("png").as("payload"),
      struct(lit(3).as("width"), lit(2).as("height"),
        lit(0L).as("duration_ms"), lit("png").as("codec")).as("meta"))
      .as[Multimodal.MediaRecord]
    val f = Multimodal.decodeFeatures(media).collect().head
    assert(f.feature(0) == 3.0f && f.feature(1) == 2.0f) // real decoded dims
    assert(f.feature(2) == 255.0f / 6)                   // mean red: one red pixel
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

  test("imageResize: 4x4 nearest-neighbor thumbnail equals closed-form samples") {
    val docs = Seq(0L, 7L, 42L).toDF("doc_id")
    val out = Multimodal.imageResize(spark, docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    for (id <- Seq(0L, 7L, 42L)) {
      val (w, h) = (Multimodal.gridW(id), Multimodal.gridH(id))
      val pts = for (ty <- 0 until 4; tx <- 0 until 4)
        yield (tx * w / 4, ty * h / 4)
      val (er, eg, eb) = (
        pts.map { case (x, y) => Multimodal.gridR(id, x, y).toLong }.sum,
        pts.map { case (x, y) => Multimodal.gridG(id, x, y).toLong }.sum,
        pts.map { case (x, y) => Multimodal.gridB(id, x, y).toLong }.sum)
      assert(out(id) == ((w, h, er, eg, eb)))
    }
  }

  test("videoFrameSample: demuxed PNG container frames equal closed-form sums") {
    val docs = Seq(0L, 3L, 11L).toDF("doc_id")
    val out = Multimodal.videoFrameSample(spark, docs, everyK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    for (id <- Seq(0L, 3L, 11L)) {
      val (w, h) = (Multimodal.gridW(id), Multimodal.gridH(id))
      val sampled = (0 until Multimodal.vidFrames(id)).filter(_ % 2 == 0)
      // exactly the sampled frames appear — skipped ones never decode
      assert(out.keys.count(_._1 == id) == sampled.size)
      for (f <- sampled) {
        val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
        val (er, eg, eb) = (
          px.map { case (x, y) => Multimodal.vidR(id, f, x, y).toLong }.sum,
          px.map { case (x, y) => Multimodal.vidG(id, f, x, y).toLong }.sum,
          px.map { case (x, y) => Multimodal.vidB(id, f, x, y).toLong }.sum)
        assert(out((id, f)) == ((w, h, er, eg, eb)))
      }
    }
  }

  test("gifRoundtrip: animated GIF frames decode to exact closed-form sums") {
    val docs = Seq(0L, 3L, 11L).toDF("doc_id")
    val out = Multimodal.gifRoundtrip(spark, docs)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    for (id <- Seq(0L, 3L, 11L)) {
      val (w, h) = (Multimodal.gridW(id), Multimodal.gridH(id))
      // EVERY frame of the animation comes back, in order
      assert(out.keys.count(_._1 == id) == Multimodal.vidFrames(id))
      for (f <- 0 until Multimodal.vidFrames(id)) {
        val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
        val (er, eg, eb) = (
          px.map { case (x, y) => Multimodal.vidR(id, f, x, y).toLong }.sum,
          px.map { case (x, y) => Multimodal.vidG(id, f, x, y).toLong }.sum,
          px.map { case (x, y) => Multimodal.vidB(id, f, x, y).toLong }.sum)
        // palette-exact encode ⇒ NO tolerance — lossless through the
        // real GIF codec
        assert(out((id, f)) == ((w, h, er, eg, eb)))
      }
    }
  }

  test("audioRoundtrip: real WAV encode/decode preserves exact sample stats") {
    val docs = Seq(0L, 5L, 123L).toDF("doc_id")
    val out = Multimodal.audioRoundtrip(spark, docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for (id <- Seq(0L, 5L, 123L)) {
      val n = Multimodal.wavN(id)
      val vs = (0 until n).map(i => Multimodal.wavSample(id, i).toLong)
      assert(out(id) == ((8000, n.toLong, n.toLong * 125,
        vs.sum, vs.map(math.abs).sum)))
    }
  }
}
