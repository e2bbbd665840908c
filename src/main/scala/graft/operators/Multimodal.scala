package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata structs, plus a partition-batched decode/feature-extract
  * operator.
  *
  * Two decode paths:
  *  - [[imageRoundtrip]] — a REAL codec path: per row, a PNG is encoded
  *    (`javax.imageio`, the one codec stack in a bare JVM) from pixels
  *    that are a closed-form function of `doc_id`, then decoded back and
  *    reduced to integer pixel sums. PNG is lossless, so the decoded sums
  *    equal the closed form — which a SQL oracle can recompute exactly.
  *  - [[decodeFeatures]] — the generic byte-payload path. For `image`
  *    payloads it first tries a real `ImageIO` decode; for non-image
  *    bytes (this corpus: UTF-8 text standing in for encoded media) it
  *    falls back to the clearly-marked deterministic STUB.
  * Either way the Spark-side plumbing is what matters at scale — declared
  * schema, binary columns, partition-batched iteration (the Scala shape of
  * a batched pandas-UDF: amortize per-batch codec-context setup across
  * `batchSize` records), and no driver-side collection anywhere.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, duration_ms: Long, codec: String)
  case class MediaRecord(doc_id: Long, media_type: String,
      payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Int,
      checksum: Long, n_frames: Int, feature: Array[Float])

  /** Derive a media table from `documents`: payload = UTF-8 bytes of the
    * text (stands in for encoded media), media_type cycles deterministically,
    * metadata derived from n_chars. */
  def toMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 40).cast("long").as("duration_ms"),
        lit("stub-v0").as("codec")).as("meta"))

  /** Batch size for the partition-batched decode — the knob that a real
    * decoder would use to amortize codec-context setup. */
  val decodeBatchSize = 64

  /** Partition-batched decode / feature extraction. Runs fully distributed;
    * each partition iterates in `decodeBatchSize` groups. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      codecInit()
      it.grouped(decodeBatchSize).flatMap { batch =>
        // A real implementation would open one codec context per batch
        // here and decode `batch` through it.
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** Decode one record: real `ImageIO` decode for image payloads that
    * actually parse (PNG/BMP/GIF/JPEG — the bare-JVM codec set), STUB
    * fallback otherwise (this corpus's payloads are text bytes). */
  private def decodeOne(m: MediaRecord): MediaFeatures =
    (if (m.media_type == "image") imageFeatures(m.doc_id, m.payload) else None)
      .getOrElse(decodeStub(m))

  /** Real image decode: parse the bytes with `javax.imageio` (PNG/BMP/
    * GIF/JPEG — the bare-JVM codec set). Returns None when the payload
    * isn't a decodable image (ImageIO.read yields null) — the caller
    * falls back to the stub. Checksum stays the byte-rolling hash
    * (content identity); nFrames = 1; feature = [w, h, mean r/g/b] —
    * what a real extractor's head would see. */
  private[operators] def imageFeatures(docId: Long, payload: Array[Byte]): Option[MediaFeatures] =
    decodeSums(payload).map { case (w, h, sr, sg, sb) =>
      val n = (w * h).toFloat
      val checksum = payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xFFFFFFFFL)
      MediaFeatures(docId, "image", payload.length, checksum, 1,
        Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n))
    }

  /** The codec call itself: decode bytes → (width, height, exact integer
    * RGB channel sums). None when the bytes aren't a decodable image. */
  private[operators] def decodeSums(payload: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        (w, h, sr, sg, sb)
      }
      // NonFatal, not just IOException: ImageIO throws RuntimeExceptions
      // (ArrayIndexOutOfBounds, IllegalArgument, NegativeArraySize) on
      // hostile/truncated headers; any decode failure degrades to the stub
      // instead of failing the task.
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder — deterministic fake in place of a real codec call. */
  private def decodeStub(m: MediaRecord): MediaFeatures = {
    val checksum = m.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xFFFFFFFFL)
    val nFrames = m.media_type match {
      case "video" => (m.meta.duration_ms / 40).toInt // 25 fps stub
      case "audio" => (m.meta.duration_ms / 20).toInt
      case _       => 1
    }
    // "Feature vector": first 8 payload bytes, scaled — a stand-in for an
    // embedding a real extractor would emit.
    val feature = m.payload.take(8).map(b => (b & 0xff) / 255.0f)
    MediaFeatures(m.doc_id, m.media_type, m.payload.length, checksum, nFrames, feature)
  }

  /** Fan the documents scan out before per-row codec work: the test
    * corpora are single-row-group parquet, so the scan arrives as ONE
    * partition and a codec `mapPartitions` placed directly on it runs
    * single-threaded at local[32] (r16 measurement: mm_decode_gif 13.1 s
    * with 31 idle cores). One narrow exchange of bare 8-byte doc_ids
    * hash-splits the work across all cores — the same fix the dedup
    * family carries at `Dedup.scala:149` for the same single-row-group
    * pathology. At cluster scale the scan arrives already split and this
    * stays one cheap id-only exchange; the payload bytes a real lake
    * would attach are read AFTER the split, never shuffled.
    *
    * The partition COUNT must be explicit: the shuffled ids are ~8
    * bytes/row, far under AQE's advisory partition size, so a bare
    * `repartition(col)` (REPARTITION_BY_COL origin) gets coalesced
    * right back to ONE partition — AQE sizes by bytes and cannot see
    * the per-row codec cost downstream. `repartition(n, col)`
    * (REPARTITION_BY_NUM) is exempt from coalescing; n = the session's
    * shuffle parallelism. Measured (r17): without the explicit count
    * mm_decode_gif stayed at 14.8 s — the fan-out was silently undone. */
  private def fannedIds(documents: DataFrame): Dataset[Long] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("doc_id"))
      .as[Long]
  }

  /** Once the fan-out exists, the codec stack itself must be concurrency
    * clean: `ImageIO` defaults to FILE-backed Image{In,Out}putStream
    * caches, so every `ImageIO.write`/`read` call creates, fills, and
    * deletes a temp file — ~25k of them for one frame-sample pass — and
    * 32 concurrent tasks serialize on the temp-dir filesystem instead
    * of decoding (measured r17: mm_frame_sample 4.8 s single-threaded →
    * 12.9 s at 32-way WITH the default cache). Memory-backed streams
    * keep the roundtrips in-heap. Idempotent, called at the top of each
    * codec partition so it runs once per executor JVM regardless of
    * which operator a task hits first. */
  private[operators] def codecInit(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  /** Frame sampling over binary payloads: split each payload into
    * fixed-size byte frames (posexplode of computed offsets + binary
    * substring — all relational, no decode), yielding one row per frame
    * with its length and content hash. The real-codec version would
    * replace the byte slice with an I-frame extraction at the same
    * operator shape. */
  def sampleFrames(media: DataFrame, frameBytes: Int): DataFrame =
    media
      // empty payloads yield no frames (unguarded, floor((0-1)/n) = -1 and
      // sequence(0,-1) emits [0,-1] — two spurious rows)
      .filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"), col("media_type"), col("payload"),
        explode(sequence(lit(0),
          floor((octet_length(col("payload")) - 1) / frameBytes).cast("int")))
          .as("frame_idx"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        octet_length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))

  /** End-to-end media pipeline as a DataFrame op (for the query layer). */
  def mediaFeatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    decodeFeatures(toMedia(documents).as[MediaRecord]).toDF()
  }

  case class ImageStats(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Closed-form pixel grid for [[imageRoundtrip]]: dimensions and RGB are
    * pure integer functions of (doc_id, x, y), so an oracle can recompute
    * the decoded sums with SQL arithmetic alone. */
  private[graft] def gridW(id: Long): Int = (8 + id % 9).toInt   // 8..16
  private[graft] def gridH(id: Long): Int = (6 + id % 5).toInt   // 6..10
  private[graft] def gridR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  private[graft] def gridG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 11 + y * 3) % 256).toInt
  private[graft] def gridB(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 5 + y * 19) % 256).toInt

  /** REAL codec roundtrip, fully distributed and oracle-checkable: per
    * doc, render the closed-form pixel grid, ENCODE it to genuine PNG
    * bytes, DECODE those bytes back through `javax.imageio`, and reduce
    * the decoded bitmap to integer channel sums. PNG is lossless, so the
    * sums equal the closed form — any codec bug (stride, channel order,
    * color model) breaks the oracle hash. Partition-batched like
    * [[decodeFeatures]]; a real pipeline would swap the synthetic render
    * for bytes read from the lake and keep everything downstream. */
  def imageRoundtrip(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    fannedIds(documents).mapPartitions { it =>
      codecInit()
      it.grouped(decodeBatchSize).flatMap { batch =>
        // one encoder/decoder context per batch (amortization point)
        batch.iterator.map { id =>
          val (w, h) = (gridW(id), gridH(id))
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (gridR(id, x, y) << 16) | (gridG(id, x, y) << 8) | gridB(id, x, y))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val png = bos.toByteArray                       // real PNG bytes
          val (dw, dh, sr, sg, sb) = decodeSums(png).getOrElse(
            sys.error(s"PNG roundtrip failed for doc $id"))
          ImageStats(id, dw, dh, sr, sg, sb)
        }
      }
    }.toDF()
  }

  case class JpegStats(doc_id: Long, width: Int, height: Int,
      jpeg_bytes_gt_zero: Boolean, jpeg_mean_within_tol: Boolean)

  /** REAL JPEG roundtrip (VERDICT r10 #8 — real-world corpora are
    * JPEG-heavy; `javax.imageio` ships the codec): render the closed-form
    * grid, ENCODE to genuine JPEG bytes, DECODE back, and compare the
    * decoded per-channel MEANS against the closed form. JPEG is lossy so
    * no cross-engine closed form exists for the pixel sums — the
    * oracle-checkable contract is the part that IS exact (doc_id, the
    * decoded dimensions, a non-empty bitstream) plus the accuracy bound:
    * DCT quantization perturbs per-pixel values but preserves block DC
    * terms, so the whole-image channel mean stays within a small
    * tolerance (±8 of 0..255 is generous for any compliant encoder
    * quality). Same partition-batched shape as [[imageRoundtrip]]. */
  def jpegRoundtrip(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    fannedIds(documents).mapPartitions { it =>
      codecInit()
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator.map { id =>
          val (w, h) = (gridW(id), gridH(id))
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var (er, eg, eb) = (0L, 0L, 0L) // closed-form exact sums
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, b) = (gridR(id, x, y), gridG(id, x, y), gridB(id, x, y))
              er += r; eg += g; eb += b
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          val jpeg = bos.toByteArray                    // real JPEG bytes
          val (dw, dh, sr, sg, sb) = decodeSums(jpeg).getOrElse(
            sys.error(s"JPEG roundtrip failed for doc $id"))
          val n = (w * h).toLong
          val tol = 8L
          // compare SUMS against tol·n — exact integer arithmetic; the
          // per-side mean truncation (sr/n vs er/n) would widen the
          // effective tolerance to ±(tol+1)
          val meansOk = math.abs(sr - er) <= tol * n &&
            math.abs(sg - eg) <= tol * n &&
            math.abs(sb - eb) <= tol * n
          JpegStats(id, dw, dh, jpeg.nonEmpty, meansOk)
        }
      }
    }.toDF()
  }

  case class ThumbStats(doc_id: Long, width: Int, height: Int,
      thumb_w: Int, thumb_h: Int, t_sum_r: Long, t_sum_g: Long,
      t_sum_b: Long)

  /** REAL image RESIZE through the codec (the brief's named multimodal
    * op): encode the closed-form grid to genuine PNG, decode it back,
    * then nearest-neighbor downsample to a `tw`×`th` thumbnail —
    * `src(x, y) = (tx·w DIV tw, ty·h DIV th)`, floor sampling, so every
    * sampled pixel is SQL-recomputable from the grid formulas and the
    * integer channel sums of the thumbnail hash against the twin.
    * (Bilinear would average fractional weights — float order enters —
    * which is why production thumbnailers that must be reproducible,
    * e.g. dataset dedup by thumbnail hash, pin nearest-neighbor too.)
    * Partition-batched like [[decodeFeatures]]. */
  def imageResize(spark: SparkSession, documents: DataFrame,
      tw: Int = 4, th: Int = 4): DataFrame = {
    import spark.implicits._
    fannedIds(documents).mapPartitions { it =>
      codecInit()
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator.map { id =>
          val (w, h) = (gridW(id), gridH(id))
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (gridR(id, x, y) << 16) | (gridG(id, x, y) << 8) | gridB(id, x, y))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val decoded = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          var (sr, sg, sb) = (0L, 0L, 0L)
          var ty = 0
          while (ty < th) {
            var tx = 0
            while (tx < tw) {
              val rgb = decoded.getRGB(tx * decoded.getWidth / tw,
                ty * decoded.getHeight / th)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              tx += 1
            }
            ty += 1
          }
          ThumbStats(id, decoded.getWidth, decoded.getHeight, tw, th,
            sr, sg, sb)
        }
      }
    }.toDF()
  }

  case class FrameStats(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Closed-form per-frame pixel grid for [[videoFrameSample]]: frame
    * count and RGB are exact integer functions of (doc_id, frame, x, y),
    * so the oracle recomputes the decoded sums with SQL arithmetic. */
  private[graft] def vidFrames(id: Long): Int = (2 + id % 4).toInt // 2..5
  private[graft] def vidR(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt
  private[graft] def vidG(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 17 + f * 29 + x * 11 + y * 3) % 256).toInt
  private[graft] def vidB(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 23 + f * 37 + x * 5 + y * 19) % 256).toInt

  /** REAL multi-frame decode — retires the last stubbed media path: per
    * doc a genuine multi-frame CONTAINER is built (length-prefixed PNG
    * frames — the chunked layout AVI/MP4 atoms use, with PNG as the
    * per-frame codec since it's the bare JVM's lossless one), then the
    * consumer side DEMUXES the container by its length index and decodes
    * every `everyK`-th frame through `javax.imageio` — real frame
    * sampling, the I-frame-stride shape a video pre-training pipeline
    * runs (decode only what you sample; skipped frames are skipped at
    * the demux level and never hit the codec). Each sampled frame
    * reduces to exact integer channel sums; PNG is lossless, so the
    * sums equal the closed-form grid and the DuckDB twin recomputes
    * them. Partition-batched; nothing touches the driver. */
  def videoFrameSample(spark: SparkSession, documents: DataFrame,
      everyK: Int = 2): DataFrame = {
    import spark.implicits._
    fannedIds(documents).mapPartitions { it =>
      codecInit()
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { id =>
          val (w, h) = (gridW(id), gridH(id))
          val nf = vidFrames(id)
          // encode: one container of nf length-prefixed PNG frames
          val bos = new java.io.ByteArrayOutputStream()
          val dos = new java.io.DataOutputStream(bos)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y, (vidR(id, f, x, y) << 16) |
                  (vidG(id, f, x, y) << 8) | vidB(id, f, x, y))
                x += 1
              }
              y += 1
            }
            val fb = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", fb)
            val png = fb.toByteArray
            dos.writeInt(png.length)
            dos.write(png)
            f += 1
          }
          val container = bos.toByteArray // real multi-frame media bytes
          // demux + sampled decode (container knowledge ends here: the
          // reader walks the length index to EOF, decoding only sampled
          // frames)
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(container))
          val out = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
          var idx = 0
          while (in.available() >= 4) {
            val len = in.readInt()
            val png = new Array[Byte](len)
            in.readFully(png)
            if (idx % everyK == 0) {
              val (dw, dh, sr, sg, sb) = decodeSums(png).getOrElse(
                sys.error(s"frame decode failed for doc $id frame $idx"))
              out += FrameStats(id, idx, dw, dh, sr, sg, sb)
            }
            idx += 1
          }
          out.iterator
        }
      }
    }.toDF()
  }

  case class GifStats(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL ANIMATED-GIF roundtrip (r12): per doc, the closed-form video
    * frames ([[vidR]]/[[vidG]]/[[vidB]], [[vidFrames]] of them) are
    * encoded into ONE genuine multi-frame GIF89a through
    * `javax.imageio`'s sequence writer, then ALL frames are decoded back
    * through a fresh reader and reduced to exact integer channel sums.
    *
    * GIF is palette-based; each frame here has ≤ w·h ≤ 160 distinct
    * colors < 256, so building the frame as a `TYPE_BYTE_INDEXED` image
    * over its own EXACT palette makes the encode LOSSLESS — no
    * quantizer runs, the decoded sums equal the closed form with no
    * tolerance, and the DuckDB twin recomputes them with SQL
    * arithmetic (the same contract as the PNG paths, unlike the
    * DC-bounded JPEG one). Partition-batched; nothing on the driver. */
  def gifRoundtrip(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    fannedIds(documents).mapPartitions { it =>
      codecInit()
      // One GIF writer/reader per PARTITION (registry lookup once,
      // `reset()` between docs) — the per-batch codec context the decode
      // paths promise, here also skipping ~2 registry scans per doc.
      val gifWriter = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
      val gifReader = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { id =>
          val (w, h) = (gridW(id), gridH(id))
          val nf = vidFrames(id)
          val frames = (0 until nf).map { f =>
            // exact per-frame palette (insertion-ordered, ≤ 160 entries)
            val colors = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
            val idxPix = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = (vidR(id, f, x, y) << 16) |
                  (vidG(id, f, x, y) << 8) | vidB(id, f, x, y)
                val pi = colors.getOrElseUpdate(rgb, colors.size)
                idxPix(y * w + x) = pi.toByte
                x += 1
              }
              y += 1
            }
            val cmap = new Array[Int](colors.size)
            colors.foreach { case (rgb, i) => cmap(i) = rgb }
            val icm = new java.awt.image.IndexColorModel(8, cmap.length,
              cmap, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            img.getRaster.setDataElements(0, 0, w, h, idxPix)
            img
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          gifWriter.setOutput(ios)
          gifWriter.prepareWriteSequence(null)
          frames.foreach { img =>
            gifWriter.writeToSequence(new javax.imageio.IIOImage(img, null,
              gifWriter.getDefaultImageMetadata(
                new javax.imageio.ImageTypeSpecifier(img),
                gifWriter.getDefaultWriteParam)),
              gifWriter.getDefaultWriteParam)
          }
          gifWriter.endWriteSequence(); ios.close(); gifWriter.reset()
          val gif = bos.toByteArray // real animated-GIF bytes
          gifReader.setInput(javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(gif)))
          val n = gifReader.getNumImages(true)
          val out = (0 until n).map { f =>
            val img = gifReader.read(f)
            val (dw, dh) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < dh) {
              var x = 0
              while (x < dw) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            GifStats(id, f, dw, dh, sr, sg, sb)
          }
          gifReader.reset()
          out.iterator
        }
      }
    }.toDF()
  }

  // ---- real audio codec path ------------------------------------------

  case class AudioStats(doc_id: Long, sample_rate: Int, n_samples: Long,
      duration_us: Long, sum_samples: Long, sum_abs: Long)

  /** Closed-form PCM signal for [[audioRoundtrip]] — sample count and
    * 16-bit values are exact integer functions of `doc_id`, so the
    * decoded stats are SQL-recomputable (the PNG grid's discipline). */
  private[graft] def wavN(id: Long): Int = (800 + id % 401).toInt
  private[graft] def wavSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 7) % 65536L) - 32768L).toInt
  private[graft] val wavRate = 8000 // Hz; divides 1e6 so duration is exact

  /** REAL audio codec roundtrip — the WAV analog of [[imageRoundtrip]],
    * retiring the audio side of the decode stub: per row a 16-bit mono
    * PCM signal (closed form of doc_id) is encoded to actual WAV bytes
    * via `javax.sound.sampled` (the JVM's built-in audio stack, works
    * headless), decoded back through `AudioSystem.getAudioInputStream`
    * (header parse, format negotiation), and reduced to exact integer
    * stats: frame count, µs duration (rate divides 10⁶), signed sum and
    * absolute sum of samples. PCM WAV is lossless, so the decoded sums
    * equal the closed form and the DuckDB twin recomputes them.
    * Partition-batched like every decode path; nothing touches the
    * driver. */
  def audioRoundtrip(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    fannedIds(documents).mapPartitions { it =>
      codecInit()
      // One codec context per PARTITION — the amortization the batched
      // shape exists for, and here it is mandatory for parallelism, not
      // just nice: `AudioSystem.write`/`getAudioInputStream` route EVERY
      // call through the JDK sound stack's static-SYNCHRONIZED provider
      // lookup, a single global lock that serialized the 32 fanned tasks
      // (measured r17: 1.05 s single-threaded → 3.6 s at 32-way through
      // AudioSystem). The SPI itself is public (`java.desktop` declares
      // `provides javax.sound.sampled.spi.AudioFile{Reader,Writer}`), so
      // resolve the WAV providers ONCE here and call them lock-free.
      import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
      import scala.jdk.CollectionConverters._
      val wavWriter = java.util.ServiceLoader.load(classOf[AudioFileWriter])
        .asScala.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
        .getOrElse(sys.error("no WAVE AudioFileWriter SPI in this JVM"))
      val audioReaders = java.util.ServiceLoader.load(classOf[AudioFileReader])
        .asScala.toList
      // Probe-pick the ONE reader that accepts this WAV layout at init:
      // trying the whole SPI list per row would throw (and fill in the
      // stack trace of) an UnsupportedAudioFileException per non-WAV
      // reader per doc on the hot path.
      val wavReader: AudioFileReader = {
        val fmt = new AudioFormat(wavRate.toFloat, 16, 1, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        wavWriter.write(new AudioInputStream(
          new java.io.ByteArrayInputStream(new Array[Byte](4)), fmt, 2L),
          AudioFileFormat.Type.WAVE, bos)
        val probe = bos.toByteArray
        audioReaders.find { r =>
          try { r.getAudioInputStream(
            new java.io.ByteArrayInputStream(probe)).close(); true }
          catch { case scala.util.control.NonFatal(_) => false }
        }.getOrElse(sys.error("no AudioFileReader SPI accepts PCM WAV"))
      }
      def decodeWav(bytes: Array[Byte], id: Long): AudioInputStream =
        try wavReader.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(e) =>
          sys.error(s"WAV decode failed for doc $id: $e") }
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator.map { id =>
          val n = wavN(id)
          val raw = new Array[Byte](n * 2) // 16-bit LE mono
          var i = 0
          while (i < n) {
            val s = wavSample(id, i)
            raw(2 * i) = (s & 0xff).toByte
            raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new AudioFormat(wavRate.toFloat, 16, 1,
            /* signed = */ true, /* bigEndian = */ false)
          val bos = new java.io.ByteArrayOutputStream()
          wavWriter.write(
            new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
            AudioFileFormat.Type.WAVE, bos)
          val wav = bos.toByteArray                       // real WAV bytes
          // decode: container/header parse via the real audio stack
          val in = decodeWav(wav, id)
          val f = in.getFormat
          require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
            !f.isBigEndian, s"unexpected decoded format $f for doc $id")
          val dec = in.readAllBytes()
          in.close()
          val frames = dec.length / 2
          var sum = 0L
          var sabs = 0L
          var j = 0
          while (j < frames) {
            val v = ((dec(2 * j) & 0xff) | (dec(2 * j + 1) << 8)).toShort.toLong
            sum += v
            sabs += math.abs(v)
            j += 1
          }
          AudioStats(id, f.getSampleRate.toInt, frames.toLong,
            frames.toLong * 1000000L / wavRate, sum, sabs)
        }
      }
    }.toDF()
  }
}
