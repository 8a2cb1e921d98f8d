package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded image metadata + features: dimensions, pixel count, integer
  * brightness sum, and the first four pixel values. All-integer so results
  * are engine-exact for the oracle gate. */
final case class MediaMeta(
    doc_id: Long, width: Int, height: Int, n_px: Long, sum_gray: Long,
    f0: Int, f1: Int, f2: Int, f3: Int)

/** Nearest-neighbor-resized image features: source + target geometry,
  * brightness sum and first four pixels of the RESIZED raster. Integer
  * sampling (sx = x*srcW/outW) keeps the result engine-exact. */
final case class ResizedMeta(
    doc_id: Long, src_w: Int, src_h: Int, out_w: Int, out_h: Int,
    sum_resized: Long, r0: Int, r1: Int, r2: Int, r3: Int)

/** One sampled frame of a clip: frame index + luma sum. */
final case class FrameMeta(doc_id: Long, frame_no: Int, sum_luma: Long)

/** JPEG round-trip verdict: header geometry (exact even under lossy
  * coding) + the decoded raster's max absolute pixel error vs the
  * closed-form source raster. */
final case class JpegMeta(
    doc_id: Long, width: Int, height: Int, n_px: Long, max_err: Int)

/** Decoded audio metadata + features: format fields read from the WAV
  * header by the codec, then all-integer PCM statistics (engine-exact). */
final case class AudioMeta(
    doc_id: Long, sample_rate: Int, n_channels: Int, n_samples: Long,
    sum_abs: Long, max_abs: Int, zero_crossings: Long)

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns, decode/feature-extract per partition, return typed
 * metadata + features.
 *
 * The decoder is REAL — `javax.imageio` parses actual PNG bytes (signature,
 * IHDR, zlib-inflated scanlines) — and runs as a per-partition iterator
 * transform: one codec context per partition, streaming rows, no driver
 * involvement, partition-parallel at any scale. Heavier codecs (JPEG via
 * the same ImageIO API, video frame-sampling via an external process) slot
 * into the same mapPartitions shape.
 *
 * Because the test corpus carries no binary columns, [[encodePayloads]]
 * renders a deterministic grayscale PNG per document (pixel values are a
 * closed-form function of doc_id), which makes the decode round-trip
 * oracle-checkable: an engine with no image codec can still recompute the
 * expected dimensions and pixel statistics symbolically.
 */
object Multimodal {

  /** ImageIO's stream cache defaults to DISK (`useCache=true`): every
    * read/write wraps its stream in a FileCache stream backed by a fresh
    * temp FILE — one create+write+delete per image, which dominated the
    * mm_* rows (measured 5.4 s → 0.6 s on mm_features at sf0.1 once
    * disabled). Payloads here are KB-sized, so the in-memory cache is
    * strictly better at any scale; called from every codec closure so each
    * executor JVM flips the static flag once (guide §4.5: per-task init,
    * not per-row). */
  private def noDiskCache(): Unit =
    if (ImageIO.getUseCache) ImageIO.setUseCache(false)

  /** Deterministic image geometry for doc `id`: 4..16 × 3..13. */
  def dims(id: Long): (Int, Int) = ((4 + id % 13).toInt, (3 + id % 11).toInt)

  /** Deterministic gray value of pixel `idx` (row-major) of doc `id`. */
  def pixel(id: Long, idx: Int): Int = ((id * 37 + idx.toLong * 101) % 256).toInt

  /** Render the synthetic grayscale PNG payload for doc `id` — real PNG
    * bytes via ImageIO (8-bit gray is lossless, so decode recovers the
    * exact pixel values). */
  def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var idx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(id, idx)); idx += 1; x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach the synthetic PNG payload as a binary column: (doc_id, payload).
    * Per-partition encode — the fixture generator for the decode path. */
  def encodePayloads(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it => noDiskCache(); it.map(id => (id, syntheticPng(id))) }
      .toDF("doc_id", "payload")
  }

  /** Decode a binary PNG payload column into typed media metadata with a
    * real image codec (javax.imageio), one decoder context per partition. */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        noDiskCache()
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"doc $id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L
          val first = new Array[Int](4)
          var idx = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              sum += v
              if (idx < 4) first(idx) = v
              idx += 1
              x += 1
            }
            y += 1
          }
          MediaMeta(id, w, h, w.toLong * h, sum, first(0), first(1), first(2), first(3))
        }
      }
  }

  /** Decode + nearest-neighbor resize to a fixed target geometry — the
    * normalize-before-training step of an image pipeline. Real ImageIO
    * decode per partition; the resample is integer floor sampling
    * (sx = x*srcW/outW, sy = y*srcH/outH), so the oracle can recompute the
    * resized raster symbolically. Interpolating kernels (bilinear etc.)
    * slot into the same shape but are float-valued — nearest keeps the
    * gate exact. */
  def resizeFeatures(df: DataFrame, idCol: String, payloadCol: String,
                     outW: Int, outH: Int): Dataset[ResizedMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        noDiskCache()
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"doc $id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L
          val first = new Array[Int](4)
          var i = 0
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val v = raster.getSample(x * w / outW, sy, 0)
              sum += v
              if (i < 4) first(i) = v
              i += 1
              x += 1
            }
            y += 1
          }
          ResizedMeta(id, w, h, outW, outH, sum,
            first(0), first(1), first(2), first(3))
        }
      }
  }

  // ------------------------------------------------------------- jpeg
  //
  // JPEG is what real crawled corpora actually carry, and ImageIO decodes
  // it with the same API the PNG path uses — decodeFeatures/resizeFeatures
  // work on JPEG payloads unchanged (ImageIO sniffs the container). What
  // JPEG changes is the GATE: the codec is lossy, so the decoded raster is
  // only close to the source, not equal. The battery row therefore checks
  // geometry exactly (headers survive lossy coding bit-exact) and bounds
  // the per-pixel error against the closed-form raster; the bound itself
  // is measured in OperatorsSpec, not assumed.

  /** Render the synthetic grayscale JPEG payload for doc `id` at maximum
    * encoder quality (quantization tables ≈ 1, so the per-pixel error is
    * DCT rounding noise — small even on this noise-like raster). */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var idx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(id, idx)); idx += 1; x += 1 }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Attach the synthetic JPEG payload as a binary column: (doc_id, payload). */
  def encodeJpegs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it => noDiskCache(); it.map(id => (id, syntheticJpeg(id))) }
      .toDF("doc_id", "payload")
  }

  /** Decode a binary JPEG payload with the real ImageIO codec and compare
    * the raster against the closed-form source ([[pixel]]): geometry +
    * max absolute pixel error. The FIXTURE-BOUND verification twin of the
    * format-agnostic [[decodeFeatures]] (which is the production operator
    * and handles JPEG payloads unchanged) — lossy coding makes exact
    * equality impossible, so this is where the error gets a measured,
    * gated bound. */
  def jpegRoundTrip(df: DataFrame, idCol: String,
                    payloadCol: String): Dataset[JpegMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        noDiskCache()
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"doc $id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var maxErr = 0
          var idx = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val e = math.abs(raster.getSample(x, y, 0) - pixel(id, idx))
              if (e > maxErr) maxErr = e
              idx += 1
              x += 1
            }
            y += 1
          }
          JpegMeta(id, w, h, w.toLong * h, maxErr)
        }
      }
  }

  // ------------------------------------------------------------- audio
  //
  // Audio-shaped payloads: real RIFF/WAVE containers (16-bit little-endian
  // PCM, mono, 8 kHz) decoded with the JDK's actual audio codec
  // (javax.sound.sampled.AudioSystem — the audio analog of ImageIO): the
  // decoder parses the RIFF chunks and reports format fields; the feature
  // pass then computes integer PCM statistics, so the oracle can recompute
  // them symbolically from the closed-form sample function.

  /** Deterministic 16-bit PCM sample `i` of doc `id`'s synthetic wave. */
  def audioSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 7717) % 65536) - 32768).toInt

  /** Samples per clip for doc `id`: 400..599. */
  def audioLen(id: Long): Int = (400 + id % 200).toInt

  /** Render the synthetic WAV payload for doc `id` — a complete RIFF file
    * (RIFF/WAVE + fmt + data chunks), byte-identical to what any PCM
    * encoder would emit. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = audioLen(id)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)            // PCM, mono
    bb.putInt(8000); bb.putInt(8000 * 2)      // rate, byte rate
    bb.putShort(2); bb.putShort(16)           // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(audioSample(id, i).toShort); i += 1 }
    bb.array()
  }

  /** Attach the synthetic WAV payload as a binary column: (doc_id, audio). */
  def encodeWavs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticWav(id))))
      .toDF("doc_id", "audio")
  }

  /** Decode a binary WAV payload column with the JDK audio codec, one
    * decoder context per partition, emitting per-clip integer features:
    * sample count, |PCM| sum and max, and strict sign-change crossings. */
  def decodeAudioFeatures(df: DataFrame, idCol: String,
                          payloadCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
            s"doc $id: expected 16-bit LE PCM, got $fmt")
          val pcm = ais.readAllBytes()
          ais.close()
          val n = pcm.length / 2
          var sumAbs = 0L
          var maxAbs = 0
          var crossings = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
            val a = math.abs(v)
            sumAbs += a
            if (a > maxAbs) maxAbs = a
            if (i > 0 && prev.toLong * v < 0) crossings += 1
            prev = v
            i += 1
          }
          AudioMeta(id, fmt.getSampleRate.toInt, fmt.getChannels, n,
            sumAbs, maxAbs, crossings)
        }
      }
  }

  // ------------------------------------------------------------- clips
  //
  // Video-shaped payloads. The container has no video codec (and the
  // corpus no video column), so a clip is a deterministic RAW frame stack
  // — the post-decode representation a real pipeline would hold after
  // ffmpeg/your-codec-here — behind the same binary-column plumbing: a
  // 4-byte header (w, h, nFrames, version) + nFrames w*h-byte grayscale
  // frames, luma(f, idx) = (id*37 + f*7919 + idx*101) % 256. The decode
  // step is the honest stub; the Spark-side schema, partitioning, and
  // per-partition iterator transform are real and oracle-checked.

  /** Luma of pixel `idx` in frame `f` of doc `id`'s synthetic clip. */
  def clipLuma(id: Long, f: Int, idx: Int): Int =
    ((id * 37 + f.toLong * 7919 + idx.toLong * 101) % 256).toInt

  /** Attach a synthetic raw clip payload: (doc_id, clip). */
  def encodeClips(df: DataFrame, idCol: String, nFrames: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = dims(id)
        val bytes = new Array[Byte](4 + nFrames * w * h)
        bytes(0) = w.toByte; bytes(1) = h.toByte
        bytes(2) = nFrames.toByte; bytes(3) = 1
        var f = 0
        var o = 4
        while (f < nFrames) {
          var idx = 0
          while (idx < w * h) {
            bytes(o) = clipLuma(id, f, idx).toByte; o += 1; idx += 1
          }
          f += 1
        }
        (id, bytes)
      })
      .toDF("doc_id", "clip")
  }

  /** Sample every `stride`-th frame of a raw clip payload (frame geometry
    * from the clip header, not from the id — the operator only sees
    * bytes), emitting per-frame luma sums: the keyframe-extraction step of
    * a video pipeline as a per-partition iterator transform. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   stride: Int): Dataset[FrameMeta] = {
    require(stride > 0, "stride must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          require(bytes.length >= 4 && bytes(3) == 1,
            s"doc $id: not a v1 raw clip")
          val w = bytes(0) & 0xff
          val h = bytes(1) & 0xff
          val nFrames = bytes(2) & 0xff
          require(bytes.length == 4 + nFrames * w * h,
            s"doc $id: truncated clip payload")
          (0 until nFrames by stride).iterator.map { f =>
            var sum = 0L
            val base = 4 + f * w * h
            var idx = 0
            while (idx < w * h) { sum += bytes(base + idx) & 0xff; idx += 1 }
            FrameMeta(id, f, sum)
          }
        }
      }
  }
}
