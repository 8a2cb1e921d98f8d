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
      .mapPartitions(_.map(id => (id, syntheticPng(id))))
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
}
