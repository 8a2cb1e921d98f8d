package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic fake of an image/audio decode result — the real decoder
  * (libjpeg/ffmpeg/PIL) is not in this container, so the decode step is a
  * clearly-marked stub; everything around it (schema, binary column
  * plumbing, per-partition batching, typed output) is real. */
final case class MediaMeta(
    doc_id: Long, width: Int, height: Int, n_frames: Int,
    f0: Int, f1: Int, f2: Int, f3: Int)

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns, decode/feature-extract per partition, return typed
 * metadata + features. The Spark-side shape is the point: a `Dataset`
 * transform with an `Encoder`-backed schema, executed per partition with no
 * driver involvement, partition-parallel at any scale. Swap `decodeStub`
 * for a real codec (JNI / external process) without touching the plumbing.
 */
object Multimodal {

  /** STUB decoder: deterministic fake metadata derived from the payload
    * bytes. Replace with a real codec for production use. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    def b(i: Int): Int = if (n > i) bytes(i) & 0xff else 0
    MediaMeta(id, 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 8,
      b(0), b(1), b(2), b(3))
  }

  /** Decode a binary payload column into typed media metadata. Runs as a
    * per-partition iterator transform (mapPartitions), the shape a real
    * batched decoder needs (one codec init per partition, streaming rows). */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec initialization would happen here, once per partition
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}
