package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Size-targeted parquet export — the last step of a training-data
 * pipeline: write the cleaned corpus as files of a chosen COMPRESSED size
 * (the "20-150 MB parquet part" guidance the reference's registration
 * docs give for its own layout, generalized to any target). Naive writes
 * get this wrong at both ends: `df.write` emits one file per shuffle
 * partition (200 corpus-sized monsters, or millions of KB-sized files
 * after a selective filter), and row-count caps ignore compression, which
 * varies 10× between prose and base64-ish payloads.
 *
 * Approach — measure, don't guess:
 *  1. PILOT: write a content-random sample (deterministic
 *     [[graft.operators.TextAnalysis.hashUniform]] draw, so the pilot is
 *     an unbiased slice even of a sorted/clustered corpus) to a scratch
 *     dir and read the actual compressed bytes/row off the filesystem —
 *     the only estimator that sees the real encoder+codec behavior.
 *  2. SIZE: files = ceil(rows · bytesPerRow / targetFileBytes).
 *  3. WRITE: `repartition(files, md5(salt:id))` — deterministic hash
 *     boundaries (no sampling, unlike repartitionByRange) on a
 *     content-random key, so file sizes concentrate tightly regardless of
 *     input skew or order. `maxRecordsPerFile` at 2× the per-file row
 *     budget guards against duplicate-id hash skew piling rows into one
 *     partition; it bounds ROWS, not bytes, so a systematic pilot
 *     underestimate scales every file proportionally instead — compare
 *     the returned stats (`bytes / files` vs the target) and re-export
 *     with a larger `sampleRows` if the pilot drifted.
 *
 * Scale shape: the pilot is O(sample) work, the count is one
 * column-pruned aggregate (or free if the caller already knows it), and
 * the export itself is the unavoidable ONE shuffle into `files`
 * partitions. Nothing corpus-sized touches the driver; the returned
 * stats come from a driver-side file listing (bounded by file count).
 */
object DatasetExporter {

  final case class ExportStats(files: Long, rows: Long, bytes: Long,
                               pilotBytesPerRow: Double)

  /** (total bytes, file count) of the data files directly under `p` —
    * shared by [[export]] and [[compact]]. Flat layouts only (partitioned
    * dt=... trees compact per-directory). */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                            p: String): (Long, Long) = {
    val st = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .filter(s => s.getPath.getName.endsWith(".parquet"))
    (st.map(_.getLen).sum, st.length.toLong)
  }

  /** Export `df` under `path` targeting `targetFileBytes` per data file.
    * `idCol` drives the deterministic pilot draw and file distribution;
    * `sampleRows` sizes the pilot (its cost bound). Returns the written
    * layout's stats after verification-friendly listing. */
  def export(df: DataFrame, idCol: String, path: String,
             targetFileBytes: Long, salt: String = "export",
             sampleRows: Long = 10000L): ExportStats = {
    require(targetFileBytes > 0, "target file size must be positive")
    val spark = df.sparkSession
    val rows = df.count()
    require(rows > 0, "refusing to export an empty frame")

    // Pilot: deterministic content-random sample, actual compressed size.
    val rate = math.min(1.0, sampleRows.toDouble / rows)
    val pilotPath = s"$path.__pilot"
    df.where(graft.operators.TextAnalysis.hashUniform(col(idCol), s"$salt:pilot")
        < rate)
      .write.mode(SaveMode.Overwrite).parquet(pilotPath)
    val fs = new org.apache.hadoop.fs.Path(pilotPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataBytes(p: String): (Long, Long) = listDataFiles(fs, p)
    val pilotRows = spark.read.parquet(pilotPath).count()
    require(pilotRows > 0, "pilot sample came up empty; raise sampleRows")
    val bytesPerRow = dataBytes(pilotPath)._1.toDouble / pilotRows
    fs.delete(new org.apache.hadoop.fs.Path(pilotPath), true)

    val files = math.max(1L, math.ceil(rows * bytesPerRow / targetFileBytes).toLong)
    // Guard the Long→Int narrowing below: a degenerate rows/target ratio
    // (e.g. targetFileBytes = 1) would wrap silently into a garbage
    // partition count. Int.MaxValue files is far beyond any real layout,
    // so failing loud is the only sane behavior.
    require(files <= Int.MaxValue.toLong,
      s"computed file count $files exceeds Int.MaxValue; raise targetFileBytes")
    val rowsPerFile = math.max(1L, math.ceil(rows.toDouble / files).toLong)
    df.repartition(files.toInt,
        graft.operators.TextAnalysis.saltedMd5Public(col(idCol), salt))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", 2L * rowsPerFile)
      .parquet(path)

    val (outBytes, outFiles) = dataBytes(path)
    ExportStats(outFiles, rows, outBytes, bytesPerRow)
  }

  final case class CompactStats(filesBefore: Long, bytesBefore: Long,
                                filesAfter: Long, bytesAfter: Long)

  /** Shuffle-FREE small-file compaction — the maintenance half of the
    * layout story. Long-running ingestion (streaming sinks, incremental
    * appends, selective rewrites) fragments a dataset into thousands of
    * KB-sized files whose per-file open/footer cost comes to dominate
    * scans; the reference's own guidance is 20-150 MB parts. [[export]]
    * fixes sizes by paying a full shuffle — right for a fresh layout,
    * wasteful for re-binning bytes that are already well-distributed.
    * This instead drives Spark's OWN scan bin-packing: with
    * `files.maxPartitionBytes` set to the target, `openCostInBytes` at 0
    * (pack by real bytes, not padded open cost), and `minPartitionNum` at
    * 1 (default parallelism would re-split the packing), the
    * FileSourceScan's partitions ARE ~target-sized bins of input files —
    * one map-only job, zero Exchange (pinned by shuffleBytesWritten == 0
    * in OperatorsSpec), each task writing one output file. Oversized
    * inputs get split too (row-group boundaries), so one call normalizes
    * both tails. Within-file row order is preserved and bins concatenate
    * whole small files, so a clustered layout (sorted, z-ordered) keeps
    * per-file stats boxes that are unions of a few neighbors — coarser
    * than a re-sort, with zero re-sort cost; re-cluster via
    * [[graft.sources.ZOrder.zorderWrite]] when pruning sharpness matters
    * more than compaction cost. The packing confs are set on a CLONED
    * session (`newSession` — own SQLConf, shared SparkContext and
    * catalog), never on the caller's: a save/restore on the shared
    * session would plan every CONCURRENT query (the server's async pool)
    * with the compaction's tiny maxPartitionBytes, exploding a multi-GB
    * scan into thousands of tasks, and two concurrent compacts would
    * clobber each other's saved values. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              outPath: String, targetFileBytes: Long): CompactStats = {
    require(targetFileBytes > 0, "target file size must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val inP = new org.apache.hadoop.fs.Path(path)
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val fs = inP.getFileSystem(conf)
    // The output may live on a DIFFERENT scheme (mock3:// → file: is a
    // supported shape, ObjectStoreSpec) — its listing needs its own
    // FileSystem, not the input's.
    val outFs = outP.getFileSystem(conf)
    // In-place compaction is not supported (the Overwrite would delete the
    // input mid-scan); fail with a clear message instead of Spark's opaque
    // analysis error. Qualified comparison so `/a/b` == `file:/a/b`.
    require(fs.makeQualified(inP) != outFs.makeQualified(outP),
      s"compact output path must differ from the input path ($path)")
    val (bytesBefore, filesBefore) = listDataFiles(fs, path)
    require(filesBefore > 0, s"no parquet files under $path")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", targetFileBytes.toString)
    s2.conf.set("spark.sql.files.openCostInBytes", "0")
    s2.conf.set("spark.sql.files.minPartitionNum", "1")
    s2.read.parquet(path)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    val (bytesAfter, filesAfter) = listDataFiles(outFs, outPath)
    CompactStats(filesBefore, bytesBefore, filesAfter, bytesAfter)
  }
}
