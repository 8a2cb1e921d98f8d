package graft.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/**
 * Registry for intermediate DataFrames persisted inside operators (e.g. the
 * LSH bucket table that feeds a self-join — persisting it halves the
 * pipeline cost because Spark re-executes shared lineage once per join
 * side). Operators can't unpersist eagerly themselves: the cache must stay
 * alive until the *caller* consumes the lazily-evaluated result. Long-lived
 * sessions (ApiServer, Bench) call [[drain]] after each query so caches
 * don't accumulate; short-lived CLI runs can ignore it (the context
 * cleaner reclaims them on JVM exit).
 */
object Caches {
  private val bin = ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` (memory-and-disk) and remember it for a later [[drain]].
    * Idempotent: an already-persisted frame (a query re-executed inside the
    * same session — warmup + timed bench runs) is left at its current level
    * rather than re-persisted, so CacheManager stops warning "asked to cache
    * already cached data" and real double-caching bugs stay visible. */
  def retain[T](ds: Dataset[T]): Dataset[T] = synchronized {
    if (ds.storageLevel == StorageLevel.NONE) {
      ds.persist(StorageLevel.MEMORY_AND_DISK)
      bin += ds
    }
    ds
  }

  /** Register `ds` for [[drain]] WITHOUT persisting it — for frames whose
    * storage is already bound elsewhere (localCheckpoint blocks). */
  def track[T](ds: Dataset[T]): Dataset[T] = synchronized {
    bin += ds
    ds
  }

  /** Release the blocks behind a localCheckpoint-backed frame. A local
    * checkpoint IS its lineage — the blocks cannot be recomputed — so call
    * this only once nothing will read the frame again. Matches the plan
    * ROOT only: a tree-wide sweep would also destroy caller-owned
    * checkpoint blocks buried deeper in a derived plan's lineage, killing
    * the caller's still-live frame. No-op for plans not rooted in a
    * checkpoint/RDD. Blocking, for the same reason [[drain]] is: async
    * block cleanup from one query otherwise lands inside the next one's
    * measurement. */
  def freeCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true)
      case _ => ()
    }

  /** Unpersist every retained dataset and clear the registry. Blocking:
    * callers drain between measured queries (Bench) or between requests
    * (ApiServer), and a non-blocking unpersist lets one query's block
    * cleanup churn leak into the next measurement (observed 1.5-4x
    * in-battery inflation at sf0.1). */
  def drain(): Unit = synchronized {
    bin.foreach { ds =>
      ds.unpersist(blocking = true)
      freeCheckpoint(ds) // tracked checkpoint-backed frames free here
    }
    bin.clear()
  }
}
