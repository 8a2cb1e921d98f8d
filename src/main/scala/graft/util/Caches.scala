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

  /** Persist `ds` (memory-and-disk) and remember it for a later [[drain]]. */
  def retain[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    bin += ds
    ds
  }

  /** Unpersist every retained dataset and clear the registry. Blocking:
    * callers drain between measured queries (Bench) or between requests
    * (ApiServer), and a non-blocking unpersist lets one query's block
    * cleanup churn leak into the next measurement (observed 1.5-4x
    * in-battery inflation at sf0.1). */
  def drain(): Unit = synchronized {
    bin.foreach(_.unpersist(blocking = true))
    bin.clear()
  }
}
