package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracks DataFrames persisted inside query builders so the harness can
  * release them once the returned plan has been materialized. The builders
  * return lazy plans — unpersisting before the caller's action would defeat
  * the cache — so the contract is: builders call [[persist]], the runner
  * (Bench/Verify/tests) calls [[releaseAll]] after each query's action.
  * Without this, MEMORY_AND_DISK blocks accumulate across the ~60 queries
  * the gate runs in one long-lived session.
  */
object CacheRegistry {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized { tracked += df; df.persist(level) }

  def releaseAll(): Unit = synchronized {
    tracked.foreach(df => try df.unpersist(blocking = false) catch { case _: Throwable => () })
    tracked.clear()
  }
}
