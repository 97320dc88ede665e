package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Spark's CacheManager is PLAN-keyed: persisting a second Dataset whose
  * logical plan is already cached registers nothing and logs
  * "WARN CacheManager: Asked to cache already cached data". Identical
  * plans arise legitimately here — one query's primary engine is another
  * query's cross-check witness (same prepared state, same theta ⇒ same
  * plan). `Dataset.storageLevel` performs the same plan-keyed lookup, so
  * guarding on it makes persist idempotent and keeps the logs clean.
  *
  * (The matching hazard — an unpersist on one of two plan-identical
  * Datasets drops the shared cache entry for both — is inherent to the
  * plan-keyed CacheManager and unchanged by this guard; owners free
  * their caches only after materializing consumers, as before.) */
object Caching {
  implicit class PersistOnce(private val df: DataFrame) extends AnyVal {
    def persistOnce(): DataFrame =
      if (df.storageLevel != StorageLevel.NONE) df
      else df.persist(StorageLevel.MEMORY_AND_DISK)
  }
}
