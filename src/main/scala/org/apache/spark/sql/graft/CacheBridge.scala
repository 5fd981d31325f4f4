package org.apache.spark.sql.graft

import org.apache.spark.sql.{Dataset => ApiDataset}
import org.apache.spark.sql.classic.Dataset

/** Bridge into the `private[sql]` cache machinery, for
  * `graft.core.CacheScope`'s orphan sweep.
  *
  * Why it exists: `Dataset.unpersist()` drops the CacheManager entry and
  * the buffer RDD — but an action PLANNED while the cache was live holds
  * a compiled `InMemoryTableScan` that references the entry's
  * `CachedRDDBuilder` directly. If such an action materializes (or
  * re-materializes) the buffer AFTER the unpersist, the builder lazily
  * rebuilds and re-persists it: the rebuilt RDD is registered with the
  * SparkContext but belongs to no CacheManager entry, so neither a second
  * `unpersist()` nor `catalog.clearCache()` can ever find it again — a
  * permanent block-manager leak (observed as CacheHygieneSpec's
  * "leaked caches ... at collect" failure under a busy listener bus).
  * The only handle that can release the rebuilt buffer is the builder
  * itself, which is `private[sql]`.
  */
object CacheBridge {

  /** Capture a kill-switch over the cache builder CURRENTLY backing
    * `df`'s persisted plan (None if the plan is not cached). The switch
    * stays valid after the entry is removed from the CacheManager —
    * invoking it clears whatever buffer the builder holds at that time,
    * including one rebuilt by an in-flight action. Idempotent; a later
    * re-`persist()` of the same plan creates a NEW builder and is
    * unaffected.
    */
  def orphanKiller(df: ApiDataset[_]): Option[() => Unit] = {
    val ds = df.asInstanceOf[Dataset[_]]
    ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds).map { cd =>
      val builder = cd.cachedRepresentation.cacheBuilder
      () => builder.clearCache(false)
    }
  }
}
