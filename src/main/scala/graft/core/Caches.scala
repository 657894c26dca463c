package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Ownership-aware persist: the fix for the "Asked to cache already
  * cached data" class of bugs.
  *
  * Two operators can legitimately build the SAME canonical plan (the
  * shared churn spine, a common tensorized test split). If both call
  * `.persist()`, the second is a warning + no-op — but both believe
  * they own the cache, and whichever calls `.unpersist()` first drops
  * the entry out from under the other (Dataset.unpersist releases by
  * canonical plan, not by caller). [[acquire]] makes the ownership
  * explicit: persist only when the plan is not already cached, and
  * report whether THIS call took ownership, so the caller's release
  * runs only when it truly holds the pin.
  */
object Caches {

  /** Persist `ds` unless its canonical plan is already cached.
    * Returns (ds, owned): release with `if (owned) ds.unpersist()`.
    */
  def acquire[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                ): (Dataset[T], Boolean) =
    if (org.apache.spark.sql.graft.bridge.isCached(ds)) (ds, false)
    else { ds.persist(level); (ds, true) }
}
