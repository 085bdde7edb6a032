package graft

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames persisted INSIDE graft operators (the ngram
  * inverted index, the triangle pair frame): callers never see those
  * frames, so they cannot unpersist them, and a long-lived application
  * would otherwise accrete MEMORY_AND_DISK blocks across runs.
  * Operators register their internal persists here;
  * [[CorpusPipeline.run]] (and any long-lived caller) releases them via
  * [[unpersistAll]] — which, unlike `spark.catalog.clearCache()`, does
  * not evict caches the USER created.
  *
  * References are weak: a frame that was never unpersisted but is no
  * longer reachable does not pin its JVM object here (its storage is
  * reclaimed by Spark's ContextCleaner through the same weak-ref
  * mechanism).
  */
object CacheTracker {
  private val tracked =
    scala.collection.mutable.ArrayBuffer.empty[java.lang.ref.WeakReference[DataFrame]]

  /** Register an internally-persisted frame; returns it for chaining.
    * Dead (GC-cleared) references are compacted away on every call, so
    * an app that tracks but never calls [[unpersistAll]] holds at most
    * live-frame-count registry entries, not one per historical persist.
    */
  def track(df: DataFrame): DataFrame = synchronized {
    tracked.filterInPlace(_.get != null)
    tracked += new java.lang.ref.WeakReference(df)
    df
  }

  /** Unpersist every tracked frame still alive and clear the registry. */
  def unpersistAll(): Unit = synchronized {
    tracked.foreach { r =>
      val df = r.get
      if (df != null) df.unpersist(blocking = false)
    }
    tracked.clear()
  }

  /** Live (still-reachable) tracked frames — observability for specs. */
  def trackedCount: Int = synchronized { tracked.count(_.get != null) }

  /** Raw registry length including not-yet-compacted dead refs — lets a
    * spec prove [[track]]'s compaction bounds the registry.
    */
  private[graft] def registrySize: Int = synchronized { tracked.length }
}
