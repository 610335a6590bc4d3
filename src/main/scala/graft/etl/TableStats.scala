package graft.etl

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** The shared ANALYZE ledger: every corpus-derived capacity in the
  * engine (IVF/SemDeDup k, LSH plane count, pHash chunk width, bloom
  * bucket count — see r32_catalog_stats for the full per-column
  * collection pass) reads its driving cardinality from here, so a
  * statistic is computed ONCE per lake per application and every
  * consumer derives from the same snapshot. At 100 TB this is the
  * catalog's statistics store fed by the nightly ANALYZE job; locally
  * it is a memoized count.
  *
  * Keying: (applicationId, statistic key). The application id is
  * stable for the life of a SparkContext and never aliases across
  * restarts (unlike an identity hash, which can be reused after GC).
  * The snapshot semantics are deliberate: the count reflects the lake
  * at FIRST use within the application — exactly when the index/plan
  * capacity derived from it was fixed — so a capacity and the stat it
  * came from can never silently diverge. Regenerating a lake in-place
  * within one application requires [[invalidate]] (the REFRESH TABLE
  * of this layer).
  */
object TableStats {

  private val cache = new ConcurrentHashMap[(String, String), java.lang.Long]()

  /** Memoized scalar statistic (row count, key count) for `key` —
    * computed at most once per (application, key); later calls return
    * the first snapshot. */
  def rowCount(s: SparkSession, key: String)(compute: => Long): Long =
    cache.computeIfAbsent((s.sparkContext.applicationId, key),
      _ => compute).longValue()

  private val invalidationHooks =
    new java.util.concurrent.CopyOnWriteArrayList[String => Unit]()

  /** Registers a callback run on every [[invalidate]] with the same
    * prefix — how OTHER per-lake memoizations (cluster labels, ANN
    * index builds) join the one re-ANALYZE hook instead of growing
    * private, unreachable invalidation APIs. Idempotence is the
    * caller's concern (register once, from object init). */
  def registerInvalidationHook(f: String => Unit): Unit =
    invalidationHooks.add(f)

  /** Drop every cached statistic whose key starts with `keyPrefix`
    * (typically a lake directory) — the explicit re-ANALYZE hook for
    * lakes regenerated within one application. Registered hooks fire
    * with the same prefix, so every derived memoization drops with
    * the stats it derived from. */
  def invalidate(keyPrefix: String): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next()._2.startsWith(keyPrefix)) it.remove()
    invalidationHooks.forEach(_(keyPrefix))
  }
}
