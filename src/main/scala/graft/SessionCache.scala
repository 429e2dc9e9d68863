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
