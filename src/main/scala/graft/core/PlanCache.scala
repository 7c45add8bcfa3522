package graft.core

/** Bounded LRU plan cache — the Spark analog of the reference's per-session
  * two-level `QueryCache` (crates/grafeo-engine/src/query/cache.rs:1-60,
  * checked on every execute at session.rs:160).
  *
  * The reference caches parsed ASTs and optimized plans and invalidates them
  * on writes. Here a compiled `DataFrame` IS the lazy optimized-plan handle —
  * Catalyst re-optimizes per execution (cheap on the driver, and AQE re-plans
  * at runtime regardless) — so what the cache removes is the repeated
  * parse → translate → compile front-end work on hot query strings. Staleness
  * is structural rather than invalidated: graph snapshots are immutable
  * (mutations return new graphs, hence new sessions with fresh caches), the
  * same role MVCC epochs play in the reference.
  */
final class PlanCache[V <: AnyRef](val capacity: Int = PlanCache.DefaultCapacity) {
  private val map = new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      size() > capacity
  }
  private var hitCount = 0L
  private var missCount = 0L

  /** Return the cached value for `key`, computing and inserting on miss. */
  def get(key: String)(compute: => V): V = synchronized {
    val v = map.get(key)
    if (v != null) { hitCount += 1; v }
    else {
      missCount += 1
      val nv = compute
      map.put(key, nv)
      nv
    }
  }

  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
  def size: Int = synchronized(map.size())
}

object PlanCache {
  val DefaultCapacity = 128
  /** Session config key overriding the cache capacity (0 disables). */
  val CapacityKey = "graft.planCache.capacity"

  def forSession(spark: org.apache.spark.sql.SparkSession): PlanCache[org.apache.spark.sql.DataFrame] =
    new PlanCache(spark.conf.getOption(CapacityKey).map(_.toInt).getOrElse(DefaultCapacity))
}
