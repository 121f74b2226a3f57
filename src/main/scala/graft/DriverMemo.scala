package graft

/** Bounded driver-side memo for train-once/serve-many models — the shared
  * store behind every driver-held model cache (k-means quantizer, PQ
  * codebooks, PCA model, BPE merge tables, cluster maps, quality and
  * safety models).
  *
  * Why bounded: several caches key on `(System.identityHashCode(session),
  * path)` so a fresh session over changed data retrains instead of reusing
  * stale weights. That key shape means entries for closed/GC'd sessions
  * can never be looked up again — in a long-lived driver that creates many
  * sessions over the same corpus path, an unbounded map accumulates
  * orphaned model arrays indefinitely (round-10 advice on
  * safetyModelCache; the same growth existed in clusterCache/mergeCache).
  * An access-ordered LRU capped at [[DriverMemo.DefaultCap]] entries turns
  * that unbounded growth into a fixed ceiling: models are a few KB to a
  * few MB each, so the worst case is cap × largest-model, and the
  * hot-session entries (the ones still reachable) are exactly the ones
  * LRU keeps.
  *
  * Concurrency: the train thunk runs under the memo's lock — like
  * `ConcurrentHashMap.computeIfAbsent`'s bin lock, concurrent callers of
  * the SAME key observe exactly one training. Unlike CHM this also
  * serializes concurrent trainings of DIFFERENT keys; training is a rare
  * driver-side event (once per corpus release per model), so the
  * simplicity wins over striping.
  */
final class DriverMemo[K, V](cap: Int = DriverMemo.DefaultCap) {
  require(cap > 0, s"memo cap must be positive, got $cap")

  // accessOrder=true → get() refreshes recency; eldest = least recently used
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > cap
  }

  /** Memoized lookup: returns the cached value or trains, stores, and
    * returns it. A stored `null` is not distinguished from absence —
    * callers store model arrays/frames, never null. */
  def getOrElseUpdate(k: K)(train: => V): V = m.synchronized {
    val hit = m.get(k)
    if (hit != null) hit
    else {
      val v = train
      m.put(k, v)
      v
    }
  }

  /** Drop every entry — the content-staleness escape hatch each operator
    * exposes as its `invalidate*Cache()`. */
  def clear(): Unit = m.synchronized(m.clear())

  def size: Int = m.synchronized(m.size())

  private[graft] def keys: Seq[K] = m.synchronized {
    import scala.jdk.CollectionConverters._
    m.keySet().asScala.toSeq
  }
}

object DriverMemo {
  /** Plenty for every (session, corpus, hyperparameter) combination a
    * driver juggles at once; small enough that orphaned entries from dead
    * sessions are bounded noise rather than a leak. */
  val DefaultCap = 64
}
