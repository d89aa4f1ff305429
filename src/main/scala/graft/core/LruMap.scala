package graft.core

/** Tiny synchronized LRU map bounded at `max` entries.
  *
  * The driver's keep-latest-per-path caches (index heads, meta rows,
  * sub-table schemas, sample factors) key on index PATH. Keep-latest
  * handles same-path rebuilds, but compaction always writes a NEW dir,
  * so churn retires paths forever — under indefinite streaming
  * maintenance an unbounded map leaks one dead entry (sometimes a
  * whole-vocabulary head) per retired dir for the session's lifetime.
  * The LRU bound closes that: correctness is unaffected because every
  * entry is version-guarded by its caller (an evicted entry is just
  * re-read).
  */
final class LruMap[K, V](max: Int) {
  require(max >= 1)
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > max
  }
  def get(key: K): Option[V] = m.synchronized(Option(m.get(key)))
  def put(key: K, value: V): Unit = m.synchronized { m.put(key, value); () }
}
