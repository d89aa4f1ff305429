package graft.core

import org.apache.spark.sql.DataFrame

/** Tiny LRU of persisted DataFrames keyed by PLAN identity
  * (`sameResult` over the analyzed plan — Spark's own CacheManager
  * equivalence), bounded at `max` entries.
  *
  * The single-slot predecessor thrashed whenever two operators
  * alternated corpora (the dedup_apply duplicated corpus evicted the
  * documents-corpus shingle cache that jaccard/decontaminate/pipeline
  * share, forcing a full re-shingle per suite pass). Two slots keep
  * both working sets warm; eviction unpersists, so at most `max`
  * cached shuffles' worth of storage is ever held.
  */
final class PlanCache(max: Int) {
  require(max >= 1)
  private val slots = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** The cached equivalent of `df` if one is live, else `df` itself
    * persisted and remembered (evicting the least-recently-used entry
    * past `max`).
    */
  def getOrPersist(df: DataFrame): DataFrame = synchronized {
    val i = slots.indexWhere(_.queryExecution.analyzed
      .sameResult(df.queryExecution.analyzed))
    if (i >= 0) {
      val hit = slots.remove(i)
      slots.prepend(hit)
      hit
    } else {
      if (slots.size >= max) slots.remove(slots.size - 1).unpersist()
      df.cache()
      slots.prepend(df)
      df
    }
  }
}
