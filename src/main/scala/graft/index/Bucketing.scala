package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod, xxhash64}

/** THE posting-bucket hash (xxhash64 seed 42 mod 16) shared by every
  * bucket-partitioned posting table (ngram / token / bm25) — one
  * Spark-side build column and its driver-side twin, in one place.
  * Any drift between the two (or between copies per kind) sends query
  * probes to the wrong bucket partition: silently empty index results,
  * no error. Seed 42 is Spark's own `xxhash64(...)` default, pinned by
  * PropertySpec against the Column form.
  */
private[graft] object Bucketing {
  val Buckets = 16

  /** Build-side bucket column. */
  def bucketCol(c: Column): Column = pmod(xxhash64(c), lit(Buckets))

  /** Driver-side twin of [[bucketCol]] for query-time routing. */
  def bucketOfString(g: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.unsafe.types.UTF8String
    Math.floorMod(XxHash64Function.hash(UTF8String.fromString(g),
      org.apache.spark.sql.types.StringType, 42L), Buckets.toLong).toInt
  }
}
