package graft.ops

import graft.core.Layout
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering + multi-column zone-map pruning.
  *
  * A single-column sort makes zone maps perfect for that column and
  * useless for every other; interleaving the bits of two columns and
  * range-partitioning on the interleave gives BOTH columns locality,
  * so per-row-group min/max zones prune 2-D range queries — the
  * OPTIMIZE ZORDER flow of the open-table-format world, expressed as
  * one `repartitionByRange` + `sortWithinPartitions` shuffle (the same
  * cost as any re-clustering pass; at 100 TB this is a maintenance
  * job, not a query-time cost). The reference's virtual zone-map mode
  * (backends/utils.py:110-126) is the single-column special case.
  *
  * The interleave is a branch-free magic-mask bit spread — six
  * and/or/shift steps per column, all built-in expressions inside
  * whole-stage codegen; no UDF.
  */
object ZOrder {

  /** Bits kept per column (2×31 = 62-bit codes, fits a long). */
  val Bits = 31

  // validated (pathA, pathB, metaVersionA, metaVersionB) keys of
  // searchRange2's shared-uid-space guard (see there)
  private val uidGuardCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long, Long), Unit]

  /** Spread the low 31 bits of `c` to even bit positions (standard
    * 2-D Morton magic masks).
    */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x7FFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** Morton code of two non-negative integral columns (`a` even bits,
    * `b` odd bits).
    */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long"))
      .bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Reference bit-loop interleave (for property tests). */
  def zValueRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < Bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Rewrite `df` into `parts` files clustered on z(a, b): ONE range
    * shuffle on the code, rows inside each file sorted by it.
    */
  def cluster(df: DataFrame, a: String, b: String, parts: Int,
      out: String): Unit = {
    val z = zValue(col(a), col(b))
    df.repartitionByRange(parts, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(out)
  }

  /** 2-D range query over two zone-map indexes built on the SAME lake
    * (shared uid space): candidate units must overlap BOTH ranges —
    * the zone tables are metadata-sized, their uid intersection is a
    * tiny join — then selective read + exact refine.
    */
  def searchRange2(spark: SparkSession,
      pathA: String, colA: String, loA: Long, hiA: Long,
      pathB: String, colB: String, loB: Long, hiB: Long): DataFrame = {
    val meta = spark.read.parquet(s"$pathA/meta")
    // the uid join below is only meaningful if both indexes were built
    // over the SAME lake snapshot (shared uid space); a mismatch would
    // intersect unrelated uids and silently return wrong rows, so fail
    // fast on any (uid, file_path) disagreement (metadata-scale check).
    // Indexes are immutable once built, so the check runs ONCE per
    // (pathA, pathB, meta versions) and is memoized — two driver-side
    // collects per query would otherwise dominate small-query latency
    val vKey = (pathA, pathB,
      graft.core.Fs.dirSignature(spark, s"$pathA/meta"),
      graft.core.Fs.dirSignature(spark, s"$pathB/meta"))
    if (!uidGuardCache.contains(vKey)) {
      val fpA = meta.select("uid", "file_path").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val fpB = spark.read.parquet(s"$pathB/meta")
        .select("uid", "file_path").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      require(fpA == fpB,
        s"zone-map indexes $pathA and $pathB were built over different " +
          s"lakes/snapshots (${fpA.size} vs ${fpB.size} meta rows, " +
          s"${(fpA diff fpB).size + (fpB diff fpA).size} disagreeing) — " +
          "their uid spaces cannot be joined")
      // re-stat before caching (the discipline of headOf/centroidHead/
      // headAt): an in-place rebuild landing between the key stat and
      // the collects — within mtime granularity it can even keep the
      // SAME signature — would memoize a mixed-build validation; only
      // cache when the dirs provably did not move under the read
      if (graft.core.Fs.dirSignature(spark, s"$pathA/meta") == vKey._3 &&
          graft.core.Fs.dirSignature(spark, s"$pathB/meta") == vKey._4)
        uidGuardCache.put(vKey, ())
      // drop entries for superseded versions of the same pair (a
      // rebuild changes the dir version; the stale key never hits)
      uidGuardCache.keys.filter(k =>
        k._1 == pathA && k._2 == pathB && k != vKey)
        .foreach(uidGuardCache.remove)
    }
    val candA = spark.read.parquet(s"$pathA/zones")
      .filter(col("hi") >= loA && col("lo") <= hiA) // overlap test
      .select("uid")
    val candB = spark.read.parquet(s"$pathB/zones")
      .filter(col("hi") >= loB && col("lo") <= hiB) // overlap test
      .select("uid")
    val hits = candA.join(candB, Seq("uid"))
    Layout.readHits(spark, meta, hits)
      .filter(col(colA) >= loA && col(colA) <= hiA &&
        col(colB) >= loB && col(colB) <= hiB)
  }
}
