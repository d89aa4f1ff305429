package graft.index

import graft.core.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact/prefix key index ("uuid index" in the reference).
  *
  * The reference builds an LCP-compressed binary trie over pre-sorted
  * keys (reference: src/lava/uuid/uuid.rs:16-61, trie.rs:42-128) and
  * walks it at search (uuid.rs:106-162). The trie is an encoding choice;
  * the capability is "point/prefix lookup over sorted keys". The
  * idiomatic Spark equivalent (SURVEY §2.3 #20) is a **range-partitioned,
  * sorted (key, uid) parquet table**: parquet row-group min/max stats on
  * the sorted key column ARE the zone map, so an equality/prefix
  * predicate prunes to the few row groups that can contain the key —
  * same O(log) page-touch profile, native to every parquet reader.
  *
  * Like the trie (which admits false positives refined later,
  * trie.rs:550-556), hits are refined against the lake rows.
  */
object KeyIndex {

  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String, parts: Int = 8): Unit = {
    val meta = Layout.buildMeta(spark, files, Some(column)).cache()
    val data = Layout.withUid(spark, files, meta)
    data.select(col(column).as("key"), col("uid"))
      .repartitionByRange(parts, col("key"))
      .sortWithinPartitions(col("key"))
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/keys")
    meta.write.mode("overwrite").parquet(s"$path/meta")
    meta.unpersist()
  }

  /** Exact-match lookup → matching lake rows (all columns + uid). */
  def searchExact(spark: SparkSession, path: String, column: String,
      key: String): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta")
    val hits = spark.read.parquet(s"$path/keys")
      .filter(col("key") === key) // pushed filter → row-group pruning
      .select("uid").distinct()
    Layout.readHits(spark, meta, hits)
      .filter(col(column) === key) // refine (FP discipline)
  }

  /** Merge two key indexes: union + global re-sort (the reference
    * merges tries recursively with uid offsets, reference:
    * src/lava/uuid/trie.rs:213-354; a sorted table makes it a
    * range-repartitioned sort).
    */
  def merge(spark: SparkSession, a: String, b: String, out: String,
      parts: Int = 8): Unit = {
    val offset = spark.read.parquet(s"$a/meta")
      .agg(max("uid")).collect()(0).getLong(0)
    spark.read.parquet(s"$a/keys").unionByName(
      spark.read.parquet(s"$b/keys").withColumn("uid", col("uid") + offset))
      .repartitionByRange(parts, col("key"))
      .sortWithinPartitions(col("key"))
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$out/keys")
    spark.read.parquet(s"$a/meta").unionByName(
      spark.read.parquet(s"$b/meta").withColumn("uid", col("uid") + offset))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/meta")
  }

  /** Tight exclusive upper bound for a prefix range: increment the last
    * code point (UTF-8 byte order follows code-point order, so
    * `init + (c+1)` exceeds every `init + c + suffix`). `prefix+"￿"`
    * would miss keys whose continuation starts with a supplementary
    * character (first UTF-8 byte 0xF0 > 0xEF). None when no valid bound
    * exists (next code point would be a surrogate / overflow).
    */
  private[graft] def prefixUpperBound(prefix: String): Option[String] = {
    if (prefix.isEmpty) return None // "%": unbounded range, refine restores exactness
    val c = prefix.last
    // c+1 must not land in the surrogate block [U+D800, U+DFFF]; both
    // BMP ranges around it are valid bounds (code-point order = UTF-8
    // order for every valid non-surrogate) — refusing the upper range
    // would degrade fullwidth/CJK-compat/private-use prefixes to
    // unbounded scans
    if (c < '퟿' || ('' <= c && c < '￿'))
      Some(prefix.init + (c + 1).toChar)
    else None
  }

  /** Prefix lookup: range predicate [prefix, nextPrefix) — both bounds
    * are pushed to parquet and prune row groups of the sorted key table.
    */
  def searchPrefix(spark: SparkSession, path: String, column: String,
      prefix: String): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta")
    val ranged = spark.read.parquet(s"$path/keys")
      .filter(col("key") >= prefix)
    val bounded = prefixUpperBound(prefix) match {
      case Some(hi) => ranged.filter(col("key") < hi)
      case None     => ranged // mandatory refine still restores exactness
    }
    val hits = bounded.select("uid").distinct()
    Layout.readHits(spark, meta, hits)
      .filter(col(column).startsWith(prefix))
  }
}
