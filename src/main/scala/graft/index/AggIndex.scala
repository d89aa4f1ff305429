package graft.index

import graft.core.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grouped-aggregate index (materialized-view matching, the BI "cube"
  * slice): per (row group, key) partials of
  * `GROUP BY key → count(*), count(m), sum(m), min(m), max(m)`.
  *
  * The zone map answers GLOBAL stats queries metadata-only
  * ([[ZoneMapIndex.statsAgg]] + the Aggregate rewrite); this kind
  * extends the same contract to single-key grouped aggregates — the
  * per-source / per-tenant / per-day dashboard query a 100 TB lake
  * cannot afford to rescan. Partials are mergeable by construction
  * (counts and DECIMAL(38,0) sums add), so compaction is the standard
  * uid re-offset union and the index table stays
  * ndv(key) × row-groups — metadata-scale whenever the key is the
  * low-cardinality dimension an aggregate index is worth building for
  * (the Catalyst rewrite VETOES past a row budget instead of serving a
  * data-scale collect).
  *
  * Exactness argument: every row of a covered file lands in exactly one
  * (uid, key) cell; count(*) sums cells, count(measure) sums the
  * non-null cell counts, sum(measure) sums exact decimal cell sums —
  * each equal to the scan's answer by associativity of the underlying
  * aggregates (the same partial-aggregation Spark itself performs
  * map-side, persisted instead of recomputed).
  */
object AggIndex {

  /** Build over `files`: groups table (uid, key, n, nn, s) + spec
    * (key/measure column names, consulted by the Catalyst matcher) +
    * the standard meta sidecar.
    */
  def build(spark: SparkSession, files: Seq[String], keyCol: String,
      measureCol: String, path: String): Unit = {
    import spark.implicits._
    val meta = Layout.buildMeta(spark, files, Some(keyCol)).cache()
    val data = Layout.withUid(spark, files, meta)
    // exact decimal sums only for integral measures (the ZoneMapIndex
    // rule): a time/string measure stores NULL s — min/max/count still
    // serve, and the rewrite's sum path never fires (integralType gate)
    val integral = data.schema(measureCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val sCol =
      if (integral) sum(col(measureCol)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      else lit(null).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    data.groupBy(col("uid"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        count(col(measureCol)).as("nn"),
        sCol.as("s"),
        min(col(measureCol)).as("lo"),
        max(col(measureCol)).as("hi"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/groups")
    Seq((keyCol, measureCol)).toDF("key_col", "measure_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/spec")
    meta.write.mode("overwrite").parquet(s"$path/meta")
    meta.unpersist()
  }

  /** Merge two agg indexes: `b`'s uids re-based past `a`'s — cells stay
    * disjoint by (uid, key), so the union IS the merged partial set.
    */
  def merge(spark: SparkSession, a: String, b: String, out: String): Unit = {
    require(spec(spark, a) == spec(spark, b),
      s"agg indexes disagree on (key, measure): $a vs $b")
    val offset = spark.read.parquet(s"$a/meta")
      .agg(max("uid")).collect()(0).getLong(0)
    spark.read.parquet(s"$a/groups").unionByName(
      spark.read.parquet(s"$b/groups")
        .withColumn("uid", col("uid") + offset))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/groups")
    spark.read.parquet(s"$a/spec")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/spec")
    spark.read.parquet(s"$a/meta").unionByName(
      spark.read.parquet(s"$b/meta").withColumn("uid", col("uid") + offset))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/meta")
  }

  /** Build over a lake prefix (idempotent) and commit the coverage
    * metadata row (indexType "aggindex") that makes the Catalyst
    * grouped-aggregate rewrite discover it. Returns the index path.
    */
  def ensureRegistered(spark: SparkSession, prefix: String,
      keyCol: String, measureCol: String): String = {
    import graft.core.{IndexStore, Lake}
    val p = IndexStore.indexPath(prefix, s"agg_${keyCol}_$measureCol")
    IndexStore.ensure(p) {
      build(spark, Lake.listFiles(prefix), keyCol, measureCol, p)
    }
    // self-heal a pre-lo/hi generation of the cells table: rebuild in
    // place (metadata row, if any, stays valid — same coverage). Delete
    // through the PATH's own filesystem — a java.nio delete is a silent
    // no-op on s3://-style index roots, which would pin the stale
    // generation (and the min/max veto) forever
    if (!spark.read.parquet(s"$p/groups").schema.fieldNames.contains("lo")) {
      if (graft.core.Fs.isLocalPath(p))
        IndexStore.deleteRec(java.nio.file.Paths.get(p))
      else graft.core.Fs.deleteRec(spark, p)
      IndexStore.ensure(p) {
        build(spark, Lake.listFiles(prefix), keyCol, measureCol, p)
      }
    }
    if (!IndexStore.metadataRowsCached(spark, prefix)
        .exists(_.indexFile == p)) {
      val fc = spark.read.parquet(s"$p/meta")
        .groupBy(col("file_path"))
        .agg(sum(col("num_rows")).cast("long").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      IndexStore.commitMetadata(spark, prefix,
        IndexStore.metadataRows(spark, prefix, keyCol,
          fc.map(_._1), fc.map(_._2), p, "aggindex", fc.map(_._2).sum))
    }
    p
  }

  /** (key_col, measure_col) the index was built for. */
  def spec(spark: SparkSession, path: String): (String, String) = {
    val r = spark.read.parquet(s"$path/spec").collect()(0)
    (r.getString(0), r.getString(1))
  }

  /** The grouped aggregate served FROM the index tables (zero lake data
    * pages): the direct-call twin of the Catalyst rewrite.
    */
  def groupStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/groups")
      .groupBy(col("key"))
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("nn")).cast("long").as("nn"),
        sum(col("s")).as("s"),
        min(col("lo")).as("lo"), max(col("hi")).as("hi"))
}
