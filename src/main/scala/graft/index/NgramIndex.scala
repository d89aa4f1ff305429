package graft.index

import graft.core.{IndexStore, Layout}
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substring index: character n-gram posting lists at row-group
  * granularity.
  *
  * Capability-equivalent Spark re-expression of the reference's
  * FM-index/BWT substring index (reference: src/lava/substring/build.rs:
  * 127-547, search.rs:95-204): any row whose value contains the query
  * must sit in a row group whose gram set contains *every* n-gram of the
  * query, so gram-intersection gives a candidate superset and the
  * mandatory brute-force refine removes false positives — the reference
  * has the same FP discipline (never truncate to K before refine,
  * reference: src/lava/substring/search.rs:78-85).
  *
  * Physical layout: `postings/` parquet of (gram, uid) rows partitioned
  * by a gram hash bucket — a query's grams prune to ≤|grams| buckets via
  * partition pruning; posting "lists" stay as rows, never driver-sized
  * arrays, so a 100 TB build is one explode→distinct shuffle.
  *
  * Besides the 3-grams the postings also hold 1- and 2-grams, so
  * queries SHORTER than the gram width still prune via an exact gram
  * lookup instead of falling off a full-lake-scan cliff (the
  * reference's FM backward search handles any query length,
  * reference: src/lava/substring/search.rs:120-149). Distinct
  * (uid, gram) pairs bound the cost: ≤ |alphabet| + |alphabet|² extra
  * rows per row group.
  */
object NgramIndex {

  val N = 3
  val Buckets = Bucketing.Buckets

  private def bucketOf(c: org.apache.spark.sql.Column) =
    Bucketing.bucketCol(c)

  /** Driver-side twin of `bucketOf` (xxhash64 seed 42, same as the
    * `xxhash64` SQL function) so query grams map to partition values
    * without a Spark job.
    */
  def bucketOfString(g: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.unsafe.types.UTF8String
    Math.floorMod(
      XxHash64Function.hash(UTF8String.fromString(g),
        org.apache.spark.sql.types.StringType, 42L), Buckets.toLong).toInt
  }

  /** Build over a file group; writes postings + meta sidecar under
    * `path` and returns (files covered, rows indexed).
    */
  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = {
    val meta = Layout.buildMeta(spark, files, Some(column)).cache()
    val data = Layout.withUid(spark, files, meta)
    // 3-grams for normal queries + 1/2-grams for the short-query path
    // (different lengths never collide, so one flat gram column)
    val grams = concat(
      Text.charNgrams(col(column), N),
      Text.charNgrams(col(column), 2),
      Text.charNgrams(col(column), 1))
    val postings = data
      .select(col("uid"), explode(grams).as("gram"))
      .distinct() // (uid, gram) pairs; array_distinct already dedups per row
      .withColumn("bucket", bucketOf(col("gram")))
    postings.write.mode("overwrite")
      .partitionBy("bucket")
      .option("compression", "zstd")
      .parquet(s"$path/postings")
    meta.write.mode("overwrite").parquet(s"$path/meta")
    meta.unpersist()
  }

  /** Search one index: gram-intersect → candidate row groups → selective
    * read → refine. Returns the matching lake rows (all columns + uid).
    * No K-truncation here: FP-prone candidates are refined first
    * (reference: search.rs:78-85).
    */
  def search(spark: SparkSession, path: String, column: String,
      query: String): DataFrame = {
    val q = graft.text.Text.sparkLower(query)
    val meta = spark.read.parquet(s"$path/meta")
    if (q.isEmpty) {
      // contains("") is every row: no gram to probe, scan covered files
      val files = meta.select("file_path").distinct()
        .collect().map(_.getString(0)).toSeq
      return spark.read.parquet(files: _*)
        .withColumn("uid", lit(-1L))
    }
    // cap probe width on long queries (candidate superset stays valid;
    // refine restores exactness) — reference: token_viable_limit,
    // src/lava/substring/search.rs:512-524. Queries shorter than the
    // gram width probe their exact short gram instead of scanning.
    // code-point grams: the index's grams are Spark-side code-point
    // windows, so the query must window the same way (Text.cpGrams)
    val qgrams = {
      val cpg = graft.text.Text.cpGrams(q, N)
      if (cpg.nonEmpty) graft.text.QueryShaping.viableGrams(cpg.distinct)
      else Seq(q)
    }
    val qbuckets = qgrams.map(bucketOfString).distinct
    val post = spark.read.parquet(s"$path/postings")
      // bucket predicate prunes partitions; gram predicate prunes row
      // groups inside them via parquet min/max stats
      .filter(col("bucket").isin(qbuckets: _*) && col("gram").isin(qgrams: _*))
    import spark.implicits._
    // candidate uids are row-group ordinals — metadata-sized by
    // definition — so one collect both feeds the cost switch and
    // replaces a session-cache entry that would otherwise leak
    val cands = post.groupBy("uid")
      .agg(countDistinct(col("gram")).as("ng"))
      .filter(col("ng") === qgrams.size)
      .select("uid").collect().map(_.getLong(0)).toSeq
    // cost switch: past the hit threshold — or when EVERY row group is
    // hit (zero pruning value) — a full scan beats selective row-group
    // fetches (reference: brute_force_threshold=1000,
    // backends/utils.py:221-225)
    if (cands.size > graft.core.Lake.BruteForceThreshold ||
        cands.size >= meta.count()) {
      val files = meta.select("file_path").distinct()
        .collect().map(_.getString(0)).toSeq
      return spark.read.parquet(files: _*)
        .filter(lower(col(column)).contains(q))
        .withColumn("uid", lit(-1L))
    }
    Layout.readHits(spark, meta, cands.toDF("uid"))
      .filter(lower(col(column)).contains(q))
  }

  /** Regex search against the same postings: probe the index for the
    * pattern's REQUIRED literal runs
    * ([[graft.text.QueryShaping.requiredLiterals]]), intersect their
    * grams, regex-refine only the candidate row groups. This is the
    * log-grep accelerant the LogCloud tier applies to templates,
    * generalized to any indexed column: at 100 TB a regex that contains
    * any 3-char literal reads only the row groups holding ALL its
    * literals' grams instead of scanning the lake.
    *
    * `pattern` is matched against `lower(column)` (the postings are
    * lowercased grams), Java-regex contains semantics — callers pass
    * lowercase literals. Patterns with no required literal (top-level
    * alternation, all-optional) take the documented scan-and-refine
    * fallback: the index cannot bound them, exactness never depends on
    * it.
    */
  def searchRegex(spark: SparkSession, path: String, column: String,
      pattern: String): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta")
    def coveredScan(): DataFrame = {
      val files = meta.select("file_path").distinct()
        .collect().map(_.getString(0)).toSeq
      spark.read.parquet(files: _*)
        .filter(lower(col(column)).rlike(pattern))
        .withColumn("uid", lit(-1L))
    }
    val lits = graft.text.QueryShaping.requiredLiterals(pattern)
      .map(graft.text.Text.sparkLower).filter(_.nonEmpty)
    if (lits.isEmpty) return coveredScan()
    // every literal's grams must ALL be present in a candidate row
    // group (a matching row contains every literal, so its group's gram
    // set is a superset of every literal's grams); literals shorter
    // than the gram width probe their exact short gram — one flat
    // distinct gram set carries the conjunction
    val qgrams = lits.flatMap { l =>
      val cpg = graft.text.Text.cpGrams(l, N)
      if (cpg.nonEmpty) cpg else Seq(l)
    }.distinct
    val probeGrams = graft.text.QueryShaping.viableGrams(qgrams)
    val qbuckets = probeGrams.map(bucketOfString).distinct
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(qbuckets: _*) &&
        col("gram").isin(probeGrams: _*))
    import spark.implicits._
    val cands = post.groupBy("uid")
      .agg(countDistinct(col("gram")).as("ng"))
      .filter(col("ng") === probeGrams.size)
      .select("uid").collect().map(_.getLong(0)).toSeq
    if (cands.size > graft.core.Lake.BruteForceThreshold ||
        cands.size >= meta.count()) return coveredScan()
    Layout.readHits(spark, meta, cands.toDF("uid"))
      .filter(lower(col(column)).rlike(pattern))
  }

  /** Merge two indexes into one (compaction): second index's uids are
    * re-based past the first's (reference: merge re-bases uid offsets,
    * src/lava/merge.rs:17-205; metadata merge backends/utils.py:195-213).
    * Parquet-table indexes make this a union + uid shift, not a
    * streaming BWT interleave.
    */
  def merge(spark: SparkSession, a: String, b: String, out: String): Unit = {
    val metaA = spark.read.parquet(s"$a/meta")
    val metaB = spark.read.parquet(s"$b/meta")
    val offset = metaA.agg(max("uid")).collect()(0).getLong(0)
    val meta = metaA.unionByName(
      metaB.withColumn("uid", col("uid") + offset))
    val post = spark.read.parquet(s"$a/postings").unionByName(
      spark.read.parquet(s"$b/postings").withColumn("uid", col("uid") + offset))
    post.write.mode("overwrite").partitionBy("bucket")
      .option("compression", "zstd").parquet(s"$out/postings")
    meta.coalesce(1).write.mode("overwrite").parquet(s"$out/meta")
  }
}
