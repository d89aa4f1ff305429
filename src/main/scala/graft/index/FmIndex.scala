package graft.index

import graft.core.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring index with real FM-index semantics: bounded-window suffix
  * array → BWT → chunked rank structure → backward search (reference:
  * src/lava/substring/build.rs:127-305 builds the char-mode SA/BWT,
  * search.rs:381-444 runs backward search; fm_chunk.rs:56-64 stores
  * cumulative counts per chunk exactly like `cum` here).
  *
  * Spark-first construction: the suffix array is a *fixed-length-key
  * sort* — the reference bounds suffix comparisons to 10-token windows
  * (build.rs:439-451), here to `W` characters — so the whole build is
  * one `repartitionByRange(key, uid, pos) + sortWithinPartitions`
  * (Spark's strongest primitive) plus `zipWithIndex` for the global SA
  * rank. Everything physical is parquet: `fm/` holds per-chunk BWT
  * text, cumulative char counts, and the SA-ordered uid array (the
  * reference's FM chunks + posting chunks); `head/` holds the C array.
  *
  * Exactness: with ties in the W-bounded sort broken by (rid, pos) —
  * rid a per-ROW unique id — backward search is EXACT for patterns of
  * ≤ W−1 chars: a suffix outside the current SA range can only tie
  * with one inside on the first W−1 chars if it also starts with the
  * (≤ W−2 char) pattern, a contradiction; and the (rid, pos)
  * tie-break is preserved by the LF step (prepending a char maps it
  * to (rid, pos−1), the same order).
  * Queries longer than W−1 walk their LAST W−1 chars
  * (the reference keeps the last `token_viable_limit` tokens,
  * search.rs:512-524) and the mandatory brute-force refine restores
  * exactness — the reference's own FP discipline (search.rs:78-85).
  *
  * Search is driver-orchestrated point lookups: ≤ |walk| steps, each
  * reading ≤ 2 boundary chunks by `chunk_id` (parquet min/max pruned),
  * memoized in a driver LRU — the role the reference's Redis range
  * cache plays for hot index ranges (src/formats/cache/cache.rs:11-35).
  */
object FmIndex {

  val W = 16 // suffix window; exact backward search for |q| ≤ 15
  val ChunkSize = 4096 // SA positions per chunk (reference: FM_CHUNK_TOKS)
  val Sentinel = "\u0001"

  /** Shared SA/BWT pipeline: suffix rows → bounded sort → global SA
    * rank. Returns (ranked, meta), both cached — `ranked` has columns
    * (rank, uid, bwtc, fc, chunk, off). [[WaveletIndex]] builds from
    * the same pipeline with a different physical rank encoding.
    */
  private[index] def rankedBwt(spark: SparkSession, files: Seq[String],
      column: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val meta = Layout.buildMeta(spark, files).cache()
    // rid = per-ROW unique id: the suffix-sort tie-break must be unique
    // per position, and uid is row-GROUP granularity (docs sharing a
    // row group would collide, making the BWT order of tied windows
    // arbitrary across docs and corrupting LF ranks). (rid, i) is
    // LF-consistent: prepending a char maps it to (rid, i−1), the same
    // order. uid stays as the posting payload.
    val data = Layout.withUid(spark, files, meta)
      .select(col("uid"), lower(col(column)).as("txt"))
      .filter(col("txt").isNotNull && length(col("txt")) > 0)
      .withColumn("rid", monotonically_increasing_id())
    // one row per character position 0..len INCLUSIVE: the terminator
    // suffix at i = len puts the row's LAST char into the BWT (without
    // it, matches ending at a row boundary are unreachable by the LF
    // step — the BWT must be a permutation of the row's chars plus one
    // sentinel). Each row: W-char suffix window key, the char BEFORE
    // the position (BWT), and the first char (C array).
    val padded = concat(col("txt"), lit(Sentinel * W))
    val suf = data
      .select(col("uid"), col("rid"), col("txt"), explode(
        expr("sequence(0, length(txt))")).as("i"))
      .select(col("uid"), col("rid"), col("i"),
        substring(padded, col("i") + 1, lit(W)).as("key"),
        when(col("i") === 0, lit(Sentinel))
          .otherwise(substring(col("txt"), col("i"), lit(1))).as("bwtc"),
        substring(padded, col("i") + 1, lit(1)).as("fc"))
    // bounded suffix sort; (rid, i) tie-break makes the order total and
    // LF-consistent (see scaladoc). zipWithIndex assigns the global SA
    // rank without funneling data through one partition.
    val sorted = suf
      .repartitionByRange(col("key"), col("rid"), col("i"))
      .sortWithinPartitions("key", "rid", "i")
    val ranked = sorted.select("uid", "bwtc", "fc").rdd.zipWithIndex
      .map { case (r, rank) =>
        (rank, r.getLong(0), r.getString(1), r.getString(2))
      }.toDF("rank", "uid", "bwtc", "fc")
      .withColumn("chunk", expr(s"rank div $ChunkSize"))
      .withColumn("off", col("rank") % ChunkSize)
      .cache()
    (ranked, meta)
  }

  /** Per-chunk SA-order char and uid arrays (array_sort on structs
    * orders by the leading `off` field).
    */
  private[index] def perChunkArrays(ranked: DataFrame): DataFrame =
    ranked.groupBy("chunk").agg(
      transform(array_sort(collect_list(struct(col("off"), col("bwtc")))),
        x => x.getField("bwtc")).as("chars"),
      transform(array_sort(collect_list(struct(col("off"), col("uid")))),
        x => x.getField("uid")).as("uids"))

  /** Dense cumulative char counts before each chunk, as a per-chunk
    * map column (chars absent from a chunk still need their running
    * total, hence the cross join).
    */
  private[index] def chunkCums(ranked: DataFrame): DataFrame = {
    val counts = ranked.groupBy("chunk", "bwtc").agg(count(lit(1)).as("n"))
    val dense = ranked.select("chunk").distinct()
      .crossJoin(counts.select("bwtc").distinct())
      .join(counts, Seq("chunk", "bwtc"), "left")
      .na.fill(0L, Seq("n"))
    val cums = dense.withColumn("cum",
      coalesce(sum(col("n")).over(Window.partitionBy("bwtc")
        .orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    cums.groupBy("chunk")
      .agg(map_from_entries(collect_list(struct(col("bwtc"), col("cum"))))
        .as("cum"))
  }

  /** Writes the artifacts shared by both BWT encodings: `head/` (C
    * array + totals), `info/` (indexed column), `meta/` sidecar.
    * Unpersists both cached inputs.
    */
  private[index] def writeCommon(spark: SparkSession, ranked: DataFrame,
      meta: DataFrame, column: String, path: String): Unit = {
    import spark.implicits._
    val counts = ranked.groupBy("bwtc").agg(count(lit(1)).as("nb"))
    // head: per char, suffixes starting below it (C array), suffixes
    // starting with it, and its total BWT occurrences (rank at pos = N)
    val firstCounts = ranked.groupBy("fc").agg(count(lit(1)).as("nf"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val bwtTotals = counts
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    var before = 0L
    val headRows = firstCounts.map { case (ch, nf) =>
      val r = (ch, before, nf, bwtTotals.getOrElse(ch, 0L)); before += nf; r
    }
    val bwtOnly = (bwtTotals.keySet -- firstCounts.map(_._1).toSet).toSeq
      .sorted.map(ch => (ch, -1L, 0L, bwtTotals(ch)))
    (headRows ++ bwtOnly).toSeq
      .toDF("ch", "c_before", "n_first", "n_bwt")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/head")
    ranked.unpersist()
    // indexed column, needed by rebuild-on-merge (the merge signature is
    // column-agnostic, like every kind's)
    Seq(column).toDF("column").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/info")
    meta.write.mode("overwrite").parquet(s"$path/meta")
    meta.unpersist()
  }

  /** Build over a file group: suffix rows → bounded sort → SA rank →
    * chunked BWT/rank/uid tables + C-array head + meta sidecar.
    */
  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = {
    val (ranked, meta) = rankedBwt(spark, files, column)
    val perChunk = perChunkArrays(ranked)
      .select(col("chunk"), array_join(col("chars"), "").as("bwt"),
        col("uids"))
    perChunk.join(chunkCums(ranked), Seq("chunk"))
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/fm")
    writeCommon(spark, ranked, meta, column, path)
  }

  /** Merge = rebuild over the union of both indexes' covered files
    * (SURVEY §7.5: rebuild-on-merge is the sanctioned v1 for BWT
    * indexes — the reference's streaming interleave, merge.rs:185-407,
    * is an encoding-level optimization with identical search results).
    */
  def merge(spark: SparkSession, a: String, b: String, out: String): Unit = {
    val column = spark.read.parquet(s"$a/info").collect()(0).getString(0)
    val files = (spark.read.parquet(s"$a/meta").select("file_path")
      .unionByName(spark.read.parquet(s"$b/meta").select("file_path")))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    build(spark, files, column, out)
  }

  // ---- driver-side lookup state (the hot "metadata page") -------------

  private case class Head(cBefore: Map[String, Long], nBwt: Map[String, Long],
      n: Long)
  private case class Chunk(bwt: String, cum: Map[String, Long], uids: Seq[Long])

  // caches are keyed by (path, head-dir mtime): index dirs are immutable
  // once built (the facade's discipline — merge writes a NEW dir), but a
  // same-path rebuild must never serve stale chunks
  private def version(path: String): Long =
    java.nio.file.Files
      .getLastModifiedTime(java.nio.file.Paths.get(path, "head")).toMillis

  private val headCache =
    scala.collection.mutable.Map.empty[(String, Long), Head]
  private val chunkCache =
    new java.util.LinkedHashMap[(String, Long, Long), Chunk](256, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), Chunk]): Boolean =
        size() > 1024
    }

  private def head(spark: SparkSession, path: String): Head = synchronized {
    headCache.getOrElseUpdate((path, version(path)), {
      val rows = spark.read.parquet(s"$path/head").collect()
      Head(
        rows.filter(_.getLong(1) >= 0)
          .map(r => r.getString(0) -> r.getLong(1)).toMap,
        rows.map(r => r.getString(0) -> r.getLong(3)).toMap,
        rows.map(_.getLong(2)).sum)
    })
  }

  /** Batched fetch: ONE job loads every missing (path, chunk) pair
    * across all indexes — the per-step boundary read of backward search
    * stays one job no matter how many indexes cover the lake (the
    * facade's constant-jobs discipline). Rows are attributed to their
    * index by file path.
    */
  private def fetchChunks(spark: SparkSession,
      needs: Map[String, Seq[Long]]): Unit = synchronized {
    val vers = needs.keys.map(p => p -> version(p)).toMap
    val missing = needs.toSeq.flatMap { case (p, ids) =>
      ids.distinct.filterNot(id =>
        chunkCache.containsKey((p, vers(p), id))).map(p -> _)
    }
    if (missing.isEmpty) return
    val paths = missing.map(_._1).distinct
    val ids = missing.map(_._2).distinct
    spark.read.parquet(paths.map(_ + "/fm"): _*)
      .filter(col("chunk").isin(ids: _*))
      .select(col("chunk"), col("bwt"), col("uids"), col("cum"),
        input_file_name().as("__f"))
      .collect().foreach { r =>
        val f = Layout.canonPath(r.getString(4))
        paths.find(p => f.startsWith(Layout.canonPath(p) + "/")).foreach { p =>
          chunkCache.put((p, vers(p), r.getLong(0)),
            Chunk(r.getString(1), r.getMap[String, Long](3).toMap,
              r.getSeq[Long](2).toIndexedSeq))
        }
      }
  }

  private def chunks(spark: SparkSession, path: String,
      ids: Seq[Long]): Map[Long, Chunk] = {
    fetchChunks(spark, Map(path -> ids))
    synchronized {
      val v = version(path)
      ids.distinct.map(id => id -> chunkCache.get((path, v, id))).toMap
    }
  }

  /** occurrences of `c` in BWT[0, pos) */
  private def rank(spark: SparkSession, path: String, h: Head,
      c: String, pos: Long): Long = {
    if (pos <= 0) return 0L
    if (pos >= h.n) return h.nBwt.getOrElse(c, 0L)
    val id = pos / ChunkSize
    val ch = chunks(spark, path, Seq(id))(id)
    val inChunk = ch.bwt.substring(0, (pos % ChunkSize).toInt)
      .count(_.toString == c)
    ch.cum.getOrElse(c, 0L) + inChunk
  }

  /** Lock-step backward search over several indexes at once: all walks
    * advance together and each step's boundary chunks are fetched in
    * ONE batched job across every index. Returns each index's SA range
    * [lo, hi) for the walk pattern (last W−1 chars of the query).
    */
  def saRangeMulti(spark: SparkSession, paths: Seq[String],
      query: String): Map[String, (Long, Long)] = {
    val hs = paths.map(p => p -> head(spark, p)).toMap
    val walk = query.takeRight(W - 1)
    var state = paths.map(p => p -> (0L, hs(p).n)).toMap
    walk.reverseIterator.foreach { ch =>
      val c = ch.toString
      val needs = state.collect { case (p, (lo, hi)) if lo < hi =>
        val h = hs(p)
        p -> Seq(lo, hi).filter(pos => pos > 0 && pos < h.n).map(_ / ChunkSize)
      }.filter(_._2.nonEmpty)
      fetchChunks(spark, needs)
      state = state.map { case (p, (lo, hi)) =>
        if (lo >= hi) p -> (lo, hi)
        else hs(p).cBefore.get(c) match {
          case None => p -> (0L, 0L) // char never starts a suffix here
          case Some(cb) =>
            p -> (cb + rank(spark, path = p, hs(p), c, lo),
              cb + rank(spark, path = p, hs(p), c, hi))
        }
      }
    }
    state
  }

  def saRange(spark: SparkSession, path: String, query: String): (Long, Long) =
    saRangeMulti(spark, Seq(path), query)(path)

  /** SA-ordered uid posting slice [lo, hi); assumes the covering chunks
    * are already cached (call fetchPostings/chunks first).
    */
  def postingSlice(spark: SparkSession, path: String,
      lo: Long, hi: Long): Seq[Long] = {
    if (hi <= lo) return Nil
    val ids = (lo / ChunkSize) to ((hi - 1) / ChunkSize)
    val fetched = chunks(spark, path, ids)
    ids.flatMap { id =>
      val ch = fetched(id)
      val base = id * ChunkSize
      val from = math.max(lo - base, 0L).toInt
      val until = math.min(hi - base, ch.uids.size.toLong).toInt
      if (until > from) ch.uids.slice(from, until) else Nil
    }.distinct
  }

  /** Batch-fetch the posting chunks covering every index's range in one
    * job, so subsequent postingSlice calls are cache hits.
    */
  def fetchPostings(spark: SparkSession,
      ranges: Map[String, (Long, Long)]): Unit =
    fetchChunks(spark, ranges.collect { case (p, (lo, hi)) if hi > lo =>
      p -> ((lo / ChunkSize) to ((hi - 1) / ChunkSize)).toSeq
    })

  /** Search one index: backward search → SA-range uid posting slice →
    * selective read → refine with the FULL query (exactness past W−1
    * and the reference's no-truncate-before-refine discipline).
    */
  def search(spark: SparkSession, path: String, column: String,
      query: String): DataFrame = {
    import spark.implicits._
    val q = query.toLowerCase
    val meta = spark.read.parquet(s"$path/meta")
    def covered: Seq[String] = meta.select("file_path").distinct()
      .collect().map(_.getString(0)).toSeq
    if (q.isEmpty)
      return spark.read.parquet(covered: _*).withColumn("uid", lit(-1L))
    val (lo, hi) = saRange(spark, path, q)
    // cost switch: a huge SA range means the gram is unselective — the
    // covered-files scan wins (reference: brute_force_threshold,
    // backends/utils.py:221-225)
    if (hi - lo > graft.core.Lake.BruteForceThreshold * ChunkSize) {
      return spark.read.parquet(covered: _*)
        .filter(lower(col(column)).contains(q))
        .withColumn("uid", lit(-1L))
    }
    val uids = postingSlice(spark, path, lo, hi)
    Layout.readHits(spark, meta, uids.toDF("uid"))
      .filter(lower(col(column)).contains(q))
  }
}
