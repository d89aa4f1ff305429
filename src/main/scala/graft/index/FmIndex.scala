package graft.index

import graft.core.Layout
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * The driver-side search machinery (caches, lock-step multi-index
  * walk, capped posting slices, cost switches) is the shared
  * [[BwtDriver]]; this object contributes the raw-text chunk encoding
  * (linear in-chunk rank) and the build pipeline, which
  * [[WaveletIndex]] reuses with a different physical rank structure.
  */
object FmIndex extends BwtDriver {

  val W = 16 // suffix window; exact backward search for |q| ≤ 15
  val ChunkSize = 4096 // SA positions per chunk (reference: FM_CHUNK_TOKS)
  val Sentinel = "\u0001"

  // ---- shared build pipeline (used by both encodings) ----------------

  /** Shared SA/BWT pipeline: suffix rows → bounded sort → global SA
    * rank. Returns (ranked, meta), both cached — `ranked` has columns
    * (rank, uid, bwtc, fc, chunk, off). [[WaveletIndex]] builds from
    * the same pipeline with a different physical rank encoding.
    */
  private[index] def rankedBwt(spark: SparkSession, files: Seq[String],
      column: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val meta = Layout.buildMeta(spark, files, Some(column)).cache()
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
    (rankSuffixes(spark, suf, ChunkSize), meta)
  }

  /** Bounded suffix sort + global SA rank, shared by the char- and
    * token-mode builds: (rid, i) tie-break makes the order total and
    * LF-consistent (see scaladoc). zipWithIndex assigns the global SA
    * rank without funneling data through one partition. `suf` needs
    * (uid, rid, i, key, bwtc, fc); returns cached (rank, uid, bwtc, fc,
    * chunk, off).
    */
  private[index] def rankSuffixes(spark: SparkSession, suf: DataFrame,
      chunkSize: Int): DataFrame = {
    import spark.implicits._
    val sorted = suf
      .repartitionByRange(col("key"), col("rid"), col("i"))
      .sortWithinPartitions("key", "rid", "i")
    sorted.select("uid", "bwtc", "fc").rdd.zipWithIndex()
      .map { case (r, rank) =>
        (rank, r.getLong(0), r.getString(1), r.getString(2))
      }.toDF("rank", "uid", "bwtc", "fc")
      .withColumn("chunk", expr(s"rank div $chunkSize"))
      .withColumn("off", col("rank") % chunkSize)
      .cache()
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
    // the C array must be ordered the way the suffix sort ordered keys:
    // Spark string order is UTF-8 BINARY order, so sort symbols by
    // their UTF-8 bytes — not by Java's UTF-16 char order (they diverge
    // for supplementary chars vs BMP chars in [U+E000, U+FFFF]). Full
    // UTF8String comparison, not first-code-point, so multi-char
    // symbols (token-mode) order exactly like the suffix sort did.
    val utf8Ord: Ordering[String] = (a: String, b: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val counts = ranked.groupBy("bwtc").agg(count(lit(1)).as("nb"))
    // head: per symbol, suffixes starting below it (C array), suffixes
    // starting with it, and its total BWT occurrences (rank at pos = N)
    val firstCounts = ranked.groupBy("fc").agg(count(lit(1)).as("nf"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)(utf8Ord)
    val bwtTotals = counts
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    var before = 0L
    val headRows = firstCounts.map { case (ch, nf) =>
      val r = (ch, before, nf, bwtTotals.getOrElse(ch, 0L)); before += nf; r
    }
    val bwtOnly = (bwtTotals.keySet -- firstCounts.map(_._1).toSet).toSeq
      .sorted(utf8Ord).map(ch => (ch, -1L, 0L, bwtTotals(ch)))
    ranked.unpersist()
    // indexed column, needed by rebuild-on-merge (the merge signature is
    // column-agnostic, like every kind's)
    Seq(column).toDF("column").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/info")
    meta.write.mode("overwrite").parquet(s"$path/meta")
    meta.unpersist()
    // head/ LAST: it is the version anchor every driver cache keys on,
    // so once its signature is observable every table of THIS build is
    // already on disk (see TokenFmIndex.build)
    (headRows ++ bwtOnly).toSeq
      .toDF("ch", "c_before", "n_first", "n_bwt")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/head")
  }

  /** Build over a file group: suffix rows → bounded sort → SA rank →
    * chunked BWT/rank/uid tables + C-array head + meta sidecar.
    */
  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = {
    val (ranked, meta) = rankedBwt(spark, files, column)
    writeChunks(spark, ranked, path)
    writeCommon(spark, ranked, meta, column, path)
  }

  protected def writeChunks(spark: SparkSession, ranked: DataFrame,
      path: String): Unit = {
    val perChunk = perChunkArrays(ranked)
      .select(col("chunk"), array_join(col("chars"), "").as("bwt"),
        col("uids"))
    perChunk.join(chunkCums(ranked), Seq("chunk"))
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/fm")
  }

  /** Merge input: per-position rows decoded chunk-locally, INCLUDING
    * the LF value — the chunk's own `cum` map plus a running local
    * count gives occ(p) with no shuffle, so recovering the ψ
    * permutation for the interleave is map-only.
    */
  protected def positions(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val cB = spark.sparkContext.broadcast(loadHead(spark, path).cBefore)
    spark.read.parquet(s"$path/fm")
      .select(col("chunk"), col("bwt"), col("uids"), col("cum"))
      .as[(Long, String, Seq[Long], Map[String, Long])]
      .flatMap { case (chunk, bwt, uids, cum) =>
        val occ = scala.collection.mutable.HashMap.empty[String, Long]
        val out = Seq.newBuilder[(Long, String, Long, Long)]
        var i = 0; var k = 0
        while (i < bwt.length) {
          val cp = bwt.codePointAt(i); val w = Character.charCount(cp)
          val ch = bwt.substring(i, i + w)
          val o = occ.getOrElse(ch, 0L)
          occ.update(ch, o + 1)
          out += ((chunk * ChunkSize + k, ch, uids(k),
            cB.value(ch) + cum.getOrElse(ch, 0L) + o))
          i += w; k += 1
        }
        out.result()
      }.toDF("pos", "bwtc", "uid", "lf")
  }

  // ---- BwtDriver: raw-text chunk encoding ----------------------------

  protected case class FmChunk(bwt: String, cum: Map[String, Long],
      uids: Seq[Long])
  protected case class FmHead(cBefore: Map[String, Long],
      nBwt: Map[String, Long], n: Long) extends BwtHead

  protected type Chunk = FmChunk
  protected type Head = FmHead

  protected def chunkDir: String = "fm"
  protected def chunkColumns: Seq[String] = Seq("chunk", "bwt", "uids", "cum")

  protected def decodeChunk(r: Row): FmChunk =
    FmChunk(r.getString(1), r.getMap[String, Long](3).toMap,
      r.getSeq[Long](2).toIndexedSeq)

  protected def chunkBytes(c: FmChunk): Long =
    64L + 2L * c.bwt.length + 64L * c.cum.size + 8L * c.uids.size

  protected def chunkUids(c: FmChunk): Seq[Long] = c.uids
  protected def chunkCum(c: FmChunk, ch: String): Long =
    c.cum.getOrElse(ch, 0L)

  /** Linear code-point scan of the chunk prefix — iterates code points
    * so a surrogate pair counts as one BWT entry, matching the
    * code-point positions the build indexed.
    */
  protected def rankWithin(h: FmHead, c: FmChunk, ch: String,
      off: Int): Long = {
    val target = ch.codePointAt(0)
    var i = 0; var seen = 0; var cnt = 0L
    while (seen < off && i < c.bwt.length) {
      val cp = c.bwt.codePointAt(i)
      if (cp == target) cnt += 1
      i += Character.charCount(cp)
      seen += 1
    }
    cnt
  }

  protected def loadHead(spark: SparkSession, path: String): FmHead = {
    val rows = spark.read.parquet(s"$path/head").collect()
    FmHead(
      rows.filter(_.getLong(1) >= 0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.map(r => r.getString(0) -> r.getLong(3)).toMap,
      rows.map(_.getLong(2)).sum)
  }
}
