package graft.index

import graft.core.Layout
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Token-mode FM index: the BWT machinery instantiated over a TOKEN
  * alphabet (reference: src/lava/substring/build.rs:307-547 — the
  * token-mode build sorts bounded 10-TOKEN windows of the tokenized
  * corpus; search.rs:446-530 tokenizes queries exactly like the corpus
  * and walks tokens, not chars).
  *
  * Construction mirrors [[FmIndex]] one level up the alphabet: each row
  * becomes its token sequence plus a terminator, one suffix row per
  * TOKEN position, the sort key is the next `W` tokens joined by a
  * single space. Because the space (0x20) sorts below every token
  * character (`[a-z0-9]`, ≥ 0x30) and above the sentinel (0x01), the
  * joined-string UTF-8 order equals token-sequence lexicographic order
  * — so the shared bounded-sort pipeline ([[FmIndex.rankSuffixes]])
  * and head writer produce a valid token-alphabet BWT as-is. Backward
  * search is EXACT for queries of ≤ W−1 tokens by the same tie-break
  * argument as char-mode ([[FmIndex]] scaladoc); longer queries walk
  * their last W−1 tokens (the reference's `token_viable_limit`,
  * search.rs:512-524) and the mandatory token-sequence refine restores
  * exactness.
  *
  * Versus [[TokenIndex]] (word uni+bigram postings): same query
  * semantics, but a phrase of individually-common tokens prunes by the
  * full (≤ 9-token) sequence here instead of by its best bigram —
  * the candidate set the FM machinery was built to shrink.
  */
object TokenFmIndex extends BwtDriver {

  val W = 10 // token window (reference 10-token windows, build.rs:439-451)
  val ChunkSize = 4096
  val Sentinel = ""

  override protected[graft] def symbols(s: String): IndexedSeq[String] =
    TokenIndex.tokensOf(s).toIndexedSeq

  override protected[graft] def refinePred(column: String, normQ: String)
      : org.apache.spark.sql.Column = {
    val qnorm = " " + TokenIndex.tokensOf(normQ).mkString(" ") + " "
    TokenIndex.normalForm(col(column)).contains(qnorm)
  }

  /** Build over a file group: token suffix rows → shared bounded sort /
    * SA rank → chunked token-BWT tables + symbol head + meta sidecar.
    *
    * `sample` > 1 enables the reference's token skip-sampling
    * (reference: src/lava/substring/build.rs:420-437 thins the token
    * stream to every Nth token before the suffix sort): the index is a
    * normal token BWT over the THINNED stream — 1/N the suffix rows,
    * 1/N the sort — and [[search]] compensates with one residue
    * pattern per offset (reference: search.rs:493-507), refine
    * restoring exactness. Thinning here is per ROW (the reference
    * thins the concatenated global stream, which lets windows straddle
    * document boundaries; row-local thinning keeps every candidate
    * attributable to its row). Queries shorter than `sample` tokens
    * cannot guarantee a sampled alignment and take the brute path.
    */
  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = build(spark, files, column, path, 1)

  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String, sample: Int): Unit = {
    require(sample >= 1, s"sample factor must be >= 1, got $sample")
    val meta = Layout.buildMeta(spark, files, Some(column)).cache()
    val toksCol =
      if (sample == 1) graft.text.Text.tokens(col(column))
      else filter(graft.text.Text.tokens(col(column)),
        (_, i) => i % sample === 0)
    val data = Layout.withUid(spark, files, meta)
      .select(col("uid"), toksCol.as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("rid", monotonically_increasing_id())
    // one suffix row per token position 0..n INCLUSIVE (the terminator
    // suffix puts the row's LAST token into the BWT — same boundary
    // argument as char-mode). key = next W tokens space-joined.
    val padded = concat(col("toks"), array_repeat(lit(Sentinel), W))
    val suf = data
      .select(col("uid"), col("rid"), col("toks"),
        explode(expr("sequence(0, size(toks))")).as("i"))
      .select(col("uid"), col("rid"), col("i"),
        concat_ws(" ", slice(padded, col("i") + 1, lit(W))).as("key"),
        when(col("i") === 0, lit(Sentinel))
          .otherwise(element_at(col("toks"), col("i"))).as("bwtc"),
        element_at(padded, col("i") + 1).as("fc"))
    val ranked = FmIndex.rankSuffixes(spark, suf, ChunkSize)
    writeChunks(spark, ranked, path)
    // tconf BEFORE head: head/ is the version anchor every cache keys
    // on, so it must land LAST — once a head signature is observable,
    // every sidecar of THAT build is already on disk. (The reverse
    // order let a search racing a same-path rebuild stat the NEW head,
    // read the OLD tconf, pass the head re-stat, and cache the stale
    // factor under the new version — permanent silent false negatives.)
    writeSample(spark, path, sample)
    FmIndex.writeCommon(spark, ranked, meta, column, path)
  }

  // sample factor sidecar, cached by (path, HEAD version): the factor
  // is part of the build (the BWT is the thinned stream), so it must
  // ride the same version discipline as head/chunks — its own dir's
  // mtime would let a same-path rebuild pair mismatched halves
  private val sampleCache =
    new graft.core.LruMap[String, (Long, Int)](1024)

  private def writeSample(spark: SparkSession, path: String,
      sample: Int): Unit = {
    import spark.implicits._
    Seq(sample).toDF("sample").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/tconf")
  }

  def sampleOf(spark: SparkSession, path: String): Int =
    sampleAt(spark, path,
      graft.core.Fs.dirSignature(spark, s"$path/head"))

  /** Sample factor at a known head version — fails loudly when a
    * rebuild lands between the caller's version stat and the sidecar
    * read (same contract as the chunk fetches).
    */
  private def sampleAt(spark: SparkSession, path: String,
      headVer: Long): Int = {
    sampleCache.get(path) match {
      case Some((v, s)) if v == headVer => return s
      case _ =>
    }
    val dir = s"$path/tconf"
    val s =
      if (!graft.core.Fs.exists(spark, dir)) 1 // pre-sampling build
      else spark.read.parquet(dir).head().getInt(0)
    require(try graft.core.Fs.dirSignature(spark, s"$path/head") == headVer
      catch { case _: Exception => false },
      s"index at $path changed during the operation — retry")
    sampleCache.put(path, (headVer, s))
    s
  }

  override protected[graft] def sampleFactor(spark: SparkSession,
      path: String): Int = sampleOf(spark, path)

  /** The reference's residue patterns (search.rs:493-507): pattern `r`
    * is the query tokens at offsets r, r+sample, r+2·sample… — exactly
    * the thinned subsequence an occurrence starting at row position
    * ≡ −r (mod sample) leaves in the sampled stream.
    */
  private def residues(toks: Seq[String], sample: Int): Seq[Seq[String]] =
    (0 until sample).map(r =>
      toks.drop(r).zipWithIndex.collect {
        case (t, i) if i % sample == 0 => t
      })

  /** Facade candidate resolution, sample-aware: an unsampled index
    * walks normally; a skip-sampled one unions one residue probe per
    * offset. None (→ brute) when the query is shorter than the sample
    * factor (no guaranteed alignment) or any cap trips.
    */
  override protected[graft] def candidateUids(spark: SparkSession,
      path: String, query: String, cap: Int,
      ver: Long): Option[Seq[Long]] = {
    val sample = sampleAt(spark, path, ver)
    if (sample == 1)
      return super.candidateUids(spark, path, query, cap, ver)
    val toks = TokenIndex.tokensOf(query)
    if (toks.size < sample) return None
    val vers = Map(path -> ver)
    val ranges = residues(toks, sample).map(rs =>
      saRangeMultiSyms(spark, Seq(path), rs, vers)(path))
    val width = ranges.map { case (lo, hi) => math.max(hi - lo, 0L) }.sum
    if (width > cap.toLong * ChunkSize) return None
    // ONE batched chunk fetch across every residue's range (the slices
    // below then hit the cache instead of paying a job per chunk)
    fetchRanges(spark, path, ranges, ver)
    val slices = ranges.map { case (lo, hi) =>
      postingSliceCapped(spark, path, lo, hi, cap, Some(ver))
    }
    if (slices.contains(None)) None
    else {
      val uids = slices.flatMap(_.get).distinct
      if (uids.size > cap) None else Some(uids)
    }
  }

  /** Interleave-merge carries the factor forward (the interleaved BWT
    * is still the thinned stream); mixed factors cannot interleave —
    * their thinned alphabets describe different streams.
    */
  override protected def mergeSampleSidecar(spark: SparkSession,
      a: String, b: String, out: String): Unit = {
    val (sa, sb) = (sampleOf(spark, a), sampleOf(spark, b))
    require(sa == sb, s"cannot interleave-merge token indexes with " +
      s"different sample factors ($sa vs $sb) — use rebuild")
    writeSample(spark, out, sa)
  }

  /** Rebuild-merge propagates a common factor; mixed factors rebuild
    * unsampled (correct for any query, just un-thinned).
    */
  override protected def rebuildBuild(spark: SparkSession,
      files: Seq[String], column: String, out: String, a: String,
      b: String): Unit = {
    val (sa, sb) = (sampleOf(spark, a), sampleOf(spark, b))
    build(spark, files, column, out, if (sa == sb) sa else 1)
  }

  /** Chunk payload: SA-ordered token array (no join into one string —
    * token boundaries must survive) plus posting uids — NO per-chunk
    * cum map. The char encodings carry a dense cum map per chunk
    * (alphabet = code points, bounded); densified over a TOKEN alphabet
    * that is chunks x |vocabulary| entries — quadratic blow-up at any
    * real vocabulary (the driver testdata's 31-token vocab masked it).
    * The cumulative term lives in `cums/` instead: ONE SPARSE row per
    * (symbol, chunk-where-it-occurs), bucket-partitioned by symbol like
    * every posting table, resolved at query time by a batched floor
    * lookup ([[prefetchCums]]).
    */
  protected def writeChunks(spark: SparkSession,
      ranked: org.apache.spark.sql.DataFrame, path: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    FmIndex.perChunkArrays(ranked)
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/$chunkDir")
    val counts = ranked.groupBy("chunk", "bwtc").agg(count(lit(1)).as("n"))
    counts
      .withColumn("cum",
        coalesce(sum(col("n")).over(Window.partitionBy("bwtc")
          .orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("bucket", Bucketing.bucketCol(col("bwtc")))
      .write.mode("overwrite").partitionBy("bucket")
      .option("compression", "zstd").parquet(s"$path/cums")
  }

  /** Merge input with LF computed by a per-symbol window over the
    * decoded stream (one bwtc-partitioned shuffle, merge-time only) —
    * the sparse format has no chunk-local cum to reuse.
    */
  protected def positions(spark: SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val decoded = spark.read.parquet(s"$path/$chunkDir")
      .select(col("chunk"), col("chars"), col("uids"))
      .as[(Long, Seq[String], Seq[Long])]
      .flatMap { case (chunk, chars, uids) =>
        chars.indices.map(k => (chunk * ChunkSize + k, chars(k), uids(k)))
      }.toDF("pos", "bwtc", "uid")
    val cb = spark.read.parquet(s"$path/head")
      .filter(col("c_before") >= 0)
      .select(col("ch").as("bwtc"), col("c_before"))
    decoded.join(cb, Seq("bwtc"))
      .withColumn("lf", col("c_before") - 1 +
        row_number().over(Window.partitionBy("bwtc").orderBy("pos")))
      .select(col("pos"), col("bwtc"), col("uid"), col("lf"))
  }

  // ---- BwtDriver: token-array chunk encoding -------------------------

  protected case class TokChunk(toks: IndexedSeq[String], uids: Seq[Long])
  protected case class TokHead(cBefore: Map[String, Long],
      nBwt: Map[String, Long], n: Long) extends BwtHead

  protected type Chunk = TokChunk
  protected type Head = TokHead

  // "tfm2": the sparse-cums on-disk format. A v1 dir (dense "tfm")
  // read through the facade raises PATH_NOT_FOUND, which the lake
  // self-heal treats as a broken index: metadata row dropped, files
  // demoted to in-situ, rebuilt in v2 on the next index()
  protected def chunkDir: String = "tfm2"
  protected def chunkColumns: Seq[String] = Seq("chunk", "chars", "uids")

  protected def decodeChunk(r: Row): TokChunk =
    TokChunk(r.getSeq[String](1).toIndexedSeq, r.getSeq[Long](2).toIndexedSeq)

  protected def chunkBytes(c: TokChunk): Long =
    64L + c.toks.iterator.map(t => 48L + 2L * t.length).sum +
      8L * c.uids.size

  protected def chunkUids(c: TokChunk): Seq[Long] = c.uids
  // never called: rankAt is overridden to resolve the cumulative term
  // from the sparse side table
  protected def chunkCum(c: TokChunk, ch: String): Long = 0L

  // (path, headVer, symbol, chunk) -> occurrences before the chunk;
  // values are longs, bounded LRU
  private val cumCache =
    new graft.core.LruMap[(String, Long, String, Long), Long](65536)

  /** Batched floor lookup over the sparse `cums/` tables: ONE job per
    * walk step resolves the cumulative term for symbol `ch` at every
    * boundary chunk of every index. Sparse rows are (bwtc, chunk,
    * cum-before, n) only where the symbol OCCURS; cum-before(id) =
    * entry at the greatest chunk <= id (its own cum if chunk == id,
    * else cum + n), or 0 with no entry.
    */
  override protected def prefetchCums(spark: SparkSession,
      needs: Map[String, Seq[Long]], ch: String,
      vers: Map[String, Long]): Unit = {
    val missing = needs.toSeq.sortBy(_._1).map { case (p, ids) =>
      p -> ids.distinct.sorted
        .filterNot(id => cumCache.get((p, vers(p), ch, id)).isDefined)
    }.filter(_._2.nonEmpty)
    if (missing.isEmpty) return
    val paths = missing.map(_._1)
    val rows = graft.api.IndexKind.readTagged(spark, paths, "cums")
      .filter(col("bucket") === Bucketing.bucketOfString(ch) &&
        col("bwtc") === ch)
    val aggs = missing.zipWithIndex.flatMap { case ((_, ids), i) =>
      ids.map(id =>
        max(when(col("idx") === i && col("chunk") <= id,
          struct(col("chunk"), col("cum"), col("n")))))
    }
    val row = rows.agg(aggs.head, aggs.tail: _*).collect()(0)
    // re-stat (the fetchChunks discipline): never cache floors read
    // across a same-path rebuild
    missing.foreach { case (p, _) =>
      require(try graft.core.Fs.dirSignature(spark, s"$p/head") == vers(p)
        catch { case _: Exception => false },
        s"index at $p changed during the operation — retry")
    }
    var k = 0
    missing.foreach { case (p, ids) =>
      ids.foreach { id =>
        val s = row.getStruct(k); k += 1
        val cum =
          if (s == null) 0L
          else if (s.getLong(0) == id) s.getLong(1)
          else s.getLong(1) + s.getLong(2)
        cumCache.put((p, vers(p), ch, id), cum)
      }
    }
  }

  /** Sparse-format rank: within-chunk scan from the fetched chunk, the
    * cumulative term from the floor cache (filled by the walk's
    * [[prefetchCums]]; a direct call — posting slices never need it —
    * falls back to a one-path prefetch).
    */
  override protected def rankAt(spark: SparkSession, path: String,
      h: TokHead, v: Long, ch: String, pos: Long): Long = {
    if (pos <= 0) return 0L
    if (pos >= h.n) return h.nBwt.getOrElse(ch, 0L)
    val id = pos / ChunkSize
    val c = chunkAt(spark, path, id, v)
    val cum = cumCache.get((path, v, ch, id)).getOrElse {
      prefetchCums(spark, Map(path -> Seq(id)), ch, Map(path -> v))
      cumCache.get((path, v, ch, id)).getOrElse(0L)
    }
    cum + rankWithin(h, c, ch, (pos % ChunkSize).toInt)
  }

  /** Linear scan of the chunk's token prefix — whole-token equality,
    * the token-alphabet rank primitive.
    */
  protected def rankWithin(h: TokHead, c: TokChunk, ch: String,
      off: Int): Long = {
    val lim = math.min(off, c.toks.length)
    var i = 0; var cnt = 0L
    while (i < lim) {
      if (c.toks(i) == ch) cnt += 1
      i += 1
    }
    cnt
  }

  protected def loadHead(spark: SparkSession, path: String): TokHead = {
    val rows = spark.read.parquet(s"$path/head").collect()
    TokHead(
      rows.filter(_.getLong(1) >= 0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.map(r => r.getString(0) -> r.getLong(3)).toMap,
      rows.map(_.getLong(2)).sum)
  }
}
