package graft.index

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Wavelet-encoded variant of the BWT substring index — the reference's
  * alternate physical encoding of the same logical index (reference:
  * src/lava/substring/build.rs:20-125 builds a balanced byte wavelet
  * tree over the BWT; wavelet_tree.rs:46-89 serializes it in rank-block
  * chunks carrying running rank0/rank1 headers; wavelet_tree.rs:116-159
  * answers rank from those blocks; search.rs:209-312 runs backward
  * search against it).
  *
  * Same logical content as [[FmIndex]] — identical suffix-array build
  * (shared via [[FmIndex.rankedBwt]]), identical `head/`, `meta/` and
  * posting layout, identical backward search (the shared [[BwtDriver]])
  * — but each chunk's rank structure is a levelwise wavelet matrix
  * (the standard pointerless wavelet-tree formulation, "The Wavelet
  * Matrix", SPIRE 2012) instead of raw BWT text:
  *
  *  - the global alphabet is coded into `depth = ceil(log2 σ)` bits
  *    (`alpha/` table; the reference fixes σ=256 / 8 levels for bytes,
  *    wavelet_tree.rs:199-214 — ours is text so σ is the observed set);
  *  - level `l` stores one bitvector of the chunk's codes' l-th bit
  *    (MSB first), with all 0-bit symbols stably moved to the front of
  *    the next level;
  *  - bitvectors are packed into 64-bit words with a cumulative-rank1
  *    header every 8 words — the same rank-block design as the
  *    reference's 32768-bit chunks with rank prefix headers.
  *
  * rank(c, pos) inside a chunk walks the `depth` levels with two
  * block-rank lookups per level — O(log σ) word reads instead of the
  * FM chunk's O(ChunkSize) scan — and cross-chunk totals come from the
  * same per-chunk cumulative map as the FM encoding. Search results are
  * bit-identical to [[FmIndex]] by construction.
  */
object WaveletIndex extends BwtDriver {

  val ChunkSize: Int = FmIndex.ChunkSize
  val W: Int = FmIndex.W // shares FmIndex.rankedBwt, hence its window
  private val WordsPerBlock = 8

  // ---- wavelet-matrix encode / rank (pure Scala, per chunk) ----------

  /** One encoded chunk: per level packed bit-words, zero-counts and
    * per-block cumulative rank1 headers, plus the FM-identical
    * cross-chunk cum map and SA-order posting uids.
    */
  private[graft] case class WChunk(chunk: Long, m: Int,
      words: Seq[Seq[Long]], zeros: Seq[Long], blocks: Seq[Seq[Long]],
      cum: Map[String, Long], uids: Seq[Long])

  /** Input row of the chunk encoder (named for encoder resolution). */
  private[graft] case class ChunkIn(chunk: Long, chars: Seq[String],
      uids: Seq[Long], cum: Map[String, Long])

  /** Encode one chunk's code sequence into wavelet-matrix levels. */
  private[graft] def encode(codes: Array[Int], depth: Int)
      : (Seq[Seq[Long]], Seq[Long], Seq[Seq[Long]]) = {
    val m = codes.length
    var cur = codes
    val words = Vector.newBuilder[Seq[Long]]
    val zeros = Vector.newBuilder[Long]
    val blocks = Vector.newBuilder[Seq[Long]]
    for (l <- 0 until depth) {
      val bit = depth - 1 - l
      val w = new Array[Long](math.max((m + 63) / 64, 1))
      var ones = 0
      var i = 0
      while (i < m) {
        if (((cur(i) >> bit) & 1) == 1) {
          w(i / 64) |= 1L << (i % 64); ones += 1
        }
        i += 1
      }
      // cumulative rank1 before each 8-word block (reference: running
      // rank headers per rank-block chunk, wavelet_tree.rs:46-89)
      val nBlocks = (w.length + WordsPerBlock - 1) / WordsPerBlock
      val hdr = new Array[Long](nBlocks)
      var acc = 0L
      var b = 0
      while (b < nBlocks) {
        hdr(b) = acc
        var j = b * WordsPerBlock
        val end = math.min(j + WordsPerBlock, w.length)
        while (j < end) { acc += java.lang.Long.bitCount(w(j)); j += 1 }
        b += 1
      }
      words += w.toSeq
      zeros += (m - ones).toLong
      blocks += hdr.toSeq
      // stable partition: 0-bit symbols first — the next level's order
      val next = new Array[Int](m)
      var k = 0
      i = 0
      while (i < m) { if (((cur(i) >> bit) & 1) == 0) { next(k) = cur(i); k += 1 }; i += 1 }
      i = 0
      while (i < m) { if (((cur(i) >> bit) & 1) == 1) { next(k) = cur(i); k += 1 }; i += 1 }
      cur = next
    }
    (words.result(), zeros.result(), blocks.result())
  }

  /** rank1 of one level's bitvector at position `p` (∈ [0, m]): block
    * header + ≤7 word popcounts + one partial-word popcount.
    */
  private def rank1(words: Seq[Long], blocks: Seq[Long], p: Int): Long = {
    if (p <= 0) return 0L
    val w = p / 64
    if (w >= words.length) { // p == m with m a multiple of 64: total ones
      var s = blocks.last
      var j = (blocks.length - 1) * WordsPerBlock
      while (j < words.length) { s += java.lang.Long.bitCount(words(j)); j += 1 }
      return s
    }
    var s = blocks(w / WordsPerBlock)
    var j = (w / WordsPerBlock) * WordsPerBlock
    while (j < w) { s += java.lang.Long.bitCount(words(j)); j += 1 }
    val rem = p % 64
    if (rem > 0)
      s += java.lang.Long.bitCount(words(w) & ((1L << rem) - 1))
    s
  }

  /** Occurrences of `code` in the chunk's first `pos` symbols: the
    * standard wavelet-matrix rank walk (reference's per-level rank
    * descent, wavelet_tree.rs:161-197, matrix formulation).
    */
  private[graft] def rankInChunk(ch: WChunk, code: Int, depth: Int,
      pos: Int): Long = {
    var p = math.min(pos, ch.m).toLong
    var s = 0L
    var l = 0
    while (l < depth) {
      val bit = (code >> (depth - 1 - l)) & 1
      val w = ch.words(l); val bl = ch.blocks(l)
      val r1p = rank1(w, bl, p.toInt)
      val r1s = rank1(w, bl, s.toInt)
      if (bit == 0) { p -= r1p; s -= r1s }
      else { p = ch.zeros(l) + r1p; s = ch.zeros(l) + r1s }
      l += 1
    }
    p - s
  }

  // ---- build ---------------------------------------------------------

  /** Build over a file group: shared SA/BWT pipeline → wavelet-matrix
    * chunk tables (`wt/` + `alpha/`) + the FM-identical common
    * artifacts (`head/`, `info/`, `meta/`).
    */
  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = {
    val (ranked, meta) = FmIndex.rankedBwt(spark, files, column)
    writeChunks(spark, ranked, path)
    FmIndex.writeCommon(spark, ranked, meta, column, path)
  }

  protected def writeChunks(spark: SparkSession,
      ranked: org.apache.spark.sql.DataFrame, path: String): Unit = {
    import spark.implicits._
    val alpha = ranked.select("bwtc").distinct()
      .collect().map(_.getString(0)).sortBy(_.codePointAt(0)).toSeq
    val code = alpha.zipWithIndex.toMap
    val depth = depthFor(alpha.size)
    val codeB = spark.sparkContext.broadcast(code)
    val enc = FmIndex.perChunkArrays(ranked)
      .join(FmIndex.chunkCums(ranked), Seq("chunk"))
      .as[ChunkIn]
      .map { in =>
        val codes = in.chars.map(codeB.value).toArray
        val (w, z, b) = encode(codes, depth)
        WChunk(in.chunk, codes.length, w, z, b, in.cum, in.uids)
      }
    enc.write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/wt")
    alpha.zipWithIndex.toDF("ch", "code").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/alpha")
  }

  /** Inverse of [[encode]] for one chunk: walk each position down the
    * levels reading its bit (MSB first) and stepping by the same
    * stable-partition arithmetic the rank walk uses.
    */
  private[graft] def decodeCodes(c: WChunk, depth: Int): Array[Int] = {
    val out = new Array[Int](c.m)
    var i = 0
    while (i < c.m) {
      var p = i; var code = 0; var l = 0
      while (l < depth) {
        val w = c.words(l); val bl = c.blocks(l)
        val bit = ((w(p / 64) >> (p % 64)) & 1L).toInt
        code = (code << 1) | bit
        p = if (bit == 0) (p - rank1(w, bl, p)).toInt
            else (c.zeros(l) + rank1(w, bl, p)).toInt
        l += 1
      }
      out(i) = code
      i += 1
    }
    out
  }

  /** Merge input: per-position rows decoded chunk-locally from the
    * wavelet matrix (O(m log σ) per chunk, distributed), INCLUDING the
    * LF value from the chunk's cum map + a running local code count —
    * recovering ψ for the interleave is map-only.
    */
  protected def positions(spark: SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val alpha = spark.read.parquet(s"$path/alpha").collect()
      .map(r => r.getInt(1) -> r.getString(0)).toMap
    val depth = depthFor(alpha.size)
    val invB = spark.sparkContext.broadcast(alpha)
    val cB = spark.sparkContext.broadcast(loadHead(spark, path).cBefore)
    spark.read.parquet(s"$path/wt").as[WChunk].flatMap { c =>
      val codes = decodeCodes(c, depth)
      val occ = new Array[Long](invB.value.size)
      codes.indices.map { i =>
        val cd = codes(i); val ch = invB.value(cd)
        val o = occ(cd); occ(cd) += 1
        (c.chunk * ChunkSize + i, ch, c.uids(i),
          cB.value(ch) + c.cum.getOrElse(ch, 0L) + o)
      }
    }.toDF("pos", "bwtc", "uid", "lf")
  }

  private def depthFor(sigma: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(sigma - 1, 1)))

  // ---- BwtDriver: wavelet-matrix chunk encoding ----------------------

  protected case class WHead(cBefore: Map[String, Long],
      nBwt: Map[String, Long], n: Long, code: Map[String, Int],
      depth: Int) extends BwtHead

  protected type Chunk = WChunk
  protected type Head = WHead

  protected def chunkDir: String = "wt"
  protected def chunkColumns: Seq[String] =
    Seq("chunk", "m", "words", "zeros", "blocks", "cum", "uids")

  protected def decodeChunk(r: Row): WChunk =
    // inner arrays surface as mutable ArraySeq — type them loosely and
    // copy to immutable
    WChunk(r.getLong(0), r.getInt(1),
      r.getSeq[scala.collection.Seq[Long]](2)
        .map(_.toIndexedSeq).toIndexedSeq,
      r.getSeq[Long](3).toIndexedSeq,
      r.getSeq[scala.collection.Seq[Long]](4)
        .map(_.toIndexedSeq).toIndexedSeq,
      r.getMap[String, Long](5).toMap,
      r.getSeq[Long](6).toIndexedSeq)

  override protected def headBytes(h: WHead): Long =
    super.headBytes(h) +
      h.code.iterator.map { case (k, _) => 72L + 2L * k.length }.sum

  protected def chunkBytes(c: WChunk): Long =
    64L + 8L * (c.words.iterator.map(_.size.toLong).sum +
      c.blocks.iterator.map(_.size.toLong).sum +
      c.zeros.size + c.uids.size) + 64L * c.cum.size

  protected def chunkUids(c: WChunk): Seq[Long] = c.uids
  protected def chunkCum(c: WChunk, ch: String): Long =
    c.cum.getOrElse(ch, 0L)

  protected def rankWithin(h: WHead, c: WChunk, ch: String,
      off: Int): Long =
    h.code.get(ch) match {
      case None => 0L
      case Some(cd) => rankInChunk(c, cd, h.depth, off)
    }

  protected def loadHead(spark: SparkSession, path: String): WHead = {
    val rows = spark.read.parquet(s"$path/head").collect()
    val alpha = spark.read.parquet(s"$path/alpha").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    WHead(
      rows.filter(_.getLong(1) >= 0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.map(r => r.getString(0) -> r.getLong(3)).toMap,
      rows.map(_.getLong(2)).sum,
      alpha, depthFor(alpha.size))
  }
}
