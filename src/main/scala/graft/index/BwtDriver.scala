package graft.index

import graft.core.{Lake, Layout}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Common shape of a BWT index "head" — the tiny driver-cached metadata
  * page: the C array (suffixes starting below each code point), per-code
  * point BWT totals (rank at position N), and the total position count.
  */
trait BwtHead {
  def cBefore: Map[String, Long]
  def nBwt: Map[String, Long]
  def n: Long
}

/** Driver-side lookup layer shared by the two physical encodings of the
  * BWT substring index — [[FmIndex]] (raw text chunks, linear in-chunk
  * rank) and [[WaveletIndex]] (wavelet-matrix chunks, O(log σ) rank).
  * The encodings differ ONLY in the chunk payload and the in-chunk rank
  * primitive; everything else lives here exactly once: version-keyed
  * head/chunk caches, batched one-job chunk fetches, the lock-step
  * multi-index backward search, capped posting slices, and the
  * search/merge entry points.
  *
  * Unicode discipline: the Spark-side build indexes CODE POINTS
  * (Spark's `length`/`substring`/`sequence` are code-point functions,
  * and its string sort order is UTF-8 binary = code-point order), so
  * every driver-side walk here iterates code points too — a query with
  * a supplementary character (an emoji) walks the full code point,
  * never a lone surrogate that could not match any single-code-point
  * BWT entry.
  *
  * Version discipline: each top-level operation reads every index's
  * `head/` mtime ONCE and threads it through all cache keys, so a
  * same-path rebuild mid-operation can never mix chunks of two builds
  * (it fails loudly instead of NPE-ing or silently serving a blend).
  */
trait BwtDriver {

  /** Chunk payload of this encoding. */
  protected type Chunk >: Null <: AnyRef
  /** Head type of this encoding (may carry extra fields, e.g. the
    * wavelet alphabet coding). */
  protected type Head <: BwtHead

  def ChunkSize: Int

  /** Suffix-window length of the encoding's build: backward search may
    * walk at most W−1 code points (walking further than the sorted
    * window would silently drop true matches). Owned by the trait so a
    * future encoding with a different window cannot inherit the wrong
    * walk length.
    */
  def W: Int

  /** Parquet subdirectory holding the chunk table. */
  protected def chunkDir: String
  /** Chunk-table columns to read; the first must be `chunk`. */
  protected def chunkColumns: Seq[String]
  /** Decode one fetched chunk row (fields in `chunkColumns` order). */
  protected def decodeChunk(r: Row): Chunk
  /** SA-ordered posting uids of the chunk. */
  protected def chunkUids(c: Chunk): Seq[Long]
  /** Cumulative occurrences of code point `ch` before this chunk. */
  protected def chunkCum(c: Chunk, ch: String): Long
  /** Occurrences of code point `ch` within the chunk's first `off` SA
    * positions — the encoding-specific rank primitive. */
  protected def rankWithin(h: Head, c: Chunk, ch: String, off: Int): Long
  /** Load the head tables of one index. */
  protected def loadHead(spark: SparkSession, path: String): Head

  /** Build one index over a file group (encoding-specific). */
  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit

  /** Per-position frame `(pos, bwtc, uid)` decoded from a built index's
    * chunk tables — the merge input (encoding-specific decode).
    */
  protected def positions(spark: SparkSession, path: String): DataFrame

  /** Write this encoding's chunk tables from a ranked frame
    * `(rank, uid, bwtc, fc, chunk, off)` (encoding-specific encode).
    */
  protected def writeChunks(spark: SparkSession, ranked: DataFrame,
      path: String): Unit

  /** Merge strategy switch. Both strategies produce search-identical
    * indexes (property-tested); they differ only in cost model:
    *
    *  - `rebuild` (default): re-sort the union of covered files
    *    through the build pipeline — ONE wide range-sort plus a corpus
    *    scan. Measured at sf0.1: 6.4 s for the union.
    *  - `interleave`: the reference's streaming 2-way interleave
    *    (src/lava/substring/merge.rs:115-183) re-expressed as
    *    ψ-prefix-doubling over the decoded BWTs ([[BwtMerge]]) — no
    *    corpus read, but ~log₂(W)+3 narrow shuffles of every position.
    *    Measured at sf0.1: 20.7 s for the same union.
    *
    * The reference's interleave is O(n) because it refines a
    * driver-held bitvector sequentially in memory; Spark has no such
    * primitive, so the distributed interleave pays ~10× the shuffle
    * bytes of rebuild's single sort — more than the corpus re-read it
    * saves, at any scale where shuffle and storage I/O are within ~2
    * orders of magnitude of each other. Rebuild-on-merge is therefore
    * the Spark-first default (SURVEY §7.5 sanctions it); the
    * interleave stays available for deployments where the lake read is
    * the scarce resource (set `spark.graft.bwt.merge=interleave`).
    */
  def merge(spark: SparkSession, a: String, b: String, out: String): Unit =
    if (spark.conf.getOption("spark.graft.bwt.merge")
        .contains("interleave")) mergeInterleave(spark, a, b, out)
    else mergeRebuild(spark, a, b, out)

  /** Rebuild over the union of covered files (SURVEY §7.5). */
  def mergeRebuild(spark: SparkSession, a: String, b: String,
      out: String): Unit = {
    val column = spark.read.parquet(s"$a/info").collect()(0).getString(0)
    val files = (spark.read.parquet(s"$a/meta").select("file_path")
      .unionByName(spark.read.parquet(s"$b/meta").select("file_path")))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    rebuildBuild(spark, files, column, out, a, b)
  }

  /** The build call a rebuild-merge issues — encodings with build-time
    * options that must survive a merge (the token encoding's skip-
    * sample factor) override to propagate them from the inputs.
    */
  protected def rebuildBuild(spark: SparkSession, files: Seq[String],
      column: String, out: String, a: String, b: String): Unit =
    build(spark, files, column, out)

  /** Streaming interleave merge (reference: src/lava/substring/
    * merge.rs:115-183): both indexes' per-position frames (decoded
    * chunk-locally, LF included) are interleaved by ψ-prefix-doubling
    * ([[BwtMerge]]) into one merged ranked frame, which is re-encoded
    * without ever touching the corpus. `b`'s uids are re-based past
    * `a`'s (the uniform uid-offset merge protocol).
    */
  def mergeInterleave(spark: SparkSession, a: String, b: String,
      out: String): Unit = {
    val column = spark.read.parquet(s"$a/info").collect()(0).getString(0)
    val offset = spark.read.parquet(s"$a/meta")
      .agg(max("uid")).collect()(0).getLong(0)
    val pa = positions(spark, a)
    val pb = positions(spark, b).withColumn("uid", col("uid") + offset)
    val ranked = BwtMerge.interleave(spark, Seq(pa, pb), W, ChunkSize)
    writeChunks(spark, ranked, out)
    // sidecars BEFORE head: head/ is the version anchor, so it lands
    // last (see TokenFmIndex.build)
    mergeSampleSidecar(spark, a, b, out)
    val meta = spark.read.parquet(s"$a/meta").unionByName(
      spark.read.parquet(s"$b/meta").withColumn("uid", col("uid") + offset))
      .cache()
    FmIndex.writeCommon(spark, ranked, meta, column, out)
  }

  /** Interleave-merge hook for build-time sidecars that must carry over
    * (the token encoding's skip-sample factor): the interleaved stream
    * IS still the thinned stream, so the merged index must declare the
    * same factor or searches would silently treat it as unsampled.
    */
  protected def mergeSampleSidecar(spark: SparkSession, a: String,
      b: String, out: String): Unit = ()

  /** Skip-sample factor of a built index (1 = not sampled). Encodings
    * without sampling always report 1.
    */
  protected[graft] def sampleFactor(spark: SparkSession, path: String): Int = 1

  /** Per-path candidate uid list under `cap` — the facade's per-index
    * candidate resolution: one backward walk + capped posting slice.
    * Encodings whose on-disk stream is transformed (skip-sampled token
    * mode) override to restore the candidate-superset guarantee. None
    * means "over cap / not resolvable": the caller's brute-force
    * switch wins for this path's files.
    */
  protected[graft] def candidateUids(spark: SparkSession, path: String,
      query: String, cap: Int, ver: Long): Option[Seq[Long]] = {
    val (lo, hi) = saRangeMultiSyms(spark, Seq(path), symbols(query),
      Map(path -> ver))(path)
    if (hi - lo > cap.toLong * ChunkSize) None
    else {
      // ONE batched chunk fetch for the whole range — the per-chunk
      // fallback inside the slice would otherwise pay a Spark job per
      // uncached chunk (up to ~cap x ChunkSize / ChunkSize jobs)
      fetchRanges(spark, path, Seq((lo, hi)), ver)
      postingSliceCapped(spark, path, lo, hi, cap, Some(ver))
    }
  }

  // ---- code-point helpers --------------------------------------------

  /** One string per code point (surrogate pairs stay joined). */
  protected def codePoints(s: String): IndexedSeq[String] =
    graft.text.Text.codePoints(s)

  /** Alphabet of the encoding: how a (normalized) query splits into BWT
    * symbols. Char-mode encodings walk code points; the token-mode
    * encoding ([[TokenFmIndex]]) overrides this with word tokens
    * (reference: token-mode queries are tokenized exactly like the
    * corpus, search.rs:446-530).
    */
  protected[graft] def symbols(s: String): IndexedSeq[String] = codePoints(s)

  /** Refine predicate over the indexed column for a normalized query —
    * raw substring containment for char-mode; the token-mode encoding
    * overrides with token-sequence containment.
    */
  protected[graft] def refinePred(column: String, normQ: String)
      : org.apache.spark.sql.Column =
    lower(col(column)).contains(normQ)

  // ---- driver-side caches (the hot "metadata page") ------------------

  // caches are keyed by (path, head-dir mtime): index dirs are immutable
  // once built (the facade's discipline — merge writes a NEW dir), but a
  // same-path rebuild must never serve stale chunks. Hadoop-FS stat so
  // a non-local index store versions correctly instead of throwing
  private def version(spark: SparkSession, path: String): Long =
    graft.core.Fs.dirSignature(spark, s"$path/head")

  /** Stat every index's version ONCE for an operation; thread the map
    * through every step (saRangeMulti → fetchPostings → posting
    * slices) so a same-path rebuild mid-operation can never pair one
    * build's SA ranges with another build's posting chunks.
    */
  def versionsOf(spark: SparkSession, paths: Seq[String]): Map[String, Long] =
    paths.map(p => p -> version(spark, p)).toMap

  // keep-latest per path (versioned keys would strand a dead head per
  // rebuild), byte-accounted under the shared serve budget: token-mode
  // heads hold whole-vocabulary maps — the LARGEST single driver
  // payloads in the warm tier — so they compete in the same LRU pool
  // as every other slice instead of a fixed 256-path count nobody
  // sizes in bytes
  // maxShare = 1: a keep-latest head IS the point of this cache — a
  // vocabulary-sized head may occupy up to the full budget (evicting
  // other slices) rather than being permanently refused into a
  // reload-per-operation cliff
  private val headCache =
    graft.index.Serve.budgeted[String, (Long, Head)](hv =>
      24L + headBytes(hv._2), maxShare = 1)

  /** Coarse decoded-head byte estimate: the two per-symbol maps every
    * encoding carries; encodings with extra structures override and
    * add theirs.
    */
  protected def headBytes(h: Head): Long =
    64L + (h.cBefore.iterator ++ h.nBwt.iterator)
      .map { case (k, _) => 88L + 2L * k.length }.sum
  /** Coarse decoded-chunk byte estimate, charged against the shared
    * serve budget ([[graft.index.Serve.Budget]] — ONE number bounds
    * the whole warm driver tier). Sizing note: the budget should
    * exceed the worst single batched fetch (≤ BruteForceThreshold
    * range chunks + 2 boundary chunks per covering index per LF step)
    * or walks degrade to re-fetching per step — degraded, never wrong:
    * [[fetchChunks]] RETURNS the fetched chunks, so an eviction (or a
    * budget-admission refusal) between insert and use costs a job, not
    * correctness.
    */
  protected def chunkBytes(c: Chunk): Long
  private val chunkCache =
    graft.index.Serve.budgeted[(String, Long, Long), Chunk](chunkBytes)

  private def headAt(spark: SparkSession, path: String, v: Long): Head = {
    synchronized {
      headCache.get(path) match {
        case Some((m, h)) if m == v => return h
        case _ =>
      }
    }
    // Spark read OUTSIDE the monitor: one slow head load must not block
    // concurrent cache-hit lookups on other indexes (a racing duplicate
    // load is harmless — last insert wins with identical content)
    val h = loadHead(spark, path)
    // re-stat: never cache a head that was rebuilt since the operation
    // stat'd its version (see fetchChunks)
    require(try graft.core.Fs.dirSignature(spark, s"$path/head") == v
      catch { case _: Exception => false },
      s"index at $path changed during the operation — retry")
    synchronized { headCache.put(path, (v, h)); h }
  }

  /** Batched fetch: ONE job loads every missing (path, chunk) pair
    * across all indexes — the per-step boundary read of backward search
    * stays one job no matter how many indexes cover the lake (the
    * facade's constant-jobs discipline). Rows are attributed to their
    * index by file path and cached under the operation's versions.
    *
    * The monitor is held only to compute the missing set and to insert
    * results — the Spark read/collect runs outside it, so one slow
    * fetch never blocks concurrent pure-cache-hit searches. Two racing
    * fetches of the same chunk redundantly read it; both insert
    * identical (version-keyed) content.
    */
  /** Batch-fetch the requested chunks, RETURNING them (cache hits +
    * fresh reads): callers that need a specific chunk read it from the
    * returned map, never from a post-insert cache lookup — under the
    * byte budget an insert may be evicted (or refused admission for an
    * oversized payload) before the lookup, and that must cost a
    * re-fetch, never a spurious "index changed" failure.
    */
  private def fetchChunks(spark: SparkSession, needs: Map[String, Seq[Long]],
      vers: Map[String, Long]): Map[(String, Long, Long), Chunk] = {
    val hits = synchronized {
      needs.toSeq.flatMap { case (p, ids) =>
        ids.distinct.flatMap { id =>
          chunkCache.get((p, vers(p), id)).map((p, vers(p), id) -> _)
        }
      }.toMap
    }
    val missing = needs.toSeq.flatMap { case (p, ids) =>
      ids.distinct.filterNot(id => hits.contains((p, vers(p), id)))
        .map(p -> _)
    }
    if (missing.isEmpty) return hits
    val paths = missing.map(_._1).distinct
    val ids = missing.map(_._2).distinct
    val rows = spark.read.parquet(paths.map(_ + s"/$chunkDir"): _*)
      .filter(col("chunk").isin(ids: _*))
      .select(chunkColumns.map(col) :+ input_file_name().as("__f"): _*)
      .collect()
    // re-stat AFTER the read: a same-path rebuild completing between
    // the operation's version stat and this fetch would hand us the NEW
    // build's chunks under the OLD version key — a silent blend of two
    // builds. Dropping such rows makes chunkAt's require fire ("index
    // changed — retry") instead. (A rebuild still mid-overwrite is the
    // residual window; its half-written chunk dir fails the read or
    // misses chunks, which the same require catches.)
    val stale = paths.filter(p =>
      try graft.core.Fs.dirSignature(spark, s"$p/head") != vers(p)
      catch { case _: Exception => true }).toSet
    val fetched = rows.flatMap { r =>
      val f = Layout.canonPath(r.getString(chunkColumns.length))
      paths.find(p => f.startsWith(Layout.canonPath(p) + "/"))
        .filterNot(stale).map { p =>
          ((p, vers(p), r.getLong(0)), decodeChunk(r))
        }
    }.toMap
    synchronized {
      fetched.foreach { case (k, c) => chunkCache.put(k, c) }
    }
    hits ++ fetched
  }

  /** Pre-warm seam ([[graft.index.Serve.populateRows]]): cache the
    * head and EVERY chunk of one index (one id-listing job + one
    * batched fetch, both through the version-keyed paths searches
    * use), so the first backward search after deploy walks warm —
    * subject to the shared budget's admission/eviction like any other
    * fetch. Returns the chunk count warmed.
    */
  private[graft] def populateChunks(spark: SparkSession,
      path: String): Long = {
    val v = graft.core.Fs.dirSignature(spark, s"$path/head")
    headAt(spark, path, v)
    val ids = spark.read.parquet(s"$path/$chunkDir")
      .select(col("chunk")).distinct().collect().map(_.getLong(0)).toSeq
    fetchChunks(spark, Map(path -> ids), Map(path -> v))
    ids.length.toLong
  }

  protected def chunkAt(spark: SparkSession, path: String, id: Long,
      v: Long): Chunk = {
    val got = fetchChunks(spark, Map(path -> Seq(id)), Map(path -> v))
    got.getOrElse((path, v, id), throw new IllegalArgumentException(
      s"index at $path changed during the operation (chunk $id) — retry"))
  }

  /** occurrences of `ch` in BWT[0, pos). Overridable: encodings whose
    * alphabet is too large for per-chunk dense cum maps (the token
    * encoding) resolve the cumulative term from a sparse side table
    * instead of the chunk payload.
    */
  protected def rankAt(spark: SparkSession, path: String, h: Head, v: Long,
      ch: String, pos: Long): Long = {
    if (pos <= 0) return 0L
    if (pos >= h.n) return h.nBwt.getOrElse(ch, 0L)
    val id = pos / ChunkSize
    val c = chunkAt(spark, path, id, v)
    chunkCum(c, ch) + rankWithin(h, c, ch, (pos % ChunkSize).toInt)
  }

  /** Per-step hook: prefetch whatever the encoding's [[rankAt]] needs
    * for symbol `ch` at the given boundary chunks, batched across every
    * index in ONE job. Default: nothing (dense encodings carry the cum
    * in the chunk payload the step already fetched).
    */
  protected def prefetchCums(spark: SparkSession,
      needs: Map[String, Seq[Long]], ch: String,
      vers: Map[String, Long]): Unit = ()

  // ---- backward search ----------------------------------------------

  /** Lock-step backward search over several indexes at once: all walks
    * advance together and each step's boundary chunks are fetched in
    * ONE batched job across every index. Returns each index's SA range
    * [lo, hi) for the walk pattern (last W−1 CODE POINTS of the query;
    * the reference keeps the last `token_viable_limit` tokens,
    * search.rs:512-524 — the mandatory refine restores exactness).
    */
  def saRangeMulti(spark: SparkSession, paths: Seq[String],
      query: String, versions: Map[String, Long] = null)
      : Map[String, (Long, Long)] =
    saRangeMultiSyms(spark, paths, symbols(query), versions)

  /** [[saRangeMulti]] over pre-split pattern symbols — the entry point
    * for searches whose pattern is NOT the tokenization of a query
    * string (skip-sampled residue patterns, [[TokenFmIndex]]).
    */
  def saRangeMultiSyms(spark: SparkSession, paths: Seq[String],
      syms: Seq[String], versions: Map[String, Long] = null)
      : Map[String, (Long, Long)] = {
    val vers = Option(versions).getOrElse(versionsOf(spark, paths))
    val hs = paths.map(p => p -> headAt(spark, p, vers(p))).toMap
    val walk = syms.takeRight(W - 1)
    var state = paths.map(p => p -> (0L, hs(p).n)).toMap
    walk.reverseIterator.foreach { c =>
      val needs = state.collect { case (p, (lo, hi)) if lo < hi =>
        val h = hs(p)
        p -> Seq(lo, hi).filter(pos => pos > 0 && pos < h.n).map(_ / ChunkSize)
      }.filter(_._2.nonEmpty)
      fetchChunks(spark, needs, vers)
      prefetchCums(spark, needs, c, vers)
      state = state.map { case (p, (lo, hi)) =>
        if (lo >= hi) p -> (lo, hi)
        else hs(p).cBefore.get(c) match {
          case None => p -> (0L, 0L) // code point never starts a suffix
          case Some(cb) =>
            p -> (cb + rankAt(spark, p, hs(p), vers(p), c, lo),
              cb + rankAt(spark, p, hs(p), vers(p), c, hi))
        }
      }
    }
    state
  }

  def saRange(spark: SparkSession, path: String, query: String): (Long, Long) =
    saRangeMulti(spark, Seq(path), query)(path)

  // ---- posting slices ------------------------------------------------

  /** SA-ordered distinct uid slice of [lo, hi), stopping as soon as the
    * distinct count exceeds `cap` (None = over cap: the caller's
    * brute-force switch wins, and the driver never materializes an
    * unbounded uid list — the reference's own >threshold discipline,
    * backends/utils.py:221-225).
    */
  def postingSliceCapped(spark: SparkSession, path: String,
      lo: Long, hi: Long, cap: Int,
      atVersion: Option[Long] = None): Option[Seq[Long]] = {
    // Option, not a -1 sentinel: dirSignature is an XOR-mixed 64-bit
    // hash that is negative about half the time, and a sentinel test
    // would silently drop the caller's threaded version there -- the
    // walk and the slice could then straddle a same-path rebuild
    if (hi <= lo) return Some(Nil)
    val v = atVersion.getOrElse(version(spark, path))
    val ids = (lo / ChunkSize) to ((hi - 1) / ChunkSize)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    ids.foreach { id =>
      val c = chunkAt(spark, path, id, v)
      val uids = chunkUids(c)
      val base = id * ChunkSize
      val from = math.max(lo - base, 0L).toInt
      val until = math.min(hi - base, uids.size.toLong).toInt
      var i = from
      while (i < until) {
        out += uids(i)
        if (out.size > cap) return None
        i += 1
      }
    }
    Some(out.toSeq)
  }

  def postingSlice(spark: SparkSession, path: String,
      lo: Long, hi: Long): Seq[Long] =
    postingSliceCapped(spark, path, lo, hi, Int.MaxValue).get

  /** Batch-fetch the chunks covering several ranges of ONE index in a
    * single job (the multi-residue probe shape); already-cached chunks
    * are skipped.
    */
  protected[graft] def fetchRanges(spark: SparkSession, path: String,
      ranges: Seq[(Long, Long)], ver: Long): Unit = {
    val ids = ranges.flatMap { case (lo, hi) =>
      if (hi <= lo) Seq.empty
      else (lo / ChunkSize) to ((hi - 1) / ChunkSize)
    }.distinct.sorted
    if (ids.nonEmpty)
      fetchChunks(spark, Map(path -> ids), Map(path -> ver))
  }

  /** Batch-fetch the posting chunks covering every index's range in one
    * job, so subsequent postingSlice calls are cache hits.
    */
  def fetchPostings(spark: SparkSession,
      ranges: Map[String, (Long, Long)],
      versions: Map[String, Long] = null): Unit = {
    val needs = ranges.collect { case (p, (lo, hi)) if hi > lo =>
      p -> ((lo / ChunkSize) to ((hi - 1) / ChunkSize)).toSeq
    }
    val vers = Option(versions).getOrElse(versionsOf(spark, needs.keys.toSeq))
    fetchChunks(spark, needs, vers)
  }

  // ---- search --------------------------------------------------------

  /** Search one index: backward search → capped SA-range posting slice
    * → selective read → refine with the FULL query (exactness past W−1
    * and the reference's no-truncate-before-refine discipline,
    * search.rs:78-85). Two brute-force switches guard the index path:
    * SA-range width (unselective pattern) and distinct-hit count
    * (> threshold, or EVERY covered row group hit — zero pruning
    * value), mirroring NgramIndex and the facade kinds.
    */
  def search(spark: SparkSession, path: String, column: String,
      query: String): DataFrame = {
    import spark.implicits._
    val q = graft.text.Text.sparkLower(query)
    val meta = spark.read.parquet(s"$path/meta")
    def covered: Seq[String] = meta.select("file_path").distinct()
      .collect().map(_.getString(0)).toSeq
    def brute(): DataFrame = spark.read.parquet(covered: _*)
      .filter(refinePred(column, q))
      .withColumn("uid", lit(-1L))
    // symbol-less query = empty pattern = contained in every NON-NULL
    // row; NULLs excluded like every contains-based path (the same
    // convention the facade kinds apply — see MoreKinds' BwtKind)
    if (symbols(q).isEmpty)
      return spark.read.parquet(covered: _*)
        .filter(col(column).isNotNull).withColumn("uid", lit(-1L))
    // one version for the whole operation: walk and slice must see the
    // same build. Candidate resolution goes through the overridable
    // [[candidateUids]] seam (None = a cost cap tripped → brute), so
    // sample-aware encodings (TokenFmIndex) need no copy of this
    // scaffold — the previous hand-rolled override had already drifted
    // on the empty-query path.
    val vers = versionsOf(spark, Seq(path))
    candidateUids(spark, path, q, Lake.BruteForceThreshold,
        vers(path)) match {
      case Some(uids)
          if uids.size < graft.api.IndexKind.metaRows(spark, path).size =>
        Layout.readHits(spark, meta, uids.toDF("uid"))
          .filter(refinePred(column, q))
      case _ => brute() // cost caps / too many hits / all groups hit
    }
  }
}
