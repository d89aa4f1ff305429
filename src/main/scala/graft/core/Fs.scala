package graft.core

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Driver-side filesystem checks routed through the Hadoop FileSystem
  * of each path's scheme (reference: scheme-dispatched readers,
  * src/formats/readers/mod.rs:259-294).
  *
  * Index DIRECTORIES may live on any Hadoop-supported store (`file:`,
  * `hdfs:`, `s3a:` …): everything that reads them driver-side —
  * existence filters in coverage/compaction, the mtime keys of the
  * head/schema/meta caches — must go through these helpers, because a
  * `java.nio.Files` check on an `s3a://` path is always false and
  * would silently demote every search to a brute-force scan (the
  * failure mode this object exists to prevent). The metadata TABLE's
  * commit protocol (IndexStore's two-rename swap) requires an
  * atomic-rename filesystem (local/HDFS); for object stores without
  * one, [[CasMetadata]] provides the rename-free create-if-absent
  * commit (and [[DeltaLog.commit]] dispatches the same way per
  * scheme).
  */
object Fs {

  // one Hadoop conf per session (newHadoopConf() copies the full conf;
  // stat calls happen several times per search). WEAK keys: a strong
  // map would pin every discarded per-tenant session (and its full
  // copied conf) for the JVM lifetime
  private val confCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      org.apache.hadoop.conf.Configuration]())

  // fast path: a synchronized get (microseconds). The full-conf copy
  // (newHadoopConf, expensive) runs OUTSIDE the lock; a racing
  // duplicate copy is harmless — first insert wins
  private def conf(spark: SparkSession)
      : org.apache.hadoop.conf.Configuration = {
    val cached = confCache.get(spark)
    if (cached != null) return cached
    val fresh = spark.sessionState.newHadoopConf()
    val prev = confCache.putIfAbsent(spark, fresh)
    if (prev != null) prev else fresh
  }

  /** Hadoop conf for call sites with no SparkSession in scope (lake
    * listing from a backend): the active session's conf when one
    * exists, cluster defaults otherwise.
    */
  private[graft] def anyConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(conf).getOrElse(new org.apache.hadoop.conf.Configuration())

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new HPath(path)
    p.getFileSystem(conf(spark)).exists(p)
  }

  // ---- session-less scheme-dispatched primitives ---------------------
  // For the log/commit protocols (DeltaLog, IcebergLog, CasMetadata)
  // whose call sites have no SparkSession: the active session's conf
  // when one exists, cluster defaults otherwise.

  private[graft] val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:/.*".r

  /** True for plain paths and `file:` URIs — the java.nio fast path. */
  private[graft] def isLocalPath(p: String): Boolean =
    !SchemeRe.matches(p) || p.startsWith("file:")

  private[graft] def forPath(p: String): org.apache.hadoop.fs.FileSystem =
    new HPath(p).getFileSystem(anyConf())

  private[graft] def readBytes(path: String): Array[Byte] = {
    val in = forPath(path).open(new HPath(path))
    try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
  }

  private[graft] def readString(path: String): String =
    new String(readBytes(path), "UTF-8")

  private[graft] def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val f = forPath(path)
    val p = new HPath(path)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Schemes whose `create(path, overwrite = false)` output streams are
    * VISIBLE before close (check-then-create filesystems: HDFS and its
    * relatives, plus the RawLocal-backed test schemes). On these, a
    * claim-file protocol must never stream content through the claimed
    * path — a reader (or a writer crash) between create and close would
    * see a TORN file as the resolvable max version, and since claim
    * files are treated as immutable the torn read would be cached
    * forever. These filesystems all provide atomic rename instead, so
    * content is staged to a hidden sibling and PUBLISHED by one rename.
    * Every other non-local scheme (`s3a:`/`gs:`/`oss:`-style object
    * stores, and conditional-PUT mocks) keeps the direct conditional
    * create: there the object lands atomically WITH its content at
    * close — the reference's own primitive (`PUT If-None-Match: *`,
    * backends/s3_utils.py:83-109).
    */
  private val streamVisibleSchemes = Set(
    "hdfs", "webhdfs", "swebhdfs", "viewfs", "ofs", "o3fs",
    "abfs", "abfss", "wasb", "wasbs", "mock", "mocks")

  /** The conditional-PUT primitive (`If-None-Match: *`): create `path`
    * with `bytes` iff absent, atomically WITH its content — no observer
    * ever sees the path existing with partial bytes. True iff THIS
    * caller created it; the atom every rename-free commit protocol
    * rests on. Dispatch per scheme:
    *
    *   - local: fully-written temp file hard-linked into place (one
    *     atomic syscall carrying claim + content; POSIX rename would
    *     silently clobber a racing claim, CREATE_NEW + write would
    *     expose a torn window).
    *   - [[streamVisibleSchemes]]: staged sibling + atomic
    *     rename-no-overwrite (HDFS arbitrates the race at the
    *     namenode; the dst-exists pre-check narrows it on the
    *     RawLocal-backed test schemes, whose races the suite never
    *     exercises).
    *   - object stores: direct `create(path, overwrite=false)` — the
    *     PUT only lands whole, and a lost race may surface at create()
    *     OR at write/close, so the full sequence is guarded.
    */
  private[graft] def createIfAbsent(path: String,
      bytes: Array[Byte]): Boolean = {
    if (isLocalPath(path)) return createIfAbsentLocal(path, bytes)
    val p = new HPath(path)
    if (streamVisibleSchemes.contains(p.toUri.getScheme))
      return createIfAbsentStaged(p, bytes)
    val f = forPath(path)
    f.mkdirs(p.getParent)
    val out =
      try f.create(p, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          return false
        // RawLocalFileSystem signals an existing target as IOException
        case e: java.io.IOException if f.exists(p) => return false
      }
    try {
      try out.write(bytes) finally out.close()
      true
    } catch {
      // a lost race surfacing at the PUT's completion; any other IO
      // failure propagates (a false "lost race" would leave a torn
      // object as the resolvable max)
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  private def createIfAbsentLocal(path: String,
      bytes: Array[Byte]): Boolean = {
    val target = java.nio.file.Paths.get(new HPath(path).toUri.getPath)
    java.nio.file.Files.createDirectories(target.getParent)
    if (java.nio.file.Files.exists(target)) return false
    val tmp = java.nio.file.Files.createTempFile(target.getParent,
      s".${target.getFileName}", ".tmp")
    try {
      java.nio.file.Files.write(tmp, bytes)
      try { java.nio.file.Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally java.nio.file.Files.delete(tmp)
  }

  private def createIfAbsentStaged(p: HPath,
      bytes: Array[Byte]): Boolean = {
    val f = forPath(p.toString)
    f.mkdirs(p.getParent)
    if (f.exists(p)) return false
    val tmp = new HPath(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    try {
      if (f.rename(tmp, p)) true
      else { f.delete(tmp, false); false } // dst exists: lost the race
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        f.delete(tmp, false); false
    }
  }

  /** Modification time in ms (directory or file). Fails if absent —
    * callers that tolerate absence should check [[exists]] first.
    */
  def mtime(spark: SparkSession, path: String): Long = {
    val p = new HPath(path)
    p.getFileSystem(conf(spark)).getFileStatus(p).getModificationTime
  }

  /** Version key for an index sub-directory: the max mtime over its
    * descendant FILES (recursive listing; the directory's own status
    * mtime if it holds none). Cache keys must derive from the files a
    * rewrite replaces — directory status mtimes are synthetic on object
    * stores (S3A), and one level is not enough for partitioned tables
    * (`cells/centroid=N/...`) whose direct children are directories
    * again. Index sub-dirs hold tens to hundreds of files, so the
    * recursive listing is one or two LIST round trips.
    */
  def dirVersion(spark: SparkSession, dir: String): Long = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf(spark))
    val it = fs.listFiles(p, true)
    var max = Long.MinValue
    while (it.hasNext) max = math.max(max, it.next().getModificationTime)
    if (max == Long.MinValue) fs.getFileStatus(p).getModificationTime
    else max
  }

  /** Content signature for an index sub-directory — the CACHE KEY
    * twin of [[dirVersion]]: an order-independent hash over every
    * descendant file's (relative path, length, mtime). [[dirVersion]]
    * alone (max mtime) misses a delete-and-rebuild that lands within
    * the store's timestamp granularity (S3 LastModified and many local
    * filesystems resolve to 1 s), which would leave a version-keyed
    * cache serving the OLD index's data against the new one — cache
    * keys must change whenever any file is added, removed, resized, or
    * re-timestamped. Same single recursive LIST as [[dirVersion]];
    * use that one only where the value's MEANING is an age
    * (vacuum retention), this one everywhere a cache is keyed.
    */
  def dirSignature(spark: SparkSession, dir: String): Long = {
    // local fast path: Hadoop's LocalFileSystem listing loads per-file
    // permission info through a forked process (~20 ms even for a
    // 5-file dir), and this signature keys EVERY driver cache — it is
    // on the latency path of every warm search. java.nio walks the
    // same tree in ~0.1 ms with identical change-detection semantics
    // (relative path, length, mtime per descendant file). Signature
    // VALUES differ from the Hadoop form (checksum shadows are
    // included here) — that is a one-time cache miss, never a stale
    // hit, since each deployment hashes consistently with itself.
    if (isLocalPath(dir)) return localDirSignature(dir)
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf(spark))
    val base = p.toUri.getPath
    val it = fs.listFiles(p, true)
    var sig = 0L
    var any = false
    while (it.hasNext) {
      val s = it.next()
      any = true
      val rel = s.getPath.toUri.getPath.stripPrefix(base)
      // order-independent combine (XOR of per-file mixes): listFiles
      // order is unspecified across filesystems
      var h = 1125899906842597L // prime seed
      rel.foreach(c => h = h * 31 + c)
      h = h * 31 + s.getLen
      h = h * 31 + s.getModificationTime
      // finalize per-file (splitmix-style) so XOR cannot cancel
      // structured (path, len, mtime) deltas
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      sig ^= h
    }
    if (!any) fs.getFileStatus(p).getModificationTime else sig
  }

  /** [[dirSignature]] over java.nio for plain local paths (same hash
    * construction; scheme-less `file:` forms are normalized by the
    * HPath round-trip). Throws like the Hadoop form on a missing dir.
    */
  private def localDirSignature(dir: String): Long = {
    val base = java.nio.file.Paths.get(
      if (dir.startsWith("file:")) new HPath(dir).toUri.getPath else dir)
    var sig = 0L
    var any = false
    // missing dir must throw what the Hadoop form throws — callers
    // (the search self-heal demote path) classify on
    // java.io.FileNotFoundException, which nio's NoSuchFileException
    // is NOT a subclass of
    val stream =
      try java.nio.file.Files.walk(base)
      catch {
        case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getFile)
      }
    try {
      stream.forEach { f =>
        // a file vanishing mid-walk (racing delete) reads as absent —
        // the signature changes either way, never throws
        val attrs =
          try java.nio.file.Files.readAttributes(f,
            classOf[java.nio.file.attribute.BasicFileAttributes])
          catch { case _: java.nio.file.NoSuchFileException => null }
        if (attrs != null && attrs.isRegularFile) {
          any = true
          val rel = f.toString.stripPrefix(base.toString)
          var h = 1125899906842597L // prime seed
          rel.foreach(c => h = h * 31 + c)
          h = h * 31 + attrs.size()
          h = h * 31 + attrs.lastModifiedTime().toMillis
          h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
          sig ^= h
        }
      }
    } catch {
      // a directory entry vanishing mid-iteration (racing delete of
      // the tree itself) surfaces as UncheckedIOException-wrapped
      // NoSuchFileException from the walk stream — the Hadoop branch
      // throws FileNotFoundException there, and callers' self-heal
      // demote classifies on exactly that type
      case e: java.io.UncheckedIOException
          if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] =>
        throw new java.io.FileNotFoundException(
          e.getCause.asInstanceOf[java.nio.file.NoSuchFileException].getFile)
    } finally stream.close()
    if (!any)
      try java.nio.file.Files.getLastModifiedTime(base).toMillis
      catch {
        case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getFile)
      }
    else sig
  }

  /** Child statuses `(path, isDirectory, mtime)` of a directory; empty
    * if it is absent. One LIST call.
    */
  def childStats(spark: SparkSession,
      dir: String): Seq[(String, Boolean, Long)] = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf(spark))
    try fs.listStatus(p).toSeq.map(s =>
      (s.getPath.toString, s.isDirectory, s.getModificationTime))
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  /** Recursive delete through the path's filesystem (no-op if absent).
    * The `_GRAFT_DONE` marker goes FIRST: build writes it last and
    * delete removes it first, so marker-present ⇒ the dir is complete
    * and not mid-deletion — the integrity probe search's
    * demote-on-missing-file retry relies on.
    */
  def deleteRec(spark: SparkSession, path: String): Unit = {
    val fs = new HPath(path).getFileSystem(conf(spark))
    // an absent marker returns false (no throw); a REAL delete failure
    // must propagate BEFORE any child is touched — swallowing it and
    // deleting children would leave marker-present-but-broken, the one
    // state the invariant promises cannot exist
    fs.delete(new HPath(path, "_GRAFT_DONE"), false)
    fs.delete(new HPath(path), true)
  }

  /** Child names of a directory (empty if the directory is absent).
    * The batch alternative to per-path [[exists]]: filtering N metadata
    * rows by existence costs N HEAD requests on an object store, but
    * one LIST per parent directory — which is how coverage/compaction
    * validate their index dirs.
    */
  def childNames(spark: SparkSession, dir: String): Set[String] = {
    // local fast path (the dirSignature argument: this LIST runs on
    // every facade search through coverage()'s existence filter)
    if (isLocalPath(dir)) {
      val base = java.nio.file.Paths.get(
        if (dir.startsWith("file:")) new HPath(dir).toUri.getPath else dir)
      // exception parity with the Hadoop branch: ONLY absence reads as
      // empty (a transient AccessDenied must propagate, not silently
      // demote every covering index to a brute scan); listing a FILE
      // answers the file itself, like Hadoop listStatus
      val s =
        try java.nio.file.Files.list(base)
        catch {
          case _: java.nio.file.NoSuchFileException => return Set.empty
          case _: java.nio.file.NotDirectoryException =>
            return Set(base.getFileName.toString)
        }
      try {
        val out = Set.newBuilder[String]
        s.forEach(p => out += p.getFileName.toString)
        return out.result()
      } finally s.close()
    }
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf(spark))
    try fs.listStatus(p).map(_.getPath.getName).toSet
    catch { case _: java.io.FileNotFoundException => Set.empty }
  }

  /** [[childNames]] for call sites with no SparkSession (the log
    * protocols): same one-LIST semantics through [[anyConf]].
    */
  private[graft] def childNamesAny(dir: String): Set[String] = {
    val p = new HPath(dir)
    try forPath(dir).listStatus(p).map(_.getPath.getName).toSet
    catch { case _: java.io.FileNotFoundException => Set.empty }
  }

  /** Batch existence filter: `paths` grouped by parent, one LIST each.
    * Semantics match per-path [[exists]] for directory children.
    */
  def existing(spark: SparkSession, paths: Seq[String]): Set[String] = {
    val byParent = paths.distinct.groupBy(p => new HPath(p).getParent)
    byParent.iterator.flatMap { case (parent, ps) =>
      if (parent == null) ps.filter(exists(spark, _))
      else {
        val names = childNames(spark, parent.toString)
        ps.filter(p => names.contains(new HPath(p).getName))
      }
    }.toSet
  }
}
