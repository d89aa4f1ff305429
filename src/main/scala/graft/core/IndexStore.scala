package graft.core

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index storage + the lake-level index-metadata table.
  *
  * Indexes are partitioned Parquet tables (SURVEY §7.1: the reference's
  * `.lava` binary blobs are an encoding of posting lists keyed by
  * token/centroid/type/prefix plus a small hot head — in Spark the
  * idiomatic equivalent is partitioned parquet + a small broadcastable
  * head table).
  *
  * The metadata table mirrors the reference's lake-level table
  * (reference: python/rottnest/backends/parquet.py:162-172): one row per
  * index file with the list of covered parquet files; invariant — each
  * lake file is covered by at most one index of a given name
  * (reference: backends/delta.py:9). Commit protocol for the plain
  * backend is an atomic single-object overwrite
  * (reference: backends/s3_utils.py:83-109).
  */
object IndexStore {

  /** Index root. The `graft.index.dir` system property overrides the
    * env (test seam); may carry any Hadoop scheme — a NON-local root
    * switches the metadata table to the rename-free [[CasMetadata]]
    * protocol and every marker/stat/delete to the root's FileSystem.
    */
  def root: String = {
    val r = sys.props.get("graft.index.dir")
      .orElse(sys.env.get("GRAFT_INDEX_DIR"))
      .getOrElse("/root/repo/target/graft-idx")
    // a file:-scheme root takes the java.nio local fast path, where
    // Paths.get("file:/x/y") is a RELATIVE path with a literal "file:"
    // first segment — markers/metadata swaps/deletes would silently
    // target $CWD/file:/... Strip the scheme ONCE here so every
    // derived path is plain; non-file schemes stay untouched (they go
    // through the Hadoop FS branch).
    if (r.startsWith("file:")) new org.apache.hadoop.fs.Path(r).toUri.getPath
    else r
  }

  private def isLocalRoot: Boolean = Fs.isLocalPath(root)
  private def hfs(p: String): org.apache.hadoop.fs.FileSystem =
    Fs.forPath(p)

  /** Stable id for a lake directory (used to key cached indexes/lakes). */
  def lakeId(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_")

  def indexPath(dir: String, name: String): String =
    s"$root/${lakeId(dir)}/$name"

  private def marker(path: String) = Paths.get(path, "_GRAFT_DONE")

  def isBuilt(path: String): Boolean =
    // dispatch on the PATH's scheme, not the root's: ensure() also
    // guards lake-side builds (Lake.ensureSplit), whose paths may
    // carry a scheme while the index root is local (and vice versa) —
    // a root-based dispatch would java.nio a "s3a:/..." string into a
    // relative $CWD path
    if (Fs.isLocalPath(path)) Files.exists(marker(path))
    else hfs(path).exists(new org.apache.hadoop.fs.Path(path, "_GRAFT_DONE"))

  // one monitor PER INDEX PATH: a build holds its lock for minutes of
  // Spark jobs, and holding the global IndexStore monitor for that long
  // would stall every concurrent search's metadata read (they
  // synchronize on IndexStore for microseconds)
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Build-once guard; builds are idempotent per (lake, index name).
    * A per-path lock keeps concurrent query entries from
    * double-building the SAME index without serializing unrelated
    * builds or blocking metadata readers.
    */
  def ensure(path: String)(build: => Unit): String = {
    val lock = buildLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      if (!isBuilt(path)) {
        build
        if (Fs.isLocalPath(path)) {
          Files.createDirectories(Paths.get(path))
          Files.write(marker(path), Array.emptyByteArray)
        } else {
          val f = hfs(path)
          val p = new org.apache.hadoop.fs.Path(path)
          f.mkdirs(p)
          f.create(new org.apache.hadoop.fs.Path(p, "_GRAFT_DONE"),
            true).close()
        }
      }
    }
    path
  }

  // ---- lake-level index metadata table ------------------------------

  def metadataPath(dir: String): String = s"$root/${lakeId(dir)}/_metadata"

  /** Base dir of the CAS log on a non-local root. */
  private def casBase(dir: String): String = s"$root/${lakeId(dir)}"

  private def casToDf(spark: SparkSession,
      rows: Seq[CasMetadata.FullRow]): DataFrame = {
    import spark.implicits._
    rows.map(r => (r.table, r.column, r.files, r.recordCounts,
        r.indexFile, r.indexType, r.rowsIndexed, r.indexTimestamp))
      .toDF("table_name", "column_name", "file_path", "record_counts",
        "index_file", "index_type", "rows_indexed", "index_timestamp")
  }

  private def dfToCas(rows: DataFrame): Seq[CasMetadata.FullRow] =
    rows.select("table_name", "column_name", "file_path", "record_counts",
        "index_file", "index_type", "rows_indexed", "index_timestamp")
      .collect()
      .map(r => CasMetadata.FullRow(r.getString(0), r.getString(1),
        r.getSeq[String](2).toSeq, r.getSeq[Long](3).toSeq, r.getString(4),
        r.getString(5), r.getLong(6), r.getLong(7)))
      .toSeq

  /** Opaque version token of the lake's metadata table — changes on
    * every commit (local: the swap-bumped mtime [[swapInMetadata]]
    * keeps monotone; CAS: the latest manifest version, immutable once
    * written). Any cache whose VALUE derives from the metadata state
    * (e.g. the optimizer rule's probe memo) must fold this into its
    * key, or a delete-and-rebuild of an index would keep serving the
    * pre-rebuild answer.
    */
  def metadataVersionToken(spark: SparkSession, dir: String): String =
    if (!isLocalRoot)
      CasMetadata.latestVersion(spark, casBase(dir)).fold("none")(_.toString)
    else {
      val p = Paths.get(metadataPath(dir))
      if (Files.exists(p)) Files.getLastModifiedTime(p).toMillis.toString
      else "none"
    }

  /** Trim the CAS manifest log on non-local roots (readers only ever
    * resolve the max, so a trailing window is always safe). No-op on
    * local roots, whose metadata table is a single swapped object with
    * no version history to trim.
    */
  def vacuumMetadataLog(spark: SparkSession, dir: String): Int =
    if (isLocalRoot) 0
    else CasMetadata.vacuum(spark, casBase(dir))

  def readMetadata(spark: SparkSession, dir: String): Option[DataFrame] = {
    if (!isLocalRoot) {
      val rows = CasMetadata.read(spark, casBase(dir))
      return if (rows.isEmpty) None else Some(casToDf(spark, rows))
    }
    recoverMetadata(dir)
    val p = metadataPath(dir)
    if (Files.exists(Paths.get(p))) Some(spark.read.parquet(p)) else None
  }

  /** Crash recovery for the two-rename swap in [[swapInMetadata]]: if a
    * writer died between moving the live table to `_old` and moving the
    * replacement in, the backup IS the authoritative table — restore it
    * so the crash demotes to a retried commit instead of permanent
    * metadata loss (the build-once markers would otherwise block any
    * re-commit forever).
    */
  private def recoverMetadata(dir: String): Unit =
    metaLock(dir).synchronized {
      val target = Paths.get(metadataPath(dir))
      val bak = Paths.get(metadataPath(dir) + "_old")
      if (!Files.exists(target) && Files.exists(bak)) Files.move(bak, target)
    }

  /** One collected metadata row (the table is metadata-sized: one row
    * per index file — the reference keeps the same table driver-side).
    */
  case class MetaRow(table: String, column: String, files: Seq[String],
      indexFile: String, indexType: String)

  // keep only the LATEST (mtime, rows) per path: commits change the
  // mtime, and versioned keys would strand one dead entry per commit —
  // unbounded growth under streaming maintenance
  private val metaRowCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Seq[MetaRow])]

  /** Collected metadata rows, cached by the table's mtime so repeated
    * facade calls (index → compact → search in one entry) pay ONE job.
    * mtime aliasing is prevented at the writer ([[swapInMetadata]] bumps
    * the mtime monotonically); a concurrent swap mid-read demotes to the
    * empty (in-situ) answer rather than crashing — the read is retried
    * with fresh state on the next call.
    */
  def metadataRowsCached(spark: SparkSession, dir: String): Seq[MetaRow] =
    try {
      if (!isLocalRoot)
        return CasMetadata.read(spark, casBase(dir)).map(_.toMetaRow)
      recoverMetadata(dir)
      val path = metadataPath(dir)
      val p = Paths.get(path)
      if (!Files.exists(p)) return Seq.empty
      val mtime = Files.getLastModifiedTime(p).toMillis
      metaRowCache.get(path) match {
        case Some((m, rows)) if m == mtime => rows
        case _ =>
          val rows = spark.read.parquet(path)
            .select("table_name", "column_name", "file_path", "index_file",
              "index_type")
            .collect()
            .map(r => MetaRow(r.getString(0), r.getString(1),
              r.getSeq[String](2).toSeq, r.getString(3), r.getString(4)))
            .toSeq
          metaRowCache.put(path, (mtime, rows))
          rows
      }
    } catch {
      // TOCTOU with a concurrent swap: treat as "no metadata yet"
      case _: java.nio.file.NoSuchFileException => Seq.empty
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") => Seq.empty
    }

  /** Append rows to the metadata table (overwrite-commit of the single
    * metadata object, as in the reference's plain-parquet backend).
    */
  // per-LAKE metadata locks: commit/delete hold a lock across their
  // read-merge-write (two same-dir committers must serialize), but a
  // GLOBAL monitor here would stall every other lake's metadata reads
  // for the duration of the commit's Spark write — the exact hazard
  // the buildLocks comment forbids
  private val metaLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def metaLock(dir: String): Object =
    metaLocks.computeIfAbsent(metadataPath(dir), _ => new Object)

  def commitMetadata(spark: SparkSession, dir: String, rows: DataFrame): Unit =
    metaLock(dir).synchronized {
      if (!isLocalRoot) {
        // object-store root: the rename-free create-if-absent protocol
        // (same idempotent index_file-replace merge, done CAS-side)
        CasMetadata.commit(spark, casBase(dir), dfToCas(rows))
        return
      }
      val merged = readMetadata(spark, dir) match {
        case Some(old) =>
          // replace rows for the same index_file (idempotent rebuild)
          val newKeys = rows.select("index_file").distinct()
          old.join(newKeys, Seq("index_file"), "left_anti").unionByName(rows)
        case None => rows
      }
      swapInMetadata(spark, dir, merged)
    }

  /** Two-rename swap of the single metadata object, crash-tolerant:
    * the live table moves to `_old` before the replacement moves in, so
    * at every instant either `_metadata` or `_metadata_old` holds a
    * complete table — [[recoverMetadata]] restores the backup if a
    * crash lands between the renames. The new table's mtime is bumped
    * strictly past the old one's so the (path, mtime) caches can never
    * alias two versions committed within one clock granule (compact's
    * append-then-delete commits twice back-to-back).
    */
  private def swapInMetadata(spark: SparkSession, dir: String,
      table: DataFrame): Unit = {
    val tmp = metadataPath(dir) + "_tmp"
    table.coalesce(1).write.mode("overwrite").parquet(tmp)
    val target = Paths.get(metadataPath(dir))
    val prev =
      if (Files.exists(target)) Files.getLastModifiedTime(target).toMillis
      else 0L
    val bak = Paths.get(metadataPath(dir) + "_old")
    if (Files.exists(target)) {
      deleteRec(bak)
      Files.move(target, bak)
    }
    Files.move(Paths.get(tmp), target)
    Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(
        math.max(System.currentTimeMillis(), prev + 1)))
    deleteRec(bak)
  }

  /** Delete metadata rows whose index_file is in `indexFiles` (second
    * half of the append-then-delete compaction commit,
    * reference: backends/iceberg.py:469-479).
    */
  def deleteMetadata(spark: SparkSession, dir: String, indexFiles: Seq[String]): Unit =
    metaLock(dir).synchronized {
      if (!isLocalRoot) {
        CasMetadata.deleteRows(spark, casBase(dir), indexFiles)
        return
      }
      readMetadata(spark, dir).foreach { old =>
        val keep = old.filter(!col("index_file").isin(indexFiles: _*))
        swapInMetadata(spark, dir, keep)
      }
    }

  def deleteRec(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      // marker first — same invariant as Fs.deleteRec (marker-present
      // ⇒ dir complete, not mid-deletion)
      Files.deleteIfExists(p.resolve("_GRAFT_DONE"))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  /** Standard metadata row set for one freshly built index. */
  def metadataRows(spark: SparkSession, table: String, column: String,
      files: Seq[String], recordCounts: Seq[Long], indexFile: String,
      indexType: String, rowsIndexed: Long): DataFrame = {
    import spark.implicits._
    Seq((table, column, files, recordCounts, indexFile, indexType,
      rowsIndexed, System.currentTimeMillis() / 1000))
      .toDF("table_name", "column_name", "file_path", "record_counts",
        "index_file", "index_type", "rows_indexed", "index_timestamp")
  }
}
