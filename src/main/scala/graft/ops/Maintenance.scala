package graft.ops

import graft.Q
import graft.core.{IndexStore, Lake}
import graft.index.NgramIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index maintenance: bin-packing, compaction, vacuum (SURVEY §2.5).
  *
  * The lifecycle mirrors the reference's compaction driver (reference:
  * python/rottnest/backends/parquet.py:283-383): pick mergeable indexes
  * (covered rows below the bin-pack threshold), group them greedily,
  * merge each group, commit new metadata rows **then** delete the old
  * ones (crash-tolerant ordering, reference: backends/iceberg.py:469-479),
  * and let vacuum physically remove unreferenced index files
  * (reference: backends/parquet.py:225-281).
  *
  * Maintenance state lives in its own metadata namespace (`dir#maint`)
  * so the lifecycle is idempotent and isolated from the query indexes.
  */
object Maintenance {

  /** Greedy bin-packing of files into index groups by accumulated row
    * count (reference: backends/parquet.py:85-103). Driver-side: the
    * input is a metadata-sized file list.
    */
  def binpack(files: Seq[(String, Long)], threshold: Long): Seq[Seq[String]] = {
    val groups = Seq.newBuilder[Seq[String]]
    var cur = Seq.newBuilder[String]
    var acc = 0L
    var n = 0
    files.foreach { case (f, rows) =>
      if (n > 0 && acc + rows > threshold) {
        groups += cur.result(); cur = Seq.newBuilder[String]; acc = 0L; n = 0
      }
      cur += f; acc += rows; n += 1
    }
    if (n > 0) groups += cur.result()
    groups.result()
  }

  /** Retention window before an unreferenced index file may be
    * physically deleted (reference: vacuum keeps index files within the
    * `history` window and only deletes unreferenced files past a
    * timeout, backends/parquet.py:225-281). Load-bearing here too:
    * in-flight readers and Delta time-travel searches may still hold a
    * superseded index's path after a compact commit.
    */
  val DefaultRetentionMs: Long = 7L * 24 * 3600 * 1000

  /** Tombstone file stamped inside an index dir by the first vacuum
    * sweep that finds it unreferenced — its mtime is the start of the
    * retention clock.
    */
  val UnreferencedMarker = "_GRAFT_UNREFERENCED"

  /** Vacuum: delete index directories not referenced by the metadata
    * table AND unmodified for at least `retentionMs`. Returns the
    * surviving referenced index paths.
    */
  def vacuum(spark: SparkSession, ns: String,
      retentionMs: Long = DefaultRetentionMs): Seq[String] = {
    val referencedPaths = IndexStore.readMetadata(spark, ns)
      .map(_.select("index_file").collect().map(_.getString(0)).toSeq)
    val root = s"${IndexStore.root}/${IndexStore.lakeId(ns)}"
    // Hadoop-FS listing/deletes, not java.nio: on a non-local index
    // store a local listing is empty and vacuum would silently delete
    // nothing forever (unbounded storage growth).
    val listing = graft.core.Fs.childStats(spark, root)
      .filter(_._2) // directories
      .map(s => (s._1, new org.apache.hadoop.fs.Path(s._1).getName, s._3))
    // FAIL-SAFE: the listing shows a metadata table this driver could
    // not read (a scheme/visibility mismatch) — "delete every index
    // under the root" is never the right reading of that state. A
    // store with NO metadata table at all is different: its dirs are
    // genuine orphans (a build that died before its commit) and age
    // out normally.
    if (referencedPaths.isEmpty &&
        listing.exists(_._2.startsWith("_metadata"))) return Seq.empty
    // index dirs and the metadata table share one directory, so
    // liveness compares BASENAMES — immune to scheme/authority
    // qualification differences between the stored paths and the
    // filesystem listing
    val referencedNames = referencedPaths.getOrElse(Seq.empty)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet
    val now = System.currentTimeMillis()
    // retention measures time-since-UNREFERENCED, not build age: the
    // first sweep that sees an unreferenced dir stamps a tombstone
    // marker, and deletion happens only once the tombstone is
    // retentionMs old. (Index dirs are immutable once built, so a
    // build-age clock gives an index superseded by compact() ZERO
    // grace the moment its metadata row is dropped — the in-flight
    // readers the retention window exists to protect would crash.)
    // A dir referenced again (in-place rebuild + re-commit) has its
    // tombstone cleared. Per-dir FS errors SKIP the dir — the fail-
    // safe direction is never delete-on-error.
    listing
      .filterNot(_._2.startsWith("_metadata"))
      .foreach { s =>
        val tomb = s"${s._1}/$UnreferencedMarker"
        try {
          if (referencedNames.contains(s._2)) {
            if (graft.core.Fs.exists(spark, tomb))
              graft.core.Fs.deleteRec(spark, tomb)
          } else {
            val since =
              if (graft.core.Fs.exists(spark, tomb))
                graft.core.Fs.mtime(spark, tomb)
              else {
                graft.core.Fs.writeBytes(tomb, Array.emptyByteArray)
                now
              }
            if (now - since >= retentionMs)
              graft.core.Fs.deleteRec(spark, s._1)
          }
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    // on CAS-backed roots the metadata table is a manifest LOG — trim
    // superseded snapshots too (the `_metadata` guard above protects
    // the log dir itself from the orphan sweep)
    IndexStore.vacuumMetadataLog(spark, ns)
    referencedPaths.getOrElse(Seq.empty).sorted
  }

  /** Snapshot-aware vacuum — the reference's retention semantics
    * (reference: backends/iceberg.py:307-384 `vacuum_iceberg_indices`):
    *
    *  1. live snapshots = those committed within `historyMs` of `now`,
    *     ALWAYS including the latest one even if it has aged out
    *     (reference: :333-338 falls back to the newest snapshot when
    *     the history window is empty);
    *  2. live files = union of the live snapshots' data files;
    *  3. metadata rows whose covered files miss the live set entirely
    *     are deleted (reference: :347-360);
    *  4. physically delete index dirs no longer referenced and older
    *     than `fileTimeoutMs` (reference: :362-384 deletes
    *     unreferenced `.lava`/`.meta` files past `index_timeout`).
    *
    * Returns the surviving referenced index paths.
    */
  def vacuumIceberg(spark: SparkSession, ns: String, table: String,
      historyMs: Long, now: Long = System.currentTimeMillis(),
      fileTimeoutMs: Long = 0L): Seq[String] = {
    val snaps = graft.core.IcebergLog.snapshotsWithTimes(table)
    // FAIL-SAFE (same stance as vacuum() above): a table with zero
    // readable snapshots is indistinguishable from a wiped/unreadable
    // metadata dir, and "every index is dead" is never the right
    // reading of that state. Genuine orphan dirs still age out via the
    // plain vacuum below — at NO LESS than the default retention: the
    // caller's fileTimeoutMs (default 0) expresses trust in the
    // snapshot-derived liveness we could not compute here, so an
    // unreadable-metadata pass must never turn it into instant
    // physical deletes of in-progress builds.
    if (snaps.isEmpty)
      return vacuum(spark, ns, math.max(fileTimeoutMs, DefaultRetentionMs))
    val cutoff = now - historyMs
    val recent = snaps.filter(_._2 > cutoff)
    val live = if (recent.nonEmpty) recent else Seq(snaps.maxBy(_._2))
    val liveFiles = live.flatMap { case (id, _) =>
      graft.core.IcebergLog.liveFiles(table, Some(id))
    }.toSet
    // liveness compares BASENAMES, like vacuum(): metadata rows store
    // the paths the builder saw, the manifest stores the committer's —
    // scheme/authority qualification may differ while naming the same
    // files, and a raw-string mismatch here would delete EVERY index
    def baseName(p: String) = new org.apache.hadoop.fs.Path(p).getName
    val liveNames = liveFiles.map(baseName)
    // scope the dead-row classification to THIS table's indexes: a
    // namespace may hold metadata for several tables (MetaRow carries
    // a table field, but it stores the builder's logical name, not
    // this path), so a row is only a candidate when its covered files
    // intersect the table's all-snapshot file set — an index over a
    // DIFFERENT table misses the live set trivially and must not be
    // classified dead against it
    val allNames = snaps.flatMap { case (id, _) =>
      graft.core.IcebergLog.liveFiles(table, Some(id))
    }.map(baseName).toSet
    if (liveNames.nonEmpty) {
      val dead = IndexStore.metadataRowsCached(spark, ns)
        .filter(r => r.files.exists(f => allNames.contains(baseName(f))) &&
          !r.files.exists(f => liveNames.contains(baseName(f))))
        .map(_.indexFile)
      if (dead.nonEmpty) IndexStore.deleteMetadata(spark, ns, dead)
    }
    vacuum(spark, ns, fileTimeoutMs)
  }

  /** Greedy max-coverage index selection (reference: the Delta path
    * repeatedly picks the index file covering the most not-yet-covered
    * live parquet files, backends/delta.py:77-93). Driver-side:
    * metadata-sized input. Returns chosen index ids in pick order.
    */
  def selectIndexes(live: Set[String],
      indexes: Seq[(String, Set[String])]): Seq[String] = {
    val picks = Seq.newBuilder[String]
    var uncovered = live
    var remaining = indexes
    while (uncovered.nonEmpty && remaining.exists(_._2.exists(uncovered))) {
      // maxBy keeps the FIRST maximum, so sorting by id first makes the
      // tie-break deterministic (lowest id wins)
      val (best, cover) = remaining.sortBy(_._1).maxBy { case (_, fs) =>
        (fs & uncovered).size
      }
      picks += best
      uncovered = uncovered -- cover
      remaining = remaining.filterNot(_._1 == best)
    }
    picks.result()
  }

  def maintNs(dir: String): String = dir + "#maint"

  /** Full lifecycle, executed once per lake: build two half-coverage
    * indexes → commit → compact (binpack, merge, append-then-delete) →
    * vacuum. Returns the live compacted index path.
    */
  def ensureCompacted(s: SparkSession, dir: String): String = {
    val ns = maintNs(dir)
    val files = Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
    val merged = IndexStore.indexPath(ns, "ngram_compacted")
    IndexStore.ensure(merged) {
      val parts = Seq(files.take(2), files.drop(2)).zipWithIndex.map {
        case (fs, i) =>
          val p = IndexStore.indexPath(ns, s"ngram_part$i")
          (p, IndexQueries.buildAndCommit(s, ns, fs, p))
      }
      // compaction plan: both part-indexes fall below the threshold →
      // binpack groups them together for one merge
      val mergeable = parts.map { case (p, counts) => (p, counts.map(_._2).sum) }
      val groups = binpack(mergeable, threshold = Long.MaxValue)
      require(groups.head.size == 2, s"expected one merge group, got $groups")
      NgramIndex.merge(s, groups.head(0), groups.head(1), merged)
      val allCounts = parts.flatMap(_._2)
      // commit new rows, then delete old (crash-tolerant order)
      IndexStore.commitMetadata(s, ns,
        IndexStore.metadataRows(s, "documents", "text",
          allCounts.map(_._1), allCounts.map(_._2), merged, "ngram",
          allCounts.map(_._2).sum))
      IndexStore.deleteMetadata(s, ns, parts.map(_._1))
      vacuum(s, ns)
    }
    merged
  }

  /** Overlapping index set for the greedy-selection entry: A covers
    * files 0-1, B covers file 2 only, C covers files 2-3 — the greedy
    * pick is [A, C] (B is redundant), exactly the reference's Delta
    * max-coverage walk (backends/delta.py:77-93).
    */
  def ensureSelectable(s: SparkSession, dir: String): Seq[String] = {
    val ns = dir + "#select"
    val files = Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
    val specs = Seq(
      ("sel_a", files.take(2)), ("sel_b", files.slice(2, 3)),
      ("sel_c", files.drop(2)))
    val built = specs.map { case (name, fs) =>
      val p = IndexStore.indexPath(ns, name)
      IndexStore.ensure(p) { NgramIndex.build(s, fs, "text", p) }
      (p, fs.toSet)
    }
    val picks = selectIndexes(files.toSet, built)
    require(picks.size == 2, s"greedy cover should pick 2 indexes, got $picks")
    picks
  }

  def entries: Map[String, Q] = Map(
    // greedy max-coverage index selection feeding a real search: the
    // chosen cover (A ∪ C, B redundant) must answer like a full scan
    "index_selection_search" -> Q((s, dir) => {
      val picks = ensureSelectable(s, dir)
      graft.api.NgramKind.searchLake(s, picks, Seq.empty, "text",
          IndexQueries.QueryStr, 100000)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, s"SELECT doc_id FROM documents WHERE contains(lower(text), '${IndexQueries.QueryStr}') ORDER BY doc_id"),

    // search through the compacted index: must equal the full scan
    "compaction_search" -> Q((s, dir) => {
      val p = ensureCompacted(s, dir)
      NgramIndex.search(s, p, "text", IndexQueries.QueryStr)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, s"SELECT doc_id FROM documents WHERE contains(lower(text), '${IndexQueries.QueryStr}') ORDER BY doc_id"),

    // post-vacuum metadata: exactly one live index covering all 4 files
    "maintenance_metadata" -> Q((s, dir) => {
      ensureCompacted(s, dir)
      IndexStore.readMetadata(s, maintNs(dir)).get
        .select(col("index_type"), size(col("file_path")).as("n_files"),
          col("rows_indexed"))
    }, "SELECT 'ngram' AS index_type, 4 AS n_files, count(*) AS rows_indexed FROM documents")
  )
}
