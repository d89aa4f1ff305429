package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Conditional-write (put-if-absent) commit protocol for the index
  * metadata table — the object-store twin of [[IndexStore]]'s
  * two-rename swap, and the protocol [[IndexStore]] dispatches to
  * whenever the index root lives on a non-local scheme.
  *
  * The rename swap assumes atomic rename, which local filesystems and
  * HDFS provide but raw object stores do not (renames there are
  * copy+delete; a crash mid-"rename" loses the table, and two racing
  * committers can interleave their copies). The reference sidesteps
  * this with a single-object PUT of the whole (small) metadata table
  * (backends/s3_utils.py:83-109); this protocol keeps that
  * single-object shape AND adds multi-writer safety via the one
  * primitive modern object stores make atomic: create-if-absent
  * (`PUT If-None-Match: *`, surfaced through Hadoop as
  * `FileSystem.create(path, overwrite = false)`).
  *
  * Layout: `<dir>/_metadata_caslog/{N}.manifest`, each a COMPLETE
  * NDJSON snapshot of the table, written exactly once and never
  * renamed or rewritten. Commit = read latest N, merge, attempt to
  * create `{N+1}.manifest`; exactly one racer's create succeeds, the
  * loser re-reads (now seeing the winner's rows) and retries at N+2 —
  * optimistic concurrency with no lock service and no rename anywhere
  * on the commit path. Manifests are immutable once visible, so reads
  * cache by path with no mtime protocol at all.
  *
  * The table is metadata-scale (one row per index file), so snapshot
  * manifests stay tiny; a vacuum may delete manifests `< N-k` at
  * leisure — readers only ever resolve the max.
  */
object CasMetadata {

  private val mapper = new ObjectMapper()

  /** One full-fidelity metadata row — the complete 8-column schema of
    * [[IndexStore.metadataRows]], so a CAS-backed table round-trips
    * losslessly through [[IndexStore.readMetadata]].
    */
  case class FullRow(table: String, column: String, files: Seq[String],
      recordCounts: Seq[Long], indexFile: String, indexType: String,
      rowsIndexed: Long, indexTimestamp: Long) {
    def toMetaRow: IndexStore.MetaRow =
      IndexStore.MetaRow(table, column, files, indexFile, indexType)
  }

  def logDir(dir: String): String = s"$dir/_metadata_caslog"

  private def manifestPath(dir: String, v: Long): String =
    f"${logDir(dir)}/$v%020d.manifest"

  // scheme-dispatched like every log protocol (the commit path has no
  // SparkSession of its own; Fs.forPath resolves via the active
  // session's conf when one exists)
  private def fs(p: String) = Fs.forPath(p)

  /** Largest committed version, if any (one LIST). */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val names = Fs.childNames(spark, logDir(dir))
    val vs = names.filter(_.endsWith(".manifest")).map(_.take(20).toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  // manifests are immutable, so caching needs no mtime protocol: keep
  // the LATEST (manifest path, rows) per dir — a manifest-path key
  // would strand one dead entry per commit, unbounded under streaming
  // maintenance (the metaRowCache discipline)
  private val latestCache = scala.collection.concurrent.TrieMap
    .empty[String, (String, Seq[FullRow])]

  /** Rows of the latest committed snapshot (empty before the first
    * commit).
    */
  def read(spark: SparkSession, dir: String): Seq[FullRow] =
    latestVersion(spark, dir) match {
      case None => Seq.empty
      case Some(v) => readVersion(spark, dir, v)
    }

  private def readVersion(spark: SparkSession, dir: String,
      v: Long): Seq[FullRow] = {
    val mp = manifestPath(dir, v)
    latestCache.get(dir) match {
      case Some((p, rows)) if p == mp => rows
      case _ =>
        val rows = readManifest(spark, mp)
        latestCache.put(dir, (mp, rows))
        rows
    }
  }

  private def readManifest(spark: SparkSession,
      path: String): Seq[FullRow] = {
    val f = fs(path)
    val in = f.open(new HPath(path))
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8")
      finally in.close()
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    // integrity trailer: the last line of every manifest this protocol
    // writes records the row count. [[Fs.createIfAbsent]] already makes
    // manifests land atomically with their content, so a MISMATCHED
    // trailer means real corruption (a truncated upload, an out-of-band
    // writer) — and because manifests are cached forever as immutable,
    // a torn read silently served as the table would drop every row on
    // the next merge. Fail loudly on mismatch; a manifest with NO
    // trailer is a legacy snapshot written before the trailer existed
    // and stays readable (its atomicity was already guaranteed by the
    // create-if-absent landing) — refusing it would brick an existing
    // lake's metadata on upgrade.
    // trailer detection must PARSE the last line and check the field is
    // actually present — a substring test would misread a legacy DATA
    // row whose value happens to be "__rows__" as the trailer and brick
    // the table (null field → NPE, or a bogus count → spurious torn
    // error)
    val trailerCount: Option[Long] =
      if (lines.isEmpty) None
      else try {
        val n = mapper.readTree(lines.last)
        if (n != null && n.isObject && n.has("__rows__"))
          Some(n.get("__rows__").asLong())
        else None
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => None
      }
    val body =
      if (trailerCount.isDefined) {
        val declared = trailerCount.get
        val b = lines.dropRight(1)
        require(b.size == declared,
          s"torn CAS manifest $path: trailer declares $declared rows, " +
            s"found ${b.size}")
        b
      } else lines
    body.map { line =>
      // a body line that fails to parse (or misses fields) is the
      // no-trailer corruption signature — report it as torn, never as
      // a bare JSON error the caller might swallow
      val n =
        try mapper.readTree(line)
        catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            throw new IllegalArgumentException(
              s"torn CAS manifest $path: unparseable row", e)
        }
      def field(name: String): com.fasterxml.jackson.databind.JsonNode = {
        val v = n.get(name)
        require(v != null, s"torn CAS manifest $path: row missing '$name'")
        v
      }
      FullRow(
        field("table_name").asText(),
        field("column_name").asText(),
        field("file_path").elements().asScala.map(_.asText()).toSeq,
        field("record_counts").elements().asScala.map(_.asLong()).toSeq,
        field("index_file").asText(),
        field("index_type").asText(),
        field("rows_indexed").asLong(),
        field("index_timestamp").asLong())
    }.toSeq
  }

  private def render(rows: Seq[FullRow]): String = {
    val sb = new StringBuilder
    rows.foreach { r =>
      val n: ObjectNode = mapper.createObjectNode()
      n.put("table_name", r.table)
      n.put("column_name", r.column)
      val fp = n.putArray("file_path")
      r.files.foreach(fp.add)
      val rc = n.putArray("record_counts")
      r.recordCounts.foreach(rc.add)
      n.put("index_file", r.indexFile)
      n.put("index_type", r.indexType)
      n.put("rows_indexed", r.rowsIndexed)
      n.put("index_timestamp", r.indexTimestamp)
      sb.append(mapper.writeValueAsString(n)).append('\n')
    }
    // integrity trailer (see readManifest): row count as the last line
    sb.append(s"""{"__rows__":${rows.size}}""").append('\n')
    sb.toString
  }

  /** Claim version `v` with `payload` via create-if-absent
    * ([[Fs.createIfAbsent]]). True iff THIS caller created the
    * manifest — the whole protocol's atomicity rests on that one
    * primitive.
    */
  private[graft] def tryClaim(spark: SparkSession, dir: String, v: Long,
      payload: String): Boolean =
    Fs.createIfAbsent(manifestPath(dir, v), payload.getBytes("UTF-8"))

  /** Merge `rows` into the table (replacing rows with the same
    * index_file — the same idempotent-rebuild semantics as
    * [[IndexStore.commitMetadata]]) and commit optimistically. Returns
    * the committed version. Losing a race re-reads and retries —
    * BOTH writers' rows land, in two consecutive versions.
    */
  def commit(spark: SparkSession, dir: String,
      rows: Seq[FullRow], maxAttempts: Int = 20): Long = {
    val newKeys = rows.map(_.indexFile).toSet
    var attempt = 0
    while (attempt < maxAttempts) {
      // resolve the base version ONCE and claim base+1: if a racer
      // commits between the resolve and the claim, the claim FAILS and
      // we retry — resolving twice could claim a version the merge was
      // never based on and silently drop the racer's rows
      val latest = latestVersion(spark, dir)
      val base = latest.map(readVersion(spark, dir, _)).getOrElse(Seq.empty)
      val merged = base.filterNot(r => newKeys.contains(r.indexFile)) ++ rows
      val v = latest.getOrElse(0L) + 1
      if (tryClaim(spark, dir, v, render(merged))) return v
      attempt += 1
    }
    throw new IllegalStateException(
      s"CAS metadata commit on $dir lost $maxAttempts straight races")
  }

  /** Delete manifests older than the newest `keep` (readers only ever
    * resolve the max, so any trailing window is safe to drop; `keep ≥
    * 1` always retains the live snapshot). Returns the deleted count.
    */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 3): Int = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val all = Fs.childNames(spark, logDir(dir))
    val names = all.filter(_.endsWith(".manifest")).toSeq.sorted
    val stale = names.dropRight(keep)
    // also sweep staging leftovers of CRASHED committers (hidden
    // `.N.manifest.<uuid>.tmp` siblings on staged-rename schemes) —
    // never published, so no reader holds them. Age-gated: a tmp
    // younger than the horizon may belong to a commit in flight RIGHT
    // NOW (write → rename is not atomic as a pair), and deleting it
    // would fail a commit that lost no race. An hour dwarfs any real
    // write-to-rename window; crashed leftovers are swept on the next
    // vacuum after they age past it.
    val horizon = System.currentTimeMillis() - OrphanTmpMinAgeMs
    val orphans = all.filter(n => n.startsWith(".") && n.endsWith(".tmp"))
      .filter { n =>
        val p = new HPath(s"${logDir(dir)}/$n")
        try fs(p.toString).getFileStatus(p).getModificationTime < horizon
        catch { case _: java.io.FileNotFoundException => false }
      }
    (stale ++ orphans).foreach { n =>
      val p = new HPath(s"${logDir(dir)}/$n")
      fs(p.toString).delete(p, false)
    }
    stale.size
  }

  /** Minimum age before [[vacuum]] treats a hidden staging file as a
    * crashed committer's orphan rather than a commit in flight.
    */
  private[graft] val OrphanTmpMinAgeMs = 60L * 60 * 1000

  /** Drop rows whose index_file is in `indexFiles` (the delete half of
    * compaction's append-then-delete), same optimistic loop.
    */
  def deleteRows(spark: SparkSession, dir: String,
      indexFiles: Seq[String], maxAttempts: Int = 20): Long = {
    val gone = indexFiles.toSet
    var attempt = 0
    while (attempt < maxAttempts) {
      val latest = latestVersion(spark, dir)
      val base = latest.map(readVersion(spark, dir, _)).getOrElse(Seq.empty)
      val kept = base.filterNot(r => gone.contains(r.indexFile))
      val v = latest.getOrElse(0L) + 1
      if (tryClaim(spark, dir, v, render(kept))) return v
      attempt += 1
    }
    throw new IllegalStateException(
      s"CAS metadata delete on $dir lost $maxAttempts straight races")
  }
}
