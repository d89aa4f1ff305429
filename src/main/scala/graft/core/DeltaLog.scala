package graft.core

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native reader/writer of the Delta Lake transaction-log protocol —
  * the table format is an open spec (delta-io PROTOCOL.md): a table is
  * a directory of parquet data files plus `_delta_log/` holding one
  * JSON file per version (`%020d.json`, newline-delimited action
  * objects `add` / `remove` / `metaData` / `protocol` / `commitInfo`)
  * and periodic parquet checkpoints (`%020d.checkpoint.parquet` +
  * `_last_checkpoint`). The reference ships a Delta backend on the same
  * protocol via the `deltalake` package (reference:
  * python/rottnest/backends/delta.py:25-93, `DeltaTable.file_uris()` /
  * `load_as_version`); no Delta jars are available here, so the replay
  * is implemented directly.
  *
  * Scale: JSON deltas are parsed driver-side (they are metadata, one
  * small file per commit), but snapshot state at a checkpoint is read
  * as PARQUET THROUGH SPARK — at 100 TB a table has ~10^6 live files
  * and the checkpoint is the only state that big; replay then applies
  * only the post-checkpoint JSON tail, exactly how production Delta
  * readers bound log-replay cost.
  */
object DeltaLog {

  private val mapper = new ObjectMapper()

  private def logDir(table: String) = s"$table/_delta_log"

  private def commitFile(table: String, v: Long) =
    f"${logDir(table)}/$v%020d.json"

  private def checkpointFile(table: String, v: Long) =
    f"${logDir(table)}/$v%020d.checkpoint.parquet"

  // ---- scheme-dispatched IO ------------------------------------------
  // The log must also work on object stores (the reference's Delta
  // backend rides deltalake's S3 support), so listing/reading/writing
  // route through each path's Hadoop FileSystem, and the commit claim
  // goes through the one shared atomic-with-content put-if-absent
  // primitive ([[Fs.createIfAbsent]]: local hardlink / staged rename /
  // conditional single-object PUT, dispatched per scheme).

  private def hfs(p: String): org.apache.hadoop.fs.FileSystem =
    Fs.forPath(p)

  private def listLogNames(table: String): Seq[String] = {
    val d = new org.apache.hadoop.fs.Path(logDir(table))
    try hfs(logDir(table)).listStatus(d).toSeq.map(_.getPath.getName)
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  private def readLines(path: String): Seq[String] = {
    val in = hfs(path).open(new org.apache.hadoop.fs.Path(path))
    val text =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    text.linesIterator.toSeq
  }

  private def writeObject(path: String, bytes: Array[Byte],
      overwrite: Boolean): Unit = {
    val out = hfs(path).create(
      new org.apache.hadoop.fs.Path(path), overwrite)
    try out.write(bytes) finally out.close()
  }

  /** Sorted JSON commit versions present in the log. */
  def versions(table: String): Seq[Long] =
    listLogNames(table).filter(n => n.endsWith(".json") && n.length == 25)
      .map(_.take(20).toLong).sorted

  def currentVersion(table: String): Long = {
    val vs = versions(table)
    require(vs.nonEmpty, s"not a Delta table (no _delta_log commits): $table")
    vs.max
  }

  private def checkpointVersions(table: String): Seq[Long] =
    listLogNames(table).filter(_.endsWith(".checkpoint.parquet"))
      .map(_.take(20).toLong).sorted

  /** Live data files (absolute paths, sorted) at `asOf` (None = latest):
    * state from the newest checkpoint ≤ asOf, then JSON-delta replay of
    * the tail — adds insert, removes delete (spec: last action per path
    * wins within the replay order).
    */
  def liveFiles(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Seq[String] =
    liveRawPaths(spark, table, asOf).map(resolvePath(table, _)).sorted

  /** The live set in RAW log form — the exact strings add/remove
    * matching uses. [[checkpoint]] stores these verbatim: a
    * re-derived form (decode → relativize → re-encode) would change
    * the string for spec-legal absolute-URI adds, and a later
    * remove's raw string would no longer match the checkpointed add —
    * the removed file would stay live forever.
    */
  private def liveRawPaths(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Seq[String] = {
    val target = asOf.getOrElse(currentVersion(table))
    require(versions(table).contains(target) || checkpointVersions(table).contains(target),
      s"unknown Delta version $target of $table (have ${versions(table)})")
    val cp = checkpointVersions(table).filter(_ <= target).maxOption
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    cp.foreach { v =>
      spark.read.parquet(checkpointFile(table, v))
        .filter(col("add").isNotNull)
        .select(col("add.path")).collect()
        .foreach(r => live += r.getString(0))
    }
    versions(table)
      .filter(v => v > cp.getOrElse(-1L) && v <= target)
      .foreach { v =>
        readLines(commitFile(table, v))
          .filter(_.nonEmpty).foreach { line =>
            val node = mapper.readTree(line)
            if (node.has("add")) live += node.get("add").get("path").asText()
            if (node.has("remove")) live -= node.get("remove").get("path").asText()
          }
      }
    live.toSeq.sorted
  }

  /** Resolve an add/remove path per the spec: paths are stored as
    * percent-encoded relative URIs, and MAY be absolute URIs
    * (spec-legal, e.g. after SHALLOW CLONE) — only relative paths
    * resolve against the table root. Add/remove matching happens on the
    * RAW path string (both sides of a pair use the same form), so only
    * final resolution needs decoding — a data file with a space or '%'
    * in its name is URL-encoded in the log and must not resolve to a
    * nonexistent path.
    */
  private def resolvePath(table: String, p: String): String = {
    val d = decodePath(p)
    if (SchemeRe.matches(d) || d.startsWith("/")) Layout.canonPath(d)
    else Layout.canonPath(s"$table/$d")
  }

  /** Percent-decode a log path. A raw string that is not a valid URI
    * (an unencoded space from a non-conforming writer) is used as-is.
    * Relative paths parse behind a prepended '/' — handing a bare
    * relative path to java.net.URI would misread a ':' in its first
    * segment (a timestamped file name) as a URI scheme and fail the
    * parse, leaving the path encoded.
    */
  // scheme detection for BOTH the double-slash ("file://x") and the
  // single-slash ("file:/x" — Hadoop Path.toUri's common form) URI
  // shapes; a ':' later in a path segment does not match
  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:/.*".r

  private[graft] def decodePath(p: String): String =
    try {
      if (SchemeRe.matches(p)) {
        val u = new java.net.URI(p)
        if (u.getScheme == "file") u.getPath
        else {
          // assemble from the DECODED parts by hand: the multi-arg URI
          // constructor re-encodes the path, which would hand back the
          // still-encoded (nonexistent) name for s3a://bucket/a%20b
          val auth = Option(u.getAuthority).getOrElse("")
          s"${u.getScheme}://$auth${u.getPath}"
        }
      } else if (p.startsWith("/")) new java.net.URI(p).getPath
      else new java.net.URI("/" + p).getPath.substring(1)
    } catch { case _: java.net.URISyntaxException => p }

  /** Percent-encode a path for the log (inverse of [[decodePath]]);
    * preserves '/' and any scheme://authority prefix.
    */
  private[graft] def encodePath(p: String): String =
    try {
      val i = p.indexOf("://")
      if (i >= 0) {
        val rest = p.substring(i + 3)
        val slash = rest.indexOf('/')
        val auth = if (slash >= 0) rest.substring(0, slash) else rest
        val path = if (slash >= 0) rest.substring(slash) else ""
        new java.net.URI(p.substring(0, i), auth, path, null).toASCIIString
      } else if (SchemeRe.matches(p)) {
        // single-slash scheme URI (file:/tmp/x): no authority component
        val c = p.indexOf(':')
        new java.net.URI(p.substring(0, c), null, p.substring(c + 1), null)
          .toASCIIString
      } else if (p.startsWith("/"))
        new java.net.URI(null, null, p, null).getRawPath
      else
        // the multi-arg URI ctor rejects relative paths: encode behind
        // a leading slash, then strip it
        new java.net.URI(null, null, "/" + p, null).getRawPath.substring(1)
    } catch { case _: java.net.URISyntaxException => p }

  // ---- writer --------------------------------------------------------

  /** One file addition: `path` is relative to the table root. */
  case class Add(path: String, size: Long)

  /** Atomically commit `version`: write the NDJSON actions to a temp
    * file and put-if-absent move it into the log (the spec's optimistic
    * concurrency — a lost race throws instead of clobbering).
    */
  def commit(table: String, version: Long, adds: Seq[Add] = Seq.empty,
      removes: Seq[String] = Seq.empty, schemaJson: Option[String] = None): Unit = {
    val sb = new StringBuilder
    def obj(kind: String)(fill: ObjectNode => Unit): Unit = {
      val root = mapper.createObjectNode()
      fill(root.putObject(kind))
      sb.append(mapper.writeValueAsString(root)).append('\n')
    }
    if (version == 0L) {
      obj("protocol") { p =>
        p.put("minReaderVersion", 1); p.put("minWriterVersion", 2)
      }
      obj("metaData") { m =>
        m.put("id", java.util.UUID.nameUUIDFromBytes(
          table.getBytes("UTF-8")).toString)
        m.putObject("format").put("provider", "parquet")
        m.put("schemaString", schemaJson.getOrElse("{}"))
        m.putArray("partitionColumns")
        m.putObject("configuration")
      }
    }
    adds.foreach { a =>
      obj("add") { n =>
        n.put("path", encodePath(a.path))
        n.putObject("partitionValues")
        n.put("size", a.size)
        n.put("modificationTime", 0L)
        n.put("dataChange", true)
      }
    }
    removes.foreach { p =>
      obj("remove") { n =>
        n.put("path", encodePath(p)); n.put("deletionTimestamp", 0L)
        n.put("dataChange", true)
      }
    }
    // put-if-absent of the fully-rendered NDJSON decides the race —
    // atomic WITH content on every scheme (local hardlink, staged
    // rename on stream-visible filesystems, conditional single-object
    // PUT on object stores), so no reader ever resolves a torn commit
    if (!Fs.createIfAbsent(commitFile(table, version),
        sb.toString.getBytes("UTF-8")))
      throw new IllegalStateException(
        s"concurrent Delta commit: version $version of $table already exists")
  }

  /** Row-level change feed between two versions, derived from the
    * snapshot FILE-set diff: rows of files added in (from, to] are
    * inserts, rows of files removed are deletes. Only the changed
    * files are read — change-capture cost is proportional to the delta
    * between the versions, never to table size (the CDF contract that
    * makes incremental downstream pipelines viable at 100 TB). File
    * granularity is exact for append/remove workloads (this engine's
    * commit protocol only appends and removes whole files); a rewrite
    * surfaces as delete+insert of the rewritten rows.
    */
  def changes(spark: SparkSession, table: String, fromVersion: Long,
      toVersion: Long): org.apache.spark.sql.DataFrame = {
    require(fromVersion <= toVersion,
      s"from $fromVersion must be <= to $toVersion")
    val before = liveFiles(spark, table, Some(fromVersion)).toSet
    val after = liveFiles(spark, table, Some(toVersion)).toSet
    val added = (after -- before).toSeq.sorted
    val removed = (before -- after).toSeq.sorted
    def tagged(files: Seq[String], change: String) =
      if (files.isEmpty) None
      else Some(spark.read.parquet(files: _*)
        .withColumn("_change_type", lit(change)))
    val parts = tagged(added, "insert").toSeq ++ tagged(removed, "delete")
    require(parts.nonEmpty || before == after, "unreachable")
    if (parts.isEmpty) {
      // no change between versions: empty frame with the table schema
      val any = after.toSeq.sorted
      require(any.nonEmpty, s"$table is empty at both versions")
      spark.read.parquet(any.head).limit(0)
        .withColumn("_change_type", lit(""))
    } else parts.reduce(_ unionByName _)
  }

  /** Materialize snapshot state at `version` as a parquet checkpoint +
    * `_last_checkpoint` pointer; replay afterwards starts here instead
    * of at version 0. Per the spec a checkpoint carries the table's
    * `protocol` and `metaData` actions (replayed from the log tail ≤
    * version — external Delta readers bootstrap ALL state from the
    * checkpoint) and `partitionValues` inside each add.
    */
  def checkpoint(spark: SparkSession, table: String, version: Long): Unit = {
    import spark.implicits._
    // RAW log-form paths, stored VERBATIM: replay-over-checkpoint
    // matches removes against these same strings (see liveRawPaths)
    val rel = liveRawPaths(spark, table, Some(version))
    // real file sizes where resolvable (readers use add.size for
    // planning); unreachable files record 0
    val sizes = rel.map(resolvePath(table, _)).map(f =>
      try hfs(f).getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
      catch { case _: Exception => 0L })
    // latest metaData/protocol at `version` (last one wins on replay)
    var metaN: Option[com.fasterxml.jackson.databind.JsonNode] = None
    var protoN: Option[com.fasterxml.jackson.databind.JsonNode] = None
    versions(table).filter(_ <= version).foreach { v =>
      readLines(commitFile(table, v))
        .filter(_.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          if (node.has("metaData")) metaN = Some(node.get("metaData"))
          if (node.has("protocol")) protoN = Some(node.get("protocol"))
        }
    }
    require(metaN.nonEmpty && protoN.nonEmpty,
      s"log of $table has no metaData/protocol action ≤ $version")
    val addT = "struct<path:string,partitionValues:map<string,string>,size:bigint,modificationTime:bigint,dataChange:boolean>"
    val remT = "struct<path:string,deletionTimestamp:bigint,dataChange:boolean>"
    val metaT = "struct<id:string,format:struct<provider:string,options:map<string,string>>,schemaString:string,partitionColumns:array<string>,configuration:map<string,string>,createdTime:bigint>"
    val protoT = "struct<minReaderVersion:int,minWriterVersion:int>"
    val addRows = rel.zip(sizes).toDF("p", "sz").selectExpr(
      "named_struct('path', p, 'partitionValues', cast(map() as map<string,string>), 'size', sz, 'modificationTime', 0L, 'dataChange', true) as add",
      s"cast(null as $remT) as remove",
      s"cast(null as $metaT) as metaData",
      s"cast(null as $protoT) as protocol")
    // one action per checkpoint row, per the spec: metaData and
    // protocol each get their own row
    val metaRow = Seq((
      metaN.get.get("id").asText,
      metaN.get.get("schemaString").asText
    )).toDF("id", "ss").selectExpr(
      s"cast(null as $addT) as add",
      s"cast(null as $remT) as remove",
      "named_struct('id', id, 'format', named_struct('provider', 'parquet', 'options', cast(map() as map<string,string>)), 'schemaString', ss, 'partitionColumns', cast(array() as array<string>), 'configuration', cast(map() as map<string,string>), 'createdTime', 0L) as metaData",
      s"cast(null as $protoT) as protocol")
    val protoRow = Seq((
      protoN.get.get("minReaderVersion").asInt,
      protoN.get.get("minWriterVersion").asInt
    )).toDF("r", "w").selectExpr(
      s"cast(null as $addT) as add",
      s"cast(null as $remT) as remove",
      s"cast(null as $metaT) as metaData",
      "named_struct('minReaderVersion', r, 'minWriterVersion', w) as protocol")
    val out = checkpointFile(table, version)
    // stage LOCALLY (Spark's output committer renames its task files,
    // which an object store may not support), then stream the single
    // part to the spec'd name through the TABLE's filesystem — an
    // idempotent overwrite PUT, no rename on the target store
    val stage = Files.createTempDirectory("graft-ckpt").toString
    metaRow.unionByName(protoRow).unionByName(addRows)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Lake.listFiles(stage).head
    val in = Files.newInputStream(Paths.get(part.stripPrefix("file:")))
    val o = hfs(out).create(new org.apache.hadoop.fs.Path(out), true)
    org.apache.hadoop.io.IOUtils.copyBytes(in, o, 65536, true)
    IndexStore.deleteRec(Paths.get(stage))
    // _last_checkpoint.size counts ALL actions in the checkpoint
    // (adds + metaData + protocol)
    writeObject(s"${logDir(table)}/_last_checkpoint",
      s"""{"version":$version,"size":${rel.size + 2}}""".getBytes("UTF-8"),
      overwrite = true)
  }
}
