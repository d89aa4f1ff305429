package graft.core

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import scala.jdk.CollectionConverters._

/** Native reader/writer of the Apache Iceberg table-metadata protocol —
  * the subset the reference exercises (reference:
  * python/rottnest/backends/iceberg.py:109-137 lists the current
  * snapshot's data files via the manifest tree, `:278-281` rejects
  * tables with delete files, `:278-305` time-travels by snapshot id).
  * Layout per the open spec: `metadata/vN.metadata.json` (+
  * `version-hint.text`), per-snapshot Avro manifest lists
  * (`snap-<id>.avro`) pointing at Avro manifest files whose entries
  * carry `data_file` records. No Iceberg jars exist here, so the
  * metadata JSON is parsed with Jackson and the manifests with the
  * plain Avro core library — all driver-side (the manifest tree is
  * metadata, bounded by file count, the same reason production Iceberg
  * clients read it on the coordinator).
  *
  * Writer simplifications (documented, spec-shaped): each snapshot
  * writes ONE manifest holding the snapshot's full file state
  * (added files status=1/ADDED, carried files status=0/EXISTING —
  * manifest compaction is legal in the spec), partition data and
  * column-level stats are omitted, and snapshot ids are sequential.
  */
object IcebergLog {

  private val mapper = new ObjectMapper()

  case class DataFile(path: String, records: Long, bytes: Long)

  private def metaDir(table: String) = s"$table/metadata"

  private val manifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin)

  private val manifestSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","field-id":134},
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104}
      |]}}]}""".stripMargin)

  // ---- avro helpers ---------------------------------------------------

  // avro over STREAMS, not java.io.File: manifests may live on any
  // Hadoop scheme (object stores included). Manifest files are small
  // (metadata-scale) and read whole, so the sequential DataFileStream
  // replaces the seekable DataFileReader without cost.
  private def writeAvro(path: String, schema: Schema,
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    if (Fs.isLocalPath(path)) w.create(schema, new java.io.File(path))
    else {
      val f = Fs.forPath(path)
      val hp = new org.apache.hadoop.fs.Path(path)
      f.mkdirs(hp.getParent)
      w.create(schema, f.create(hp, true)
        : java.io.OutputStream)
    }
    try rows.foreach(w.append) finally w.close()
  }

  private def readAvro(path: String): Seq[GenericRecord] = {
    if (Fs.isLocalPath(path)) {
      val r = DataFileReader.openReader(new java.io.File(path),
        new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toList finally r.close()
    } else {
      val in = Fs.forPath(path).open(new org.apache.hadoop.fs.Path(path))
      val r = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toList finally { r.close(); }
    }
  }

  // ---- metadata json --------------------------------------------------

  private def hintPath(table: String): String =
    s"${metaDir(table)}/version-hint.text"

  private val VersionRe = """v(\d+)\.metadata\.json""".r

  /** Committed metadata versions, resolved by LISTING the metadata dir
    * — NOT by trusting `version-hint.text`. A claimed
    * `vN.metadata.json` IS a committed snapshot (the claim lands
    * atomically with its content); the hint is written AFTER the claim
    * and a crash between the two must neither pin readers to N-1
    * forever nor wedge every future commit on the already-claimed N.
    * The hint stays purely advisory (the spec calls it a hint), kept
    * for external filesystem-catalog readers.
    */
  private def listVersions(table: String): Seq[Int] =
    Fs.childNamesAny(metaDir(table)).toSeq.collect {
      case VersionRe(n) => n.toInt
    }.sorted

  /** True when `table` has versioned Iceberg metadata — the
    * backend-auto-detection probe ([[graft.api.GraftLake.auto]]).
    */
  def isIcebergTable(table: String): Boolean = listVersions(table).nonEmpty

  private def currentVersion(table: String): Int = {
    val vs = listVersions(table)
    require(vs.nonEmpty,
      s"not an Iceberg table (no versioned metadata): $table")
    vs.max
  }

  private def metadataJson(table: String) =
    metadataJsonAt(table, currentVersion(table))

  private def metadataJsonAt(table: String, version: Int) =
    mapper.readTree(Fs.readString(
      s"${metaDir(table)}/v$version.metadata.json"))

  def snapshots(table: String): Seq[Long] =
    metadataJson(table).get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong()).toList.sorted

  /** (snapshot id, committed-at ms) for every snapshot — the
    * retention input (reference inspects `committed_at` per snapshot,
    * backends/iceberg.py:325-338).
    */
  def snapshotsWithTimes(table: String): Seq[(Long, Long)] =
    metadataJson(table).get("snapshots").elements().asScala
      .map(n => (n.get("snapshot-id").asLong(),
        n.get("timestamp-ms").asLong())).toList.sortBy(_._1)

  def currentSnapshot(table: String): Long =
    metadataJson(table).get("current-snapshot-id").asLong()

  /** Live data files (sorted canonical paths) at `snapshot`
    * (None = current). Tables carrying delete manifests or non-data
    * content files are rejected, like the reference
    * (backends/iceberg.py:278-281 `content==0` filter + error).
    */
  def liveFiles(table: String, snapshot: Option[Long] = None): Seq[String] = {
    val meta = metadataJson(table)
    val target = snapshot.getOrElse(meta.get("current-snapshot-id").asLong())
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == target)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown Iceberg snapshot $target of $table (have ${snapshots(table)})"))
    val manifests = readAvro(snap.get("manifest-list").asText())
    val files = manifests.flatMap { m =>
      require(m.get("content").asInstanceOf[Int] == 0,
        s"Iceberg table $table has delete manifests — unsupported (reference rejects them too)")
      readAvro(m.get("manifest_path").toString).flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        require(df.get("content").asInstanceOf[Int] == 0,
          s"Iceberg table $table has non-data files — unsupported")
        if (status != 2) Some(df.get("file_path").toString) else None
      }
    }
    files.map(Layout.canonPath).sorted
  }

  /** Incremental read between two snapshots: rows of files added in
    * (from, to] tagged `insert`, rows of removed files tagged
    * `delete` — the snapshot file-set diff, reading ONLY changed
    * files (same contract as [[DeltaLog.changes]]; Iceberg's own
    * incremental-scan API works the same way on append/delete
    * histories).
    */
  def changes(spark: org.apache.spark.sql.SparkSession, table: String,
      fromSnapshot: Long, toSnapshot: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromSnapshot <= toSnapshot,
      s"fromSnapshot $fromSnapshot > toSnapshot $toSnapshot of $table — " +
        "reversed arguments would silently swap insert/delete tags")
    val before = liveFiles(table, Some(fromSnapshot)).toSet
    val after = liveFiles(table, Some(toSnapshot)).toSet
    def tagged(files: Set[String], change: String) =
      if (files.isEmpty) None
      else Some(spark.read.parquet(files.toSeq.sorted: _*)
        .withColumn("_change_type", lit(change)))
    val parts = tagged(after -- before, "insert").toSeq ++
      tagged(before -- after, "delete")
    if (parts.isEmpty) {
      val any = after.toSeq.sorted
      require(any.nonEmpty, s"$table is empty at both snapshots")
      spark.read.parquet(any.head).limit(0)
        .withColumn("_change_type", lit(""))
    } else parts.reduce(_ unionByName _)
  }

  // ---- writer ---------------------------------------------------------

  /** Commit a new snapshot: previous live files carry forward (minus
    * `removes`), `adds` join as ADDED entries. Returns the snapshot id.
    * `timestampMs` is the snapshot's committed-at time (overridable so
    * retention tests can age snapshots deterministically).
    */
  def commit(table: String, adds: Seq[DataFile],
      removes: Seq[String] = Seq.empty,
      timestampMs: Long = System.currentTimeMillis()): Long = {
    if (Fs.isLocalPath(table))
      Files.createDirectories(Paths.get(metaDir(table)))
    else Fs.forPath(table).mkdirs(
      new org.apache.hadoop.fs.Path(metaDir(table)))
    // resolve the version ONCE and derive everything from that one
    // metadata read: re-listing inside metadataJson/liveFilesWithCounts
    // would cost 2 extra LISTs per commit and could observe a racer's
    // newer version, building this snapshot on state the claimed
    // version number was never based on
    val versions = listVersions(table)
    val (version, prevLive, prevSnaps) =
      if (versions.nonEmpty) {
        val meta = metadataJsonAt(table, versions.max)
        (versions.max + 1, liveFilesWithCounts(table, meta),
          meta.get("snapshots").elements().asScala.toList)
      } else (1, Seq.empty[DataFile], List.empty[com.fasterxml.jackson.databind.JsonNode])
    val snapId = version.toLong
    // manifest/list names carry a per-attempt uuid (as real Iceberg
    // writers do): two racers computing the same next version would
    // otherwise overwrite each other's m-N.avro BEFORE the metadata
    // claim arbitrates, corrupting the winner's snapshot
    val attemptId = java.util.UUID.randomUUID().toString.take(8)
    val removed = removes.map(Layout.canonPath).toSet
    val carried = prevLive.filterNot(f => removed.contains(Layout.canonPath(f.path)))

    def entry(f: DataFile, status: Int): GenericRecord = {
      val df = new GenericData.Record(manifestSchema.getField("data_file").schema())
      df.put("content", 0)
      df.put("file_path", f.path)
      df.put("file_format", "PARQUET")
      df.put("record_count", f.records)
      df.put("file_size_in_bytes", f.bytes)
      val e = new GenericData.Record(manifestSchema)
      e.put("status", status)
      e.put("snapshot_id", snapId)
      e.put("data_file", df)
      e
    }
    val manifestPath = s"${metaDir(table)}/m-$snapId-$attemptId.avro"
    writeAvro(manifestPath, manifestSchema,
      carried.map(entry(_, 0)) ++ adds.map(entry(_, 1)))
    val ml = new GenericData.Record(manifestListSchema)
    ml.put("manifest_path", manifestPath)
    ml.put("manifest_length",
      if (Fs.isLocalPath(manifestPath)) Files.size(Paths.get(manifestPath))
      else Fs.forPath(manifestPath).getFileStatus(
        new org.apache.hadoop.fs.Path(manifestPath)).getLen)
    ml.put("content", 0)
    ml.put("added_snapshot_id", snapId)
    val listPath = s"${metaDir(table)}/snap-$snapId-$attemptId.avro"
    writeAvro(listPath, manifestListSchema, Seq(ml))

    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid",
      java.util.UUID.nameUUIDFromBytes(table.getBytes("UTF-8")).toString)
    root.put("location", table)
    root.put("current-snapshot-id", snapId)
    val snapArr = root.putArray("snapshots")
    prevSnaps.foreach(s => snapArr.add(s))
    val sn = snapArr.addObject()
    sn.put("snapshot-id", snapId)
    sn.put("timestamp-ms", timestampMs)
    sn.put("manifest-list", listPath)
    sn.putObject("summary").put("operation",
      if (removes.nonEmpty) "overwrite" else "append")
    // optimistic concurrency, like DeltaLog.commit: the versioned
    // metadata file is claimed through the shared atomic-with-content
    // put-if-absent ([[Fs.createIfAbsent]] — hardlink / staged rename /
    // conditional PUT per scheme), so of two racing committers exactly
    // one wins and the loser fails loudly instead of silently
    // clobbering the winner's snapshot (Iceberg catalogs do this with
    // an atomic pointer swap; filesystem tables claim the versioned
    // metadata name)
    val metaJson = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val metaPath = s"${metaDir(table)}/v$version.metadata.json"
    if (!Fs.createIfAbsent(metaPath, metaJson))
      throw new java.nio.file.FileAlreadyExistsException(metaPath)
    // the hint is ADVISORY (version resolution LISTs the metadata dir):
    // a failure here must not fail the already-committed snapshot, and
    // a stale hint wedges nothing
    try Fs.writeBytes(hintPath(table), version.toString.getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    snapId
  }

  /** Current live files WITH their manifest stats (for carry-forward),
    * resolved from an already-read metadata JSON (the commit path reads
    * it exactly once).
    */
  private def liveFilesWithCounts(table: String,
      meta: com.fasterxml.jackson.databind.JsonNode): Seq[DataFile] = {
    val target = meta.get("current-snapshot-id").asLong()
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == target).get
    readAvro(snap.get("manifest-list").asText()).flatMap { m =>
      // same delete-file rejection as liveFiles: carrying a delete
      // manifest forward would rewrite its entries as content-0 data
      // files in the new snapshot, turning delete files into garbage
      // table rows for every subsequent reader
      require(m.get("content").asInstanceOf[Int] == 0,
        s"Iceberg table $table has delete manifests — unsupported (reference rejects them too)")
      readAvro(m.get("manifest_path").toString).flatMap { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        require(df.get("content").asInstanceOf[Int] == 0,
          s"Iceberg table $table has non-data files — unsupported")
        if (e.get("status").asInstanceOf[Int] != 2) {
          Some(DataFile(df.get("file_path").toString,
            df.get("record_count").asInstanceOf[Long],
            df.get("file_size_in_bytes").asInstanceOf[Long]))
        } else None
      }
    }
  }
}
