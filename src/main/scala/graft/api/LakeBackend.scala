package graft.api

import graft.core.{DeltaLog, IcebergLog, Lake, Layout}
import org.apache.spark.sql.SparkSession

/** Where a lake's data files come from. The reference ships plain
  * parquet-prefix, Delta, and Iceberg backends behind one API surface
  * (reference: python/rottnest/backends/{parquet,delta,iceberg}.py);
  * the facade is parameterized the same way. A backend answers one
  * question — the live data files, optionally at a historical
  * snapshot — and everything else (coverage anti-diff, bin-packing,
  * commit, compaction, vacuum) is shared.
  */
trait LakeBackend {

  /** Stable identifier keying this lake's index-store namespace. */
  def id: String

  /** Live data files (canonical absolute paths) at the current version. */
  def files: Seq[String]

  /** Live data files at `snapshot` (None = current). Backends without
    * versions reject time travel.
    */
  def filesAt(snapshot: Option[Long]): Seq[String]

  /** Whether old files can disappear from the live set (table formats
    * with remove actions). Append-only backends skip hit-set filtering.
    */
  def canRemove: Boolean

  /** ANY data file this lake has ever referenced, for deriving the
    * table schema when the live set is empty (an empty-at-snapshot
    * search must still answer with typed columns). Versioned backends
    * look beyond the current version: removes are logical, the parquet
    * objects remain until a data vacuum.
    */
  def schemaFile: Option[String] = files.headOption
}

/** Append-only directory of immutable parquet files
  * (reference: backends/parquet.py:57-63). `ns` optionally overrides
  * the index-store namespace so several logical lakes (with separate
  * index coverage) can point at the same physical files.
  */
case class PrefixBackend(prefix: String, ns: Option[String] = None)
    extends LakeBackend {
  def id: String = ns.getOrElse(prefix)
  def files: Seq[String] = Lake.listFiles(prefix).map(Layout.canonPath)
  def filesAt(snapshot: Option[Long]): Seq[String] = {
    require(snapshot.isEmpty, "plain-parquet lakes have no snapshots")
    files
  }
  def canRemove: Boolean = false
}

/** Delta-protocol table: live files come from transaction-log replay
  * (checkpoint + JSON tail), snapshots from replay-to-version — the
  * `DeltaTable.file_uris()` / `load_as_version` calls of the
  * reference's Delta backend (reference: backends/delta.py:25-38,
  * 63-72) re-expressed over [[graft.core.DeltaLog]].
  */
case class DeltaBackend(spark: SparkSession, table: String) extends LakeBackend {
  def id: String = Layout.canonPath(table)
  def files: Seq[String] = DeltaLog.liveFiles(spark, table, None)
  def filesAt(snapshot: Option[Long]): Seq[String] =
    DeltaLog.liveFiles(spark, table, snapshot)
  def canRemove: Boolean = true
  // a fully emptied table still has files at earlier versions
  override def schemaFile: Option[String] =
    files.headOption.orElse(
      DeltaLog.versions(table).sorted.reverse.iterator
        .map(v => DeltaLog.liveFiles(spark, table, Some(v)))
        .collectFirst { case fs if fs.nonEmpty => fs.head })
}

/** Iceberg table: live files from the snapshot's manifest tree, time
  * travel by snapshot id, delete-file tables rejected — the reference's
  * Iceberg-first backend (reference: backends/iceberg.py:109-137,
  * 278-305) re-expressed over [[graft.core.IcebergLog]].
  */
case class IcebergBackend(table: String) extends LakeBackend {
  def id: String = Layout.canonPath(table)
  def files: Seq[String] = IcebergLog.liveFiles(table, None)
  def filesAt(snapshot: Option[Long]): Seq[String] =
    IcebergLog.liveFiles(table, snapshot)
  def canRemove: Boolean = true
  // a fully emptied table still has files at earlier snapshots
  override def schemaFile: Option[String] =
    files.headOption.orElse(
      IcebergLog.snapshotsWithTimes(table).sortBy(-_._2).iterator
        .map { case (id, _) => IcebergLog.liveFiles(table, Some(id)) }
        .collectFirst { case fs if fs.nonEmpty => fs.head })
}
