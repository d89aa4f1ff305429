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

  def root: String =
    sys.env.getOrElse("GRAFT_INDEX_DIR", "/root/repo/target/graft-idx")

  /** Stable id for a lake directory (used to key cached indexes/lakes). */
  def lakeId(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_")

  def indexPath(dir: String, name: String): String =
    s"$root/${lakeId(dir)}/$name"

  private def marker(path: String) = Paths.get(path, "_GRAFT_DONE")

  def isBuilt(path: String): Boolean = Files.exists(marker(path))

  /** Build-once guard; builds are idempotent per (lake, index name).
    * JVM-level lock keeps concurrent query entries from double-building.
    */
  def ensure(path: String)(build: => Unit): String = synchronized {
    if (!isBuilt(path)) {
      build
      Files.createDirectories(Paths.get(path))
      Files.write(marker(path), Array.emptyByteArray)
    }
    path
  }

  // ---- lake-level index metadata table ------------------------------

  def metadataPath(dir: String): String = s"$root/${lakeId(dir)}/_metadata"

  def readMetadata(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = metadataPath(dir)
    if (Files.exists(Paths.get(p))) Some(spark.read.parquet(p)) else None
  }

  /** One collected metadata row (the table is metadata-sized: one row
    * per index file — the reference keeps the same table driver-side).
    */
  case class MetaRow(table: String, column: String, files: Seq[String],
      indexFile: String, indexType: String)

  private val metaRowCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Seq[MetaRow]]

  /** Collected metadata rows, cached by the table's mtime so repeated
    * facade calls (index → compact → search in one entry) pay ONE job.
    * Staleness on mtime aliasing is correctness-safe: a missed commit
    * only demotes covered files to the in-situ path.
    */
  def metadataRowsCached(spark: SparkSession, dir: String): Seq[MetaRow] = {
    val p = Paths.get(metadataPath(dir))
    if (!Files.exists(p)) return Seq.empty
    val mtime = Files.getLastModifiedTime(p).toMillis
    metaRowCache.getOrElseUpdate((metadataPath(dir), mtime),
      readMetadata(spark, dir).get
        .select("table_name", "column_name", "file_path", "index_file",
          "index_type")
        .collect()
        .map(r => MetaRow(r.getString(0), r.getString(1),
          r.getSeq[String](2).toSeq, r.getString(3), r.getString(4)))
        .toSeq)
  }

  /** Append rows to the metadata table (overwrite-commit of the single
    * metadata object, as in the reference's plain-parquet backend).
    */
  def commitMetadata(spark: SparkSession, dir: String, rows: DataFrame): Unit =
    synchronized {
      val merged = readMetadata(spark, dir) match {
        case Some(old) =>
          // replace rows for the same index_file (idempotent rebuild)
          val newKeys = rows.select("index_file").distinct()
          old.join(newKeys, Seq("index_file"), "left_anti").unionByName(rows)
        case None => rows
      }
      val tmp = metadataPath(dir) + "_tmp"
      merged.coalesce(1).write.mode("overwrite").parquet(tmp)
      val target = Paths.get(metadataPath(dir))
      // atomic swap: write to tmp, move over target
      if (Files.exists(target)) {
        val bak = Paths.get(metadataPath(dir) + "_old")
        deleteRec(bak)
        Files.move(target, bak)
        Files.move(Paths.get(tmp), target)
        deleteRec(bak)
      } else Files.move(Paths.get(tmp), target)
    }

  /** Delete metadata rows whose index_file is in `indexFiles` (second
    * half of the append-then-delete compaction commit,
    * reference: backends/iceberg.py:469-479).
    */
  def deleteMetadata(spark: SparkSession, dir: String, indexFiles: Seq[String]): Unit =
    synchronized {
      readMetadata(spark, dir).foreach { old =>
        val keep = old.filter(!col("index_file").isin(indexFiles: _*))
        val tmp = metadataPath(dir) + "_tmp"
        keep.coalesce(1).write.mode("overwrite").parquet(tmp)
        val target = Paths.get(metadataPath(dir))
        deleteRec(target)
        Files.move(Paths.get(tmp), target)
      }
    }

  def deleteRec(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
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
