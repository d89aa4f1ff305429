package graft.ops

import java.nio.file.{Files, Paths}
import graft.Q
import graft.api.{GraftLake, IcebergBackend, NgramKind}
import graft.core.{IcebergLog, IndexStore, Lake}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg lake-backend lifecycle entries — the reference is
  * Iceberg-first (reference: backends/iceberg.py:109-239 build,
  * 278-305 search, test/iceberg_test.py:14-64), so the facade must run
  * the same index → search → time-travel flow over a hand-rolled
  * Iceberg table. History mirrors the Delta entries so snapshot
  * replay is exercised symmetrically:
  *
  *  - snapshot 1 appends the doc_id%4∈{0,1} partitions PLUS a junk
  *    file whose rows MATCH the query (negative doc_ids);
  *  - snapshot 2 removes the junk file and appends the %4∈{2,3}
  *    partitions — if manifest carry-forward or DELETED-status replay
  *    broke, junk rows would surface at the current snapshot.
  */
object IcebergQueries {

  private val Query = IndexQueries.QueryStr // "merge merge"

  /** Stage `df` as the single data file `table/data/name` — the one
    * stage-write → move → cleanup implementation both fixture builders
    * share (DeltaQueries.part is the Delta-shaped sibling).
    */
  private def part(s: SparkSession, table: String, name: String,
      df: DataFrame): IcebergLog.DataFile = {
    val stage = s"$table/_stage_$name"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    Files.move(Paths.get(Lake.listFiles(stage).head),
      Paths.get(s"$table/data/$name"))
    IndexStore.deleteRec(Paths.get(stage))
    IcebergLog.DataFile(s"$table/data/$name", df.count(),
      Files.size(Paths.get(s"$table/data/$name")))
  }

  def ensureIcebergDocs(s: SparkSession, dir: String): String = {
    val table = Lake.splitPath(dir, "iceberg_documents")
    IndexStore.synchronized {
      if (!Files.exists(Paths.get(table, "metadata"))) {
        Files.createDirectories(Paths.get(table, "data"))
        val docs = graft.Tables.load(s, dir, "documents")
        def part(name: String, df: DataFrame): IcebergLog.DataFile =
          IcebergQueries.part(s, table, name, df)
        val adds1 = (0 to 1).map(m =>
          part(s"part-m$m.parquet", docs.filter(col("doc_id") % 4 === m)))
        val junk = part("junk.parquet",
          docs.orderBy(col("doc_id")).limit(5)
            .withColumn("doc_id", -col("doc_id") - 1)
            .withColumn("text", lit(s"xx $Query yy")))
        IcebergLog.commit(table, adds1 :+ junk)
        val adds2 = (2 to 3).map(m =>
          part(s"part-m$m.parquet", docs.filter(col("doc_id") % 4 === m)))
        IcebergLog.commit(table, adds2,
          removes = Seq(s"$table/data/junk.parquet"))
      }
    }
    table
  }

  private def lake(s: SparkSession, dir: String): GraftLake =
    GraftLake(s, IcebergBackend(ensureIcebergDocs(s, dir)))

  /** Two-era table for the retention entry: snapshot 1 (committed "40
    * days ago") holds the %4∈{0,1} partitions; snapshot 2 (committed
    * an hour ago) REWRITES the table to the %4∈{2,3} partitions. With
    * a 30-day history window, snapshot 1 and every file it covered are
    * out of retention.
    */
  def ensureAgedDocs(s: SparkSession, dir: String): String = {
    val table = Lake.splitPath(dir, "iceberg_aged_documents")
    IndexStore.synchronized {
      if (!Files.exists(Paths.get(table, "metadata"))) {
        Files.createDirectories(Paths.get(table, "data"))
        val docs = graft.Tables.load(s, dir, "documents")
        def part(name: String, df: DataFrame): IcebergLog.DataFile =
          IcebergQueries.part(s, table, name, df)
        val now = System.currentTimeMillis()
        val day = 24L * 3600 * 1000
        val era1 = (0 to 1).map(m =>
          part(s"part-m$m.parquet", docs.filter(col("doc_id") % 4 === m)))
        IcebergLog.commit(table, era1, timestampMs = now - 40 * day)
        val era2 = (2 to 3).map(m =>
          part(s"part-m$m.parquet", docs.filter(col("doc_id") % 4 === m)))
        IcebergLog.commit(table, era2,
          removes = era1.map(_.path), timestampMs = now - 3600 * 1000)
      }
    }
    table
  }

  def entries: Map[String, Q] = Map(
    // current snapshot: manifest-tree listing; the removed junk file
    // must be gone even though its rows match the query
    "iceberg_lake_search" -> Q((s, dir) => {
      val l = lake(s, dir)
      l.index(NgramKind, "text")
      l.search(NgramKind, "text", Query, 100000, Seq("doc_id"))
        .select(col("doc_id"))
    }, s"SELECT doc_id FROM documents WHERE contains(lower(text), '$Query') ORDER BY doc_id"),

    // retention vacuum over an aged two-era table: the index covering
    // only out-of-history files must lose its metadata row AND its
    // physical dir (reference keep-latest-snapshot + history-days
    // rules, backends/iceberg.py:307-384); the surviving index then
    // answers the current-snapshot search
    "vacuum_retention" -> Q((s, dir) => {
      val table = ensureAgedDocs(s, dir)
      val ns = dir + "#vacuumret"
      val day = 24L * 3600 * 1000
      val oldIdx = IndexStore.indexPath(ns, "ngram_era1")
      val newIdx = IndexStore.indexPath(ns, "ngram_era2")
      def commitIdx(p: String, files: Seq[String]): Unit = {
        graft.index.NgramIndex.build(s, files, "text", p)
        IndexStore.commitMetadata(s, ns, IndexStore.metadataRows(s,
          "documents", "text", files, files.map(_ => -1L), p, "ngram", -1L))
      }
      val era1Files = (0 to 1).map(m => s"$table/data/part-m$m.parquet")
      val era2Files = (2 to 3).map(m => s"$table/data/part-m$m.parquet")
      // the vacuum DELETES era-1's index, so the whole build→vacuum
      // lifecycle runs once behind a marker (re-running `ensure` on the
      // vacuumed dir would rebuild-then-revacuum it every invocation —
      // query time must measure the search, not the fixture)
      IndexStore.ensure(IndexStore.indexPath(ns, "vacuumret_done")) {
        commitIdx(oldIdx, era1Files)
        commitIdx(newIdx, era2Files)
        val survivors =
          Maintenance.vacuumIceberg(s, ns, table, historyMs = 30 * day)
        // retention contract, asserted loudly: era-1's index is gone
        // from both the metadata table and disk; era-2's survives
        require(survivors == Seq(newIdx),
          s"expected only $newIdx to survive, got $survivors")
      }
      require(!Files.exists(Paths.get(oldIdx)),
        "out-of-retention index dir must be physically deleted")
      require(Files.exists(Paths.get(newIdx)),
        "in-retention index dir must survive")
      graft.api.NgramKind.searchLake(s, Seq(newIdx), Seq.empty, "text",
          Query, 100000)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, s"""SELECT doc_id FROM documents
          |WHERE doc_id % 4 IN (2, 3) AND contains(lower(text), '$Query')
          |ORDER BY doc_id""".stripMargin),

    // snapshot 1: only the %4∈{0,1} partitions and the junk file were
    // live — index hits from later files are filtered out, the
    // then-live junk file is probed in-situ
    // incremental read snapshot 1 -> 2 from the manifest file-set
    // diff (the Iceberg twin of delta_cdf): junk rows surface as
    // deletes, the %4∈{2,3} appends as inserts, unchanged files are
    // never scanned
    "iceberg_cdf" -> Q((s, dir) => {
      val table = ensureIcebergDocs(s, dir)
      IcebergLog.changes(s, table, 1L, 2L)
        .select(col("doc_id"), col("_change_type"))
        .orderBy(col("_change_type"), col("doc_id"))
    }, s"""SELECT doc_id, _change_type FROM (
          |  SELECT doc_id, 'insert' AS _change_type FROM documents
          |  WHERE doc_id % 4 IN (2, 3)
          |  UNION ALL
          |  SELECT -doc_id - 1, 'delete' FROM
          |    (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5)
          |) ORDER BY _change_type, doc_id""".stripMargin),

    "iceberg_time_travel" -> Q((s, dir) => {
      val l = lake(s, dir)
      l.index(NgramKind, "text")
      l.search(NgramKind, "text", Query, 100000, Seq("doc_id"),
          snapshot = Some(1L))
        .select(col("doc_id"))
    }, s"""SELECT doc_id FROM (
          |  SELECT doc_id FROM documents
          |  WHERE doc_id % 4 IN (0, 1) AND contains(lower(text), '$Query')
          |  UNION ALL
          |  SELECT -doc_id - 1 FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5)
          |) ORDER BY doc_id""".stripMargin)
  )
}
