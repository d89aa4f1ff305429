package graft.ops

import java.nio.file.{Files, Paths}
import graft.Q
import graft.api.{DeltaBackend, GraftLake, NgramKind}
import graft.core.{DeltaLog, IndexStore, Lake}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-protocol lake-backend lifecycle entries.
  *
  * A documents table is committed through the transaction log with a
  * history that exercises every replay path (reference:
  * backends/delta.py — index over `DeltaTable.file_uris()`, search at
  * `load_as_version` snapshots):
  *
  *  - v0 adds the doc_id%4∈{0,1} partitions PLUS a junk file whose rows
  *    MATCH the query (negative doc_ids) — if remove-replay ever broke,
  *    junk rows would surface at the latest version and fail the oracle;
  *  - v1 removes the junk file and adds the doc_id%4∈{2,3} partitions;
  *  - a parquet checkpoint is cut at v1, so the latest-version read goes
  *    through the checkpoint path, and the v0 read through JSON replay.
  */
object DeltaQueries {

  private val Query = IndexQueries.QueryStr // "merge merge"

  def ensureDeltaDocs(s: SparkSession, dir: String): String = {
    val table = Lake.splitPath(dir, "delta_documents")
    IndexStore.synchronized {
      if (!Files.exists(Paths.get(table, "_delta_log"))) {
        Files.createDirectories(Paths.get(table))
        val docs = graft.Tables.load(s, dir, "documents")
        def part(name: String, df: DataFrame): DeltaLog.Add = {
          val stage = s"$table/_stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stage)
          Files.move(Paths.get(Lake.listFiles(stage).head),
            Paths.get(s"$table/$name"))
          IndexStore.deleteRec(Paths.get(stage))
          DeltaLog.Add(name, Files.size(Paths.get(s"$table/$name")))
        }
        // all four mod-partitions in ONE write job (partitionBy splits
        // them; the partition column is dropped from the files, so the
        // data schema stays identical to `documents`)
        val stage = s"$table/_stage_mods"
        docs.coalesce(1).withColumn("__m", pmod(col("doc_id"), lit(4)))
          .write.mode("overwrite").partitionBy("__m").parquet(stage)
        def mv(m: Int): DeltaLog.Add = {
          val name = s"part-m$m.parquet"
          Files.move(Paths.get(Lake.listFiles(s"$stage/__m=$m").head),
            Paths.get(s"$table/$name"))
          DeltaLog.Add(name, Files.size(Paths.get(s"$table/$name")))
        }
        val adds0 = (0 to 1).map(mv)
        // junk rows deliberately match the query: surviving a remove
        // would be caught by the latest-version oracle
        val junk = part("junk.parquet",
          docs.orderBy(col("doc_id")).limit(5)
            .withColumn("doc_id", -col("doc_id") - 1)
            .withColumn("text", lit(s"xx $Query yy")))
        DeltaLog.commit(table, 0, adds0 :+ junk)
        val adds1 = (2 to 3).map(mv)
        IndexStore.deleteRec(Paths.get(stage))
        DeltaLog.commit(table, 1, adds1, removes = Seq("junk.parquet"))
        DeltaLog.checkpoint(s, table, 1L)
      }
    }
    table
  }

  private def lake(s: SparkSession, dir: String): GraftLake =
    GraftLake(s, DeltaBackend(s, ensureDeltaDocs(s, dir)))

  def entries: Map[String, Q] = Map(
    // latest version: checkpoint read; the removed junk file must be
    // gone even though its rows match the query
    "delta_lake_search" -> Q((s, dir) => {
      val l = lake(s, dir)
      l.index(NgramKind, "text")
      l.search(NgramKind, "text", Query, 100000, Seq("doc_id"))
        .select(col("doc_id"))
    }, s"SELECT doc_id FROM documents WHERE contains(lower(text), '$Query') ORDER BY doc_id"),

    // snapshot 0: JSON replay; only the %4∈{0,1} partitions and the
    // junk file were live — index hits from later files are filtered
    // out, the then-live junk file is probed in-situ
    // change data feed v0 -> v1 from the snapshot file-set diff: the
    // junk file's rows surface as deletes, the %4∈{2,3} partitions as
    // inserts — and ONLY the changed files are read (CDF cost tracks
    // the delta, not the table)
    "delta_cdf" -> Q((s, dir) => {
      val table = ensureDeltaDocs(s, dir)
      DeltaLog.changes(s, table, 0L, 1L)
        .select(col("doc_id"), col("_change_type"))
        .orderBy(col("_change_type"), col("doc_id"))
    }, s"""SELECT doc_id, _change_type FROM (
          |  SELECT doc_id, 'insert' AS _change_type FROM documents
          |  WHERE doc_id % 4 IN (2, 3)
          |  UNION ALL
          |  SELECT -doc_id - 1, 'delete' FROM
          |    (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5)
          |) ORDER BY _change_type, doc_id""".stripMargin),

    "delta_time_travel" -> Q((s, dir) => {
      val l = lake(s, dir)
      l.index(NgramKind, "text")
      l.search(NgramKind, "text", Query, 100000, Seq("doc_id"),
          snapshot = Some(0L))
        .select(col("doc_id"))
    }, s"""SELECT doc_id FROM (
          |  SELECT doc_id FROM documents
          |  WHERE doc_id % 4 IN (0, 1) AND contains(lower(text), '$Query')
          |  UNION ALL
          |  SELECT -doc_id - 1 FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5)
          |) ORDER BY doc_id""".stripMargin)
  )
}
