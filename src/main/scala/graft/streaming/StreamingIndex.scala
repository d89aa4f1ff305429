package graft.streaming

import graft.Q
import graft.core.{IndexStore, Lake, Layout}
import graft.index.NgramIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming index maintenance: Structured Streaming's file source
  * discovers newly landed lake files and each micro-batch builds a
  * substring index over exactly the new files — the streaming twin of
  * the reference's incremental `index_parquet_lake` (which indexes the
  * files metadata doesn't cover yet, reference:
  * python/rottnest/backends/parquet.py `index_parquet_lake`). At 100 TB
  * this is the continuous-ingest shape: checkpointed file discovery,
  * one bounded index build per trigger, never a full-lake rebuild;
  * compaction later folds the per-batch indexes (ops.Maintenance).
  *
  * Search unions the per-batch index probes in one plan — results must
  * equal a brute-force scan no matter how the file→batch assignment
  * fell out, because every file lands in exactly one batch and the
  * refine is exact.
  */
object StreamingIndex {

  val Column = "text"
  val BatchFiles = 2

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Run the indexing stream to completion (Trigger.AvailableNow) if it
    * has not run yet; returns the per-batch index paths.
    */
  def ensureStreamIndexes(spark: SparkSession, dir: String): Seq[String] = {
    Lake.ensureSplit(spark, dir, "documents", "doc_id", 4)
    val prefix = s"${Lake.lakeRoot}/${IndexStore.lakeId(dir)}/documents"
    val root = IndexStore.indexPath(dir, "ngram_stream")
    IndexStore.ensure(root) {
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", BatchFiles)
        .parquet(prefix)
        .select(col("_metadata.file_path").as("f"))
      val q = stream.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ckpt")
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          val newFiles = batch.distinct().collect()
            .map(r => Layout.canonPath(r.getString(0))).toSeq.sorted
          if (newFiles.nonEmpty)
            NgramIndex.build(spark, newFiles, Column, s"$root/b$id")
        }
        .start()
      q.awaitTermination()
    }
    val dirs = new java.io.File(root).listFiles()
    dirs.filter(f => f.isDirectory && f.getName.startsWith("b"))
      .map(_.getAbsolutePath).sorted.toSeq
  }

  /** One-plan union of the per-batch index searches. */
  def search(spark: SparkSession, dir: String, query: String): DataFrame =
    ensureStreamIndexes(spark, dir)
      .map(p => NgramIndex.search(spark, p, Column, query).select("doc_id"))
      .reduce((a, b) => a.unionByName(b))

  def entries: Map[String, Q] = Map(
    // stream-built indexes answer exactly like a batch scan
    "streaming_index_search" -> Q((s, dir) =>
      search(s, dir, graft.ops.IndexQueries.QueryStr).orderBy("doc_id"),
      s"SELECT doc_id FROM documents WHERE contains(lower(text), '${graft.ops.IndexQueries.QueryStr}') ORDER BY doc_id")
  )
}
