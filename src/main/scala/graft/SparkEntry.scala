package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator of the engine is exposed as a named query over the
  * driver testdata; `oracleSql` carries the DuckDB-equivalent SQL for the
  * hash-match correctness gate.
  */
object SparkEntry {

  private def registry: Map[String, Q] =
    graft.ops.Relational.entries ++
      graft.ops.TextAnalysis.entries ++
      graft.ops.IndexQueries.entries ++
      graft.ops.SearchQueries.entries ++
      graft.ops.Dedup.entries ++
      graft.ops.Similarity.entries ++
      graft.ops.BinaryQuant.entries ++
      graft.ops.Clustering.entries ++
      graft.ops.Classifier.entries ++
      graft.index.VectorIndex.entries ++
      graft.index.VamanaIndex.entries ++
      graft.index.LogCloudIndex.entries ++
      graft.ops.Maintenance.entries ++
      graft.ops.Advisor.entries ++
      graft.ops.ApiQueries.entries ++
      graft.ops.DeltaQueries.entries ++
      graft.ops.IcebergQueries.entries ++
      graft.ops.Pipeline.entries ++
      graft.ops.Multimodal.entries ++
      graft.ops.LayoutQueries.entries ++
      graft.streaming.EventStream.entries ++
      graft.streaming.StreamingIndex.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The substring index search is the engine's signature
    * lifecycle: lake split → footer layout → index build → pruned
    * probe → selective read → refine.
    */
  def entry(spark: SparkSession): DataFrame =
    registry("substring_search").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
