package graft.ops

import graft.Q
import graft.api.{Bm25Kind, GraftLake, KeyKind}
import graft.core.{IndexStore, Lake}
import graft.index.Bm25Index
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Public-facade lifecycle entries for the non-ngram index kinds: the
  * reference drives every index type through the same lake API
  * (reference: backends/parquet.py `index_parquet_lake(..., index)` /
  * `search_parquet_lake`), so these entries prove bm25 and key indexes
  * run incremental index → multi-index search end-to-end through
  * [[GraftLake]] — including GLOBAL corpus stats across several covering
  * bm25 index files (reference: src/lava/bm25/bm25.rs:477-489).
  */
object ApiQueries {

  private def docLake(s: SparkSession, dir: String): GraftLake = {
    Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
    GraftLake(s, s"${Lake.lakeRoot}/${IndexStore.lakeId(dir)}/documents")
  }

  private def custLake(s: SparkSession, dir: String): GraftLake = {
    Lake.ensureSplit(s, dir, "customer", "c_custkey", 4)
    GraftLake(s, s"${Lake.lakeRoot}/${IndexStore.lakeId(dir)}/customer")
  }

  def entries: Map[String, Q] = Map(
    // bm25 through the facade, binpacked into ONE INDEX PER FILE:
    // ranking must equal a single whole-corpus index (global IDF)
    "lake_api_bm25" -> Q((s, dir) => {
      val lake = docLake(s, dir)
      lake.index(Bm25Kind("doc_id"), "text", binpackRows = 1)
      lake.search(Bm25Kind("doc_id"), "text", SearchQueries.Bm25Query,
        SearchQueries.Bm25K)
    }, Bm25Index.oracleSql("documents", "text", "doc_id",
      SearchQueries.Bm25Query, SearchQueries.Bm25K)),

    // key prefix search through the facade over per-file key indexes
    "lake_api_key" -> Q((s, dir) => {
      val lake = custLake(s, dir)
      lake.index(KeyKind, "c_name", binpackRows = 1)
      lake.search(KeyKind, "c_name", "Customer#00000001%", 100000,
          Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"))
    }, "SELECT c_custkey, c_name FROM customer " +
       "WHERE c_name LIKE 'Customer#00000001%' ORDER BY c_custkey")
  )
}
