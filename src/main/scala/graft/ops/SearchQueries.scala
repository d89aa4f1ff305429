package graft.ops

import graft.Q
import graft.core.{IndexStore, Lake}
import graft.index.{Bm25Index, KeyIndex, TokenIndex}
// merged-index entries build part indexes then compact them
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BM25 full-text search and exact/prefix key search query entries. */
object SearchQueries {

  val Bm25Query = "vector stream dup"
  val Bm25K = 10
  val ExpandedTerms: Seq[(String, Double)] =
    Seq("vector" -> 1.0, "stream" -> 1.0, "dup" -> 1.0,
      "batch" -> 0.25, "spark" -> 0.25)

  private def bm25Idx(s: SparkSession, dir: String): String = {
    val files = Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
    val p = IndexStore.indexPath(dir, "bm25_documents_text")
    IndexStore.ensure(p) {
      Bm25Index.build(s, files, "text", "doc_id", p)
      IndexStore.commitMetadata(s, dir,
        IndexStore.metadataRows(s, "documents", "text", files,
          files.map(_ => -1L), p, "bm25",
          s.read.parquet(s"$p/docstats").count()))
    }
    p
  }

  /** Token-sequence containment oracle (the normalized-form contains). */
  private def tokenOracle(q: String): String =
    s"""SELECT doc_id FROM (
       |  SELECT doc_id, ' ' || array_to_string(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), ' ') || ' ' AS nf
       |  FROM documents) t
       |WHERE contains(nf, ' $q ') ORDER BY doc_id""".stripMargin

  private def keyIdx(s: SparkSession, dir: String): String = {
    val files = Lake.ensureSplit(s, dir, "customer", "c_custkey", 4)
    val p = IndexStore.indexPath(dir, "key_customer_name")
    IndexStore.ensure(p) { KeyIndex.build(s, files, "c_name", p) }
    p
  }

  def entries: Map[String, Q] = Map(
    "bm25_search" -> Q((s, dir) => {
      val p = bm25Idx(s, dir)
      Bm25Index.search(s, p, Bm25Query, Bm25K)
    }, Bm25Index.oracleSql("documents", "text", "doc_id", Bm25Query, Bm25K)),

    // search → selective row-group fetch → scored lake rows (the
    // reference's materialization flow)
    "bm25_search_materialized" -> Q((s, dir) => {
      val p = bm25Idx(s, dir)
      Bm25Index.searchMaterialized(s, p, Bm25Query, Bm25K, "doc_id")
        .select(col("doc_id"), col("n_chars"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
    }, {
      val inner = Bm25Index.oracleSql("documents", "text", "doc_id", Bm25Query, Bm25K)
      s"""WITH topk AS (
         |$inner
         |)
         |SELECT d.doc_id, d.n_chars, t.score
         |FROM topk t JOIN documents d USING (doc_id)
         |ORDER BY t.score DESC, d.doc_id""".stripMargin
    }),

    // weighted expansion terms (the scoring half of reference query
    // expansion; weights stand in for the external model's cosines)
    "bm25_search_expanded" -> Q((s, dir) => {
      val p = bm25Idx(s, dir)
      Bm25Index.searchWeighted(s, p, ExpandedTerms, Bm25K)
    }, Bm25Index.oracleSqlWeighted("documents", "text", "doc_id", ExpandedTerms, Bm25K)),

    // token-mode substring search: token-sequence containment semantics
    "substring_token_search" -> Q((s, dir) => {
      val files = Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
      val p = IndexStore.indexPath(dir, "token_documents_text")
      IndexStore.ensure(p) { TokenIndex.build(s, files, "text", p) }
      TokenIndex.search(s, p, "text", "merge merge")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, tokenOracle("merge merge")),

    // token-index compaction (reference merge mode 1): two half-lake
    // indexes merged must answer exactly like one full index
    "substring_token_search_merged" -> Q((s, dir) => {
      val files = Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
      val a = IndexStore.indexPath(dir, "token_part0")
      val b = IndexStore.indexPath(dir, "token_part1")
      val m = IndexStore.indexPath(dir, "token_merged")
      IndexStore.ensure(m) {
        TokenIndex.build(s, files.take(2), "text", a)
        TokenIndex.build(s, files.drop(2), "text", b)
        TokenIndex.merge(s, a, b, m)
      }
      TokenIndex.search(s, m, "text", "merge merge")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, tokenOracle("merge merge")),

    // token-mode BWT: the REAL token-alphabet FM machinery (10-token
    // suffix windows, backward search over tokens) — same oracle as
    // the posting-based token index, so the two encodings are pinned
    // to identical semantics
    "substring_token_search_bwt" -> Q((s, dir) => {
      val files = Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
      val p = IndexStore.indexPath(dir, "tokenfm_documents_text")
      IndexStore.ensure(p) { graft.index.TokenFmIndex.build(s, files, "text", p) }
      graft.index.TokenFmIndex.search(s, p, "text", "merge merge")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, tokenOracle("merge merge")),

    // single-token query prunes via the unigram postings (short-query
    // discipline, no covered-files scan)
    "substring_token_search_single" -> Q((s, dir) => {
      val files = Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
      val p = IndexStore.indexPath(dir, "token_documents_text")
      IndexStore.ensure(p) { TokenIndex.build(s, files, "text", p) }
      TokenIndex.search(s, p, "text", "vector")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, tokenOracle("vector")),

    "key_search" -> Q((s, dir) => {
      val p = keyIdx(s, dir)
      KeyIndex.searchExact(s, p, "c_name", "Customer#000000042")
        .select(col("c_custkey"), col("c_name"))
    }, "SELECT c_custkey, c_name FROM customer WHERE c_name = 'Customer#000000042'"),

    "key_prefix_search" -> Q((s, dir) => {
      val p = keyIdx(s, dir)
      KeyIndex.searchPrefix(s, p, "c_name", "Customer#00000001")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, "SELECT c_custkey, c_name FROM customer WHERE c_name LIKE 'Customer#00000001%' ORDER BY c_custkey"),

    // BM25 compaction: search(merge(a,b)) with query-time IDF over the
    // merged corpus ≡ one index over everything
    "bm25_search_merged" -> Q((s, dir) => {
      val files = Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
      val a = IndexStore.indexPath(dir, "bm25_part0")
      val b = IndexStore.indexPath(dir, "bm25_part1")
      val m = IndexStore.indexPath(dir, "bm25_merged")
      IndexStore.ensure(m) {
        Bm25Index.build(s, files.take(2), "text", "doc_id", a)
        Bm25Index.build(s, files.drop(2), "text", "doc_id", b)
        Bm25Index.merge(s, a, b, m)
      }
      Bm25Index.search(s, m, Bm25Query, Bm25K)
    }, Bm25Index.oracleSql("documents", "text", "doc_id", Bm25Query, Bm25K)),

    // key-index compaction: merged sorted tables answer the same prefix
    "key_search_merged" -> Q((s, dir) => {
      val files = Lake.ensureSplit(s, dir, "customer", "c_custkey", 4)
      val a = IndexStore.indexPath(dir, "key_part0")
      val b = IndexStore.indexPath(dir, "key_part1")
      val m = IndexStore.indexPath(dir, "key_merged")
      IndexStore.ensure(m) {
        KeyIndex.build(s, files.take(2), "c_name", a)
        KeyIndex.build(s, files.drop(2), "c_name", b)
        KeyIndex.merge(s, a, b, m)
      }
      KeyIndex.searchPrefix(s, m, "c_name", "Customer#00000001")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, "SELECT c_custkey, c_name FROM customer WHERE c_name LIKE 'Customer#00000001%' ORDER BY c_custkey")
  )
}
