package graft.streaming

import graft.Q
import graft.api.{IndexKind, NgramKind, TokenKind}
import graft.core.{IndexStore, Lake, Layout}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming index maintenance: Structured Streaming's file source
  * discovers newly landed lake files and each micro-batch builds an
  * index over exactly the new files — the streaming twin of the
  * reference's incremental `index_parquet_lake` (which indexes the
  * files metadata doesn't cover yet, reference:
  * python/rottnest/backends/parquet.py `index_parquet_lake`). At 100 TB
  * this is the continuous-ingest shape: checkpointed file discovery,
  * one bounded index build per trigger, never a full-lake rebuild;
  * compaction later folds the per-batch indexes (ops.Maintenance).
  *
  * Kind-generic: the stream maintains ANY [[IndexKind]] (the build is
  * one `kind.build` per batch) and search goes through the kind's own
  * `searchLake` — ONE plan over every per-batch index with the
  * facade's constant-job discipline, not a per-batch probe union.
  * Results must equal a brute-force scan no matter how the file→batch
  * assignment fell out, because every file lands in exactly one batch
  * and the refine is exact.
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
    * has not run yet; returns the per-batch index paths. Table-generic:
    * the same maintenance loop streams ANY lake table into ANY kind
    * (documents → text kinds, embeddings → ANN kinds).
    */
  def ensureStreamIndexes(spark: SparkSession, dir: String,
      kind: IndexKind = NgramKind, table: String = "documents",
      key: String = "doc_id", column: String = Column,
      schema: StructType = docSchema): Seq[String] = {
    Lake.ensureSplit(spark, dir, table, key, 4)
    val prefix = Lake.splitPath(dir, table)
    val root = IndexStore.indexPath(dir, s"${kind.name}_stream" +
      (if (table == "documents") "" else s"_$table"))
    IndexStore.ensure(root) {
      val stream = spark.readStream.schema(schema)
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
            kind.build(spark, newFiles, column, s"$root/b$id")
        }
        .start()
      q.awaitTermination()
    }
    // list through the root's FileSystem — the index root may carry a
    // non-local scheme (object store), where java.io.File sees nothing
    graft.core.Fs.childStats(spark, root)
      .collect { case (p, true, _)
          if p.split('/').last.startsWith("b") => p }
      .sorted
  }

  /** The kind's one-plan multi-index search over the per-batch indexes. */
  def search(spark: SparkSession, dir: String, query: String,
      kind: IndexKind = NgramKind): DataFrame = {
    val paths = ensureStreamIndexes(spark, dir, kind)
    kind.searchLake(spark, paths, Seq.empty, Column, query, Int.MaxValue)
      .select("doc_id")
  }

  private val QueryStr = graft.ops.IndexQueries.QueryStr

  def entries: Map[String, Q] = Map(
    // stream-built indexes answer exactly like a batch scan
    "streaming_index_search" -> Q((s, dir) =>
      search(s, dir, QueryStr).orderBy("doc_id"),
      s"SELECT doc_id FROM documents WHERE contains(lower(text), '$QueryStr') ORDER BY doc_id"),

    // the same stream maintaining a DIFFERENT kind (token-sequence
    // semantics) — the maintenance loop is kind-generic like the
    // reference's index_parquet_lake(..., index)
    "streaming_index_search_token" -> Q((s, dir) =>
      search(s, dir, QueryStr, TokenKind).orderBy("doc_id"),
      s"""SELECT doc_id FROM (
         |  SELECT doc_id, ' ' || array_to_string(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), ' ') || ' ' AS nf
         |  FROM documents) t
         |WHERE contains(nf, ' $QueryStr ') ORDER BY doc_id""".stripMargin),

    // continuous dedup-at-ingest: the stream maintains per-batch
    // MinHash lookup indexes; a perturbed copy of doc 17 finds its
    // near-duplicate through the multi-index band probe no matter
    // which batch the matching file landed in
    "streaming_index_search_minhash" -> Q((s, dir) => {
      val paths = ensureStreamIndexes(s, dir, graft.api.MinHashKind)
      graft.api.MinHashKind.searchLake(s, paths, Seq.empty, Column,
        graft.ops.Dedup.lookupQueryText(s, dir), Int.MaxValue)
        .select(col("doc_id"), col("jac")).orderBy("doc_id")
    }, graft.ops.Dedup.minhashLookupSql),

    // boolean query MODE over the SAME stream-maintained ngram
    // indexes (kind name "ngram" → shared fixture; BoolNgramKind is a
    // query mode, not a second maintenance loop)
    "streaming_index_search_bool" -> Q((s, dir) =>
      search(s, dir, s""""slow scan" OR "fast scan" AND NOT window""",
        graft.api.BoolNgramKind).orderBy("doc_id"),
      {
        import graft.index.BoolSearch._
        val q = Or(Seq(Term("slow scan"),
          And(Seq(Term("fast scan"), Not(Term("window"))))))
        s"SELECT doc_id FROM documents WHERE ${oraclePredicate("text", q)} ORDER BY doc_id"
      }),

    // continuous typo-tolerant ingest: per-batch fuzzy (SymSpell
    // deletion-neighborhood) indexes; the kind's multi-index probe +
    // levenshtein refine must equal the brute predicate regardless of
    // the file→batch split
    "streaming_index_search_fuzzy" -> Q((s, dir) =>
      search(s, dir, graft.ops.IndexQueries.FuzzyQueryStr,
        graft.api.FuzzyKind).orderBy("doc_id"),
      graft.ops.IndexQueries.fuzzySqlPublic(
        graft.ops.IndexQueries.FuzzyQueryStr)),

    // continuous-ingest ANN: the stream maintains per-batch IVF
    // indexes over the embeddings table; the kind's multi-index
    // searchLake (probe-everything default = exact) must equal the
    // brute-force cosine oracle regardless of the file→batch split
    "streaming_index_search_vector" -> Q((s, dir) => {
      val kind = graft.api.VectorKind("vec_id")
      val embSchema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType)))
      val paths = ensureStreamIndexes(s, dir, kind, "embeddings",
        "vec_id", "embedding", embSchema)
      val q = graft.ops.Similarity.embeddings(s, dir)
        .filter(col("vec_id") === graft.ops.Similarity.QueryVecId)
        .select(col("v")).collect()(0).getSeq[Double](0)
      kind.searchLake(s, paths, Seq.empty, "embedding", q.mkString(","),
        graft.ops.Similarity.K)
        .select(col("vec_id"), col("cos"))
    }, graft.ops.Similarity.knnSql),

    // continuous BI: the stream maintains per-batch grouped-aggregate
    // partials ([[graft.index.AggIndex]]) — cells are mergeable by
    // construction, so the per-batch indexes fold by plain union and
    // the dashboard slice stays current under ingest with no full-lake
    // rebuild; the combined stats must equal the batch GROUP BY no
    // matter how files landed in batches
    "streaming_agg_index" -> Q((s, dir) => {
      Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
      val root = IndexStore.indexPath(dir, "aggindex_stream")
      IndexStore.ensure(root) {
        val stream = s.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", BatchFiles)
          .parquet(Lake.splitPath(dir, "documents"))
          .select(col("_metadata.file_path").as("f"))
        val q = stream.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/_ckpt")
          .foreachBatch { (batch: Dataset[Row], id: Long) =>
            val newFiles = batch.distinct().collect()
              .map(r => Layout.canonPath(r.getString(0))).toSeq.sorted
            if (newFiles.nonEmpty)
              graft.index.AggIndex.build(s, newFiles, Seq("source"),
                Seq("n_chars"), s"$root/b$id")
          }
          .start()
        q.awaitTermination()
      }
      val paths = graft.core.Fs.childStats(s, root)
        .collect { case (p, true, _)
            if p.split('/').last.startsWith("b") => p }
        .sorted
      paths.map(p => graft.index.AggIndex.groupStats(s, p))
        .reduce(_ unionByName _)
        .groupBy(col("key"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("nn")).cast("long").as("nn"),
          sum(col("s")).cast("long").as("sm"),
          min(col("lo")).as("lo"), max(col("hi")).as("hi"))
        .withColumnRenamed("key", "source")
        .orderBy(col("source"))
    },
      """SELECT source, count(*) AS n, count(n_chars) AS nn,
        |  CAST(sum(n_chars) AS BIGINT) AS sm,
        |  min(n_chars) AS lo, max(n_chars) AS hi
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
  )
}
