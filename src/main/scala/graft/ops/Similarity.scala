package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns.
  *
  * Brute-force cosine top-k is the correctness baseline (the reference's
  * exact rerank, reference: python/rottnest/indices/vector_index.py:15-27);
  * the IVF index in graft.index.VectorIndex is the scale path. All dot
  * products are `zip_with` + `aggregate` folds over double arrays —
  * sequential left folds, so the DuckDB `list_sum` oracle computes the
  * identical float result.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  val K = 10
  val QueryVecId = 0
  val DedupTau = 0.4 // synthetic embeddings have no planted near-dups;
                     // 0.4 keeps the pair set non-trivial at every SF

  def embeddings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  /** Exact cosine top-k against the embedding of `QueryVecId`, using
    * the native codegen'd expression (bit-identical to the fold).
    */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("v")).collect()(0).getSeq[Double](0)
    val qc = typedLit(q)
    e.select(col("vec_id"),
      round(graft.GraftExtensions.cosineSim(s, col("v"), qc), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(K)
  }

  val knnSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
       |SELECT vec_id,
       |  round(list_sum([v[i] * qv[i] for i in generate_series(1, len(v))]) /
       |        (sqrt(list_sum([v[i] * v[i] for i in generate_series(1, len(v))])) *
       |         sqrt(list_sum([qv[i] * qv[i] for i in generate_series(1, len(qv))]))), 6) AS cos
       |FROM e CROSS JOIN q
       |ORDER BY cos DESC, vec_id LIMIT $K""".stripMargin

  /** Embedding near-dup pairs, label-blocked (the blocking key stands in
    * for an LSH bucket; at 100 TB the block is an LSH/IVF cell, not a
    * label).
    */
  def embeddingDedup(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val a = e.select(col("label"), col("vec_id").as("i"), col("v").as("va"))
    val b = e.select(col("label"), col("vec_id").as("j"), col("v").as("vb"))
    a.join(b, Seq("label")).filter(col("i") < col("j"))
      .withColumn("cos",
        round(graft.GraftExtensions.cosineSim(s, col("va"), col("vb")), 4))
      .filter(col("cos") >= DedupTau)
      .select(col("i"), col("j"), col("cos"))
  }

  val embeddingDedupSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS i, b.vec_id AS j,
       |  round(list_sum([a.v[i] * b.v[i] for i in generate_series(1, len(a.v))]) /
       |        (sqrt(list_sum([a.v[i] * a.v[i] for i in generate_series(1, len(a.v))])) *
       |         sqrt(list_sum([b.v[i] * b.v[i] for i in generate_series(1, len(b.v))]))), 4) AS cos
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round(list_sum([a.v[i] * b.v[i] for i in generate_series(1, len(a.v))]) /
       |        (sqrt(list_sum([a.v[i] * a.v[i] for i in generate_series(1, len(a.v))])) *
       |         sqrt(list_sum([b.v[i] * b.v[i] for i in generate_series(1, len(b.v))]))), 4) >= $DedupTau""".stripMargin

  def entries: Map[String, Q] = Map(
    "similarity_knn_brute" -> Q((s, dir) => knnBrute(s, dir), knnSql),
    "dedup_embedding" -> Q((s, dir) => embeddingDedup(s, dir), embeddingDedupSql)
  )
}
