package graft.ops

import graft.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 1-bit (sign) quantization of the embedding column + Hamming-distance
  * candidate search with exact cosine rerank.
  *
  * The 100 TB serving story the int8 path cannot reach: a 64-dim float32
  * embedding is 256 bytes; its sign signature is 8 bytes (one long per 64
  * dims) — a 32x reduction, so the ENTIRE candidate-generation structure
  * for a billion vectors fits in ~8 GB of executor memory and the
  * distance kernel is a single XOR+popcount per word (codegen'd
  * `bit_count`, no floating point). The reference reranks PQ/ADC
  * candidates with exact distances the same way
  * (src/lava/vector/vector.rs:172-208 — coarse score, then exact rerank);
  * here the coarse score is Hamming distance on sign bits, the
  * RaBitQ/binary-hashing family's observation that sign agreement of two
  * unit vectors concentrates around their angle.
  *
  * Determinism contract: candidates are the `candidates(n)` lowest
  * (hamming, vec_id) rows — a total order — and the rerank is the same
  * round-6 cosine every exact entry uses, so the result hash-matches a
  * DuckDB oracle computing the identical algorithm (the oracle counts
  * sign mismatches positionally, which IS popcount(xor) of the packed
  * words). `knn_join_binary_recall` gates panel-mean recall@k vs the TRUE
  * neighbors at [[RecallFloor]] (measured 0.87 at sf0.01 and 0.88 at
  * sf0.1 with the n/10 candidate rule).
  */
object BinaryQuant {

  /** Candidate-set size: a tenth of the corpus, floored so small lakes
    * stay exact. Deterministic in n, reproduced verbatim in the oracle.
    */
  val MinCand = 100
  val CandDiv = 10
  val RecallFloor = 0.7

  def candidates(n: Long): Int = math.max(MinCand.toLong, n / CandDiv).toInt

  /** Packed sign bits: bit (i mod 64) of word (i div 64) is set iff
    * v[i] > 0. Bit 63 contributes Long.MinValue — two's-complement sum
    * equals OR because each bit is added at most once.
    *
    * DECLARATIVE SPEC TWIN: the hot paths below run the native
    * [[graft.functions.SignPack]] kernel (one fused codegen pass instead
    * of 64 interpreted when/pow steps per word per row); VecMathSpec
    * pins the two bit-equal. Kept for the spec and as the readable
    * definition.
    */
  def signBits(v: Column): Column =
    transform(sequence(lit(0), ((size(v) + 63) / lit(64)).cast("int") - 1), w =>
      aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
        val idx = w * 64 + b + 1
        val bitVal = when(b === 63, lit(Long.MinValue))
          .otherwise(pow(lit(2.0), b).cast("long")) // 2^b exact in double for b<=62
        acc + when(idx <= size(v) && element_at(v, idx) > 0, bitVal)
          .otherwise(0L)
      }))

  /** Driver-side twin of [[signBits]] for the collected query vector. */
  def packSigns(v: Seq[Double]): Array[Long] = {
    val out = new Array[Long]((v.length + 63) / 64)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0) out(i / 64) |= (1L << (i % 64))
      i += 1
    }
    out
  }

  /** XOR + popcount over the packed words — the whole distance kernel.
    * DECLARATIVE SPEC TWIN of [[graft.functions.HammingDist]] (see
    * [[signBits]]); hot paths run the native kernel.
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Signature table: one (vec_id, word-index, code) row per packed
    * long — the persistable artifact (same row shape as
    * embed_quantize_int8's codes).
    */
  def quantizeBinary(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(graft.GraftExtensions.signPack(s, col("v")))
          .as(Seq("w", "code")))
      .select(col("vec_id"), (col("w") + 1).cast("long").as("i"), col("code"))

  private def quantizeBinarySql: String = {
    val words = (Similarity.VecDim + 63) / 64
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT vec_id, w + 1 AS i,
       |  list_sum([CASE WHEN w*64 + b + 1 <= len(v) AND v[w*64 + b + 1] > 0
       |     THEN CASE WHEN b = 63 THEN (-9223372036854775807 - 1)::BIGINT
       |          ELSE 1::BIGINT << b::INT END
       |     ELSE 0 END for b in generate_series(0, 63)])::BIGINT AS code
       |FROM e CROSS JOIN generate_series(0, ${words - 1}) g(w)""".stripMargin
  }

  /** Single-query top-K: Hamming candidates (TakeOrdered — a distributed
    * top-C, never a global sort), then exact cosine rerank. The scan
    * reads only (vec_id, v); at scale the signature table replaces the
    * full-vector scan for the candidate stage and only C vectors are
    * fetched for rerank (the selective-read discipline every other index
    * kind follows).
    */
  def knnBinary(s: SparkSession, dir: String): DataFrame = {
    val e = Similarity.embeddings(s, dir)
    val q = e.filter(col("vec_id") === Similarity.QueryVecId)
      .select(col("v")).collect()(0).getSeq[Double](0)
    val c = candidates(e.count())
    val cand = e
      .select(col("vec_id"), col("v"),
        graft.GraftExtensions.hammingDist(s,
          graft.GraftExtensions.signPack(s, col("v")),
          typedLit(packSigns(q))).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(c)
    cand.select(col("vec_id"),
      round(graft.GraftExtensions.cosineSim(s, col("v"), typedLit(q)), 6)
        .as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(Similarity.K)
  }

  private def knnBinarySql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = ${Similarity.QueryVecId}),
       |h AS (SELECT vec_id, v, qv,
       |   len([x for x in generate_series(1, len(v)) if (v[x] > 0) <> (qv[x] > 0)]) AS h
       |   FROM e CROSS JOIN q),
       |cand AS (SELECT vec_id, v, qv FROM (
       |   SELECT *, row_number() OVER (ORDER BY h, vec_id) AS rn FROM h) t
       |   WHERE rn <= greatest($MinCand, (SELECT count(*) FROM e) // $CandDiv))
       |SELECT vec_id, round(list_sum([v[x]*qv[x] for x in generate_series(1, len(v))]) /
       |  (sqrt(list_sum([v[x]*v[x] for x in generate_series(1, len(v))])) *
       |   sqrt(list_sum([qv[x]*qv[x] for x in generate_series(1, len(qv))]))), 6) AS cos
       |FROM cand ORDER BY cos DESC, vec_id LIMIT ${Similarity.K}""".stripMargin

  /** Panel KNN join on the Hamming candidate path, for the recall gate:
    * broadcast the [[Similarity.KnnPanelN]] query signatures, per-query
    * top-C by (hamming, j) window, exact cosine rerank to
    * [[Similarity.KnnJoinK]].
    */
  def knnJoinBinaryPanel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Similarity.embeddings(s, dir)
      .select(col("vec_id"), col("v"),
        graft.GraftExtensions.signPack(s, col("v")).as("sig"))
    val panel = e.filter(col("vec_id") < Similarity.KnnPanelN)
      .select(col("vec_id").as("i"), col("v").as("qv"), col("sig").as("qsig"))
    val c = candidates(e.count())
    val wh = Window.partitionBy("i").orderBy(col("h"), col("j"))
    val wc = Window.partitionBy("i").orderBy(col("cos").desc, col("j"))
    broadcast(panel)
      .join(e.select(col("vec_id").as("j"), col("v").as("vb"),
        col("sig").as("sb")), col("i") =!= col("j"))
      .withColumn("h",
        graft.GraftExtensions.hammingDist(s, col("qsig"), col("sb")))
      .withColumn("rn", row_number().over(wh)).filter(col("rn") <= c)
      .withColumn("cos",
        round(graft.GraftExtensions.cosineSim(s, col("qv"), col("vb")), 6))
      .withColumn("rk", row_number().over(wc))
      .filter(col("rk") <= Similarity.KnnJoinK)
      .select(col("i"), col("j"), col("cos"))
  }

  def entries: Map[String, Q] = Map(
    // the persistable 1-bit signature table (32x smaller than float32)
    "embed_quantize_binary" -> Q(
      (s, dir) => quantizeBinary(s, dir), quantizeBinarySql),
    // Hamming candidates + exact rerank, hash-matched end to end
    "similarity_knn_binary" -> Q((s, dir) => knnBinary(s, dir), knnBinarySql),
    // quantitative gate: panel-mean recall@k of the Hamming candidate
    // path vs the exact neighbors must clear the floor
    "knn_join_binary_recall" -> Q((s, dir) =>
      Similarity.panelRecallOk(s, dir, knnJoinBinaryPanel(s, dir), RecallFloor),
      "SELECT true AS recall_ok")
  )
}
