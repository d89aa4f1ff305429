package graft.ops

import graft.{Q, Tables}
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trainable text classifier for pipeline curation — the fastText /
  * CCNet "quality classifier" stage of LLM data pipelines (train on a
  * labeled seed corpus, score the unlabeled lake), expressed as pure
  * aggregation dataflow so training is itself a distributed Spark job
  * with a DuckDB-reproducible result.
  *
  * Model: multinomial Naive-Bayes-style likelihood-ratio scorer. For
  * token t and class c over the TRAIN split,
  *
  *   rho(t, c) = S * P̂(t | c) / P̂(t)        (Laplace-smoothed)
  *             = (S * (n_tc + 1) * (N + V)) div ((n_t + 1) * (N_c + V))
  *
  * and a document scores `sum_t count(t, d) * rho(t, c)` per class;
  * the prediction is the argmax (ties broken by class name). Per the
  * library's ulp convention (see [[Pipeline.dsirSample]]) the log-sum
  * is linearized to a sum of INTEGER-quantized ratios computed in
  * DECIMAL(38) intermediates — web-scale count products overflow
  * 64-bit — so both engines produce bit-identical scores and the hash
  * oracle is exact. The driver's synthetic text shares one vocabulary
  * across classes, so accuracy here is near-chance by construction;
  * the entries verify the MACHINERY (split, train counts, smoothing,
  * densified rho, scoring join, argmax) end to end.
  *
  * Scale shape (100 TB): train counts are one partial-agg groupBy of
  * the token stream (vocab-bounded output); the rho table is
  * vocab x classes rows built from a broadcast of the class totals;
  * scoring is a shuffle join on token (both sides token-partitioned;
  * rho is the small side and broadcasts when vocab x classes fits)
  * into a (doc, class) groupBy with map-side combine; the argmax is a
  * doc-partitioned window — no global sort, no driver materialization
  * anywhere.
  */
object Classifier {

  /** Ratio quantization scale (same convention as [[Pipeline.DsirS]]). */
  val S = 10000L

  /** Held-out split: doc_id % TestMod == 0 is scored, the rest trains. */
  val TestMod = 5

  val LabelCol = "lang"

  private def toks(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col(LabelCol).as("cls"),
        explode(Text.tokens(col("text"))).as("t"))

  /** Densified quantized likelihood-ratio table: one row per
    * (token, class) in the TRAIN vocabulary, including zero-count
    * pairs (Laplace smoothing needs them; an inner join on observed
    * counts would silently drop the smoothing mass).
    */
  def rhoTable(train: DataFrame): DataFrame = {
    val tc = train.groupBy("t", "cls").agg(count(lit(1)).as("ntc"))
    val cls = train.groupBy("cls").agg(count(lit(1)).as("nc"))
    val voc = train.groupBy("t").agg(count(lit(1)).as("nt"))
    val tot = voc.agg(sum("nt").as("n"), count(lit(1)).as("v"))
    voc.crossJoin(broadcast(cls)) // vocab x classes — classes are tiny
      .join(tc, Seq("t", "cls"), "left").na.fill(0L, Seq("ntc"))
      .crossJoin(broadcast(tot))
      .select(col("t"), col("cls"),
        expr(s"CAST(($S * CAST(ntc + 1 AS DECIMAL(38,0)) * (n + v)) div " +
          "(CAST(nt + 1 AS DECIMAL(38,0)) * (nc + v)) AS BIGINT)").as("rho"))
  }

  /** One-time persisted model for a lake dir — the artifact a
    * production pipeline trains once and scores with many times
    * (here: predict, eval, and the streaming scorer all read it
    * instead of re-running the training aggregation).
    */
  private def ensureModel(s: SparkSession, dir: String): String = {
    val p = graft.core.IndexStore.indexPath(dir, "classifier_nb_model")
    graft.core.IndexStore.ensure(p) {
      rhoTable(toks(s, dir).filter(col("doc_id") % TestMod =!= 0)
          .drop("doc_id"))
        .write.mode("overwrite").parquet(s"$p/rho")
    }
    p
  }

  private[ops] def rhoPersisted(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${ensureModel(s, dir)}/rho")

  /** (doc_id, pred, score) for the held-out split. Documents whose
    * tokens are all outside the train vocabulary produce no score rows
    * and are absent (no evidence, no prediction) — same semantics in
    * the oracle.
    */
  def predict(s: SparkSession, dir: String): DataFrame = {
    val rho = rhoPersisted(s, dir)
    val testCounts = toks(s, dir).filter(col("doc_id") % TestMod === 0)
      .groupBy("doc_id", "t").agg(count(lit(1)).as("ctd"))
    val scores = testCounts.join(rho, Seq("t"))
      .groupBy(col("doc_id"), col("cls").as("pred"))
      .agg(sum(col("ctd") * col("rho")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("pred"))
    scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("pred"), col("score"))
  }

  /** Broadcast-model scoring: trains the rho table batch-side, ships
    * it as a token → per-class-rho MAP literal, and scores `docs` in a
    * single map-only pass (array fold per row, no explode, no shuffle)
    * — the shape a production scorer uses on a STREAM or on executors
    * without re-aggregating (train once, broadcast the model, score
    * anywhere). Semantically identical to [[predict]]: the fold sums
    * rho over token instances, OOV tokens contribute zero, documents
    * with no in-vocabulary token are dropped, argmax ties break toward
    * the lexicographically first class (array_position returns the
    * FIRST maximum and classes are sorted). The model is vocab×classes
    * longs — at 100 TB cap the vocabulary (top-V by train count or
    * feature hashing) before shipping, like any fastText-style model.
    */
  def scoreWithModel(s: SparkSession, dir: String,
      docs: DataFrame): DataFrame = {
    val (mapLit, clsLit, nClasses) = modelLits(s, dir)
    // one fused codegen pass over the token array computes BOTH the
    // matched count and the per-class score sums
    // (graft.functions.NbScorePack — the interpreted filter +
    // aggregate(zip_with) HOF pair it replaces paid per-token
    // per-class boxed eval; the fold twin below stays for the spec pin)
    docs
      .withColumn("tk", Text.tokens(col("text")))
      .withColumn("pk",
        graft.GraftExtensions.nbScorePack(s, col("tk"), mapLit, nClasses))
      .withColumn("matched", element_at(col("pk"), 1))
      .filter(col("matched") > 0)
      .withColumn("sc", slice(col("pk"), 2, nClasses))
      .withColumn("best", array_max(col("sc")))
      .select(col("doc_id"),
        element_at(clsLit,
          array_position(col("sc"), col("best")).cast("int")).as("pred"),
        col("best").as("score"))
  }

  /** The model shipped as literals: token → per-class-rho map (class
    * order = sorted class names), the sorted class-name array, and the
    * class count — shared by the native scorer and its fold twin so the
    * two can never score against different models.
    */
  private def modelLits(s: SparkSession,
      dir: String): (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, Int) = {
    val rho = rhoPersisted(s, dir).collect()
    val classes = rho.map(_.getString(1)).distinct.sorted.toSeq
    val cIdx = classes.zipWithIndex.toMap
    val model: Map[String, Seq[Long]] =
      rho.groupBy(_.getString(0)).map { case (t, rs) =>
        val arr = Array.fill(classes.size)(0L)
        rs.foreach(r => arr(cIdx(r.getString(1))) = r.getLong(2))
        t -> arr.toSeq
      }
    (typedLit(model), typedLit(classes), classes.size)
  }

  /** DECLARATIVE SPEC TWIN of [[scoreWithModel]]: the pre-r13
    * interpreted-HOF form (filter for matched + aggregate(zip_with)
    * fold for scores). ClassifierSpec pins the native path equal to
    * this row-for-row.
    */
  private[graft] def scoreWithModelFold(s: SparkSession, dir: String,
      docs: DataFrame): DataFrame = {
    val (mapLit, clsLit, nClasses) = modelLits(s, dir)
    val zero = array_repeat(lit(0L), nClasses)
    // tokenize ONCE into a column: "matched" and the score fold both
    // consume it, and re-evaluating the regex split per expression
    // would double the per-row cost on this hot scoring path
    val scores = aggregate(col("tk"), zero, (acc, t) =>
      zip_with(acc, coalesce(element_at(mapLit, t), zero), (a, b) => a + b))
    docs
      .withColumn("tk", Text.tokens(col("text")))
      .withColumn("matched",
        size(filter(col("tk"), t => element_at(mapLit, t).isNotNull)))
      .filter(col("matched") > 0)
      .withColumn("sc", scores)
      .withColumn("best", array_max(col("sc")))
      .select(col("doc_id"),
        element_at(clsLit,
          array_position(col("sc"), col("best")).cast("int")).as("pred"),
        col("best").as("score"))
  }

  private val toksSql =
    s"""toks AS (SELECT doc_id, $LabelCol AS cls,
       |  unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
       |FROM documents),
       |train AS (SELECT cls, t FROM toks WHERE doc_id % $TestMod <> 0),
       |tc AS (SELECT t, cls, count(*) AS ntc FROM train GROUP BY 1, 2),
       |cl AS (SELECT cls, count(*) AS nc FROM train GROUP BY 1),
       |voc AS (SELECT t, count(*) AS nt FROM train GROUP BY 1),
       |tot AS (SELECT sum(nt) AS n, count(*) AS v FROM voc),
       |rho AS (SELECT voc.t, cl.cls,
       |    CAST(($S * CAST(coalesce(ntc, 0) + 1 AS HUGEINT) * (n + v)) //
       |         (CAST(nt + 1 AS HUGEINT) * (nc + v)) AS BIGINT) AS rho
       |  FROM voc CROSS JOIN cl
       |  LEFT JOIN tc ON tc.t = voc.t AND tc.cls = cl.cls
       |  CROSS JOIN tot),
       |tcnt AS (SELECT doc_id, t, count(*) AS ctd FROM toks
       |  WHERE doc_id % $TestMod = 0 GROUP BY 1, 2),
       |sc AS (SELECT doc_id, rho.cls AS pred, CAST(sum(ctd * rho) AS BIGINT) AS score
       |  FROM tcnt JOIN rho USING (t) GROUP BY 1, 2),
       |rk AS (SELECT doc_id, pred, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pred) AS rn
       |  FROM sc)""".stripMargin

  private[graft] val predictSql =
    s"""WITH $toksSql
       |SELECT doc_id, pred, score FROM rk WHERE rn = 1""".stripMargin

  private val evalSql =
    s"""WITH $toksSql
       |SELECT count(*) AS n_test,
       |  CAST(count(*) FILTER (WHERE pred = $LabelCol) AS BIGINT) AS n_correct
       |FROM (SELECT doc_id, pred FROM rk WHERE rn = 1) p
       |JOIN documents USING (doc_id)""".stripMargin

  def entries: Map[String, Q] = Map(
    "classifier_nb_predict" -> Q((s, dir) => predict(s, dir), predictSql),
    // resubstitution-style evaluation of the predictions against the
    // held-out labels — the pipeline's accept/reject health number
    "classifier_nb_eval" -> Q((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col(LabelCol))
      predict(s, dir).join(docs, Seq("doc_id"))
        .agg(count(lit(1)).as("n_test"),
          // coalesce: a zero-row join yields sum=NULL but the oracle's
          // count(*) FILTER yields 0 — and getLong callers would NPE
          coalesce(sum(when(col("pred") === col(LabelCol), 1L)
            .otherwise(0L)), lit(0L)).as("n_correct"))
    }, evalSql)
  )
}
