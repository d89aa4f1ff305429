package graft.index

import graft.core.Layout
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-mode substring index: adjacent word-bigram posting lists.
  *
  * The reference's token-mode FM index sorts bounded 10-token windows
  * over the tokenized corpus (reference: src/lava/substring/build.rs:
  * 420-463) and answers token-sequence queries; matching is at TOKEN
  * granularity, not raw bytes (queries are tokenized exactly like the
  * corpus, reference: search.rs:446-530). Same semantics here: every
  * adjacent-token bigram of the query must appear in a candidate row
  * group; the refine predicate is token-sequence containment (the
  * lowercased, delimiter-normalized form) — NOT raw `contains`, which
  * is char-mode's job (graft.index.NgramIndex).
  */
object TokenIndex {

  val Buckets = 16

  private def bucketOf(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(Buckets))

  /** " t1 t2 ... tn " — token-normalized form used for refine. */
  def normalForm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(" "), concat_ws(" ", Text.tokens(c)), lit(" "))

  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = {
    val meta = Layout.buildMeta(spark, files).cache()
    val data = Layout.withUid(spark, files, meta)
    // bigram construction windows over each input ROW (not each uid —
    // bigrams must never span row boundaries)
    val toksR = data
      .withColumn("__rid", monotonically_increasing_id())
      .select(col("uid"), col("__rid"),
        posexplode(Text.tokens(col(column))).as(Seq("pos", "tok")))
    val wr = Window.partitionBy(col("__rid")).orderBy(col("pos"))
    val bigrams = toksR
      .withColumn("nxt", lead(col("tok"), 1).over(wr))
      .filter(col("nxt").isNotNull)
      .select(col("uid"), concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
      .distinct()
      .withColumn("bucket", bucketOf(col("bigram")))
    bigrams.write.mode("overwrite").partitionBy("bucket")
      .option("compression", "zstd").parquet(s"$path/postings")
    meta.write.mode("overwrite").parquet(s"$path/meta")
    meta.unpersist()
  }

  def bucketOfString(g: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.unsafe.types.UTF8String
    Math.floorMod(XxHash64Function.hash(UTF8String.fromString(g),
      org.apache.spark.sql.types.StringType, 42L), Buckets.toLong).toInt
  }

  /** Token-sequence search. Queries with fewer than 2 tokens cannot use
    * the bigram index → brute scan over covered files (reference's
    * brute-force signal).
    */
  def search(spark: SparkSession, path: String, column: String,
      query: String): DataFrame = {
    val qtoks = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val meta = spark.read.parquet(s"$path/meta")
    val qnorm = " " + qtoks.mkString(" ") + " "
    def refine(df: DataFrame) = df.filter(normalForm(col(column)).contains(qnorm))
    if (qtoks.size < 2) {
      val files = meta.select("file_path").distinct()
        .collect().map(_.getString(0)).toSeq
      return refine(spark.read.parquet(files: _*)).withColumn("uid", lit(-1L))
    }
    val qbi = qtoks.sliding(2).map(_.mkString(" ")).toSeq.distinct
    val qbuckets = qbi.map(bucketOfString).distinct
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(qbuckets: _*) && col("bigram").isin(qbi: _*))
    val cands = post.groupBy(col("uid"))
      .agg(countDistinct(col("bigram")).as("nb"))
      .filter(col("nb") === qbi.size)
      .select("uid")
    refine(Layout.readHits(spark, meta, cands))
  }
}
