package graft.index

import graft.core.IndexStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LogCloud-style log index: template mining + typed variable tables +
  * tiered search.
  *
  * The reference compresses logs into learned templates + variable
  * streams via opaque C++ trainer/compressor blobs (reference:
  * src/lava/logcloud/logcloud_rex.rs:240-566), groups variables by a
  * character-class type bitmask, dedups them into sorted per-type files
  * (logcloud_rex.rs:390-533), then serves tiered searches: hot
  * dictionary/template file ("kauai"), per-type variable blocks
  * ("oahu"), FM-index over blocks ("hawaii"), with a brute-force signal
  * when the query matches template text (logcloud.rs:396-512,702-868).
  *
  * Spark re-expression (public Drain-style mining, SURVEY §7.5):
  * - a token is a *variable* iff it contains a digit; the template is
  *   the line with variables replaced by `<V>` — one groupBy.
  * - variables land in a parquet table (value, type, line_id)
  *   partitioned by type bitmask → a query's type prunes partitions
  *   (the reference's per-type block pruning).
  * - high-frequency values are split into a small dictionary table (the
  *   reference's DICT_THRESHOLD=1000 promotion, logcloud.rs:54) that is
  *   searched first.
  * - search: variable-shaped queries (contain a digit, no whitespace)
  *   take dictionary → typed-variable contains-scan → line fetch →
  *   refine; anything else signals brute force (flag 0), exactly like a
  *   template/dictionary hit does in the reference (logcloud.rs:450-486).
  */
object LogCloudIndex {

  val DictThreshold = 1000L

  /** Character-class bitmask, ported semantics (reference:
    * src/lava/logcloud/logcloud_common.rs:9-24): digit=1, a-f=2, A-F=4,
    * G-Z=8, g-z=16, other=32.
    */
  def typeBits(s: String): Int = s.foldLeft(0) { (m, c) =>
    m | (c match {
      case c if c.isDigit          => 1
      case c if 'a' <= c && c <= 'f' => 2
      case c if 'A' <= c && c <= 'F' => 4
      case c if 'G' <= c && c <= 'Z' => 8
      case c if 'g' <= c && c <= 'z' => 16
      case _                        => 32
    })
  }

  private val typeBitsCol = {
    // same classification as a codegen-friendly column expression
    val lc = "abcdef"
    (c: org.apache.spark.sql.Column) =>
      aggregate(split(c, ""), lit(0), (m, ch) =>
        m.bitwiseOR(
          when(ch.rlike("[0-9]"), 1)
            .when(ch.rlike("[a-f]"), 2)
            .when(ch.rlike("[A-F]"), 4)
            .when(ch.rlike("[G-Z]"), 8)
            .when(ch.rlike("[g-z]"), 16)
            .otherwise(32)))
  }

  /** Build over (line_id, line). */
  def build(spark: SparkSession, lines: DataFrame, path: String): Unit = {
    val toks = lines.select(col("line_id"),
      posexplode(split(col("line"), " ")).as(Seq("pos", "tok")))
    val isVar = col("tok").rlike("[0-9]")
    // templates: variables masked, then one groupBy — the Drain-lite
    // equivalent of the reference's trained template set
    val templ = toks
      .withColumn("t", when(isVar, lit("<V>")).otherwise(col("tok")))
      .groupBy(col("line_id")).agg(
        // order-correct template assembly: sort by pos then join
        concat_ws(" ", transform(array_sort(collect_list(struct(col("pos"), col("t")))),
          x => x.getField("t"))).as("template"))
      .groupBy(col("template")).agg(count(lit(1)).as("n_lines"))
    templ.coalesce(1).write.mode("overwrite").parquet(s"$path/templates")
    val vars = toks.filter(isVar)
      .select(col("tok").as("value"), col("line_id"))
      .distinct()
      .withColumn("type", typeBitsCol(col("value")))
    val df = vars.groupBy(col("value")).agg(count(lit(1)).as("n"))
    val dictVals = df.filter(col("n") > DictThreshold).select("value")
    // dict is the small hot table (reference's kauai file) — written
    // unpartitioned so an empty dict still round-trips with its schema
    vars.join(dictVals, Seq("value"), "left_semi")
      .write.mode("overwrite")
      .option("compression", "zstd").parquet(s"$path/dict")
    val coldVars = vars.join(dictVals, Seq("value"), "left_anti")
    coldVars
      .write.mode("overwrite").partitionBy("type")
      .option("compression", "zstd").parquet(s"$path/vars")
    // "hawaii" tier (reference: char FM-index over variable blocks for
    // types past the brute threshold, logcloud.rs:670-674,870-885):
    // char-trigram postings over DISTINCT variable values, so a long
    // query prunes which values get the contains scan
    val valueGrams = coldVars.select(col("value")).distinct()
      .select(col("value"),
        explode(graft.text.Text.charNgrams(col("value"), 3)).as("gram"))
    valueGrams.write.mode("overwrite")
      .option("compression", "zstd").parquet(s"$path/hawaii")
  }

  /** True when the query can only live inside a variable token —
    * otherwise the caller must brute-force (reference returns brute
    * force flag 0 on template/dict text hits, logcloud.rs:450-486).
    */
  def isVariableQuery(q: String): Boolean =
    q.nonEmpty && !q.exists(_.isWhitespace) && q.exists(_.isDigit)

  /** Search → matching line_ids (deduped). `lines` is the lake view
    * (line_id, line) used for the brute path and final refine.
    */
  def search(spark: SparkSession, path: String, lines: DataFrame,
      q: String): DataFrame = {
    if (!isVariableQuery(q))
      return lines.filter(col("line").contains(q)).select("line_id")
    val qt = typeBits(q)
    // type pruning: a variable can contain q only if its type bits
    // cover q's (reference: logcloud.rs:737-747)
    def prune(df: DataFrame) =
      df.filter((col("type").bitwiseAND(qt) === qt) && col("value").contains(q))
    val dictHits = prune(spark.read.parquet(s"$path/dict"))
    val coldVars = spark.read.parquet(s"$path/vars")
    // hawaii tier: for gram-width queries, intersect trigram postings
    // over distinct values first — a candidate SUPERSET of matching
    // values (refined by the contains filter in prune)
    val varSource =
      if (q.length >= 3) {
        val qgrams = q.toLowerCase.sliding(3).toSeq.distinct
        // values are matched case-sensitively by contains; grams are
        // lowercased at build, so lower the value grams too
        val candVals = spark.read.parquet(s"$path/hawaii")
          .filter(col("gram").isin(qgrams: _*))
          .groupBy(col("value"))
          .agg(countDistinct(col("gram")).as("ng"))
          .filter(col("ng") === qgrams.size)
          .select("value")
        coldVars.join(candVals, Seq("value"), "left_semi")
      } else coldVars
    val varHits = prune(varSource)
    val ids = dictHits.select("line_id").union(varHits.select("line_id")).distinct()
    // fetch + mandatory refine (variable match ⇒ line contains q, but
    // keep the FP discipline uniform)
    lines.join(ids, Seq("line_id"), "left_semi")
      .filter(col("line").contains(q))
      .select("line_id")
  }

  def eventLines(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "events")
      // coalesce, not concat_ws's null-skip: the oracle's `||` would
      // drop NULL-props rows while concat_ws kept them — both sides
      // must treat NULL props as ''
      .select(col("event_id").as("line_id"),
        concat(col("event_type"), lit(" "),
          coalesce(col("props"), lit(""))).as("line"))

  def ensureBuilt(s: SparkSession, dir: String): String = {
    val p = IndexStore.indexPath(dir, "logcloud_events")
    IndexStore.ensure(p) { build(s, eventLines(s, dir), p) }
    p
  }

  private def oracle(q: String) =
    s"""SELECT event_id AS line_id FROM events
       |WHERE contains(event_type || ' ' || coalesce(props, ''), '$q')
       |ORDER BY line_id""".stripMargin

  def entries: Map[String, graft.Q] = Map(
    // variable-path search (typed variable tables, partition-pruned)
    "logcloud_search" -> graft.Q((s, dir) => {
      val p = ensureBuilt(s, dir)
      search(s, p, eventLines(s, dir), "87").orderBy(col("line_id"))
    }, oracle("87")),
    // template-text query → brute-force signal path (flag 0)
    "logcloud_search_template" -> graft.Q((s, dir) => {
      val p = ensureBuilt(s, dir)
      search(s, p, eventLines(s, dir), "error").orderBy(col("line_id"))
    }, oracle("error"))
  )
}
