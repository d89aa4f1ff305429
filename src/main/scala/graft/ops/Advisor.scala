package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Index advisor: recommend an index kind per column from one stats
  * pass over the table.
  *
  * The reference leaves kind selection to the user (each index class is
  * chosen by hand — indices/bm25_index.py, uuid_index.py, ...); at a
  * 100 TB estate with thousands of columns that choice is itself a data
  * problem. The rule set is deliberately a pure function of four
  * engine-computable statistics (type class, row count, exact NDV,
  * mean length) so the advice is deterministic, explainable, and
  * oracle-checkable — no sampling, no scoring model:
  *
  *   - orderable scalars (ints/floats/time) → zonemap (range pruning
  *     costs one groupBy and serves range + stats + top-k pushdowns);
  *   - unique-ish strings (ndv = n) → key (the sorted-trie point-lookup
  *     kind; uniqueness is what makes the trie's prefix ranges selective);
  *   - long strings (mean length ≥ [[Advisor.TextLen]]) → bm25+ngram
  *     (ranked + substring full-text — length says "prose", and prose
  *     is what postings amortize);
  *   - remaining low-cardinality strings → bloom (equality probes on a
  *     column the lake is not clustered by — min/max zones are useless
  *     when ndv is small and values scatter).
  *
  * One job: every statistic is a partial-aggregable expression, so the
  * whole advisory is a single map-side-combined pass (no per-column
  * scans — at 100 TB that difference is the feature).
  */
object Advisor {

  val TextLen = 64.0

  /** Coarse type class shared with the oracle SQL. */
  def typeClassOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType | _: DecimalType => "float"
    case TimestampType | DateType => "time"
    case StringType => "string"
    case BinaryType => "binary"
    case _ => "other"
  }

  def advise(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    val cols = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("_n") +: cols.flatMap { f =>
      val c = col(f.name)
      Seq(countDistinct(c).as(s"_ndv_${f.name}")) ++
        (if (f.dataType == StringType)
          Seq(avg(length(c)).as(s"_len_${f.name}")) else Nil)
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("_n")
    val rows = cols.map { f =>
      val tc = typeClassOf(f.dataType)
      val ndv = r.getAs[Long](s"_ndv_${f.name}")
      val len =
        if (f.dataType == StringType)
          Option(r.getAs[java.lang.Double](s"_len_${f.name}")).map(_.toDouble)
        else None
      val kind = tc match {
        case "int" | "float" | "time" => "zonemap"
        case "string" | "binary" if ndv == n && n > 0 => "key"
        case "string" if len.exists(_ >= TextLen) => "bm25+ngram"
        case "string" | "binary" => "bloom"
        case _ => "none"
      }
      (f.name, tc, n, ndv, len, kind)
    }
    rows.toDF("column", "type_class", "n", "ndv", "avg_len", "kind")
      // Spark-side round (BigDecimal HALF_UP) — the repo-wide pairing
      // that matches DuckDB round() on doubles
      .withColumn("avg_len", round(col("avg_len"), 4))
      .orderBy("column")
  }

  /** The same rule in ANSI SQL, stats recomputed independently. */
  def adviseSql(table: String, cols: Seq[(String, String)]): String = {
    val arms = cols.map { case (name, tc) =>
      val lenExpr =
        if (tc == "string") s"round(avg(length($name)), 4)" else "NULL"
      s"""SELECT '$name' AS "column", '$tc' AS type_class,
         |  count(*) AS n, count(DISTINCT $name) AS ndv,
         |  $lenExpr AS avg_len FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH stats AS (
       |$arms
       |)
       |SELECT "column", type_class, n, ndv, avg_len,
       |  CASE
       |    WHEN type_class IN ('int', 'float', 'time') THEN 'zonemap'
       |    WHEN type_class IN ('string', 'binary') AND ndv = n AND n > 0
       |      THEN 'key'
       |    WHEN type_class = 'string' AND avg_len >= $TextLen
       |      THEN 'bm25+ngram'
       |    WHEN type_class IN ('string', 'binary') THEN 'bloom'
       |    ELSE 'none' END AS kind
       |FROM stats ORDER BY "column"""".stripMargin
  }

  def entries: Map[String, Q] = Map(
    // one-pass per-column advisory over the documents table: doc_id →
    // zonemap (orderable id), text → bm25+ngram (prose), lang/source →
    // bloom (low-card scatter), n_chars → zonemap
    "index_advisor" -> Q((s, dir) =>
      advise(s, Tables.load(s, dir, "documents")),
      adviseSql("documents", Seq(
        "doc_id" -> "int", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "int")))
  )
}
