package graft

import graft.api.{Bm25Kind, GraftLake, NgramKind}
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-only surface: `graft_search` / `graft_rank` /
  * `graft_explain` / `graft_layout` table functions must answer
  * exactly like the Scala facade calls they wrap, and compose with
  * surrounding SQL (the whole point of living in the table-function
  * registry rather than a driver helper).
  */
class SqlTableFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val lakeDir = TestSpark.tmpDir("sqltvf")

  private def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
    val staging = TestSpark.tmpDir(s"sqltvf-stage-$name")
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$lakeDir/$name.parquet"))
  }

  writeFile("a", Seq(1L -> "alpha search engine", 2L -> "beta testing rig"))
  writeFile("b", Seq(3L -> "gamma search index", 4L -> "delta rays"))
  GraftExtensions.register(spark)
  private val lake = GraftLake(spark, lakeDir)
  lake.index(NgramKind, "text")
  lake.index(Bm25Kind("doc_id"), "text")

  test("graft_search matches the facade and composes with outer SQL") {
    val viaSql = spark.sql(
      s"SELECT doc_id FROM graft_search('$lakeDir', 'ngram', 'text', " +
        "'search', 100, 'doc_id') ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    val viaApi = lake.search(NgramKind, "text", "search", 100, Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(viaSql == viaApi && viaSql == Seq(1L, 3L))

    // composes: aggregate over the TVF inside a larger statement
    val n = spark.sql(
      s"SELECT count(*) AS n FROM graft_search('$lakeDir', 'ngram', " +
        "'text', 'search', 100, 'doc_id') WHERE doc_id > 1")
      .head().getLong(0)
    assert(n == 1L)

    // joins against an ordinary table
    val dim = Seq(1L -> "one", 3L -> "three").toDF("doc_id", "label")
    dim.createOrReplaceTempView("sqltvf_dim")
    val joined = spark.sql(
      s"SELECT d.label FROM graft_search('$lakeDir', 'ngram', 'text', " +
        "'search', 100, 'doc_id') h JOIN sqltvf_dim d USING (doc_id) " +
        "ORDER BY d.label").collect().map(_.getString(0)).toSeq
    assert(joined == Seq("one", "three"))
  }

  test("graft_rank scores like the facade bm25 search") {
    val viaSql = spark.sql(
      s"SELECT doc_id FROM graft_rank('$lakeDir', 'bm25', 'text', " +
        "'search engine', 2, 'doc_id')")
      .collect().map(_.getLong(0)).toSeq
    val viaApi = lake.search(Bm25Kind("doc_id"), "text", "search engine", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaApi)
    assert(viaSql.head == 1L) // both terms hit doc 1
  }

  test("graft_explain reports routing without reading data") {
    val row = spark.sql(
      s"SELECT * FROM graft_explain('$lakeDir', 'ngram', 'text')").head()
    assert(row.getAs[Long]("live_files") == 2L)
    assert(row.getAs[Long]("covered_files") == 2L)
    assert(row.getAs[Long]("insitu_files") == 0L)
  }

  test("graft_layout lists footer rows for the lake") {
    val files = spark.sql(
      s"SELECT DISTINCT file_path FROM graft_layout('$lakeDir')")
      .collect().map(_.getString(0)).toSet
    assert(files == graft.core.Lake.listFiles(lakeDir).toSet)
  }

  test("graft_search auto-detects a Delta lake and honors its removes") {
    import graft.core.DeltaLog
    val t = TestSpark.tmpDir("sqltvf-delta")
    def addFile(fname: String, rows: Seq[(Long, String)]): DeltaLog.Add = {
      val stage = TestSpark.tmpDir(s"sqltvf-dstage-$fname")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(stage).head),
        java.nio.file.Paths.get(s"$t/$fname"))
      DeltaLog.Add(fname,
        java.nio.file.Files.size(java.nio.file.Paths.get(s"$t/$fname")))
    }
    val a = addFile("a.parquet", Seq(1L -> "alpha search"))
    val b = addFile("b.parquet", Seq(2L -> "beta search"))
    DeltaLog.commit(t, 0, Seq(a, b))
    DeltaLog.commit(t, 1, removes = Seq("a.parquet"))
    // a PrefixBackend would scan BOTH parquet files and return doc 1;
    // auto-detection must replay the Delta log and see only b.parquet
    val ids = spark.sql(
      s"SELECT doc_id FROM graft_search('$t', 'ngram', 'text', " +
        "'search', 100, 'doc_id')").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L))
    // graft_stats honors the removes too (a prefix scan would count
    // the logically-removed doc 1)
    val st = spark.sql(s"SELECT * FROM graft_stats('$t', 'doc_id')")
      .collect()(0)
    assert((st.getLong(0), st.getLong(1), st.getLong(2)) == ((2L, 2L, 1L)))
  }

  test("graft_stats answers lake stats, metadata-only when covered") {
    val dir = TestSpark.tmpDir("sqltvf-stats")
    Seq((5L, "x"), (9L, "y"), (2L, null.asInstanceOf[String]))
      .toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    GraftLake(spark, dir).index(api.ZoneMapKind, "k")
    val r = spark.sql(s"SELECT * FROM graft_stats('$dir', 'k')").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 9L, 3L, 3L)))
    // uncovered column: same statement, real scan, same answer shape
    val rv = spark.sql(s"SELECT * FROM graft_stats('$dir', 'v')").collect()(0)
    assert((rv.getString(0), rv.getString(1), rv.getLong(2), rv.getLong(3))
      == (("x", "y", 3L, 2L)))
  }

  test("graft_smart routes like the Scala smartSearch on every shape") {
    def viaSql(q: String): Set[Long] = spark.sql(
      s"SELECT doc_id FROM graft_smart('$lakeDir', 'text', '$q', 100, " +
        "'doc_id')").collect().map(_.getLong(0)).toSet
    def viaApi(q: String): Set[Long] =
      lake.smartSearch("text", q, 100, Seq("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    for (q <- Seq("search", "alpha OR gamma", "\"search engine\"",
        "se[a-z]+ch", "serch")) // exact, bool, quoted escape, regex, fuzzy
      assert(viaSql(q) == viaApi(q), s"graft_smart diverged on <$q>")
    assert(viaSql("alpha OR gamma") == Set(1L, 3L))
  }

  test("graft_suggest does not double-count in the compaction overlap window") {
    // frequencies served from the bm25 postings, routed through the
    // same greedy max-coverage selection as search(): after a CRASHED
    // compact both the part-indexes and their merged superset are
    // committed, and summing tf across every registered index would
    // inflate every suggestion's frequency
    import graft.core.IndexStore
    val dir = TestSpark.tmpDir("sqltvf-suggest")
    def one(name: String, rows: Seq[(Long, String)]): String = {
      val staging = TestSpark.tmpDir(s"sqltvf-sg-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val dst = s"$dir/$name.parquet"
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(dst))
      dst
    }
    val fa = one("a", Seq(10L -> "search the search logs"))
    val fb = one("b", Seq(11L -> "search the metrics"))
    def commitBm25(name: String, files: Seq[String]): Unit = {
      val p = IndexStore.indexPath(dir, name)
      IndexStore.ensure(p) {
        graft.index.Bm25Index.build(spark, files, "text", "doc_id", p)
      }
      IndexStore.commitMetadata(spark, dir,
        IndexStore.metadataRows(spark, "t", "text", files,
          files.map(_ => 1L), p, "bm25", files.size.toLong))
    }
    def freq(): Long = spark.sql(
      s"SELECT freq FROM graft_suggest('$dir', 'text', 'searc') " +
        "WHERE token = 'search'").collect()(0).getLong(0)
    // the merged superset alone
    commitBm25("bm25_all", Seq(fa, fb))
    val clean = freq()
    assert(clean == 3L, s"expected tf('search')=3, got $clean")
    // crash window: the superseded parts land BESIDE the superset
    commitBm25("bm25_p0", Seq(fa))
    commitBm25("bm25_p1", Seq(fb))
    assert(freq() == clean,
      "overlapping coverage double-counted suggestion frequencies")
  }

  test("graft_index/compact/vacuum run the whole lifecycle from SQL") {
    val d = TestSpark.tmpDir("sqltvf-life")
    def put(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"sqltvf-life-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$d/$name.parquet"))
    }
    put("a", Seq(1L -> "needle alpha", 2L -> "filler"))
    put("b", Seq(3L -> "needle beta", 4L -> "filler"))
    def search(): Seq[Long] = spark.sql(
      s"SELECT doc_id FROM graft_search('$d', 'ngram', 'text', " +
        "'needle', 100, 'doc_id') ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    def covIdx(): Seq[String] =
      GraftLake(spark, d).coverageByName("ngram", "text").map(_._1)
    // build one index per file from SQL
    val built = spark.sql(
      s"SELECT * FROM graft_index('$d', 'ngram', 'text', 1)").collect()
    assert(built.length == 2 && built.forall(_.getString(0) == "indexed"))
    assert(covIdx().size == 2 && search() == Seq(1L, 3L))
    // idempotent: a covered lake no-ops
    val again = spark.sql(
      s"SELECT * FROM graft_index('$d', 'ngram', 'text', 1)").collect()
    assert(again.map(_.getString(0)).toSeq == Seq("noop"))
    // compact the two part-indexes into one, still from SQL
    val compacted = spark.sql(
      s"SELECT * FROM graft_compact('$d', 'ngram', 'text')").collect()
    assert(compacted.map(_.getString(0)).toSeq == Seq("compacted"))
    assert(covIdx().size == 1 && search() == Seq(1L, 3L))
    // vacuum(0 days) deletes the retired pre-compaction dirs and
    // reports the surviving merged index as live
    val vacuumed = spark.sql(
      s"SELECT * FROM graft_vacuum('$d', 0)").collect()
    assert(vacuumed.count(_.getString(0) == "vacuumed") == 2,
      "both retired dirs must be deleted: " +
        vacuumed.map(r => s"${r.getString(0)}=${r.getString(1)}")
          .mkString(", "))
    assert(vacuumed.count(_.getString(0) == "live") == 1)
    assert(search() == Seq(1L, 3L))
    // and a second vacuum finds nothing more to delete
    val v2 = spark.sql(s"SELECT * FROM graft_vacuum('$d', 0)").collect()
    assert(v2.map(_.getString(0)).count(_ == "vacuumed") == 0,
      "second vacuum deleted: " + v2.map(_.getString(1)).mkString(", "))
    assert(search() == Seq(1L, 3L))
  }

  test("non-literal and unknown-kind arguments fail with clear messages") {
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_search('$lakeDir', upper('ngram'), 'text', " +
        "'x', 10)").collect())
    assert(e1.getMessage.contains("LITERAL"))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_search('$lakeDir', 'bm25', 'text', 'x', 10)")
      .collect())
    assert(e2.getMessage.contains("graft_rank"))
  }
}
