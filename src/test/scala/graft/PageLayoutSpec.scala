package graft

import graft.core.Layout
import graft.index.NgramIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Page-granularity layout (`spark.graft.layout.granularity=page`):
  * the retrieval unit drops from row group to data page, recovered from
  * the parquet offset index (reference: src/formats/parquet.rs:243-419
  * builds the same per-column page map from page headers). Searches
  * must return identical rows at either granularity — only the fetch
  * tightens.
  */
class PageLayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One file, one row group, many small pages: page.row.count.limit
    * caps rows per page far below the row count.
    */
  private def mkPagedLake(dir: String, n: Int): Seq[String] = {
    (0 until n).map(i => (i.toLong, s"doc $i body " + ("pad " * 12) +
        (if (i % 499 == 0) "needlefish" else "plainfish")))
      .toDF("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "64")
      .parquet(dir)
    graft.core.Lake.listFiles(dir)
  }

  private def withPageGranularity[A](f: => A): A = {
    spark.conf.set(Layout.GranularityKey, "page")
    try f finally spark.conf.unset(Layout.GranularityKey)
  }

  test("scanPages cuts row groups at the indexed column's page bounds") {
    val dir = TestSpark.tmpDir("pages-scan")
    val files = mkPagedLake(s"$dir/lake", 1000)
    val groups = Layout.scan(spark, files).collect()
    val pages = Layout.scanPages(spark, files, Some("text")).collect()
    assert(pages.length > groups.length,
      s"expected page rows (${pages.length}) to outnumber row groups (${groups.length})")
    // pages tile each file exactly: contiguous, disjoint, same total
    val byFile = pages.groupBy(_.getString(0))
    for ((f, ps) <- byFile) {
      val sorted = ps.sortBy(_.getLong(4))
      val total = groups.filter(_.getString(0) == f).map(_.getLong(2)).sum
      assert(sorted.map(_.getLong(2)).sum == total, s"row coverage of $f")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) + a.getLong(2) == b.getLong(4),
            s"pages of $f must tile contiguously")
        case _ =>
      }
      // per-file unit ordinals are dense from 0 (uid arithmetic input)
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.map(identity))
    }
  }

  test("page-granular search matches row-group-granular results and fetches fewer rows") {
    val dir = TestSpark.tmpDir("pages-search")
    val n = 2000
    val files = mkPagedLake(s"$dir/lake", n)
    val q = "needlefish"

    NgramIndex.build(spark, files, "text", s"$dir/rg")
    val rgGot = NgramIndex.search(spark, s"$dir/rg", "text", q)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val pageGot = withPageGranularity {
      NgramIndex.build(spark, files, "text", s"$dir/pg")
      NgramIndex.search(spark, s"$dir/pg", "text", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }

    val want = (0L until n.toLong by 499L).toSet
    assert(rgGot == want)
    assert(pageGot == want)

    // the page-granular hit set materializes strictly fewer rows: the
    // needle lives in ~5 of ~31 pages, vs the ONE row group (= all
    // n rows) the coarse meta must fetch. Candidate uids use the same
    // all-grams intersection the search does.
    def fetched(p: String): Long = {
      val meta = spark.read.parquet(s"$p/meta")
      val qgrams = graft.text.Text.cpGrams(q, NgramIndex.N).distinct
      val hits = spark.read.parquet(s"$p/postings")
        .filter(col("gram").isin(qgrams: _*))
        .groupBy("uid").agg(countDistinct(col("gram")).as("ng"))
        .filter(col("ng") === qgrams.size)
        .select("uid")
      Layout.readHits(spark, meta, hits).count()
    }
    val rgRows = fetched(s"$dir/rg")
    val pgRows = fetched(s"$dir/pg")
    assert(rgRows == n.toLong, s"row-group fetch should read the whole group, got $rgRows")
    assert(pgRows < rgRows / 4,
      s"page fetch should be far tighter: $pgRows vs $rgRows")
  }

  test("page-granular uid assignment survives multi-file lakes and merge re-offset") {
    val dir = TestSpark.tmpDir("pages-multi")
    val rows = (0 until 600).map(i => (i.toLong, s"doc $i " + ("pad " * 12) +
      (if (i % 53 == 0) "glasswing" else "mothball")))
    val lakeA = s"$dir/a"; val lakeB = s"$dir/b"
    rows.take(300).toDF("doc_id", "text").coalesce(1)
      .write.option("parquet.page.row.count.limit", "64").parquet(lakeA)
    rows.drop(300).toDF("doc_id", "text").coalesce(1)
      .write.option("parquet.page.row.count.limit", "64").parquet(lakeB)
    val want = rows.filter(_._2.contains("glasswing")).map(_._1).toSet

    withPageGranularity {
      val fa = graft.core.Lake.listFiles(lakeA)
      val fb = graft.core.Lake.listFiles(lakeB)
      NgramIndex.build(spark, fa, "text", s"$dir/ia")
      NgramIndex.build(spark, fb, "text", s"$dir/ib")
      NgramIndex.merge(spark, s"$dir/ia", s"$dir/ib", s"$dir/im")
      val got = NgramIndex.search(spark, s"$dir/im", "text", "glasswing")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want)
    }
  }
}
