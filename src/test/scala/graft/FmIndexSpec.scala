package graft

import graft.index.FmIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FmIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random corpus over a tiny alphabet (so grams
    * repeat heavily — the adversarial case for rank bookkeeping).
    */
  private def corpus(n: Int, len: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abc "
    (0L until n.toLong).map { id =>
      id -> (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
  }

  private def buildOver(rows: Seq[(Long, String)], name: String): (String, String) = {
    val dir = TestSpark.tmpDir(name)
    rows.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq.sorted
    val idx = s"$dir/idx"
    FmIndex.build(spark, files, "text", idx)
    (idx, s"$dir/data")
  }

  private def bruteIds(data: String, q: String): Set[Long] =
    spark.read.parquet(data).filter(lower(col("text")).contains(q.toLowerCase))
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private def fmIds(idx: String, q: String): Set[Long] =
    FmIndex.search(spark, idx, "text", q)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("FM search equals brute force for many random patterns") {
    val rows = corpus(60, 120, seed = 7)
    val (idx, data) = buildOver(rows, "fm-rand")
    val rnd = new scala.util.Random(11)
    val alpha = "abc "
    // patterns of every length from 1 to beyond the exact window
    (1 to 40).foreach { trial =>
      val len = 1 + rnd.nextInt(FmIndex.W + 4)
      val q = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(fmIds(idx, q) == bruteIds(data, q), s"pattern '$q' (len $len)")
    }
    // patterns drawn from real documents (guaranteed hits)
    (1 to 20).foreach { _ =>
      val d = rows(rnd.nextInt(rows.size))._2
      val start = rnd.nextInt(d.length - 1)
      val q = d.substring(start, math.min(d.length, start + 1 + rnd.nextInt(12)))
      assert(fmIds(idx, q) == bruteIds(data, q), s"planted pattern '$q'")
    }
  }

  test("chunk cache under a starved byte budget: evicted, refused, still exact") {
    val rows = corpus(40, 100, seed = 23)
    val (idx, data) = buildOver(rows, "fm-budget")
    val saved = graft.index.Serve.Budget.MaxServeBytes
    try {
      // a budget below one decoded chunk: every insert is refused by
      // the admission check or evicted immediately — the walk degrades
      // to per-step fetches but results stay EXACT (fetchChunks
      // returns what it read; no spurious "index changed" failures)
      graft.index.Serve.Budget.MaxServeBytes = 512L
      graft.index.Serve.clearCaches()
      Seq("ab", "ca b", "b").foreach { q =>
        assert(fmIds(idx, q) == bruteIds(data, q), s"pattern '$q'")
      }
      assert(graft.index.Serve.Budget.usedBytes <= 512L)
    } finally {
      graft.index.Serve.Budget.MaxServeBytes = saved
      graft.index.Serve.clearCaches()
    }
  }

  test("FM search handles empty, absent-char, and over-window queries") {
    val rows = corpus(10, 50, seed = 3)
    val (idx, data) = buildOver(rows, "fm-edge")
    assert(fmIds(idx, "zq") == Set.empty) // chars absent from corpus
    val all = FmIndex.search(spark, idx, "text", "")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == rows.map(_._1).toSet) // contains("") is every row
    val d = rows.head._2
    val longQ = d.substring(0, FmIndex.W + 3) // walks only last W-1 chars
    assert(fmIds(idx, longQ) == bruteIds(data, longQ))
  }

  test("interleave-merged FM index answers exactly like a full rebuild") {
    // tiny alphabet → massive suffix-window ties: the adversarial case
    // for the merge's tie-break LF-consistency
    val rows = corpus(50, 100, seed = 19)
    val dir = TestSpark.tmpDir("fm-ilv")
    rows.toDF("doc_id", "text").repartition(3).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .toSeq.sorted
    FmIndex.build(spark, Seq(files.head), "text", s"$dir/a")
    FmIndex.build(spark, files.tail, "text", s"$dir/b")
    FmIndex.mergeInterleave(spark, s"$dir/a", s"$dir/b", s"$dir/m")
    FmIndex.build(spark, files, "text", s"$dir/whole")
    val rnd = new scala.util.Random(23)
    val alpha = "abc "
    (1 to 25).foreach { _ =>
      val len = 1 + rnd.nextInt(FmIndex.W + 2)
      val q = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val m = fmIds(s"$dir/m", q)
      assert(m == fmIds(s"$dir/whole", q), s"pattern '$q' vs rebuild")
      assert(m == bruteIds(s"$dir/data", q), s"pattern '$q' vs brute")
    }
  }

  test("a stale version map fails loudly instead of serving a blend") {
    val rows = corpus(20, 60, seed = 29)
    val (idx, _) = buildOver(rows, "fm-race")
    // pin the version BEFORE a same-path rebuild (the race ADVICE r5
    // describes: versionsOf() then a rebuild, then the fetch)
    val vers = FmIndex.versionsOf(spark, Seq(idx))
    Thread.sleep(10) // ms-resolution mtimes: guarantee a new version
    val rows2 = corpus(20, 60, seed = 31)
    val dir2 = TestSpark.tmpDir("fm-race2")
    rows2.toDF("doc_id", "text").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir2/data")
    val files2 = new java.io.File(s"$dir2/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .toSeq.sorted
    FmIndex.build(spark, files2, "text", idx)
    // an operation pinned at the old version must error ("retry"), not
    // pair the old head/C-array with the new build's chunks
    val e = intercept[Exception] {
      FmIndex.saRangeMulti(spark, Seq(idx), "ab", vers)
    }
    assert(e.getMessage.contains("changed during the operation"))
    // a fresh operation (fresh version map) sees the new build whole
    val fresh = fmIds(idx, "ab")
    val want = rows2.filter(_._2.contains("ab")).map(_._1).toSet
    assert(fresh == want)
  }

  test("FM search on the sf0.001 documents lake matches brute force") {
    val files = graft.core.Lake.ensureSplit(spark, "/root/testdata/sf0.001",
      "documents", "doc_id", 4)
    val dir = TestSpark.tmpDir("fm-docs")
    FmIndex.build(spark, files, "text", s"$dir/idx")
    val got = FmIndex.search(spark, s"$dir/idx", "text", "merge merge")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = spark.read.parquet(files: _*)
      .filter(lower(col("text")).contains("merge merge"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }
}
