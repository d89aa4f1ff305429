package graft

import graft.core.Layout
import graft.index.NgramIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mkLake(rows: Seq[(Long, String)], parts: Int): Seq[String] = {
    val dir = TestSpark.tmpDir("lake")
    rows.toDF("doc_id", "text")
      .repartitionByRange(parts, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    graft.core.Lake.listFiles(dir)
  }

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "pack my box with five dozen liquor jugs",
    3L -> "a quick movement of the enemy will jeopardize five gunboats",
    4L -> "brown paper packages tied up with strings",
    5L -> "the five boxing wizards jump quickly")

  test("uid assignment is a contiguous 1-based global ordinal") {
    val files = mkLake(corpus, 2)
    val meta = Layout.buildMeta(spark, files)
    val uids = meta.select("uid").collect().map(_.getLong(0)).sorted
    assert(uids.head == 1L && uids.last == uids.length)
    val total = meta.agg(sum("num_rows")).collect()(0).getLong(0)
    assert(total == corpus.size)
  }

  test("index search equals the brute-force predicate (the oracle)") {
    val files = mkLake(corpus, 3)
    val idx = TestSpark.tmpDir("idx")
    NgramIndex.build(spark, files, "text", idx)
    for (q <- Seq("quick", "brown", "five", "jeopard", "zzz", "the ")) {
      val got = NgramIndex.search(spark, idx, "text", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = corpus.filter(_._2.toLowerCase.contains(q)).map(_._1).toSet
      assert(got == want, s"query '$q'")
    }
  }

  test("search(merge(a,b)) equals brute force over the union") {
    val filesA = mkLake(corpus.take(3), 2)
    val filesB = mkLake(corpus.drop(3), 2)
    val (a, b, m) = (TestSpark.tmpDir("a"), TestSpark.tmpDir("b"), TestSpark.tmpDir("m"))
    NgramIndex.build(spark, filesA, "text", a)
    NgramIndex.build(spark, filesB, "text", b)
    NgramIndex.merge(spark, a, b, m)
    val got = NgramIndex.search(spark, m, "text", "five")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 5L))
  }

  test("short queries prune through the index, not a covered-files scan") {
    val files = mkLake(corpus, 3)
    val idx = TestSpark.tmpDir("idx_short")
    NgramIndex.build(spark, files, "text", idx)
    // queries selective enough that not every row group is hit (the
    // density cost switch rightly brute-scans all-groups-hit queries)
    for (q <- Seq("ze", "x w", "ve g")) {
      val res = NgramIndex.search(spark, idx, "text", q)
        .select("doc_id", "uid").collect()
      val want = corpus.filter(_._2.toLowerCase.contains(q)).map(_._1).toSet
      assert(res.map(_.getLong(0)).toSet == want, s"query '$q'")
      // the brute-scan fallback tags uid = -1; the index path keeps
      // real row-group uids — short queries must take the index path
      assert(res.forall(_.getLong(1) >= 0L), s"query '$q' fell to brute scan")
    }
  }

  test("empty hit set keeps the lake schema") {
    val files = mkLake(corpus, 2)
    val idx = TestSpark.tmpDir("idx2")
    NgramIndex.build(spark, files, "text", idx)
    val res = NgramIndex.search(spark, idx, "text", "qqqqqq")
    assert(res.columns.contains("doc_id") && res.count() == 0)
  }
}
