package graft

import graft.index.{FmIndex, WaveletIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WaveletIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ---- pure wavelet-matrix unit properties ---------------------------

  test("wavelet rank equals naive count for random sequences") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 30) {
      val sigma = 2 + rnd.nextInt(40)
      val depth = math.max(1, 32 - Integer.numberOfLeadingZeros(sigma - 1))
      val m = 1 + rnd.nextInt(if (trial % 5 == 0) 4096 else 300)
      val codes = Array.fill(m)(rnd.nextInt(sigma))
      val (w, z, b) = WaveletIndex.encode(codes, depth)
      val ch = WaveletIndex.WChunk(0L, m, w, z, b, Map.empty, Nil)
      for (_ <- 1 to 20) {
        val c = rnd.nextInt(sigma)
        val pos = rnd.nextInt(m + 1)
        val naive = codes.take(pos).count(_ == c).toLong
        assert(WaveletIndex.rankInChunk(ch, c, depth, pos) == naive,
          s"sigma=$sigma m=$m c=$c pos=$pos")
      }
      // boundary positions: 0, m, and word/block edges
      for (pos <- Seq(0, m, math.min(64, m), math.min(512, m))) {
        val c = codes(rnd.nextInt(m))
        assert(WaveletIndex.rankInChunk(ch, c, depth, pos) ==
          codes.take(pos).count(_ == c).toLong, s"boundary pos=$pos")
      }
    }
  }

  // ---- end-to-end equivalence with FM and brute force ----------------

  private def corpus(n: Int, len: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abc "
    (0L until n.toLong).map { id =>
      id -> (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
  }

  private def buildOver(rows: Seq[(Long, String)], name: String)
      : (String, String, String) = {
    val dir = TestSpark.tmpDir(name)
    rows.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq.sorted
    val wIdx = s"$dir/widx"
    WaveletIndex.build(spark, files, "text", wIdx)
    val fIdx = s"$dir/fidx"
    FmIndex.build(spark, files, "text", fIdx)
    (wIdx, fIdx, s"$dir/data")
  }

  private def bruteIds(data: String, q: String): Set[Long] =
    spark.read.parquet(data).filter(lower(col("text")).contains(q.toLowerCase))
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private def wIds(idx: String, q: String): Set[Long] =
    WaveletIndex.search(spark, idx, "text", q)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("wavelet search equals brute force and the FM SA ranges") {
    val rows = corpus(50, 120, seed = 19)
    val (wIdx, fIdx, data) = buildOver(rows, "wavelet-rand")
    val rnd = new scala.util.Random(23)
    val alpha = "abc "
    (1 to 25).foreach { _ =>
      val len = 1 + rnd.nextInt(FmIndex.W + 4)
      val q = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(wIds(wIdx, q) == bruteIds(data, q), s"pattern '$q'")
      // the two encodings index the same BWT: identical SA ranges
      assert(WaveletIndex.saRange(spark, wIdx, q.toLowerCase) ==
        FmIndex.saRange(spark, fIdx, q.toLowerCase), s"sa range for '$q'")
    }
    (1 to 10).foreach { _ =>
      val d = rows(rnd.nextInt(rows.size))._2
      val start = rnd.nextInt(d.length - 1)
      val q = d.substring(start, math.min(d.length, start + 1 + rnd.nextInt(12)))
      assert(wIds(wIdx, q) == bruteIds(data, q), s"planted '$q'")
    }
    // no hits and empty-ish queries
    assert(wIds(wIdx, "zzzz") == Set.empty[Long])
  }

  test("wavelet merge (streaming interleave) equals brute force over the union") {
    val rowsA = corpus(20, 80, seed = 31)
    val rowsB = corpus(20, 80, seed = 37).map { case (id, t) => (id + 100, t) }
    val dir = TestSpark.tmpDir("wavelet-merge")
    def write(rows: Seq[(Long, String)], sub: String): Seq[String] = {
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/$sub")
      new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    }
    val fa = write(rowsA, "a"); val fb = write(rowsB, "b")
    WaveletIndex.build(spark, fa, "text", s"$dir/ia")
    WaveletIndex.build(spark, fb, "text", s"$dir/ib")
    // the interleave path exercises the wavelet-matrix DECODE as well
    // as the encode; the default rebuild path is covered by the facade
    // compaction entries
    WaveletIndex.mergeInterleave(spark, s"$dir/ia", s"$dir/ib", s"$dir/merged")
    val q = "ab ab"
    val expect = (rowsA ++ rowsB).filter(_._2.contains(q)).map(_._1).toSet
    assert(wIds(s"$dir/merged", q) == expect)
  }
}
