package graft

import graft.index.{FmIndex, WaveletIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode discipline of the BWT indexes: Spark builds over CODE POINTS
  * (its length/substring/sort are code-point/UTF-8-binary functions),
  * so driver-side walks must never split surrogate pairs, and the C
  * array must be in code-point order — UTF-16 order diverges for
  * supplementary chars (emoji) vs BMP chars in [U+E000, U+FFFF].
  */
class BwtUnicodeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // U+1F600 (surrogate pair in UTF-16) sorts BEFORE U+FFFD in code-point
  // order but AFTER it in UTF-16 string order — the adversarial pair
  private val Emoji = new String(Character.toChars(0x1F600))
  private val Bmp = "�"

  private def corpus: Seq[(Long, String)] = Seq(
    1L -> s"log $Emoji merge start",
    2L -> s"merge $Bmp table scan",
    3L -> s"$Emoji$Bmp mixed $Emoji run",
    4L -> "plain ascii row merge",
    5L -> s"tail char $Emoji"
  )

  private def build(name: String,
      doBuild: (Seq[String], String) => Unit): String = {
    val dir = TestSpark.tmpDir(name)
    corpus.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq.sorted
    doBuild(files, s"$dir/idx")
    dir
  }

  private def check(dir: String,
      search: (String, String) => org.apache.spark.sql.DataFrame): Unit = {
    def brute(q: String): Set[Long] =
      spark.read.parquet(s"$dir/data")
        .filter(lower(col("text")).contains(q.toLowerCase(java.util.Locale.ROOT)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val queries = Seq(
      Emoji,                    // bare supplementary char
      s"$Emoji merge",          // pair then ascii
      s"log $Emoji",            // ascii then pair
      Bmp,                      // the UTF-16-order adversary
      s"$Emoji$Bmp",            // both, adjacent
      s"char $Emoji",           // match ending at a row boundary
      "merge", "zzz")           // ascii control + no-hit
    queries.foreach { q =>
      val got = search(s"$dir/idx", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == brute(q), s"query '$q'")
    }
  }

  test("FM search handles supplementary characters exactly") {
    val dir = build("fm-unicode",
      (files, idx) => FmIndex.build(spark, files, "text", idx))
    check(dir, (idx, q) => FmIndex.search(spark, idx, "text", q))
  }

  test("wavelet search handles supplementary characters exactly") {
    val dir = build("wt-unicode",
      (files, idx) => WaveletIndex.build(spark, files, "text", idx))
    check(dir, (idx, q) => WaveletIndex.search(spark, idx, "text", q))
  }

  test("ngram search handles supplementary characters exactly") {
    val dir = build("ngram-unicode",
      (files, idx) => graft.index.NgramIndex.build(spark, files, "text", idx))
    check(dir, (idx, q) => graft.index.NgramIndex.search(spark, idx, "text", q))
  }

  test("code-point helpers window like Spark's charNgrams") {
    import graft.text.Text
    val s = s"a$Emoji$Bmp z"
    assert(Text.codePoints(s).map(_.length) == Seq(1, 2, 1, 1, 1))
    assert(Text.cpGrams(s, 3) ==
      Seq(s"a$Emoji$Bmp", s"$Emoji$Bmp ", s"$Bmp z"))
    assert(Text.cpGrams("ab", 3) == Seq.empty)
  }
}
