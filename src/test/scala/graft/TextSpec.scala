package graft

import graft.text.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def grams(s: String, n: Int): Seq[String] =
    Seq(s).toDF("t").select(Text.charNgrams(col("t"), n).as("g"))
      .collect()(0).getSeq[String](0)

  test("charNgrams includes the final gram") {
    assert(grams("abcd", 3) == Seq("abc", "bcd"))
  }

  test("charNgrams of an exact-length string is the string itself") {
    assert(grams("abc", 3) == Seq("abc"))
  }

  test("charNgrams of a too-short string is empty") {
    assert(grams("ab", 3).isEmpty)
  }

  test("charNgrams matches a reference implementation") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 30) {
      val s = rnd.alphanumeric.take(rnd.nextInt(12)).mkString + " .!" + rnd.nextString(3)
      val expect = s.toLowerCase.sliding(3).filter(_.length == 3).toSeq.distinct
      assert(grams(s, 3) == expect, s"input '$s'")
    }
  }

  test("wordShingles covers every start position") {
    val sh = Seq("a b c d").toDF("t")
      .select(Text.wordShingles(col("t"), 3).as("s"))
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("tokens drop empties and lowercase") {
    val t = Seq("  Foo,BAR  baz9 ").toDF("t")
      .select(Text.tokens(col("t")).as("x")).collect()(0).getSeq[String](0)
    assert(t == Seq("foo", "bar", "baz9"))
  }

  test("subword tokenizer: greedy longest-match, build/query parity") {
    // longest piece wins at each position; unknowns fall back per-char
    assert(Text.SubwordTokenizer.tokenizeQuery("Interesting")
      == Seq("inter", "est", "ing"))
    assert(Text.SubwordTokenizer.tokenizeQuery("vectorization")
      == Seq("vector", "ization"))
    // punctuation/whitespace is skipped, never merged across
    assert(Text.SubwordTokenizer.tokenizeQuery("re-index! 42")
      == Seq("re", "index", "4", "2"))
    // the column form must emit the exact driver token stream
    val samples = Seq("Deduplication of the stream", "préfix überString",
      "x7 multi-query batches", "", "   ", "THE THEOREM")
    val sparkSide = samples.toDF("t")
      .select(Text.SubwordTokenizer.tokenize(col("t")).as("x"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(sparkSide == samples.map(Text.SubwordTokenizer.tokenizeQuery))
  }
}
