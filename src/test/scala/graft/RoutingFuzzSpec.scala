package graft

import graft.api._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-fuzz of the search-box contract
  * ([[graft.text.QueryShaping.route]] + [[GraftLake.smartSearch]]):
  * for ANY raw query string a user could type,
  *
  *   1. smartSearch never throws — malformed boolean programs and
  *      non-compiling regexes degrade to exact contains, they do not
  *      surface parser exceptions to a search box;
  *   2. the routed result is a SUBSET of the union of the individual
  *      mode results for the same string (exact ∪ bool ∪ regex ∪
  *      fuzzy, modes that reject the string contributing ∅) — routing
  *      picks a mode, it never invents rows. This also pins the
  *      quoting escape: a fully-quoted query's exact-of-inner-text
  *      rows are exactly the bool mode's single-phrase rows.
  */
class RoutingFuzzSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "TO BE OR NOT TO BE that is the question",
    3L -> "a quick movement of five gunboats, version 3.14",
    4L -> "slow scan of brown paper packages [a-z]+ literal",
    5L -> "fast scan the five boxing wizards jump quickly",
    6L -> "x AND y appears verbatim in this 5'6\" document")

  private lazy val lake: GraftLake = {
    val dir = TestSpark.tmpDir("routefuzz-lake")
    corpus.toDF("doc_id", "text")
      .repartitionByRange(2, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/t")
    val l = GraftLake(spark, s"$dir/t")
    l.index(NgramKind, "text")
    l
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def modeIds(kind: IndexKind, q: String): Set[Long] =
    scala.util.Try(ids(lake.search(kind, "text", q, 1000, Seq("doc_id"))))
      .getOrElse(Set.empty)

  test("smart result ⊆ union of mode results; no raw input throws") {
    val rnd = new scala.util.Random(41)
    val vocab = Seq("quick", "brown", "AND", "OR", "NOT", "fox",
      "\"slow scan\"", "\"fast scan\"", "[a-z]+", "3.14", "five",
      "\"", "(", ")", "scann", "TO", "BE", "\\W+", "x")
    val handPicked = Seq(
      "\"TO BE OR NOT TO BE\"", // fully-quoted escape
      "5'6\" tall",             // unbalanced quote
      "x AND",                  // trailing operator
      "fast \\W+ scan",         // case-sensitive escape class
      "\"slow scan\" OR \"fast scan\"")
    val random = (1 to 12).map { _ =>
      (1 to (1 + rnd.nextInt(4)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    for (q <- handPicked ++ random) {
      val smart =
        try ids(lake.smartSearch("text", q, 1000, Seq("doc_id")))
        catch { case e: Exception => fail(s"smartSearch threw on <$q>: $e") }
      val union = modeIds(NgramKind, q) ++ modeIds(BoolNgramKind, q) ++
        modeIds(NgramRegexKind, q) ++ modeIds(FuzzyKind, q)
      assert(smart.subsetOf(union),
        s"routing invented rows for <$q>: smart=$smart union=$union")
    }
  }

  test("uppercase literals in a simple regex still match (lowered whole)") {
    // the refine runs against lower(column); a simple uppercase
    // pattern must not silently return zero rows
    val got = ids(lake.smartSearch("text", "QUICK [a-z]+", 1000,
      Seq("doc_id")))
    val want = ids(lake.search(NgramRegexKind, "text", "quick [a-z]+",
      1000, Seq("doc_id")))
    assert(got == want && got.nonEmpty)
  }

  test("smartRegexForm fuzz: compiling input -> compiling output, " +
      "escape-bearing uppercase literals match") {
    import graft.text.QueryShaping.smartRegexForm
    val rnd = new scala.util.Random(20260816L)
    val frags = Seq("Quick", "BROWN", "fox", "\\d+", "\\W", "[A-Z]+",
      "[a-z]{1,3}", "(?i)", "(?:X|y)", "\\Q.Lit\\E", ".", "*", "+", "?",
      "|", "(", ")", "\\p{Lower}", "#", " ", "\\", "5")
    var checked = 0
    (1 to 400).foreach { _ =>
      val p = Seq.fill(1 + rnd.nextInt(6))(
        frags(rnd.nextInt(frags.size))).mkString
      if (scala.util.Try(java.util.regex.Pattern.compile(p)).isSuccess) {
        checked += 1
        val f = smartRegexForm(p)
        assert(
          scala.util.Try(java.util.regex.Pattern.compile(f)).isSuccess,
          s"transform broke a compiling pattern: '$p' -> '$f'")
      }
    }
    assert(checked > 100, s"fuzz generated too few compiling patterns")
    // the class of pattern the r8 verbatim rule silently zeroed:
    // escape-bearing with uppercase literals now matches lower(column)
    val got = ids(lake.smartSearch("text", "QUICK \\w+", 1000,
      Seq("doc_id")))
    val want = ids(lake.search(NgramRegexKind, "text", "quick \\w+",
      1000, Seq("doc_id")))
    assert(got == want && got.nonEmpty)
  }

  test("fully-quoted escape equals the bool single-phrase rows") {
    val inner = "TO BE OR NOT TO BE"
    val viaSmart = ids(lake.smartSearch("text", s""""$inner"""", 1000,
      Seq("doc_id")))
    val viaBool = ids(lake.search(BoolNgramKind, "text", s""""$inner"""",
      1000, Seq("doc_id")))
    assert(viaSmart == viaBool && viaSmart == Set(2L))
  }
}
