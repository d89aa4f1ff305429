package graft

import graft.ops.Advisor
import org.scalatest.funsuite.AnyFunSuite

class AdvisorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("advise maps each stats profile to its kind") {
    import spark.implicits._
    // 3 rows: id (unique string), prose (long string), tag (low-card
    // string), plus numeric and time columns
    val now = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      ("a1", "x" * 200, "red", 1L, 0.5, now),
      ("b2", "y" * 200, "red", 2L, 1.5, now),
      ("c3", "y" * 200, "blue", 3L, 2.5, now)) // prose repeats: not id-like
      .toDF("id", "prose", "tag", "k", "score", "ts")
    val out = Advisor.advise(spark, df).collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    assert(out == Map(
      "id" -> "key", "prose" -> "bm25+ngram", "tag" -> "bloom",
      "k" -> "zonemap", "score" -> "zonemap", "ts" -> "zonemap"))
  }

  test("unique long strings prefer key over bm25 (identity beats prose)") {
    import spark.implicits._
    val df = Seq.tabulate(4)(i => (s"${"x" * 100}$i")).toDF("u")
    val out = Advisor.advise(spark, df).collect()
    assert(out(0).getString(5) == "key")
  }

  test("empty table recommends nothing id-like (ndv = n = 0 is not key)") {
    import spark.implicits._
    val df = Seq.empty[(String, Long)].toDF("s", "k")
    val out = Advisor.advise(spark, df).collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    assert(out("k") == "zonemap")
    assert(out("s") == "bloom") // not "key": zero rows prove nothing
  }
}
