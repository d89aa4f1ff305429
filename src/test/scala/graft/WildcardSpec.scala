package graft

import graft.ops.SearchQueries
import graft.text.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WildcardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("expandTermsPrefix equals the brute vocabulary prefix scan") {
    val got = SearchQueries.expandTermsPrefix(spark, sf, "s").map(_._1)
    val brute = Tables.load(spark, sf, "documents")
      .select(explode(Text.tokens(col("text"))).as("t"))
      .filter(col("t").startsWith("s"))
      .select("t").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(got == brute)
    assert(got.nonEmpty)
    // weights are all 1.0 (prefix matches are not distance-discounted)
    assert(SearchQueries.expandTermsPrefix(spark, sf, "s")
      .forall(_._2 == 1.0))
  }

  test("no-match prefix expands to nothing and searches empty") {
    assert(SearchQueries.expandTermsPrefix(spark, sf, "zzzq").isEmpty)
  }

  test("resize stub: ~64 samples, deterministic, stride formula") {
    import graft.ops.Multimodal
    val df = Tables.load(spark, sf, "documents").limit(5)
      .select(col("doc_id"), col("text"),
        Multimodal.decoder.resize(col("text"), 64).as("r"))
    df.collect().foreach { row =>
      val (text, r) = (row.getString(1), row.getString(2))
      val stride = math.max(1, text.length / 64)
      val expect = (0 until text.length by stride)
        .map(text.charAt).mkString
      assert(r == expect, s"doc ${row.getLong(0)} resize mismatch")
      assert(r.length >= 64 || text.length < 64)
    }
  }
}
