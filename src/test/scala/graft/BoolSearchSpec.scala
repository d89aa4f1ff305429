package graft

import graft.index.{BoolSearch, NgramIndex}
import graft.index.BoolSearch._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BoolSearchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "pack my box with five dozen liquor jugs",
    3L -> "a quick movement of the enemy will jeopardize five gunboats",
    4L -> "brown paper packages tied up with strings",
    5L -> "the five boxing wizards jump quickly")

  private def mkIdx(): String = {
    val dir = TestSpark.tmpDir("bool-lake")
    corpus.toDF("doc_id", "text")
      .repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    val idx = TestSpark.tmpDir("bool-idx")
    NgramIndex.build(spark, graft.core.Lake.listFiles(dir), "text", idx)
    idx
  }

  private def evalBq(text: String, q: Bq): Boolean = q match {
    case Term(t) => text.toLowerCase.contains(t.toLowerCase)
    case And(cs) => cs.forall(evalBq(text, _))
    case Or(cs)  => cs.exists(evalBq(text, _))
    case Not(c)  => !evalBq(text, c)
  }

  test("boolean trees equal the brute predicate") {
    val idx = mkIdx()
    val queries = Seq[Bq](
      Term("quick"),
      And(Seq(Term("quick"), Term("five"))),
      Or(Seq(Term("brown"), Term("five"))),
      And(Seq(Term("five"), Not(Term("box")))),
      And(Seq(Or(Seq(Term("quick"), Term("brown"))), Not(Term("fox")))),
      Or(Seq(And(Seq(Term("quick"), Term("fox"))), Term("wizards"))),
      Not(Term("the")), // pure negation: no bound, covered scan
      And(Seq(Term("zzz"), Term("quick"))), // empty candidate set
      Or(Seq(Term("zzz"), Not(Term("zzz")))) // unbounded OR arm
    )
    for (q <- queries) {
      val got = BoolSearch.search(spark, idx, "text", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = corpus.filter(c => evalBq(c._2, q)).map(_._1).toSet
      assert(got == want, s"query $q")
    }
  }

  test("shared term across branches probes postings once (memoized)") {
    // structural check on the set algebra: (a AND b) OR (a AND c)
    // must equal a AND (b OR c) results-wise
    val idx = mkIdx()
    val q1 = Or(Seq(And(Seq(Term("quick"), Term("fox"))),
      And(Seq(Term("quick"), Term("five")))))
    val q2 = And(Seq(Term("quick"), Or(Seq(Term("fox"), Term("five")))))
    val r1 = BoolSearch.search(spark, idx, "text", q1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = BoolSearch.search(spark, idx, "text", q2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("oracle predicate mirrors the Spark predicate shape") {
    val q = And(Seq(Or(Seq(Term("A b"), Term("c"))), Not(Term("d"))))
    assert(BoolSearch.oraclePredicate("text", q) ==
      "((contains(lower(text), 'a b') OR contains(lower(text), 'c'))" +
        " AND (NOT contains(lower(text), 'd')))")
  }
}
