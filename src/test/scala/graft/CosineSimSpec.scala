package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = {
    val rnd = new scala.util.Random(3)
    (0L until 50L).map(i => (i, Seq.fill(16)(rnd.nextDouble() - 0.3)))
  }

  test("native expression is bit-identical to the declarative fold") {
    val df = vecs.toDF("vec_id", "v")
    val q = typedLit(vecs.head._2)
    val got = df.select(GraftExtensions.cosineSim(spark, col("v"), q))
      .collect().map(_.getDouble(0))
    val want = df.select(Similarity.cosine(col("v"), q))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == want.toSeq) // exact, not approximate
  }

  test("expression is callable from SQL after registration") {
    GraftExtensions.register(spark)
    vecs.toDF("vec_id", "v").createOrReplaceTempView("cs_vecs")
    val r = spark.sql(
      "SELECT cosine_sim(v, v) AS c FROM cs_vecs").collect().map(_.getDouble(0))
    assert(r.forall(c => math.abs(c - 1.0) < 1e-12))
  }
}
