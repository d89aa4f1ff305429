package graft

import graft.ops.SearchQueries
import org.scalatest.funsuite.AnyFunSuite

/** The vocab-embedder seam: a service-backed implementation must slot
  * into query expansion without touching the plan downstream — only
  * the (token, v) rows change.
  */
class EmbedderSeamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Stand-in for a model endpoint: a fixed 2-D vocab table. */
  private object FixedEmbedder extends SearchQueries.VocabEmbedder {
    def vocab(s: org.apache.spark.sql.SparkSession,
        d: String): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      Seq(
        ("vector", Seq(1.0, 0.0)),
        ("stream", Seq(0.9, 0.1)),
        ("dup", Seq(0.0, 1.0))
      ).toDF("token", "v")
    }
  }

  test("a custom embedder swaps in without changing the expansion flow") {
    val got = SearchQueries.expandTermsEmbed(spark, dir, "vector", 2,
      FixedEmbedder)
    // cosine ranks the fixed vocab deterministically: vector (1.0)
    // then stream (0.9/|(0.9,0.1)| ≈ 0.993884)
    assert(got.map(_._1) == Seq("vector", "stream"))
    assert(got.head._2 == 1.0)
    assert(math.abs(got(1)._2 - 0.993884) < 1e-6)
    // a term the service has no vector for expands to nothing
    assert(SearchQueries.expandTermsEmbed(spark, dir, "zzzz", 2,
      FixedEmbedder).isEmpty)
  }

  test("the default embedder is the persisted rank-modulo table") {
    val viaDefault = SearchQueries.expandTermsEmbed(spark, dir, "vector", 5)
    val viaSeam = SearchQueries.expandTermsEmbed(spark, dir, "vector", 5,
      SearchQueries.RankModuloEmbedder)
    assert(viaDefault == viaSeam && viaDefault.nonEmpty)
  }
}
