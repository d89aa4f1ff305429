package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every key in [[SparkEntry.queries]] must RUN — the driver's
  * correctness harness silently drops a query that throws (round 6 lost
  * 8 events/LogCloud queries to a loader regression with no in-repo
  * signal), so this spec makes a crashed query fail `sbt test` loudly.
  * One ScalaTest test per registered query, executed at sf0.001.
  */
class QueryParitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("entry registry has no silently-shadowed keys") {
    // SparkEntry composes per-module maps with ++, which would silently
    // keep only the last binding of a duplicated name — the query count
    // must equal the sum of the parts
    val parts = Seq(
      graft.ops.Relational.entries, graft.ops.TextAnalysis.entries,
      graft.ops.IndexQueries.entries, graft.ops.SearchQueries.entries,
      graft.ops.Dedup.entries, graft.ops.Similarity.entries,
      graft.ops.BinaryQuant.entries, graft.ops.Advisor.entries,
      graft.ops.Clustering.entries, graft.ops.Classifier.entries,
      graft.index.VectorIndex.entries,
      graft.index.VamanaIndex.entries, graft.index.LogCloudIndex.entries,
      graft.ops.Maintenance.entries, graft.ops.ApiQueries.entries,
      graft.ops.DeltaQueries.entries, graft.ops.IcebergQueries.entries,
      graft.ops.Pipeline.entries, graft.ops.Multimodal.entries,
      graft.ops.LayoutQueries.entries,
      graft.streaming.EventStream.entries,
      graft.streaming.StreamingIndex.entries)
    assert(SparkEntry.queries.size == parts.map(_.size).sum,
      "a query name is bound twice across entry modules")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query '$name' runs at sf0.001") {
      val spark = TestSpark.spark
      val df = fn(spark, dir)
      df.count() // any analysis or execution error surfaces here
    }
  }
}
