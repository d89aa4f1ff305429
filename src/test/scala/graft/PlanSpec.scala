package graft

import graft.ops.Pipeline
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan discipline checks: the scale claims in SCALE.md are
  * assertions about plan SHAPE (what shuffles, what broadcasts, what
  * stays map-only) — these specs pin them so a regression shows up as a
  * test failure, not as a silent 100 TB cliff.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private val sf = "/root/testdata/sf0.001"

  test("winnow fingerprinting is a map-only stage (no exchange)") {
    val p = plan(SparkEntry.queries("text_winnow_fingerprint")(spark, sf))
    assert(!p.contains("Exchange"), s"winnow plan shuffles:\n$p")
    // "*(n)" operator prefixes are the whole-stage-codegen markers
    assert(p.contains("*(1)"), s"winnow plan left codegen:\n$p")
  }

  test("text analysis entries are map-only stages") {
    for (name <- Seq("text_token_count", "text_quality", "text_lang_id",
        "doc_fingerprint", "text_bpe_token_count", "text_gopher_quality")) {
      val p = plan(SparkEntry.queries(name)(spark, sf))
      assert(!p.contains("Exchange"), s"$name plan shuffles:\n$p")
    }
  }

  test("corpus vocab is one partial-agg shuffle ending in top-k") {
    val p = plan(SparkEntry.queries("corpus_vocab")(spark, sf))
    // two-phase aggregate: partial before the exchange, final after —
    // the shuffle carries (token, partial-count), never raw tokens
    assert(p.contains("partial_count"), s"vocab lost map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"vocab lost top-k form:\n$p")
  }

  test("type-token ratio shuffles once, pre-explode") {
    val p = plan(SparkEntry.queries("text_type_token")(spark, sf))
    // the single repartition(doc_id) comes BEFORE the explode (texts
    // shuffle once; tokens never do) and satisfies both groupings
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"ttr must shuffle exactly once:\n$p")
    assert(p.indexOf("Exchange") > p.indexOf("HashAggregate"),
      s"the exchange must sit below every aggregate (pre-explode):\n$p")
  }

  test("bloom build keeps map-side combine; the shuffle carries words") {
    val dir = TestSpark.tmpDir("planbloom")
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lake")
    val files = graft.core.Lake.listFiles(s"$dir/lake")
    val meta = graft.core.Layout.buildMeta(spark, files, Some("id"))
    val p = plan(graft.index.BloomIndex.buildFrame(spark, files, "id", meta))
    // partial bit_or BEFORE the exchange: rows fold into set words
    // map-side, the shuffle carries (uid, word, bits) triples
    assert(p.contains("partial_bit_or"), s"bloom build lost map-side combine:\n$p")
  }

  test("asof join is one union + one per-key window, no nested loop") {
    val p = plan(SparkEntry.queries("q_asof_join")(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"asof degenerated to a range join:\n$p")
    assert(p.contains("Window"), s"asof lost its window form:\n$p")
    // exactly one hash exchange feeds the window (the user_id shuffle);
    // the trailing sort exchange is the presentation orderBy
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"asof must shuffle on the key exactly once:\n$p")
  }

  test("range join is a bucketized equi-join, no nested loop") {
    val p = plan(SparkEntry.queries("q_range_join")(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$p")
    // the interval condition must ride an equi-join on (user, bucket)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"range join lost its equi-join form:\n$p")
  }

  test("decontamination joins the benchmark side as a broadcast") {
    val p = plan(Pipeline.decontaminate(
      Tables.load(spark, sf, "documents")))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus grams got sort-merged:\n$p")
  }

  test("stratified sampling and packing avoid global single partitions") {
    val sample = plan(Pipeline.sampleStratified(
      Tables.load(spark, sf, "documents")))
    assert(!sample.contains("Exchange"), s"sampling shuffles:\n$sample")
    val pack = plan(Pipeline.packSequences(
      Tables.load(spark, sf, "documents")))
    // window partitions by source shard — hash exchange, never a global
    // SinglePartition sort
    assert(pack.contains("hashpartitioning"), s"pack lost shard window:\n$pack")
    assert(!pack.contains("SinglePartition"), s"pack went single-partition:\n$pack")
  }

  test("end-to-end pipeline fuses gates into the scan; no cartesian") {
    val p = plan(SparkEntry.queries("pipeline_end_to_end")(spark, sf))
    // the quality/lang/fingerprint gates must stay filters over ONE
    // scan (no exchange between them); the decontamination gram pass
    // accounts for the other two scans (bench side + corpus side of
    // the gram join). More scans would mean a stage stopped fusing.
    assert(!p.contains("CartesianProduct"), s"e2e went cartesian:\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 3, s"e2e re-scans the lake ($scans scans):\n$p")
    // decontamination's gram set stays broadcast inside the composition
    assert(p.contains("BroadcastHashJoin"), s"bench grams not broadcast:\n$p")
  }

  test("knn brute force is one map-side top-k (no wide exchange)") {
    val p = plan(SparkEntry.queries("similarity_knn_brute")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"knn lost top-k form:\n$p")
  }

  test("knn join broadcasts the query side; corpus never shuffles pre-window") {
    val p = plan(graft.ops.Clustering.knnJoin(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side not broadcast:\n$p")
    // the only hash exchange allowed is the per-query top-k window
    assert(!p.contains("SortMergeJoin"), s"corpus got sort-merged:\n$p")
  }

  test("int8 quantization is a map-only stage") {
    val p = plan(graft.ops.Clustering.quantizeInt8(spark, sf))
    assert(!p.contains("Exchange"), s"quantize plan shuffles:\n$p")
  }

  test("tfidf keywords: df side joins as broadcast, window is per-doc hash") {
    val p = plan(SparkEntry.queries("text_keywords_tfidf")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"df side not broadcast:\n$p")
    assert(!p.contains("SinglePartition"), s"keyword window went global:\n$p")
  }

  test("pii redaction is a map-only stage") {
    val p = plan(SparkEntry.queries("text_pii_redact")(spark, sf))
    assert(!p.contains("Exchange"), s"pii redaction shuffles:\n$p")
  }

  test("source filter broadcasts the per-source stats back to the corpus") {
    val p = plan(SparkEntry.queries("source_quality_filter")(spark, sf))
    // the corpus side must NOT shuffle for the join — per-source stats
    // are #sources-sized and broadcast
    assert(p.contains("BroadcastHashJoin"), s"stats not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus got sort-merged:\n$p")
  }

  test("embedding-expanded bm25 prunes posting buckets and broadcasts stats") {
    val p = plan(SparkEntry.queries("bm25_search_expanded_embed")(spark, sf))
    // the 20 expansion terms must reach the postings scan as BOTH a
    // bucket partition filter and a pushed token predicate — at 100 TB
    // the postings table is corpus-sized and these are what keep the
    // scan at |query terms| partitions
    assert("PartitionFilters: \\[bucket".r.findFirstIn(p).isDefined,
      s"expansion terms lost bucket pruning:\n$p")
    assert(p.contains("PushedFilters: [In(token"),
      s"expansion terms not pushed to the token scan:\n$p")
    // docstats and the term-weight table are metadata-sized: broadcast,
    // never sort-merge
    assert(!p.contains("SortMergeJoin"), s"stats join got sort-merged:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"lost top-k form:\n$p")
  }

  test("span dedup: no cartesian, window-hash agg keeps map-side combine") {
    val p = plan(SparkEntry.queries("dedup_span")(spark, sf))
    // no all-pairs anywhere — the whole point vs the paper's suffix
    // array is that every stage is a key-partitioned shuffle
    assert(!p.contains("CartesianProduct"), s"span dedup went all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"span dedup nested-loops:\n$p")
    // the shared-window filter is a two-phase count-distinct: the
    // shuffle carries (hash, partial) pairs, never window text
    assert(p.contains("partial_count"), s"shared-window agg lost map-side combine:\n$p")
  }

  test("lm quality broadcasts the trigram model back to the corpus") {
    val p = plan(SparkEntry.queries("text_lm_quality")(spark, sf))
    // the model is alphabet-bounded: the scoring join must broadcast
    // it, never shuffle the corpus-sized gram stream for a merge join
    assert(p.contains("BroadcastHashJoin"), s"model not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"gram stream got sort-merged:\n$p")
  }
}
