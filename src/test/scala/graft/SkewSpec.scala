package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial skew: the shapes that melt naive plans at 100 TB — a
  * boilerplate document duplicated thousands of times (every dedup
  * band bucket explodes quadratically) and one token carrying half of
  * all occurrences (one hot postings partition). The guards under test
  * bound the work DATA-side (bucket caps, hash bucketing, per-group
  * blooms), which is what bounds task-time spread on a cluster —
  * a join bucket capped at c rows can contribute at most c² candidate
  * pairs to any task, regardless of how skewed the corpus is.
  */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** 60 distinct docs + one boilerplate duplicated `dup` times + one
    * planted identical pair (9001, 9002).
    */
  private def skewedCorpus(dup: Int) = {
    val base = (0 until 60).map(i =>
      (i.toLong, s"unique document number token$i alpha$i beta$i gamma$i delta$i epsilon$i"))
    val boiler = (0 until dup).map(i =>
      (10000L + i, "standard boilerplate footer all rights reserved worldwide"))
    val planted = Seq(
      (9001L, "the quick brown fox jumps over the lazy dog tonight"),
      (9002L, "the quick brown fox jumps over the lazy dog tonight"))
    (base ++ boiler ++ planted).toDF("doc_id", "text")
  }

  test("capped minhash stays bounded against a 3000x duplicated doc") {
    val dup = 3000
    val d = skewedCorpus(dup)
    // uncapped banding would enqueue 16 bands x dup²/2 ≈ 7e10 candidate
    // pairs from the boilerplate cluster alone — the capped join drops
    // every band bucket larger than BucketCap BEFORE the self-join, so
    // the candidate set (and with it any single task's work) is bounded
    // by cap² per bucket
    val pairs = Dedup.minhashPairsCapped(d, Dedup.BucketCap)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // no pair from the oversized boilerplate cluster survives...
    assert(pairs.forall { case (i, j) => i < 10000L && j < 10000L },
      s"boilerplate pairs leaked: ${pairs.filter(_._1 >= 10000L).take(5)}")
    // ...while small-bucket near-dups are still found
    assert(pairs.contains((9001L, 9002L)), s"planted pair lost: $pairs")
    // and the total candidate volume stayed tiny (distinct docs share
    // no shingles, so only the planted pair verifies)
    assert(pairs.size < 10, s"unexpected pair volume: ${pairs.size}")
  }

  test("bm25 postings bucketing confines a 50%-frequency token") {
    val dir = TestSpark.tmpDir("skewbm25")
    // every doc is half 'hot': the hot token owns half of ALL postings
    val rows = (0 until 200).map { i =>
      (i.toLong, s"hot rare$i hot filler$i hot alpha$i hot beta${i % 7}")
    }
    val staging = TestSpark.tmpDir("stage-skewbm25")
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$dir/a.parquet"))
    val lake = api.GraftLake(spark, dir)
    val bm25 = api.Bm25Kind("doc_id")
    val built = lake.index(bm25, "text", binpackRows = 1000000)
    assert(built.size == 1)

    // the hash-bucketed postings layout confines the hot token to ONE
    // of the 16 partitions: a query for any other token never reads it
    val postings = spark.read.parquet(s"${built.head}/postings")
      .withColumn("bucket", col("bucket").cast("int"))
    val hotBuckets = postings
      .filter(col("token") === "hot").select("bucket").distinct().count()
    assert(hotBuckets == 1L, s"hot token spread over $hotBuckets buckets")
    val perBucket = postings.groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hotBucket = postings.filter(col("token") === "hot")
      .select("bucket").head().getInt(0)
    assert((perBucket - hotBucket).values.forall(_ < perBucket(hotBucket)),
      "hot postings leaked outside their hash bucket")

    // search quality is unaffected: a rare-token query hits its doc,
    // and the hot token still ranks (idf-damped, not crashed)
    val rare = lake.search(bm25, "text", "rare42", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(rare.headOption.contains(42L), s"rare42 search returned $rare")
    assert(lake.search(bm25, "text", "hot", 5).count() == 5)
  }

  test("bloom probes stay exact when one value dominates the lake") {
    val dir = TestSpark.tmpDir("skewbloom")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-sb-$name")
      rows.toDF("id", "k").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    // the hot value floods files a+b; the needle exists only in c
    write("a", (0 until 500).map(i => (i.toLong, "hotvalue")))
    write("b", (500 until 1000).map(i => (i.toLong, "hotvalue")))
    write("c", Seq(1000L -> "needle") ++
      (1001 until 1500).map(i => (i.toLong, "hotvalue")))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.BloomKind, "k", binpackRows = 1)
    plans.IndexPruneRule.enable(spark)
    // per-row-group blooms are fixed-size regardless of value skew;
    // the rare-value probe prunes the two needle-free files outright
    val q = spark.read.parquet(dir).filter(col("k") === "needle")
    assert(q.select("id").collect().map(_.getLong(0)).toSeq == Seq(1000L))
    val scanned = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length
    }.sum
    assert(scanned == 1, s"expected the skewed files pruned, scanned $scanned")
  }

  test("capped IVF knn join drops a 1000x duplicated-embedding clique") {
    // deterministic 8-dim embeddings: 60 distinct vectors + one vector
    // duplicated 1000x (an exact-dup flood — the shape that sends every
    // pair join quadratic). All members of the clique land in the same
    // 2 cells, blowing those cells past the cap; the cap excludes them
    // from candidacy (their resolution belongs to exact dedup), while
    // distinct vectors keep their neighbor lists through their other
    // cells.
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d => math.sin(seed * 13 + d * 7).abs + 0.01)
    val rows =
      (0L until 60L).map(i => (i, vec(i))) ++
      (0 until 1000).map(i => (10000L + i, vec(999)))
    val e = rows.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val capped = graft.ops.Clustering
      .knnJoinIvfFrom(spark, e, Some(100)).collect()
    assert(capped.nonEmpty, "distinct vectors lost their neighbors")
    assert(capped.forall(r => r.getLong(0) < 10000L && r.getLong(1) < 10000L),
      "clique pairs leaked through the cell cap")
    // and the candidate volume is bounded: at most K neighbors per
    // distinct vector (the uncapped join would enqueue ~10^6 clique
    // pairs before the top-k window could discard them)
    assert(capped.length <= 60 * graft.ops.Similarity.KnnJoinK)
  }
}
