package graft

import graft.index.VamanaIndex
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VamanaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // two well-separated direction clusters plus noise, so graph search
  // has real structure to navigate
  private val vecs: Seq[(Long, Seq[Double])] = (0L until 60L).map { i =>
    val base = if (i % 2 == 0) 1.0 else -1.0
    i -> Seq.tabulate(8)(d =>
      base * (d + 1) + 0.05 * math.sin(i * 2.3 + d))
  }

  private def brute(q: Seq[Double], k: Int): Seq[Long] = {
    val qc = typedLit(q)
    vecs.toDF("vec_id", "v")
      .select(col("vec_id"), round(Similarity.cosine(col("v"), qc), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
  }

  test("local build yields a fully reachable bounded-degree graph") {
    val arr = vecs.map(_._2.toArray).toArray
    val (adj, med) = VamanaIndex.buildLocal(arr, 8, 32, seed = 1L)
    assert(adj.length == arr.length)
    // reachability patch guarantees a total BFS from the medoid
    val reached = scala.collection.mutable.HashSet(med)
    val q = scala.collection.mutable.Queue(med)
    while (q.nonEmpty) adj(q.dequeue()).foreach { n =>
      if (reached.add(n)) q += n
    }
    assert(reached.size == arr.length)
    // non-medoid nodes respect the degree bound (the medoid may carry
    // reachability-patch slack)
    adj.zipWithIndex.filter(_._2 != med).foreach { case (ns, _) =>
      assert(ns.length <= 8)
    }
  }

  test("exact configuration equals brute-force top-k") {
    val idx = TestSpark.tmpDir("vamana")
    VamanaIndex.build(spark, vecs.toDF("vec_id", "v"), idx)
    val q = vecs(7)._2
    val got = VamanaIndex.search(spark, idx, q, 5, exact = true)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == brute(q, 5))
  }

  test("production beam finds the true top-k on clustered data") {
    val idx = TestSpark.tmpDir("vamana2")
    VamanaIndex.build(spark, vecs.toDF("vec_id", "v"), idx)
    val q = vecs(12)._2
    val got = VamanaIndex.search(spark, idx, q, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // 60 nodes, beam 64 ≥ n: the beam covers the graph, so production
    // search is exact here — any miss is a navigation bug
    assert(got == brute(q, 5))
  }

  test("batched search equals per-query production search") {
    val idx = TestSpark.tmpDir("vamana-batch")
    VamanaIndex.build(spark, vecs.toDF("vec_id", "v"), idx)
    val panel = Seq(vecs(3)._2, vecs(10)._2, vecs(21)._2, vecs(44)._2)
    // lock-step beams must produce the SAME per-query results as
    // independent beams — batching changes job count, never answers
    val batched = VamanaIndex.searchBatch(spark, idx, panel, 5)
      .select("qid", "vec_id").collect()
      .groupBy(_.getInt(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    panel.zipWithIndex.foreach { case (q, i) =>
      val single = VamanaIndex.search(spark, idx, q, 5)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(batched(i) == single, s"query $i diverged")
    }
  }

  test("driver-local fast path: identical rows, zero jobs when warm") {
    val idx = TestSpark.tmpDir("vamana-fast")
    VamanaIndex.build(spark, vecs.toDF("vec_id", "v"), idx)
    val panel = Seq(vecs(3)._2, vecs(10)._2, vecs(21)._2, vecs(44)._2)
    panel.foreach { q =>
      val slow = VamanaIndex.search(spark, idx, q, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fast = VamanaIndex.searchFast(spark, idx, q, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // BIT-identical, scores included: same beam, same rounding
      assert(fast == slow, s"fast path diverged for $q")
    }
    // steady state: the beam's working set is cache-resident, so a
    // repeat query runs ZERO Spark jobs end to end (collect() of a
    // local relation is job-free)
    val sc = spark.sparkContext
    sc.setJobGroup("vamana-warm", "vamana-warm")
    val warm =
      try VamanaIndex.searchFast(spark, idx, panel.head, 5).collect()
      finally sc.clearJobGroup()
    assert(warm.nonEmpty)
    assert(sc.statusTracker.getJobIdsForGroup("vamana-warm").isEmpty,
      "warm fast-path search ran Spark jobs")
  }

  test("facade vamana serving: bit-identical to the Spark plan, zero jobs warm") {
    val dir = TestSpark.tmpDir("vamserve-lake")
    val staging = TestSpark.tmpDir("vamserve-stage")
    vecs.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$dir/a.parquet"))
    val lake = graft.api.GraftLake(spark, dir)
    // production config (global-medoid seed, bounded beam): the shape
    // the warm hook is for — the exact config also serves, pinned by
    // the lake_api_vamana oracle entry
    val kind = graft.api.VamanaKind("vec_id", l = 64, seedAll = false)
    lake.index(kind, "embedding", binpackRows = 1)
    val q = vecs(12)._2.mkString(",")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).toSeq
    graft.index.Serve.clearCaches()
    // small k routes through the serve tier; the analytical-k call
    // keeps the distributed plan — both must answer identically
    val served = lake.search(kind, "embedding", q, 5)
    val dist = lake.search(kind, "embedding", q, 100000)
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
    assert(rows(served) == rows(dist))
    // warm repeat: zero Spark jobs end to end (beam working set +
    // hit rows cache-resident)
    val sc = spark.sparkContext
    sc.setJobGroup("vamserve-warm", "vamserve-warm")
    val warm = try rows(lake.search(kind, "embedding", q, 5))
      finally sc.clearJobGroup()
    assert(warm == rows(dist))
    val j = sc.statusTracker.getJobIdsForGroup("vamserve-warm").length
    assert(j == 0, s"warm facade vamana search ran $j Spark jobs")
    // the exact configuration through the facade serves the same rows
    // as its distributed twin too
    val exactKind = graft.api.VamanaKind("vec_id")
    val se = lake.search(exactKind, "embedding", q, 5)
    val de = lake.search(exactKind, "embedding", q, 100000)
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
    assert(rows(se) == rows(de))
  }

  test("merge of two disjoint graphs searches like one") {
    val (l, r) = vecs.partition(_._1 < 30L)
    val (ia, ib, im) = (TestSpark.tmpDir("va"), TestSpark.tmpDir("vb"),
      TestSpark.tmpDir("vm"))
    VamanaIndex.build(spark, l.toDF("vec_id", "v"), ia)
    VamanaIndex.build(spark, r.toDF("vec_id", "v"), ib)
    VamanaIndex.merge(spark, ia, ib, im)
    val q = vecs(33)._2
    val got = VamanaIndex.search(spark, im, q, 5, exact = true)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == brute(q, 5))
  }

  test("oversized cells are salted into sub-groups; exact search still total") {
    // partTarget = 8 forces every k-means cell over the bound, so the
    // build MUST split cells by vec_id salt — and a skewed corpus is
    // simulated by near-identical vectors that collapse into few cells
    val skewed: Seq[(Long, Seq[Double])] = (0L until 48L).map { i =>
      i -> Seq.tabulate(8)(d => 1.0 + 1e-4 * (i * 7 % 13) + 1e-5 * d)
    }
    val idx = TestSpark.tmpDir("vamana-salt")
    VamanaIndex.build(spark, skewed.toDF("vec_id", "v"), idx,
      partTarget = 8)
    // sub-groups are real: more medoid parts than the 4 base cells
    val parts = spark.read.parquet(s"$idx/head")
      .select("part").distinct().count()
    assert(parts > 5, s"expected salted sub-groups, got $parts parts")
    val q = skewed(11)._2
    val qc = typedLit(q)
    val want = skewed.toDF("vec_id", "v")
      .select(col("vec_id"), round(Similarity.cosine(col("v"), qc), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val got = VamanaIndex.search(spark, idx, q, 5, exact = true)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("build is deterministic") {
    val arr = vecs.map(_._2.toArray).toArray
    val a = VamanaIndex.buildLocal(arr, 8, 32, seed = 7L)
    val b = VamanaIndex.buildLocal(arr, 8, 32, seed = 7L)
    assert(a._2 == b._2 &&
      a._1.map(_.toSeq).toSeq == b._1.map(_.toSeq).toSeq)
  }
}
