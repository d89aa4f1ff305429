package graft

import graft.index.VectorIndex
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vecs: Seq[(Long, Seq[Double])] = (0L until 40L).map { i =>
    i -> Seq.tabulate(8)(d => math.sin(i * 1.7 + d).abs + 0.1)
  }

  test("cosine of a vector with itself is 1") {
    val df = vecs.toDF("vec_id", "v")
    val c = df.select(round(Similarity.cosine(col("v"), col("v")), 9))
      .collect().map(_.getDouble(0))
    assert(c.forall(_ == 1.0))
  }

  test("IVF probe-all equals brute-force top-k") {
    val df = vecs.toDF("vec_id", "v")
    val idx = TestSpark.tmpDir("ivf")
    VectorIndex.build(spark, df, idx)
    val q = vecs(7)._2
    val got = VectorIndex.search(spark, idx, q, 5, VectorIndex.numCells(spark, idx))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val qc = typedLit(q)
    val want = df.select(col("vec_id"), round(Similarity.cosine(col("v"), qc), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("PQ probe-all with full refine equals brute-force top-k") {
    val df = vecs.toDF("vec_id", "v")
    val idx = TestSpark.tmpDir("ivfpq")
    VectorIndex.build(spark, df, idx)
    val q = vecs(3)._2
    val got = VectorIndex.searchPq(spark, idx, q, 5,
      VectorIndex.numCells(spark, idx), vecs.size)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val qc = typedLit(q)
    val want = df.select(col("vec_id"), round(Similarity.cosine(col("v"), qc), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
    // production shape still returns k results and includes the query
    // vector itself (cosine 1 with itself dominates)
    val approx = VectorIndex.searchPq(spark, idx, q, 5, 4, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(approx.size == 5 && approx.contains(3L))
  }

  test("batched search equals per-query search, exact and probed") {
    val df = vecs.toDF("vec_id", "v")
    val idx = TestSpark.tmpDir("ivfbatch")
    VectorIndex.build(spark, df, idx)
    val panel = Seq(vecs(3)._2, vecs(11)._2, vecs(29)._2)
    def rows(d: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      d.select("vec_id", "cos").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for (np <- Seq(VectorIndex.numCells(spark, idx), 4)) {
      val batch = VectorIndex.searchBatch(spark, idx, panel, 5, np)
      panel.zipWithIndex.foreach { case (q, i) =>
        val one = rows(VectorIndex.search(spark, idx, q, 5, np))
        val b = rows(batch.filter(col("qid") === i))
        assert(b == one, s"qid=$i nprobe=$np")
      }
    }
    // batched PQ: bounded refine, equals the sequential PQ searcher
    for ((np, refine) <- Seq((VectorIndex.numCells(spark, idx), 40), (4, 10))) {
      val batch = VectorIndex.searchPqBatch(spark, idx, panel, 5, np, refine)
      panel.zipWithIndex.foreach { case (q, i) =>
        val one = rows(VectorIndex.searchPq(spark, idx, q, 5, np, refine))
        val b = rows(batch.filter(col("qid") === i))
        assert(b == one, s"pq qid=$i nprobe=$np refine=$refine")
      }
    }
  }

  test("PQ pre-rank scan is codes-only; rerank fetch pushes the id list") {
    val df = vecs.toDF("vec_id", "v")
    val idx = TestSpark.tmpDir("ivfsplit")
    VectorIndex.build(spark, df, idx)
    // the scale contract: the ADC-scanned table carries no full vector
    val cellCols = spark.read.parquet(s"$idx/cells").schema.fieldNames.toSet
    assert(cellCols == Set("vec_id", "codes", "vnorm", "centroid"))
    assert(spark.read.parquet(s"$idx/vecs").schema.fieldNames.toSet ==
      Set("vec_id", "v", "centroid"))
    // bounded refine: full vectors are read only through the pushed
    // vec_id IN (...) fetch, never in the pre-rank
    val q = vecs(5)._2
    val plan = VectorIndex.searchPq(spark, idx, q, 5, 4, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("vecs"), "rerank must read the vecs table")
    assert(!plan.contains("cells"),
      "the final plan must not rescan cells (ids were collected)")
    assert(plan.contains("In(vec_id"),
      s"candidate ids must push into the vecs scan:\n$plan")
  }

  test("served IVF-PQ: bit-identical rows, zero jobs when warm") {
    val df = vecs.toDF("vec_id", "v")
    val idx = TestSpark.tmpDir("ivfserve")
    VectorIndex.build(spark, df, idx)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).toSeq
    def jobs(group: String)(f: => Unit): Int = {
      val sc = spark.sparkContext
      sc.setJobGroup(group, group)
      try f finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(group).length
    }
    graft.index.Serve.clearCaches()
    for ((q, np, ref) <- Seq((vecs(3)._2, 4, 10),
        (vecs(9)._2, VectorIndex.numCells(spark, idx), Int.MaxValue),
        (vecs(0)._2, 2, 3))) {
      val viaSpark = rows(VectorIndex.searchPq(spark, idx, q, 5, np, ref))
      val served = rows(graft.index.Serve.ivfPq(spark, idx, q, 5, np, ref))
      assert(served == viaSpark, s"np=$np refine=$ref")
    }
    // warm repeat (cells + vecs slices cached): ZERO Spark jobs
    val j = jobs("ivf-serve-warm") {
      graft.index.Serve.ivfPq(spark, idx, vecs(3)._2, 5, 4, 10).collect()
    }
    assert(j == 0, s"warm served IVF probe ran $j Spark jobs")
    // a starved budget degrades to the Spark path — identical rows
    val saved = graft.index.Serve.Budget.MaxServeBytes
    try {
      graft.index.Serve.Budget.MaxServeBytes = 256L
      graft.index.Serve.clearCaches()
      assert(rows(graft.index.Serve.ivfPq(spark, idx, vecs(3)._2, 5, 4, 10))
        == rows(VectorIndex.searchPq(spark, idx, vecs(3)._2, 5, 4, 10)))
    } finally {
      graft.index.Serve.Budget.MaxServeBytes = saved
      graft.index.Serve.clearCaches()
    }
  }

  test("facade vector serving: bit-identical to the Spark plan, zero jobs warm") {
    val dir = TestSpark.tmpDir("vserve-lake")
    val staging = TestSpark.tmpDir("vserve-stage")
    vecs.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$dir/a.parquet"))
    val lake = graft.api.GraftLake(spark, dir)
    val kind = graft.api.VectorKind("vec_id")
    lake.index(kind, "embedding", binpackRows = 1)
    val q = vecs(5)._2.mkString(",")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).toSeq
    graft.index.Serve.clearCaches()
    // small k routes through the serve tier; the analytical-k call
    // keeps the distributed plan — both must answer identically
    val served = lake.search(kind, "embedding", q, 5)
    val dist = lake.search(kind, "embedding", q, 100000)
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
    assert(rows(served) == rows(dist))
    // warm repeat: zero Spark jobs end to end
    val sc = spark.sparkContext
    sc.setJobGroup("vserve-warm", "vserve-warm")
    val warm = try rows(lake.search(kind, "embedding", q, 5))
      finally sc.clearJobGroup()
    assert(warm == rows(dist))
    val j = sc.statusTracker.getJobIdsForGroup("vserve-warm").length
    assert(j == 0, s"warm facade vector search ran $j Spark jobs")
  }

  test("non-selective facade probe declines BEFORE any fetch: zero jobs") {
    val dir = TestSpark.tmpDir("vgate-lake")
    val staging = TestSpark.tmpDir("vgate-stage")
    vecs.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$dir/a.parquet"))
    val lake = graft.api.GraftLake(spark, dir)
    val kind = graft.api.VectorKind("vec_id")
    val p = lake.index(kind, "embedding", binpackRows = 1).head
    val q = vecs(5)._2
    // one served call warms the metaRows/version caches
    graft.index.Serve.clearCaches()
    lake.search(kind, "embedding", q.mkString(","), 5).collect()
    val saved = graft.index.Serve.MaxServeRows
    val sc = spark.sparkContext
    try {
      // shrink the budget below the lake's row count: the probe is now
      // non-selective BY THE PRE-GATE and must decline for free — no
      // code-slice fetch, no Spark job, just None (the caller then runs
      // the distributed plan it would have run anyway)
      graft.index.Serve.MaxServeRows = 10L
      sc.setJobGroup("vgate-decline", "vgate-decline")
      val declined =
        try graft.index.Serve.vectorLake(spark, p, "embedding", q, 5,
          Int.MaxValue, Int.MaxValue, "vec_id")
        finally sc.clearJobGroup()
      assert(declined.isEmpty, "oversized index must decline the serve path")
      val j = sc.statusTracker.getJobIdsForGroup("vgate-decline").length
      assert(j == 0, s"declining probe ran $j Spark jobs")
      // the vamana gate shares the discipline
      sc.setJobGroup("vamgate-decline", "vamgate-decline")
      val vdecl =
        try graft.index.Serve.vamanaLake(spark, p, "embedding", q, 5,
          64, false, "vec_id")
        finally sc.clearJobGroup()
      assert(vdecl.isEmpty)
      assert(sc.statusTracker.getJobIdsForGroup("vamgate-decline").isEmpty)
    } finally {
      graft.index.Serve.MaxServeRows = saved
      graft.index.Serve.clearCaches()
    }
  }

  test("half-deleted vector index: warm hook falls through and self-heals") {
    val dir = TestSpark.tmpDir("vheal-lake")
    val staging = TestSpark.tmpDir("vheal-stage")
    vecs.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$dir/a.parquet"))
    val lake = graft.api.GraftLake(spark, dir)
    val kind = graft.api.VectorKind("vec_id")
    val p = lake.index(kind, "embedding", binpackRows = 1).head
    val q = vecs(5)._2.mkString(",")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).toSeq
    val want = rows(lake.search(kind, "embedding", q, 5))
    // crashed vacuum: deleteRec removes the marker FIRST, then walks
    // the subtables — simulate the mid-walk state. The warm hook's
    // probe (centroids/cells reads) throws here; search() must fall
    // through to the distributed path, which demotes the marker-less
    // index to in-situ and still answers — never surface an exception
    java.nio.file.Files.delete(java.nio.file.Paths.get(p, "_GRAFT_DONE"))
    for (t <- Seq("centroids", "cells"))
      graft.core.Fs.deleteRec(spark, s"$p/$t")
    val healed = lake.search(kind, "embedding", q, 5)
    assert(rows(healed) == want, "self-healed search must answer identically")
  }

  test("zero-norm vectors survive the exact PQ configuration") {
    val withZero = vecs :+ (99L -> Seq.fill(8)(0.0))
    val df = withZero.toDF("vec_id", "v")
    val idx = TestSpark.tmpDir("ivfzero")
    VectorIndex.build(spark, df, idx)
    val q = vecs(3)._2
    val got = VectorIndex.searchPq(spark, idx, q, withZero.size,
      VectorIndex.numCells(spark, idx), Int.MaxValue)
    // the zero row scores adc=0 (not null) and is kept through the
    // exact path — the full corpus must come back
    assert(got.count() == withZero.size)
    // the SERVED twin must survive the zero-norm row too (its 0/0
    // cosine is NaN — the rounding replication must pass it through
    // like Spark's Round, not throw) and return the identical rows,
    // including Spark's NaN-first ordering under cos DESC
    graft.index.Serve.clearCaches()
    val served = graft.index.Serve.ivfPq(spark, idx, q, withZero.size,
      VectorIndex.numCells(spark, idx), Int.MaxValue)
      .collect().map(_.toString).toSeq
    assert(served == got.collect().map(_.toString).toSeq)
  }

  test("old-format index (cells carrying v) fails loudly") {
    val df = vecs.toDF("vec_id", "v")
    val idx = TestSpark.tmpDir("ivfold")
    // simulate the pre-split layout
    df.withColumn("centroid", lit(0)).withColumn("vnorm", lit(1.0))
      .write.partitionBy("centroid").parquet(s"$idx/cells")
    val e = intercept[IllegalArgumentException] {
      VectorIndex.searchPq(spark, idx, vecs(0)._2, 5, 1, 10)
    }
    assert(e.getMessage.contains("older on-disk format"))
  }

  test("minhash LSH finds planted near-duplicates") {
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (0 until 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val other = (100 until 160).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("capped minhash drops oversized band buckets, keeps small ones") {
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (0 until 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    // ten identical "boilerplate" docs: every band bucket they occupy
    // has 10 members, over the cap of 4 — the quadratic pair join on
    // that clique must be skipped
    val boiler = (10L until 20L).map(id => id -> (0 until 60)
      .map(i => s"boil$i").mkString(" "))
    val docs = (Seq(1L -> base, 2L -> nearDup) ++ boiler).toDF("doc_id", "text")
    val capped = Dedup.minhashPairsCapped(docs, 4)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), "cap must keep the small-bucket pair only")
    // uncapped control: the boilerplate clique pairs all 45 ways
    val full = Dedup.minhashPairs(docs)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.size == 1 + 45, "uncapped control should pair the clique")
  }

  test("simhash pairs identical docs at hamming 0, not unrelated ones") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs)
      .select("i", "j", "h").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0)))
  }
}
