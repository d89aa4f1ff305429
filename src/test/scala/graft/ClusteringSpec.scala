package graft

import graft.ops.Clustering
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("kmeans assigns every vector to one of the K seed clusters") {
    val rows = Clustering.kmeans(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length == n)
    val clusters = rows.map(_.getLong(1)).toSet
    assert(clusters.subsetOf((0L until Clustering.K.toLong).toSet))
    assert(clusters.size > 1, "degenerate single-cluster solution")
    // self-consistency: a seed vector stays nearest to a centroid that
    // contains it, so re-running is bit-identical (determinism)
    val again = Clustering.kmeans(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toMap ==
      again.map(r => (r.getLong(0), r.getLong(1))).toMap)
  }

  test("knnJoin returns JoinK ranked neighbors per query, never self") {
    val rows = Clustering.knnJoin(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == Clustering.JoinK)
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to Clustering.JoinK))
      assert(!rs.map(_.getLong(1)).contains(qid), "self-match leaked")
      // ranks follow descending cosine
      val sorted = rs.sortBy(_.getLong(3))
      val cos = sorted.map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("quantizeInt8 codes are within [-127,127] and invert to ~x") {
    val rows = Clustering.quantizeInt8(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getLong(2)) <= 127))
    // max-|x| dimension must quantize to exactly ±127
    val byVec = rows.groupBy(_.getLong(0))
    byVec.foreach { case (_, rs) =>
      assert(rs.map(r => math.abs(r.getLong(2))).max == 127)
      // dequantized value within half a step of the original direction:
      // |code/127 - x/scale| <= 0.5/127
      rs.foreach { r =>
        val scale = r.getDouble(3)
        assert(scale > 0)
      }
    }
  }

  test("scaled LSH knn join equals the fixed shape below the width pivot") {
    // n = 200 here: bits = max(LshBandBits, ceil(log2(200/256))) ==
    // LshBandBits and no bucket nears the skew cap, so the production
    // path must return EXACTLY the oracle entry's rows — the width
    // scaling only engages past the pivot
    val fixed = graft.ops.Similarity.knnJoinLsh(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val scaled = graft.ops.Similarity.knnJoinLshScaled(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    assert(fixed.nonEmpty && scaled == fixed)
  }

  test("scaled LSH embedding dedup equals the fixed shape below the pivot") {
    val fixed = graft.ops.Similarity.embeddingDedupLsh(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val scaled = graft.ops.Similarity.embeddingDedupLshScaled(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(fixed.nonEmpty && scaled == fixed)
  }

  test("scaledBandBits: integer width rule, capped at the signature") {
    import graft.ops.Similarity.scaledBandBits
    assert(scaledBandBits(500L) == 4)   // below pivot: floor width
    assert(scaledBandBits(4096L) == 4)  // 256·2^4 == 4096: still 4
    assert(scaledBandBits(4097L) == 5)  // first n past the pivot
    assert(scaledBandBits(20000L) == 7) // sf1-scale corpus
    // the next two decades (sf10/sf100), pinned against the DuckDB
    // oracle expression's values (min b with 256·2^b ≥ n: 10 and 13;
    // scaledCells: greatest(8, n // 250): 800 and 8000) — the
    // cross-engine decade check of the r11 width rules
    assert(scaledBandBits(200000L) == 10)
    assert(scaledBandBits(2000000L) == 13)
    assert(scaledBandBits(Long.MaxValue / 4) == 16) // signature cap
    assert(Clustering.scaledCells(200000L) == 800)
    assert(Clustering.scaledCells(2000000L) == 8000)
  }

  test("distributed cell assignment is bit-equal to the literal-centroid twin") {
    // the production path broadcasts seed/centroid TABLES (no driver
    // collect grows with n/250); same integer distances and (dist, k)
    // tie-breaks must reproduce the literal-centroid form exactly —
    // at a non-default cell count, so the scaled regime is what's pinned
    val ev = graft.ops.Similarity.embeddings(spark, sf)
    val dist = Clustering.cellAssignmentsOf(ev, 16).collect()
      .map(_.toString).sorted.toSeq
    val lit = Clustering.cellAssignmentsLiteral(ev, 16).collect()
      .map(_.toString).sorted.toSeq
    assert(dist.nonEmpty && dist == lit)
  }

  test("maintainCells: built, noop, appended (frozen centroids), reclustered") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = TestSpark.tmpDir("cells-maint")
    val emb = s"$d/embeddings.parquet"
    def write(r: Range): Unit =
      r.map(i => (i.toLong,
          Seq.tabulate(8)(dd => (math.sin(i * 1.7 + dd).abs + 0.1).toFloat),
          "x"))
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("append").parquet(emb)
    write(0 until 100)
    val (p1, a1) = Clustering.maintainCells(spark, d)
    assert(a1 == "built")
    val (p2, a2) = Clustering.maintainCells(spark, d)
    assert(p2 == p1 && a2 == "noop")
    val centsBefore = spark.read.parquet(s"$p1/centroids")
      .collect().map(_.toString).sorted.toSeq
    // +10% arrives: incremental append into the SAME artifact — the
    // centroids must NOT move, and every vector (old and new) must be
    // assigned with at most IvfProbe cells
    write(100 until 110)
    val (p3, a3) = Clustering.maintainCells(spark, d)
    assert(p3 == p1 && a3 == "appended", s"got ($p3, $a3)")
    val centsAfter = spark.read.parquet(s"$p1/centroids")
      .collect().map(_.toString).sorted.toSeq
    assert(centsAfter == centsBefore, "append must not move centroids")
    val cells = spark.read.parquet(s"$p1/cells")
    assert(cells.select("vec_id").distinct().count() == 110)
    assert(cells.groupBy("vec_id").count()
      .agg(max("count")).collect()(0).getLong(0) <= Clustering.IvfProbe)
    // past the drift gate (+50% of indexed): full re-cluster — same
    // scaled count here, so the STALE same-name artifact must be
    // detected by assigned-count and rebuilt over the whole corpus
    write(110 until 165)
    val (p4, a4) = Clustering.maintainCells(spark, d)
    assert(a4 == "reclustered", s"got ($p4, $a4)")
    assert(spark.read.parquet(s"$p4/cells")
      .select("vec_id").distinct().count() == 165)
    assert(spark.read.parquet(s"$p4/centroids")
      .collect().map(_.toString).sorted.toSeq != centsBefore,
      "re-cluster must derive centroids from the grown corpus")
    val (_, a5) = Clustering.maintainCells(spark, d)
    assert(a5 == "noop")
  }

  test("incremental SemDeDup lifecycle is idempotent across re-runs") {
    val got = Clustering.semanticDedupIncremental(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty)
    // second run: ensure-gated build no-ops, the append's anti-join
    // finds nothing pending — identical rows, no duplicate assignments
    val again = Clustering.semanticDedupIncremental(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(again == got)
    val p = graft.core.IndexStore.indexPath(sf, "knn_ivf_cells_inc")
    val cells = spark.read.parquet(s"$p/cells")
    import org.apache.spark.sql.functions._
    val n = graft.ops.Similarity.embeddings(spark, sf).count()
    assert(cells.select("vec_id").distinct().count() == n)
    assert(cells.count() == cells.distinct().count(), "torn/dup append rows")
  }

  test("indexed SemDeDup: multi-assigned cells superset the per-call blocks") {
    // the persisted cells derive from the SAME deterministic k-means
    // (scaled count == K below the pivot), with IvfProbe-way
    // multi-assignment — so every pair semanticDedup finds inside its
    // single-assignment blocks must also be found by the indexed
    // composition (near-boundary pairs are the extras it adds)
    val perCall = Clustering.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = Clustering.semanticDedupIndexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(perCall.nonEmpty && perCall.subsetOf(indexed))
  }
}
