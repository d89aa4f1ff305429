package graft

import graft.ops.{Classifier, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("rho table is densified: one row per (train token, class), all positive") {
    import spark.implicits._
    val train = Seq(
      ("a", "x"), ("a", "x"), ("b", "x"),
      ("a", "y"), ("c", "y"))
      .toDF("t", "cls")
    val rho = Classifier.rhoTable(train).collect()
    // 3 tokens x 2 classes, including pairs never observed ((b,y),(c,x))
    assert(rho.length == 6)
    assert(rho.forall(_.getLong(2) > 0), "Laplace smoothing must keep every ratio positive")
    val m = rho.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a token concentrated in one class scores higher there
    assert(m(("c", "y")) > m(("c", "x")))
    assert(m(("b", "x")) > m(("b", "y")))
  }

  test("rho matches the hand-computed quantized ratio") {
    import spark.implicits._
    val train = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("t", "cls")
    // N=3, V=2; token a: nt=2, class x: nc=2, ntc=2
    // rho(a,x) = (10000 * 3 * 5) div (3 * 4) = 150000 div 12 = 12500
    val m = Classifier.rhoTable(train).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("a", "x")) == 12500L)
    // rho(a,y) = (10000 * 1 * 5) div (3 * 3) = 50000 div 9 = 5555
    assert(m(("a", "y")) == 5555L)
  }

  test("predict covers exactly the held-out docs, one prediction each") {
    val preds = Classifier.predict(spark, sf).collect()
    val ids = preds.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "one row per doc")
    assert(ids.forall(_ % Classifier.TestMod == 0), "only held-out docs scored")
    val langs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.forall(r => langs.contains(r.getString(1))))
    assert(preds.forall(_.getLong(2) > 0))
    // deterministic end to end
    val again = Classifier.predict(spark, sf).collect()
    assert(preds.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq)
  }

  test("eval counts are consistent with predict") {
    val n = Classifier.predict(spark, sf).count()
    val r = Classifier.entries("classifier_nb_eval").fn(spark, sf).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(0))
  }

  test("empty train split yields an empty rho table, not a crash") {
    import spark.implicits._
    val rho = Classifier.rhoTable(
      Seq.empty[(String, String)].toDF("t", "cls"))
    assert(rho.collect().isEmpty)
  }

  test("single-class training still ranks (degenerate but defined)") {
    import spark.implicits._
    val train = Seq(("a", "x"), ("b", "x")).toDF("t", "cls")
    val rho = Classifier.rhoTable(train).collect()
    assert(rho.length == 2) // 2 tokens x 1 class
    assert(rho.forall(_.getLong(2) > 0))
  }

  test("broadcast-model scoring equals the aggregation-path predictor") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % Classifier.TestMod === 0)
    val viaModel = Classifier.scoreWithModel(spark, sf, docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val viaAgg = Classifier.predict(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(viaModel.toSeq == viaAgg.toSeq)
  }

  test("native nb_score_pack scorer equals the interpreted-HOF fold twin") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % Classifier.TestMod === 0)
    val native = Classifier.scoreWithModel(spark, sf, docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val fold = Classifier.scoreWithModelFold(spark, sf, docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(native.toSeq == fold.toSeq)
    assert(native.nonEmpty)
  }
}

class KnnJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("knnJoinLsh: at most K directed neighbors per vector, never self, ranked") {
    val rows = Similarity.knnJoinLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    val byI = rows.groupBy(_.getLong(0))
    byI.foreach { case (i, rs) =>
      assert(rs.length <= Similarity.KnnJoinK)
      assert(!rs.map(_.getLong(1)).contains(i), "self-neighbor leaked")
      assert(rs.map(_.getLong(1)).distinct.length == rs.length)
    }
  }

  test("knnJoinLsh neighbors are the true top-k WITHIN the candidate set") {
    // every reported cos is the exact cosine (spot-check against the
    // panel-exact scorer on shared pairs)
    val lsh = Similarity.knnJoinLsh(spark, sf)
      .filter(col("i") < Similarity.KnnPanelN).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val e = Similarity.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    lsh.foreach { case ((i, j), c) =>
      val (a, b) = (e(i), e(j))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val exact = dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(c - exact) < 1e-4, s"cos($i,$j) drifted: $c vs $exact")
    }
  }

  test("panel recall clears the gate floor") {
    val r = Similarity.entries("knn_join_recall").fn(spark, sf).collect()(0)
    assert(r.getBoolean(0), "panel-mean recall fell below the alarm floor")
  }

  test("knnJoinIvf: bounded directed lists, no self, cell-blocked") {
    val rows = graft.ops.Clustering.knnJoinIvf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (i, rs) =>
      assert(rs.length <= Similarity.KnnJoinK)
      assert(!rs.map(_.getLong(1)).contains(i))
    }
  }

  test("persisted-cells join is row-identical to fresh clustering at the same K") {
    // the production amortization (clustering once per corpus, join
    // per call) must not change a single neighbor row — same cell
    // definition, same deterministic k-means, only the artifact differs
    val ev = Similarity.embeddings(spark, sf)
    val k = math.max(8L, ev.count() / 625L).toInt
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = keyset(graft.ops.Clustering.knnJoinIvfFrom(spark, ev, None, k))
    val stored = keyset(graft.ops.Clustering.knnJoinIvfPersisted(spark, sf, k))
    assert(stored == fresh && fresh.nonEmpty)
  }

  test("IVF panel recall clears its gate floor and beats the LSH panel") {
    val ivf = Similarity.panelRecallMean(spark, sf,
      graft.ops.Clustering.knnJoinIvf(spark, sf))
    val lsh = Similarity.panelRecallMean(spark, sf,
      Similarity.knnJoinLsh(spark, sf))
    assert(ivf >= graft.ops.Clustering.IvfKnnRecallFloor,
      s"IVF panel-mean recall $ivf fell below the alarm floor")
    // the comparative claim the docs make (IVF's cell blocking recalls
    // more of the true neighborhood than banded LSH at this scale) —
    // previously only the gate boolean was asserted, so a regression
    // below the LSH panel but above the floor went unnoticed
    assert(ivf >= lsh,
      s"IVF panel recall $ivf no longer beats the LSH panel's $lsh")
  }

  test("stored-cell (amortized) join: bounded lists, no self, gate green") {
    val p = graft.index.VectorIndex.ensureBuilt(spark, sf)
    val rows = graft.index.VectorIndex.knnJoinFromIndex(spark, p).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (i, rs) =>
      assert(rs.length <= Similarity.KnnJoinK)
      assert(!rs.map(_.getLong(1)).contains(i))
    }
    val g = graft.index.VectorIndex.entries("knn_join_index_recall")
      .fn(spark, sf).collect()(0)
    assert(g.getBoolean(0), "stored-cell join recall fell below the floor")
  }
}
