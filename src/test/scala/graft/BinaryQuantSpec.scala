package graft

import graft.ops.{BinaryQuant, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BinaryQuantSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("signBits column expression equals the driver-side packSigns twin") {
    val rows = Similarity.embeddings(spark, sf)
      .select(col("vec_id"), col("v"), BinaryQuant.signBits(col("v")).as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val sig = r.getSeq[Long](2).toArray
      assert(sig.toSeq == BinaryQuant.packSigns(v).toSeq,
        s"vec ${r.getLong(0)} packed differently")
    }
  }

  test("hamming(packed) equals the positional sign-mismatch count") {
    val e = Similarity.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === Similarity.QueryVecId)
      .select(col("v")).collect()(0).getSeq[Double](0)
    val naive = e.select(col("vec_id"),
      aggregate(zip_with(col("v"), typedLit(q),
        (x, y) => ((x > 0) =!= (y > 0)).cast("long")),
        lit(0L), (a, x) => a + x).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packed = e.select(col("vec_id"),
      BinaryQuant.hamming(BinaryQuant.signBits(col("v")),
        typedLit(BinaryQuant.packSigns(q))).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed == naive)
  }

  test("knnBinary ranks the query vector itself first with cos 1.0") {
    val top = BinaryQuant.knnBinary(spark, sf).collect()
    assert(top.length == Similarity.K)
    assert(top.head.getLong(0) == Similarity.QueryVecId)
    assert(top.head.getDouble(1) == 1.0)
    val cos = top.map(_.getDouble(1))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }

  test("bit-63 round trip: a vector whose 64th component is positive") {
    import spark.implicits._
    // dim exactly 64 with v[63] > 0 exercises the Long.MinValue branch
    val v = Seq.fill(63)(-1.0) :+ 1.0
    val df = Seq((1L, v)).toDF("vec_id", "v")
    val sig = df.select(BinaryQuant.signBits(col("v"))).collect()(0)
      .getSeq[Long](0)
    assert(sig == Seq(Long.MinValue))
    assert(BinaryQuant.packSigns(v).toSeq == Seq(Long.MinValue))
  }

  test("panel recall gate clears the floor") {
    val ok = BinaryQuant.entries("knn_join_binary_recall")
      .fn(spark, sf).collect()
    assert(ok.length == 1 && ok(0).getBoolean(0))
  }
}
