package graft

import graft.functions.FloatVecDecode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary embedding payloads ([[graft.functions.FloatVecDecode]]): the
  * reference stores vectors as fixed-width little-endian float32 blobs
  * in binary columns (indices/vector_index.py:42-48) — the decode must
  * round-trip the writer shape exactly and equal the
  * `cast("array<double>")` path on the same values, or a
  * binary-embedding lake would score differently from an
  * array-embedding lake of identical vectors.
  */
class FloatVecDecodeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  GraftExtensions.register(spark)

  test("decode(encode(v)) round-trips float32-representable values") {
    val vs = Seq(
      Seq(0.0, 1.0, -1.0, 0.5),
      Seq(3.25, -127.75, 1e-3, 65504.0),
      Seq.empty[Double])
    val df = vs.map(v => Tuple1(FloatVecDecode.encode(v))).toDF("b")
      .select(call_udf("float_vec", col("b")).as("v"))
    val got = df.collect().map(_.getSeq[Double](0).toSeq).toSeq
    // values chosen exactly representable in float32 except 1e-3,
    // which must equal the float32-rounded double (the cast path)
    val want = vs.map(_.map(x => x.toFloat.toDouble))
    assert(got == want)
  }

  test("binary and array columns of the same vectors score identically") {
    val vecs = (0 until 16).map(i =>
      Seq.tabulate(8)(d => (math.sin(i * 1.7 + d) * 100).toFloat))
    val arr = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val bin = vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, FloatVecDecode.encode(v.map(_.toDouble)))
    }.toDF("id", "b")
      .select(col("id"), call_udf("float_vec", col("b")).as("v"))
    val q = typedLit(vecs(3).map(_.toDouble))
    def scores(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.select(col("id"), GraftExtensions.cosineSim(spark, col("v"), q)
          .as("cos"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    assert(scores(bin) == scores(arr), "bit-identical scores required")
  }

  test("corrupt widths decode to NULL, nulls stay NULL") {
    val rows = Seq(
      Array[Byte](1, 2, 3),            // not a multiple of 4
      null.asInstanceOf[Array[Byte]],  // null blob
      FloatVecDecode.encode(Seq(2.0))) // valid single float
    val got = rows.map(Tuple1(_)).toDF("b")
      .select(call_udf("float_vec", col("b")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Double](0))
    assert(got(0) == null && got(1) == null && got(2) == Seq(2.0))
  }

  test("SQL surface: float_vec composes inside a statement") {
    Seq(Tuple1(FloatVecDecode.encode(Seq(1.0, 2.0, 3.0))))
      .toDF("b").createOrReplaceTempView("fv_t")
    val n = spark.sql(
      "SELECT size(float_vec(b)) AS d FROM fv_t").head().getInt(0)
    assert(n == 3)
  }
}
