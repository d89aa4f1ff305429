package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: decode a fixed-width little-endian
  * float32 BLOB into array<double> — the reference's on-disk embedding
  * shape (binary columns of packed f32, dimension inferred from the
  * byte width at read: reference indices/vector_index.py:42-48).
  *
  * Widens to double so every consumer (the [[CosineSim]] rerank, the
  * IVF/Vamana builds) sees exactly the values the `cast("array<double>")
  * ` path produces on an ArrayType(FloatType) column — float→double is
  * exact, so a binary-embedding lake and an array-embedding lake of
  * the same vectors score bit-identically.
  *
  * A blob whose length is not a multiple of 4 decodes to NULL (the
  * [[CosineSim]] ragged-null stance: a corrupt embedding must surface
  * as missing, never as a valid-looking prefix).
  */
case class FloatVecDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"float_vec expects a binary input, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FloatVecDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.FloatVecDecode.decode($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): FloatVecDecode = copy(child = newChild)
}

object FloatVecDecode {
  /** Null on a non-multiple-of-4 width; called from generated code. */
  def decode(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length % 4 != 0) return null
    val n = b.length / 4
    val out = new Array[Double](n)
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      out(i) = buf.getFloat(i * 4).toDouble
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The inverse (test/fixture helper): pack doubles as little-endian
    * float32 — the reference's writer shape.
    */
  def encode(v: Seq[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * v.size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    v.foreach(x => bb.putFloat(x.toFloat))
    bb.array()
  }
}
