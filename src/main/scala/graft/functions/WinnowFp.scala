package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing fingerprints of a string in one
  * fused pass — polynomial rolling k-gram hashes, min per sliding window
  * of w hash positions, distinct — returning array<long>.
  *
  * The hash is h(p) = (Σ_j code(p+j)·B^(k−1−j)) mod P over CODE POINTS
  * with B=256 and P=2^31−1; powers are pre-reduced mod P so every term
  * stays < 2^52 (code point < 2^21 × coefficient < 2^31) and a k-term
  * sum < 2^56 — exact in 64-bit signed arithmetic in Spark and DuckDB
  * alike, which is what lets the DuckDB oracle reproduce the
  * fingerprints bit-for-bit.
  * Tail windows shorter than w are included (the trailing ROWS BETWEEN
  * semantics of a window frame).
  *
  * Why an expression: the declarative forms both lose —
  * explode-per-position pays two full shuffles of every char position
  * (window + distinct), and nested transform/aggregate higher-order
  * functions run interpreted per element. Here the whole document is one
  * compiled loop and the operator stays a map-only stage. (The reference
  * hashes substrings in native Rust for the same reason, reference:
  * src/lava/substring/build.rs:420-466.)
  */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFp.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static-shaped call per row keeps the surrounding stage in
    // whole-stage codegen; the loop itself is JIT-compiled Scala
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFp$$.MODULE$$.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {
  val P = 2147483647L // 2^31−1
  val B = 256L

  /** B^(k−1−j) mod P for j = 0..k−1 (coefficient of a gram's j-th char). */
  def coefs(k: Int): Array[Long] =
    Iterator.iterate(1L)(p => p * B % P).take(k).toArray.reverse

  private val coefCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Long]]

  /** Distinct windowed-min fingerprints of `u` (sorted ascending; order
    * is irrelevant to the set semantics downstream). Empty array when
    * the string is shorter than k CODE POINTS — grams are hashed over
    * code points, matching both the DuckDB oracle (ord/substr are
    * code-point functions) and the Spark-side length() prefilter; a
    * UTF-16 loop would hash lone surrogates and diverge on any non-BMP
    * text (see Text.codePoints for the repo-wide convention).
    */
  def compute(u: UTF8String, k: Int, w: Int): ArrayData = {
    val s = u.toString
    val n = s.codePointCount(0, s.length)
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Long](n)
    var ui = 0
    var ci = 0
    while (ui < s.length) {
      val cp = s.codePointAt(ui)
      cps(ci) = cp.toLong
      ci += 1
      ui += Character.charCount(cp)
    }
    val cf = coefCache.getOrElseUpdate(k, coefs(k))
    val nh = n - k + 1
    val hs = new Array[Long](nh)
    var p = 0
    while (p < nh) {
      var h = 0L
      var j = 0
      while (j < k) { h += cps(p + j) * cf(j); j += 1 }
      hs(p) = h % P
      p += 1
    }
    val mins = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      val hi = math.min(i + w, nh)
      var m = hs(i)
      var q = i + 1
      while (q < hi) { if (hs(q) < m) m = hs(q); q += 1 }
      mins(i) = m
      i += 1
    }
    java.util.Arrays.sort(mins)
    var out = 0
    i = 0
    while (i < nh) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }
}
