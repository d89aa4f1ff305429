package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSim, FloatVecDecode, L2SqDouble, L2SqLong, LshSigPack, WinnowFp}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or call
  * `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowFp].getName, "winnow_fp"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.winnowFromExprs(children)))
    ext.injectFunction((
      new FunctionIdentifier("float_vec"),
      new ExpressionInfo(classOf[FloatVecDecode].getName, "float_vec"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.floatVecFromExprs(children)))
    ext.injectFunction((
      new FunctionIdentifier("l2sq_long"),
      new ExpressionInfo(classOf[L2SqLong].getName, "l2sq_long"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2SqLong(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("l2sq_double"),
      new ExpressionInfo(classOf[L2SqDouble].getName, "l2sq_double"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2SqDouble(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_sig"),
      new ExpressionInfo(classOf[LshSigPack].getName, "lsh_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LshSigPack(children(0), children(1))))
    // transparent ngram-index file pruning for contains-filters over
    // indexed lakes (SURVEY §7.4 stretch)
    ext.injectOptimizerRule(spark => new graft.plans.IndexPruneRule(spark))
    // SQL-only surface for the lake facade: graft_search / graft_rank /
    // graft_explain / graft_layout table functions
    graft.plans.SqlTableFunctions.descriptors.foreach(ext.injectTableFunction)
  }
}

object GraftExtensions {

  /** winnow_fp(text, k, w) — k and w must be integer literals. */
  private[graft] def winnowFromExprs(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): WinnowFp = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // a clear contract error instead of a MatchError out of the
    // analyzer: function resolution runs before constant folding, so
    // k/w must be plain integer literals
    children.slice(1, 3) match {
      case Seq(Literal(k: Int, _), Literal(w: Int, _)) =>
        WinnowFp(children.head, k, w)
      case other => throw new IllegalArgumentException(
        "winnow_fp(text, k, w) needs integer LITERALS for k and w, got: " +
          (if (other.isEmpty) "no k/w arguments" else other.mkString(", ")))
    }
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      children => CosineSim(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fp", winnowFromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vec", floatVecFromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2sq_long",
      children => L2SqLong(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2sq_double",
      children => L2SqDouble(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_sig",
      children => LshSigPack(children(0), children(1)),
      "built-in")
    graft.plans.SqlTableFunctions.register(spark)
  }

  /** Column-API handle for the native expression. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    import org.apache.spark.sql.functions.expr
    // route through the registry so we never touch private Column
    // constructors; the planner substitutes the expression directly
    org.apache.spark.sql.functions.call_udf("cosine_sim", a, b)
  }

  // arity checked here (the winnowFromExprs discipline): extra args
  // silently ignored would produce plausible-looking wrong results
  private[graft] def floatVecFromExprs(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : FloatVecDecode = {
    require(children.size == 1,
      s"float_vec(blob) takes exactly one argument, got ${children.size}")
    FloatVecDecode(children.head)
  }

  /** Column-API handle for the float32-blob decode expression. */
  def floatVec(spark: SparkSession, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("float_vec", b)
  }

  /** Column-API handle for the integer squared-L2 kernel. */
  def l2sqLong(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("l2sq_long", a, b)
  }

  /** Column-API handle for the double squared-L2 kernel (sequential
    * left-fold accumulation — bit-identical to the declarative fold).
    */
  def l2sqDouble(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("l2sq_double", a, b)
  }

  /** Column-API handle for the packed LSH sign-signature expression. */
  def lshSig(spark: SparkSession, vq: Column, coefs: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("lsh_sig", vq, coefs)
  }

  /** Column-API handle for the winnowing-fingerprint expression. */
  def winnowFp(spark: SparkSession, text: Column, k: Int, w: Int): Column = {
    register(spark)
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_udf("winnow_fp", text, lit(k), lit(w))
  }
}
