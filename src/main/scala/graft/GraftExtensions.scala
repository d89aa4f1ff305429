package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSim, FloatVecDecode, HammingDist, L2SqDouble, L2SqLong, LshSigPack, NbScorePack, SignPack}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or call
  * `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(ext: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, cls, fn) =>
      ext.injectFunction((
        new FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
        fn))
    }
    // transparent ngram-index file pruning for contains-filters over
    // indexed lakes (SURVEY §7.4 stretch)
    ext.injectOptimizerRule(spark => new graft.plans.IndexPruneRule(spark))
    // SQL-only surface for the lake facade: graft_search / graft_rank /
    // graft_explain / graft_layout table functions
    graft.plans.SqlTableFunctions.descriptors.foreach(ext.injectTableFunction)
  }
}

object GraftExtensions {

  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  /** Arity-checked binary builder: a SQL call with the wrong argument
    * count gets a clear contract error, not an
    * IndexOutOfBoundsException out of the analyzer.
    */
  private def binary(name: String, f: (Expr, Expr) => Expr)(
      children: Seq[Expr]): Expr = {
    require(children.size == 2,
      s"$name takes exactly two arguments, got ${children.size}")
    f(children(0), children(1))
  }

  /** Every injected scalar function: (name, expression class, builder).
    * One table so the extension path and [[register]] can never
    * register different sets.
    */
  private val builders: Seq[(String, Class[_], Seq[Expr] => Expr)] = Seq(
    ("cosine_sim", classOf[CosineSim],
      binary("cosine_sim", CosineSim.apply) _),
    ("winnow_fp", classOf[graft.functions.WinnowFp], winnowFromExprs _),
    ("float_vec", classOf[FloatVecDecode], floatVecFromExprs _),
    ("l2sq_long", classOf[L2SqLong], binary("l2sq_long", L2SqLong.apply) _),
    ("l2sq_double", classOf[L2SqDouble],
      binary("l2sq_double", L2SqDouble.apply) _),
    ("lsh_sig", classOf[LshSigPack], binary("lsh_sig", LshSigPack.apply) _),
    ("sign_pack", classOf[SignPack], (children: Seq[Expr]) => {
      require(children.size == 1,
        s"sign_pack takes exactly one argument, got ${children.size}")
      SignPack(children.head)
    }),
    ("hamming_dist", classOf[HammingDist],
      binary("hamming_dist", HammingDist.apply) _),
    ("nb_score_pack", classOf[NbScorePack], (children: Seq[Expr]) => {
      require(children.size == 3,
        s"nb_score_pack takes exactly three arguments, got ${children.size}")
      NbScorePack(children(0), children(1), children(2))
    }))

  /** winnow_fp(text, k, w) — k and w must be integer literals. */
  private[graft] def winnowFromExprs(
      children: Seq[Expr]): graft.functions.WinnowFp = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // a clear contract error instead of a MatchError out of the
    // analyzer: function resolution runs before constant folding, so
    // k/w must be plain integer literals
    children.slice(1, 3) match {
      case Seq(Literal(k: Int, _), Literal(w: Int, _)) =>
        graft.functions.WinnowFp(children.head, k, w)
      case other => throw new IllegalArgumentException(
        "winnow_fp(text, k, w) needs integer LITERALS for k and w, got: " +
          (if (other.isEmpty) "no k/w arguments" else other.mkString(", ")))
    }
  }

  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, fn) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, fn, "built-in")
    }
    graft.plans.SqlTableFunctions.register(spark)
  }

  /** Column-API handle for the native expression. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    // route through the registry so we never touch private Column
    // constructors; the planner substitutes the expression directly
    org.apache.spark.sql.functions.call_udf("cosine_sim", a, b)
  }

  // arity checked here (the winnowFromExprs discipline): extra args
  // silently ignored would produce plausible-looking wrong results
  private[graft] def floatVecFromExprs(
      children: Seq[Expr]): FloatVecDecode = {
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

  /** Column-API handle for the packed sign-bit expression. */
  def signPack(spark: SparkSession, v: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("sign_pack", v)
  }

  /** Column-API handle for the packed Hamming-distance kernel. */
  def hammingDist(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("hamming_dist", a, b)
  }

  /** Column-API handle for the fused NB-model document scorer. */
  def nbScorePack(spark: SparkSession, tk: Column, model: Column,
      nClasses: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("nb_score_pack", tk, model,
      org.apache.spark.sql.functions.lit(nClasses))
  }

  /** Column-API handle for the winnowing-fingerprint expression. */
  def winnowFp(spark: SparkSession, text: Column, k: Int, w: Int): Column = {
    register(spark)
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_udf("winnow_fp", text, lit(k), lit(w))
  }
}
