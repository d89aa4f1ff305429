package graft

import graft.index.{TokenFmIndex, TokenIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenFmIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Tiny-vocabulary random corpus: token sequences repeat heavily —
    * the adversarial case for token-rank bookkeeping.
    */
  private def corpus(n: Int, len: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("red", "blue", "green", "go", "stop", "x1")
    (0L until n.toLong).map { id =>
      id -> (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
  }

  private def buildOver(rows: Seq[(Long, String)],
      name: String): (String, String) = {
    val dir = TestSpark.tmpDir(name)
    rows.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .toSeq.sorted
    val idx = s"$dir/idx"
    TokenFmIndex.build(spark, files, "text", idx)
    (idx, s"$dir/data")
  }

  /** Token-sequence containment oracle (TokenIndex's normal form). */
  private def bruteIds(data: String, q: String): Set[Long] = {
    val qnorm = " " + TokenIndex.tokensOf(q).mkString(" ") + " "
    spark.read.parquet(data)
      .filter(TokenIndex.normalForm(col("text")).contains(qnorm))
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  private def fmIds(idx: String, q: String): Set[Long] =
    TokenFmIndex.search(spark, idx, "text", q)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("token BWT search equals the token-sequence oracle") {
    val rows = corpus(50, 30, seed = 7)
    val (idx, data) = buildOver(rows, "tfm-rand")
    val rnd = new scala.util.Random(11)
    val vocab = Seq("red", "blue", "green", "go", "stop", "x1", "nope")
    // random phrases from 1 token to beyond the exact window
    (1 to 30).foreach { trial =>
      val len = 1 + rnd.nextInt(TokenFmIndex.W + 2)
      val q = (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      assert(fmIds(idx, q) == bruteIds(data, q), s"phrase '$q' (len $len)")
    }
    // planted phrases (guaranteed hits), including punctuation noise
    // the tokenizer must strip
    (1 to 15).foreach { _ =>
      val toks = rows(rnd.nextInt(rows.size))._2.split(" ")
      val start = rnd.nextInt(toks.length - 1)
      val q = toks.slice(start, math.min(toks.length,
        start + 1 + rnd.nextInt(11))).mkString(", ").toUpperCase
      assert(fmIds(idx, q) == bruteIds(data, q), s"planted '$q'")
    }
  }

  test("token BWT handles token-less, absent-token and boundary queries") {
    val rows = Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta gamma delta"),
      (3L, "Gamma, ALPHA!   beta"))
    val (idx, data) = buildOver(rows, "tfm-edge")
    // absent token
    assert(fmIds(idx, "omega") == Set.empty)
    // adjacency is required: gamma and beta both occur in doc 3 but
    // never adjacently — and "alpha beta gamma"(1) + "beta ..."(2)
    // must not match across row boundaries either
    assert(fmIds(idx, "gamma beta") == Set.empty)
    assert(fmIds(idx, "gamma alpha") == Set(3L))
    // tokenization: punctuation/case-insensitive
    assert(fmIds(idx, "GAMMA, alpha") == Set(3L))
    assert(fmIds(idx, "alpha beta") == bruteIds(data, "alpha beta"))
    // token-less query: every row comes back (uid = -1 passthrough)
    val all = TokenFmIndex.search(spark, idx, "text", "!!!")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L))
  }

  test("token chunks carry no dense cum map; cums/ is occurrence-sparse") {
    // chunks x |vocabulary| dense cum maps are a quadratic blow-up at
    // any real vocabulary (the driver testdata's 31-token vocab masked
    // it) — the v2 format must keep the chunk payload vocab-free and
    // the side table sparse: one row per (symbol, chunk-where-it-occurs)
    val rows = corpus(40, 25, seed = 7)
    val (idx, data) = buildOver(rows, "tfm-sparse")
    val chunkCols = spark.read.parquet(s"$idx/tfm2").schema.fieldNames.toSet
    assert(chunkCols == Set("chunk", "chars", "uids"))
    val cums = spark.read.parquet(s"$idx/cums")
    // sparse bound: every row is a (symbol, chunk) the symbol occurs in,
    // so row count <= total token positions (vs chunks x vocab dense)
    val nPositions = spark.read.parquet(s"$idx/tfm2")
      .selectExpr("sum(size(chars))").head().getLong(0)
    assert(cums.count() <= nPositions)
    // and the floor-lookup machinery answers exactly
    assert(fmIds(idx, "alpha beta") == bruteIds(data, "alpha beta"))
  }

  test("standalone symbol-less search excludes NULL rows like the facade") {
    // the empty pattern matches every NON-NULL row — the STANDALONE
    // driver search must apply the same convention as the facade kinds
    // (a NULL row sneaking in here was the one divergent path)
    val rows = Seq((1L, "alpha beta"), (2L, null: String), (3L, "gamma"))
    val (idx, _) = buildOver(rows, "tfm-nulls")
    val ids = TokenFmIndex.search(spark, idx, "text", "!!!")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
    val fmDir = TestSpark.tmpDir("fm-nulls")
    rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite")
      .parquet(s"$fmDir/data")
    val fmFiles = new java.io.File(s"$fmDir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    graft.index.FmIndex.build(spark, fmFiles, "text", s"$fmDir/idx")
    val fmAll = graft.index.FmIndex.search(spark, s"$fmDir/idx", "text", "")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fmAll == Set(1L, 3L))
  }

  test("skip-sampled token BWT equals the oracle via residue probes") {
    val rows = corpus(50, 30, seed = 13)
    val dir = TestSpark.tmpDir("tfm-sampled")
    rows.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .toSeq.sorted
    TokenFmIndex.build(spark, files, "text", s"$dir/full")
    TokenFmIndex.build(spark, files, "text", s"$dir/s2", sample = 2)
    TokenFmIndex.build(spark, files, "text", s"$dir/s3", sample = 3)
    assert(TokenFmIndex.sampleOf(spark, s"$dir/s2") == 2)

    // the thinned index holds ~1/N of the full index's BWT positions
    def bwtLen(p: String): Long =
      spark.read.parquet(s"$p/head").agg(sum("n_bwt"))
        .head().getLong(0)
    assert(bwtLen(s"$dir/s2") < bwtLen(s"$dir/full") * 6 / 10,
      s"sampled index not thinned: ${bwtLen(s"$dir/s2")} vs ${bwtLen(s"$dir/full")}")

    val rnd = new scala.util.Random(17)
    val vocab = Seq("red", "blue", "green", "go", "stop", "x1", "nope")
    (1 to 25).foreach { _ =>
      val len = 1 + rnd.nextInt(TokenFmIndex.W + 2)
      val q = (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      val want = bruteIds(s"$dir/data", q)
      assert(fmIds(s"$dir/s2", q) == want, s"sample=2 phrase '$q'")
      assert(fmIds(s"$dir/s3", q) == want, s"sample=3 phrase '$q'")
    }
    // planted phrases must be found through the residue union
    (1 to 10).foreach { _ =>
      val toks = rows(rnd.nextInt(rows.size))._2.split(" ")
      val start = rnd.nextInt(toks.length - 2)
      val q = toks.slice(start, math.min(toks.length,
        start + 2 + rnd.nextInt(8))).mkString(" ")
      assert(fmIds(s"$dir/s2", q) == bruteIds(s"$dir/data", q), s"planted '$q'")
    }
    // sub-sample-length queries take the brute path and stay exact
    assert(fmIds(s"$dir/s3", "red blue") == bruteIds(s"$dir/data", "red blue"))
    assert(fmIds(s"$dir/s3", "go") == bruteIds(s"$dir/data", "go"))
  }

  test("sampled indexes stay exact through the facade path and merges") {
    val rows = corpus(40, 25, seed = 23)
    val dir = TestSpark.tmpDir("tfm-facade-sampled")
    rows.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .toSeq.sorted
    // half the lake under a PLAIN index, half under a SAMPLED one —
    // the facade walk must not push the full pattern through the
    // thinned BWT (it would silently match nothing)
    val plain = s"$dir/plain"; val s2 = s"$dir/s2"
    TokenFmIndex.build(spark, files.take(1), "text", plain)
    TokenFmIndex.build(spark, files.drop(1), "text", s2, sample = 2)
    def lakeIds(q: String): Set[Long] =
      graft.api.TokenFmKind.searchLake(spark, Seq(plain, s2), Seq.empty,
        "text", q, 100000)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val rnd = new scala.util.Random(29)
    (1 to 12).foreach { _ =>
      val toks = rows(rnd.nextInt(rows.size))._2.split(" ")
      val start = rnd.nextInt(toks.length - 2)
      val q = toks.slice(start, start + 2 + rnd.nextInt(5)).mkString(" ")
      assert(lakeIds(q) == bruteIds(s"$dir/data", q), s"facade '$q'")
    }
    // sub-sample-length query: the sampled path demotes to brute, the
    // plain path still walks — result stays exact
    assert(lakeIds("go") == bruteIds(s"$dir/data", "go"))

    // interleave merge of two sampled halves keeps the factor (and so
    // keeps answering through residue probes)
    val sa = s"$dir/ma"; val sb = s"$dir/mb"; val mi = s"$dir/mi"
    TokenFmIndex.build(spark, files.take(1), "text", sa, sample = 2)
    TokenFmIndex.build(spark, files.drop(1), "text", sb, sample = 2)
    spark.conf.set("spark.graft.bwt.merge", "interleave")
    try TokenFmIndex.merge(spark, sa, sb, mi)
    finally spark.conf.unset("spark.graft.bwt.merge")
    assert(TokenFmIndex.sampleOf(spark, mi) == 2)
    // rebuild merge propagates the common factor too
    val mr = s"$dir/mr"
    TokenFmIndex.merge(spark, sa, sb, mr)
    assert(TokenFmIndex.sampleOf(spark, mr) == 2)
    (1 to 8).foreach { _ =>
      val toks = rows(rnd.nextInt(rows.size))._2.split(" ")
      val start = rnd.nextInt(toks.length - 2)
      val q = toks.slice(start, start + 2 + rnd.nextInt(5)).mkString(" ")
      assert(fmIds(mi, q) == bruteIds(s"$dir/data", q), s"interleaved '$q'")
      assert(fmIds(mr, q) == bruteIds(s"$dir/data", q), s"rebuilt '$q'")
    }
  }

  test("merged token-BWT index answers exactly like one whole index") {
    val rows = corpus(30, 20, seed = 5)
    val dir = TestSpark.tmpDir("tfm-merge")
    rows.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .toSeq.sorted
    TokenFmIndex.build(spark, Seq(files.head), "text", s"$dir/a")
    TokenFmIndex.build(spark, files.tail, "text", s"$dir/b")
    TokenFmIndex.merge(spark, s"$dir/a", s"$dir/b", s"$dir/m")
    // the non-default interleave strategy must answer identically
    // (token-alphabet decode + non-power-of-2 W key composition)
    TokenFmIndex.mergeInterleave(spark, s"$dir/a", s"$dir/b", s"$dir/mi")
    TokenFmIndex.build(spark, files, "text", s"$dir/whole")
    Seq("red blue", "go stop go", "x1").foreach { q =>
      def ids(p: String) = TokenFmIndex.search(spark, p, "text", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val w = ids(s"$dir/whole")
      assert(ids(s"$dir/m") == w, s"rebuild-merge query '$q'")
      assert(ids(s"$dir/mi") == w, s"interleave-merge query '$q'")
    }
  }
}
