package graft

import graft.index.FuzzyIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mkLake(rows: Seq[(Long, String)], parts: Int): Seq[String] = {
    val dir = TestSpark.tmpDir("fuzzy-lake")
    rows.toDF("doc_id", "text")
      .repartitionByRange(parts, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    graft.core.Lake.listFiles(dir)
  }

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "pack my box with five dozen liquor jugs",
    3L -> "a quick movement of the enemy will jeopardize five gunboats",
    4L -> "brown paper packages tied up with strings",
    5L -> "the five boxing wizards jump quickly",
    6L -> "a b c single char tokens")

  /** Reference predicate: some token within edit distance 1 of EVERY
    * query token (classic DP levenshtein, the spec's own oracle).
    */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
  private def brute(q: String): Set[Long] = {
    val qtoks = graft.text.Text.RegexTokenizer.tokenizeQuery(q)
    corpus.filter { case (_, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      qtoks.forall(qt => toks.exists(t => lev(t, qt) <= FuzzyIndex.MaxDist))
    }.map(_._1).toSet
  }

  test("deletion neighborhoods intersect exactly when lev <= 1 (superset)") {
    // every lev<=1 pair must share a variant (candidate completeness)
    val pairs = Seq(("fox", "fax"), ("fox", "foxy"), ("foxy", "fox"),
      ("a", "b"), ("quick", "quock"), ("five", "fiv"), ("jump", "jumps"))
    for ((t, q) <- pairs) {
      assert(lev(t, q) <= 1)
      assert(FuzzyIndex.variantsOf(t).toSet
        .intersect(FuzzyIndex.variantsOf(q).toSet).nonEmpty,
        s"($t, $q) neighborhoods must intersect")
    }
  }

  test("randomized: every lev<=1 edit of a random token shares a variant") {
    // candidate completeness on 500 seeded random (token, 1-edit) pairs
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    def randTok(): String =
      (1 to (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 500) {
      val t = randTok()
      val q = rnd.nextInt(3) match {
        case 0 => // substitution
          val i = rnd.nextInt(t.length)
          t.updated(i, alpha(rnd.nextInt(alpha.length)))
        case 1 => // insertion
          val i = rnd.nextInt(t.length + 1)
          t.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + t.substring(i)
        case _ => // deletion (1-char tokens delete to "", skip those)
          if (t.length == 1) t else t.substring(1)
      }
      assert(lev(t, q) <= 1)
      assert(FuzzyIndex.variantsOf(t).toSet
        .intersect(FuzzyIndex.variantsOf(q).toSet).nonEmpty,
        s"($t, $q)")
    }
  }

  test("index search equals the brute levenshtein predicate") {
    val files = mkLake(corpus, 3)
    val idx = TestSpark.tmpDir("fuzzy-idx")
    FuzzyIndex.build(spark, files, "text", idx)
    // typo shapes: substitution, deletion, insertion, exact, 1-char,
    // multi-token AND, and a no-match control
    for (q <- Seq("quock", "fiv", "jumpss", "brown", "z",
        "quick brown", "xyzzy")) {
      val got = FuzzyIndex.search(spark, idx, "text", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == brute(q), s"query '$q'")
    }
  }

  test("empty query returns a defined empty result with the lake schema") {
    val files = mkLake(corpus, 2)
    val idx = TestSpark.tmpDir("fuzzy-idx-e")
    FuzzyIndex.build(spark, files, "text", idx)
    val out = FuzzyIndex.search(spark, idx, "text", "...")
    assert(out.columns.contains("doc_id") && out.count() == 0)
  }

  test("search(merge(a,b)) equals brute force over the union") {
    val filesA = mkLake(corpus.take(3), 2)
    val filesB = mkLake(corpus.drop(3), 2)
    val (a, b, m) = (TestSpark.tmpDir("fa"), TestSpark.tmpDir("fb"),
      TestSpark.tmpDir("fm"))
    FuzzyIndex.build(spark, filesA, "text", a)
    FuzzyIndex.build(spark, filesB, "text", b)
    FuzzyIndex.merge(spark, a, b, m)
    for (q <- Seq("quock", "fiv", "wizardz")) {
      val got = FuzzyIndex.search(spark, m, "text", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == brute(q), s"merged query '$q'")
    }
  }

  test("facade kind: partial coverage (in-situ fill) + empty query") {
    import graft.api.FuzzyKind
    val files = mkLake(corpus, 3)
    val idx = TestSpark.tmpDir("fuzzy-facade-idx")
    FuzzyIndex.build(spark, files.take(2), "text", idx)
    // indexed 2 of 3 files; the third routes through the brute refine
    val got = FuzzyKind.searchLake(spark, Seq(idx), files.drop(2),
        "text", "quock", Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == brute("quock"))
    // empty token stream: defined empty result, not a crash
    val empty = FuzzyKind.searchLake(spark, Seq(idx), files.drop(2),
      "text", "...", Int.MaxValue)
    assert(empty.count() == 0)
  }

  test("probe plan: bucket partition pruning + pushed variant filter") {
    val files = mkLake(corpus, 3)
    val idx = TestSpark.tmpDir("fuzzy-idx-plan")
    FuzzyIndex.build(spark, files, "text", idx)
    val probeVars = FuzzyIndex.variantsOf("quock")
    val qbuckets = probeVars
      .map(graft.index.NgramIndex.bucketOfString).distinct
    val post = spark.read.parquet(s"$idx/postings")
      .filter(col("bucket").isin(qbuckets: _*) &&
        col("variant").isin(probeVars: _*))
    val p = post.queryExecution.executedPlan.toString
    // at 100 TB the postings table is corpus-sized: the probe MUST
    // reach the scan as a bucket partition filter (≤ |q|+1 partitions
    // read) and a pushed variant predicate (row-group min/max skip)
    assert("PartitionFilters: \\[.*bucket".r.findFirstIn(p).isDefined,
      s"probe lost bucket partition pruning:\n$p")
    assert(p.contains("PushedFilters: [In(variant"),
      s"probe variants not pushed to the scan:\n$p")
  }

  test("probe prunes: candidate row groups only, not a full scan") {
    // rows that cannot match the query token must not be read: build a
    // lake whose second file shares no near-tokens with the query, then
    // assert the pruned selective read touches fewer row groups than
    // the lake holds (readHits path, not the covered-files fallback)
    val distinctRows = (1L to 8L).map(i => i -> s"token$i unique$i word$i")
    val files = mkLake(distinctRows ++ Seq(9L -> "needle here"), 4)
    val idx = TestSpark.tmpDir("fuzzy-idx-p")
    FuzzyIndex.build(spark, files, "text", idx)
    val got = FuzzyIndex.search(spark, idx, "text", "needl")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(9L))
    // the index must find exactly one candidate row group for the
    // probe (variant postings are distinct per (variant, uid))
    val post = spark.read.parquet(s"$idx/postings")
    val probeVars = FuzzyIndex.variantsOf("needl")
    val cands = post.filter(col("variant").isin(probeVars: _*))
      .select("uid").distinct().count()
    assert(cands == 1L)
  }
}
