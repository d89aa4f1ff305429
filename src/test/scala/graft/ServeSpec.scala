package graft

import graft.index.{Bm25Index, KeyIndex, NgramIndex, Serve}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The warm serving tier's contract ([[graft.index.Serve]]): every
  * fast path returns BIT-IDENTICAL rows to its Spark twin, and a warm
  * repeat of the same query runs ZERO Spark jobs (the
  * VamanaSpec/searchFast discipline extended to the lexical kinds).
  */
class ServeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // range partitioning confines the needle to the FIRST file, so the
  // ngram lookup hits a strict subset of row groups (the index path,
  // not the everything-hit brute delegate)
  private val corpus = (1L to 60L).map { i =>
    val extra =
      if (i <= 4L) " needle thread fabric"
      else if (i % 7 == 0) " vector stream pipeline"
      else " plain filler body"
    i -> (s"doc $i${extra} tail token${i % 11}")
  }

  private lazy val lakeDir: String = {
    val dir = TestSpark.tmpDir("serve-lake")
    corpus.toDF("doc_id", "text")
      .repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/t")
    s"$dir/t"
  }
  private def files = graft.core.Lake.listFiles(lakeDir)

  private lazy val ngramIdx: String = {
    val p = TestSpark.tmpDir("serve-ngram")
    NgramIndex.build(spark, files, "text", p); p
  }
  private lazy val bm25Idx: String = {
    val p = TestSpark.tmpDir("serve-bm25")
    Bm25Index.build(spark, files, "text", "doc_id", p); p
  }
  private lazy val keyIdx: String = {
    val p = TestSpark.tmpDir("serve-key")
    KeyIndex.build(spark, files, "text", p); p
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def jobs(group: String)(f: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try f finally sc.clearJobGroup()
    sc.statusTracker.getJobIdsForGroup(group).length
  }

  test("ngram fast path: bit-identical rows, zero jobs when warm") {
    val q = "needle thread"
    val viaSpark = rowSet(NgramIndex.search(spark, ngramIdx, "text", q))
    Serve.clearCaches()
    val cold = rowSet(Serve.ngram(spark, ngramIdx, "text", q))
    assert(cold == viaSpark && cold.nonEmpty)
    val j = jobs("serve-ngram-warm") {
      assert(rowSet(Serve.ngram(spark, ngramIdx, "text", q)) == viaSpark)
    }
    assert(j == 0, s"warm ngram lookup ran $j Spark jobs")
  }

  test("bm25 fast path: bit-identical (doc_id, score), zero jobs when warm") {
    val q = "vector stream"
    val viaSpark = Bm25Index.search(spark, bm25Idx, q, 10).collect().toSeq
    Serve.clearCaches()
    val cold = Serve.bm25(spark, bm25Idx, q, 10).collect().toSeq
    assert(cold == viaSpark && cold.nonEmpty) // ordered AND score-exact
    val j = jobs("serve-bm25-warm") {
      assert(Serve.bm25(spark, bm25Idx, q, 10).collect().toSeq == viaSpark)
    }
    assert(j == 0, s"warm bm25 lookup ran $j Spark jobs")
  }

  test("populate pre-warm: the FIRST query after a warm runs zero jobs") {
    val q = "vector stream"
    val viaSpark = Bm25Index.search(spark, bm25Idx, q, 10).collect().toSeq
    // cold caches, explicit populate (the reference populate_cache):
    // the very first query afterwards must already be job-free — no
    // nondeterministic cold-start on whichever query arrives first
    Serve.clearCaches()
    val rows = Serve.populate(spark, bm25Idx).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.keySet == Set("docstats", "head", "postings", "vocab"))
    assert(rows("docstats") == corpus.size.toLong) // every doc has tokens
    assert(rows("postings") == rows("vocab") && rows("vocab") > 0)
    val j = jobs("serve-populate-first") {
      assert(Serve.bm25(spark, bm25Idx, q, 10).collect().toSeq == viaSpark)
    }
    assert(j == 0, s"first query after populate ran $j Spark jobs")
    // ngram populate: first exact-contains probe is job-free up to the
    // hit-row materialization (which faults in lake rows per query) —
    // pin that the GRAM slices are warm by checking the uid probe path
    Serve.clearCaches()
    val np = Serve.populate(spark, ngramIdx).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(np.keySet == Set("postings") && np("postings") > 0)
    // key populate: whole key table warm, first exact lookup job-free
    // after the shared row materialization of its hits
    Serve.clearCaches()
    val kp = Serve.populate(spark, keyIdx).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kp.keySet == Set("keys") && kp("keys") > 0)
  }

  test("populate pre-warm: BWT chunk tier (fm index)") {
    val p = TestSpark.tmpDir("serve-populate-fm")
    graft.index.FmIndex.build(spark, files, "text", p)
    Serve.clearCaches()
    val rows = Serve.populate(spark, p).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.keySet == Set("fm", "head") && rows("fm") > 0)
    // the warmed walk answers identically to a cold one
    val warm = graft.index.FmIndex.search(spark, p, "text", "needle")
      .collect().map(_.toString).toSet
    Serve.clearCaches()
    val cold = graft.index.FmIndex.search(spark, p, "text", "needle")
      .collect().map(_.toString).toSet
    assert(warm == cold && warm.nonEmpty)
  }

  test("populate pre-warm: IVF vector index, first served probe job-free") {
    val vecs = (0L until 40L).map { i =>
      i -> Seq.tabulate(8)(d => math.sin(i * 1.7 + d).abs + 0.1)
    }
    val idx = TestSpark.tmpDir("serve-populate-ivf")
    graft.index.VectorIndex.build(spark, vecs.toDF("vec_id", "v"), idx)
    val qv = vecs(3)._2
    val viaSpark = graft.index.VectorIndex
      .searchPq(spark, idx, qv, 5, 4, 10).collect().map(_.toString).toSeq
    Serve.clearCaches()
    val rows = Serve.populate(spark, idx).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.keySet == Set("cells", "head", "vecs"))
    assert(rows("cells") == rows("vecs") && rows("cells") > 0)
    val j = jobs("serve-populate-ivf-first") {
      assert(Serve.ivfPq(spark, idx, qv, 5, 4, 10)
        .collect().map(_.toString).toSeq == viaSpark)
    }
    assert(j == 0, s"first IVF probe after populate ran $j Spark jobs")
  }

  test("bm25 fast path across SEVERAL covering indexes (global IDF)") {
    val a = TestSpark.tmpDir("serve-bm25a")
    val b = TestSpark.tmpDir("serve-bm25b")
    Bm25Index.build(spark, files.take(1), "text", "doc_id", a)
    Bm25Index.build(spark, files.drop(1), "text", "doc_id", b)
    val terms = Seq("vector" -> 1.0, "stream" -> 1.0, "filler" -> 0.25)
    val viaSpark = Bm25Index
      .searchWeightedMany(spark, Seq(a, b), terms, 10).collect().toSeq
    Serve.clearCaches()
    val fast = Serve.bm25Weighted(spark, Seq(a, b), terms, 10)
      .collect().toSeq
    assert(fast == viaSpark && fast.nonEmpty)
  }

  test("wildcard fast path: bit-identical ranked rows, zero jobs warm") {
    // prefix expands to several vocab tokens (vector, ...): the warm
    // expansion must equal the postings startsWith scan, and scoring
    // rides the bm25Weighted identity
    val prefix = "t"
    def sparkTerms = spark.read.parquet(s"$bm25Idx/postings")
      .filter(col("token").startsWith(prefix))
      .select("token").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val viaSpark = Bm25Index.searchWeightedMany(spark, Seq(bm25Idx),
      sparkTerms.map(_ -> 1.0), 10).collect().toSeq
    assert(sparkTerms.size > 1, "fixture prefix should multi-expand")
    Serve.clearCaches()
    val cold = Serve.wildcard(spark, bm25Idx, prefix, 10).collect().toSeq
    assert(cold == viaSpark && cold.nonEmpty)
    val j = jobs("serve-wildcard-warm") {
      assert(Serve.wildcard(spark, bm25Idx, prefix, 10)
        .collect().toSeq == viaSpark)
    }
    assert(j == 0, s"warm wildcard lookup ran $j Spark jobs")
    // no-match prefix: schema-stable empty, still zero jobs warm
    assert(Serve.wildcard(spark, bm25Idx, "zzzq", 10).collect().isEmpty)
  }

  test("suffix/infix wildcard: sidecar expansion == vocab scan, warm zero jobs") {
    // the rvocab probe (Spark path) and the cached-vocab filter (warm
    // path) must expand to the SAME term set for every single-* shape,
    // and scoring rides the bm25Weighted identity
    for (pattern <- Seq("*d", "s*m", "th*ad", "*zzq")) {
      val i = pattern.indexOf('*')
      val (pre, suf) = (pattern.take(i), pattern.drop(i + 1))
      val terms = Bm25Index.expandWildcard(spark, bm25Idx, pre, suf)
      // independent check: brute endsWith/startsWith over the postings
      val brute = spark.read.parquet(s"$bm25Idx/postings")
        .select("token").distinct().collect().map(_.getString(0))
        .filter(t => t.startsWith(pre) && t.endsWith(suf) &&
          t.length >= pre.length + suf.length).sorted.toSeq
      assert(terms == brute, s"expansion mismatch for $pattern")
      val viaSpark = Bm25Index.searchWeightedMany(spark, Seq(bm25Idx),
        terms.map(_ -> 1.0), 10).collect().toSeq
      Serve.clearCaches()
      val cold =
        Serve.wildcardPattern(spark, bm25Idx, pattern, 10).collect().toSeq
      assert(cold == viaSpark, s"cold serve mismatch for $pattern")
      val j = jobs(s"serve-wild-$pattern") {
        assert(Serve.wildcardPattern(spark, bm25Idx, pattern, 10)
          .collect().toSeq == viaSpark)
      }
      assert(j == 0, s"warm $pattern lookup ran $j Spark jobs")
    }
  }

  test("key fast path: bit-identical rows, zero jobs when warm") {
    val key = corpus(23)._2 // exact full-text key
    val viaSpark = rowSet(KeyIndex.searchExact(spark, keyIdx, "text", key))
    Serve.clearCaches()
    val cold = rowSet(Serve.keyExact(spark, keyIdx, "text", key))
    assert(cold == viaSpark && cold.nonEmpty)
    val j = jobs("serve-key-warm") {
      assert(rowSet(Serve.keyExact(spark, keyIdx, "text", key)) == viaSpark)
    }
    assert(j == 0, s"warm key lookup ran $j Spark jobs")
  }

  test("key fast path over a BINARY key column") {
    val dir = TestSpark.tmpDir("serve-binkey")
    (1L to 30L).map(i => (i, f"k-$i%03d"))
      .toDF("id", "sval")
      .withColumn("bkey", encode(col("sval"), "UTF-8"))
      .repartitionByRange(2, col("id"))
      .write.mode("overwrite").parquet(s"$dir/t")
    val idx = TestSpark.tmpDir("serve-binkey-idx")
    KeyIndex.build(spark, graft.core.Lake.listFiles(s"$dir/t"), "bkey", idx)
    val probe = "k-017".getBytes("UTF-8").map(b => f"$b%02X").mkString
    val viaSpark = KeyIndex.searchExact(spark, idx, "bkey", probe)
      .select("id").collect().map(_.getLong(0)).toSet
    Serve.clearCaches()
    val fast = Serve.keyExact(spark, idx, "bkey", probe)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(fast == viaSpark && fast == Set(17L))
  }

  private lazy val fuzzyIdx: String = {
    val p = TestSpark.tmpDir("serve-fuzzy")
    graft.index.FuzzyIndex.build(spark, files, "text", p); p
  }

  test("fuzzy fast path: bit-identical rows, zero jobs when warm") {
    val q = "needlz threid" // both tokens 1 SUBSTITUTION from corpus tokens
    val viaSpark = rowSet(
      graft.index.FuzzyIndex.search(spark, fuzzyIdx, "text", q))
    Serve.clearCaches()
    val cold = rowSet(Serve.fuzzy(spark, fuzzyIdx, "text", q))
    assert(cold == viaSpark && cold.nonEmpty)
    val j = jobs("serve-fuzzy-warm") {
      assert(rowSet(Serve.fuzzy(spark, fuzzyIdx, "text", q)) == viaSpark)
    }
    assert(j == 0, s"warm fuzzy lookup ran $j Spark jobs")
  }

  test("smartSearch fuzzy fallback serves warm on a fully-indexed lake") {
    // exact finds nothing for the typo → the did-you-mean fallback —
    // with BOTH kinds each covered by one index, the whole search box
    // answers with zero Spark jobs warm
    val dir = TestSpark.tmpDir("serve-smart-fuzzy")
    corpus.toDF("doc_id", "text")
      .repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/t")
    val lake = graft.api.GraftLake(spark, s"$dir/t")
    lake.index(graft.api.NgramKind, "text")
    lake.index(graft.api.FuzzyKind, "text")
    def ids(): Set[Long] =
      lake.smartSearch("text", "needlz", 100, Seq("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = corpus.filter(_._2.contains("needle")).map(_._1).toSet
    assert(ids() == want && want.nonEmpty) // cold
    val j = jobs("smart-fuzzy-warm") { assert(ids() == want) }
    assert(j == 0, s"warm smartSearch fuzzy fallback ran $j Spark jobs")
  }

  test("suggest fast path: bit-identical rows, zero jobs when warm") {
    import org.apache.spark.sql.functions.{col, length, levenshtein, lit, sum}
    val term = "vektor" // distance 1 from "vector"
    val viaSpark = spark.read.parquet(s"$bm25Idx/postings")
      .select(col("token"), col("tf").cast("long").as("tf"))
      .filter(length(col("token")).between(term.length - 1, term.length + 1))
      .filter(levenshtein(col("token"), lit(term)) <= 1)
      .groupBy(col("token")).agg(sum(col("tf")).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .collect().toSeq
    Serve.clearCaches()
    val cold = Serve.suggest(spark, bm25Idx, term).collect().toSeq
    assert(cold == viaSpark && cold.nonEmpty)
    val j = jobs("serve-suggest-warm") {
      assert(Serve.suggest(spark, bm25Idx, term).collect().toSeq == viaSpark)
    }
    assert(j == 0, s"warm suggest ran $j Spark jobs")
  }

  test("levDistance matches Spark's levenshtein on random strings") {
    import org.apache.spark.sql.functions.{levenshtein, lit}
    val rnd = new scala.util.Random(17)
    val alpha = "abcde"
    val pairs = (1 to 60).map { _ =>
      def s() = (0 until rnd.nextInt(8))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (s(), s())
    }
    val viaSpark = pairs.toDF("a", "b")
      .select(levenshtein(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")))
      .collect().map(_.getInt(0)).toSeq
    val viaDriver = pairs.map { case (a, b) => Serve.levDistance(a, b) }
    assert(viaDriver == viaSpark)
  }

  test("version keys invalidate on rebuild: no stale serving") {
    // the tier's safety property: an in-place rebuild (new meta
    // signature) must flip every cache key — a warm server must never
    // answer from the OLD index's slices against the new corpus
    val dir = TestSpark.tmpDir("serve-rebuild")
    def writeCorpus(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .repartitionByRange(2, col("doc_id"))
        .write.mode("overwrite").parquet(s"$dir/t")
    val idx = TestSpark.tmpDir("serve-rebuild-idx")
    writeCorpus(Seq(1L -> "old needle body", 2L -> "plain filler"))
    NgramIndex.build(spark, graft.core.Lake.listFiles(s"$dir/t"), "text", idx)
    def served(): Set[Long] =
      Serve.ngram(spark, idx, "text", "needle")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(served() == Set(1L))
    assert(served() == Set(1L)) // warm
    // rebuild in place over a DIFFERENT corpus
    writeCorpus(Seq(1L -> "plain filler", 2L -> "plain filler",
      3L -> "new needle home", 4L -> "needle again"))
    NgramIndex.build(spark, graft.core.Lake.listFiles(s"$dir/t"), "text", idx)
    assert(served() == Set(3L, 4L),
      "warm server answered from the pre-rebuild caches")
  }

  test("absent probes answer empty without error (negative caching)") {
    // collect(), not count(): a count aggregate schedules a job even
    // over a LocalTableScan, which would mis-measure the serving tier
    def n(df: org.apache.spark.sql.DataFrame) = df.collect().length
    Serve.clearCaches()
    assert(n(Serve.ngram(spark, ngramIdx, "text", "zzzzqqq")) == 0)
    assert(n(Serve.bm25(spark, bm25Idx, "zzzzqqq", 10)) == 0)
    assert(n(Serve.keyExact(spark, keyIdx, "text", "no such key")) == 0)
    // …and a warm repeat of the absent probe is also zero jobs
    val j = jobs("serve-neg-warm") {
      assert(n(Serve.ngram(spark, ngramIdx, "text", "zzzzqqq")) == 0)
      assert(n(Serve.keyExact(spark, keyIdx, "text", "no such key")) == 0)
    }
    assert(j == 0, s"warm negative probes ran $j Spark jobs")
  }

  test("admission: a payload above a quarter of the budget is refused, warm entries survive") {
    val saved = Serve.Budget.MaxServeBytes
    val c = Serve.testCache
    try {
      Serve.Budget.MaxServeBytes = 4096L
      c.put("small", "x" * 100) // ~304 bytes, admitted
      assert(c.get("small").isDefined)
      val before = Serve.Budget.usedBytes
      // ~4104 bytes > 1024 = budget/4: refused outright — without the
      // admission check this insert would evict every other cache's
      // entries (and then itself), thrashing the warm tier
      c.put("huge", "y" * 2000)
      assert(c.get("huge").isEmpty, "oversized payload must not be admitted")
      assert(c.get("small").isDefined,
        "an oversized insert must not evict warm entries")
      assert(Serve.Budget.usedBytes == before,
        "a refused insert must not change the byte account")
    } finally {
      c.clear()
      Serve.Budget.MaxServeBytes = saved
      Serve.clearCaches()
    }
  }

  test("byte budget: oversized inserts evict across caches, results stay exact") {
    val q = "vector stream"
    val viaSpark = Bm25Index.search(spark, bm25Idx, q, 10).collect().toSeq
    val saved = Serve.Budget.MaxServeBytes
    try {
      Serve.clearCaches()
      assert(Serve.Budget.usedBytes == 0L,
        s"cleared caches must release every byte, got ${Serve.Budget.usedBytes}")
      // a budget far below one key table / dl table forces eviction on
      // every insert — the tier must stay CORRECT (Spark-path-identical
      // rows), just cold
      Serve.Budget.MaxServeBytes = 2048L
      assert(Serve.bm25(spark, bm25Idx, q, 10).collect().toSeq == viaSpark)
      assert(rowSet(Serve.keyExact(spark, keyIdx, "text", corpus(3)._2)) ==
        rowSet(KeyIndex.searchExact(spark, keyIdx, "text", corpus(3)._2)))
      assert(Serve.Budget.usedBytes <= 2048L,
        s"budget enforced by BYTES: used ${Serve.Budget.usedBytes} > 2048")
      // restore a real budget: the same lookups warm up again and the
      // byte account tracks the cached payloads
      Serve.Budget.MaxServeBytes = saved
      assert(Serve.bm25(spark, bm25Idx, q, 10).collect().toSeq == viaSpark)
      val used = Serve.Budget.usedBytes
      assert(used > 2048L && used <= saved,
        s"warm caches must hold accounted bytes, got $used")
      val j = jobs("serve-budget-warm") {
        assert(Serve.bm25(spark, bm25Idx, q, 10).collect().toSeq == viaSpark)
      }
      assert(j == 0, s"warm post-budget lookup ran $j Spark jobs")
    } finally {
      Serve.Budget.MaxServeBytes = saved
      Serve.clearCaches()
    }
  }
}
