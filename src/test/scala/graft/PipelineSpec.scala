package graft

import graft.ops.Pipeline
import graft.functions.WinnowFp
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents resolves chains, cliques, and pairs") {
    // chain 1-2-3-4 (multi-hop), triangle 10-11-12, pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("i", "j")
    val got = Pipeline.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents propagates across a long path") {
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("i", "j")
    val got = Pipeline.connectedComponents(edges).collect()
    assert(got.forall(_.getLong(1) == 1L) && got.length == 12)
  }

  private def winnow(s: String): Seq[Long] = {
    val a = WinnowFp.compute(UTF8String.fromString(s), 8, 4)
    (0 until a.numElements()).map(a.getLong)
  }

  test("WinnowFp matches a brute-force reimplementation") {
    val s = "the quick brown fox jumps over the lazy dog"
    val cf = WinnowFp.coefs(8)
    val hs = s.sliding(8).map(g =>
      g.zipWithIndex.map { case (c, j) => c.toLong * cf(j) }.sum % WinnowFp.P).toSeq
    val mins = hs.indices.map(i => hs.slice(i, math.min(i + 4, hs.size)).min)
    assert(winnow(s) == mins.distinct.sorted)
  }

  test("WinnowFp of a short string is empty; repeats share fingerprints") {
    assert(winnow("short").isEmpty)
    // identical halves yield identical gram hashes → same fingerprint set
    // as one half except at the seam
    val one = winnow("abcdefghij")
    val two = winnow("abcdefghijabcdefghij")
    assert(one.toSet.subsetOf(two.toSet))
  }

  test("packSequences opens a new bin exactly at the budget boundary") {
    val words = (1 to 200).map(i => s"w$i").mkString(" ") // 200 tokens/doc
    val d = (0L until 6L).map(i => (i, "s0", words)).toDF("doc_id", "source", "text")
    val bins = Pipeline.packSequences(d)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // cumulative starts 0,200,400,600,800,1000 with budget 512
    assert(bins == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("sampleStratified is deterministic and respects zero-rate langs") {
    val d = (0L until 300L).map(i => (i, if (i % 2 == 0) "en" else "xx", "t"))
      .toDF("doc_id", "lang", "text")
    val a = Pipeline.sampleStratified(d).collect().map(_.getLong(0)).sorted
    val b = Pipeline.sampleStratified(d).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.forall(_ % 2 == 0)) // 'xx' has no rate → dropped
  }

  test("mixtureSample hits each source's token target within one doc overshoot") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ") // 100 tokens/doc
    val d = (0L until 120L).map(i => (i, s"src${i % 6}", words))
      .toDF("doc_id", "source", "text")
    val got = Pipeline.mixtureSample(d).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // unweighted sources (src5) contribute nothing
    assert(got.forall(_._1 != "src5"))
    val bySrc = got.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    Pipeline.MixBp.foreach { case (src, bp) =>
      val target = bp * Pipeline.MixBudget / 10000
      val tok = bySrc.getOrElse(src, 0L)
      // greedy admit: ≥ target (unless source exhausted) and overshoot
      // bounded by one document
      assert(tok >= math.min(target, 2000L) && tok < target + 100,
        s"$src: $tok vs target $target")
    }
    // deterministic across runs
    val again = Pipeline.mixtureSample(d).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.sortBy(_.toString).sameElements(again.sortBy(_.toString)))
  }

  test("dsirSample prefers documents that look like the target slice") {
    // target (en) docs share a vocabulary; the out-of-distribution docs
    // use disjoint words — DSIR must rank in-distribution docs first
    val enWords = "alpha beta gamma delta epsilon zeta"
    val deWords = "zahl wort haus baum fluss berg"
    val d = ((0L until 20L).map(i => (i, "en", enWords)) ++
      (20L until 40L).map(i => (i, "de", deWords)) ++
      // an unlabeled doc WRITTEN in target vocabulary: must be selected
      Seq((99L, "de", enWords)))
      .toDF("doc_id", "lang", "text")
    val got = Pipeline.dsirSample(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = got.map(_._1).toSet
    assert(ids.contains(99L), "target-like doc not selected")
    // every target-vocab doc outscores every out-of-distribution doc
    val sc = got.toMap
    assert(sc(99L) > sc(20L) && sc(0L) > sc(20L))
  }

  test("repetition flags a degenerate doc and clears a diverse one") {
    val d = Seq((1L, "spam spam spam spam"), (2L, "all words differ here"))
      .toDF("doc_id", "text")
    val got = Pipeline.repetition(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // top bigram fills 3 of 3 bigram slots → exactly 1.0 (the
    // covered-token formulation overshot to 1.5 on this overlap run)
    assert(got(1L) == ((0.75, 1.0, 1.0)))
    assert(got(2L) == ((0.0, 0.25, 0.3333))) // 1 of 3 slots
  }

  test("repetition's fractions never exceed 1 on overlapping runs") {
    val d = Seq((1L, "a a a"), (2L, "x y x y x y x")).toDF("doc_id", "text")
    val got = Pipeline.repetition(d).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    got.foreach { case (df, tf, bf) =>
      assert(df >= 0 && df <= 1 && tf >= 0 && tf <= 1 && bf >= 0 && bf <= 1,
        s"fraction out of [0,1]: ($df, $tf, $bf)")
    }
  }

  test("chunkWindows tiles tokens with stride overlap and short tails") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ") // 40 tokens
    val d = Seq((7L, words)).toDF("doc_id", "text")
    val got = Pipeline.chunkWindows(d).collect()
      .map(r => (r.getLong(1), r.getString(2).split(" ").length, r.getLong(3)))
      .sortBy(_._1)
    // starts 0,16,32 → sizes 32, 24, 8
    assert(got.toSeq == Seq((0L, 32, 32L), (1L, 24, 24L), (2L, 8, 8L)))
    val first = Pipeline.chunkWindows(d).orderBy("chunk_id").collect()
    assert(first(0).getString(2).startsWith("w1 w2 ") &&
      first(1).getString(2).startsWith("w17 w18 "))
  }

  test("decontaminate flags only docs sharing a 5-gram with the benchmark") {
    val shared = "one two three four five"
    val d = Seq(
      (0L, s"benchmark doc with $shared inside"), // doc_id % 10 == 0 → bench
      (1L, s"corpus doc containing $shared too"),
      (2L, "completely unrelated words in this corpus document"))
      .toDF("doc_id", "text")
    val got = Pipeline.decontaminate(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L) && got(1L) >= 1L)
  }

  test("bloom decontamination gate: planted contamination caught, clean kept") {
    val spark = TestSpark.spark
    val shared = "one two three four five"
    // 1 bench doc, 1 planted-contaminated corpus doc, 20 clean corpus
    // docs with disjoint vocabularies — at DecontamBloomFpp the filter
    // must keep ≥ 95% of the clean ones and NEVER the contaminated one
    val clean = (1 to 20).map(i =>
      ((i * 10 + 1).toLong,
        s"clean a$i b$i c$i d$i e$i f$i g$i h$i words here"))
    val d = (Seq(
      (0L, s"benchmark doc with $shared inside"),
      (2L, s"corpus doc containing $shared too")) ++ clean)
      .toDF("doc_id", "text")
    val r = Pipeline.decontaminateBloomGate(spark, d).head()
    assert(r.getLong(0) == 20L, s"n_exact_kept = ${r.getLong(0)}")
    assert(r.getBoolean(1), "a contaminated doc survived the bloom")
    assert(r.getBoolean(2), "bloom overkill exceeded the bound")
  }

  test("decontaminateBloomGate answers 0/true/true on a shingle-less corpus") {
    // every doc is shorter than the 5-token shingle: zero gram rows,
    // so the groupless agg sums are NULL — the gate must coalesce them
    // (the oracle answers 0/true/true) instead of NPEing on getLong
    val d = Seq((0L, "too short"), (1L, "also short"), (2L, "tiny"))
      .toDF("doc_id", "text")
    val r = Pipeline.decontaminateBloomGate(spark, d).head()
    assert(r.getLong(0) == 0L)
    assert(r.getBoolean(1) && r.getBoolean(2))
  }

  test("spanDedup merges overlapping windows into maximal cross-doc spans") {
    // docs 1/2 share two DISJOINT 4-token spans (separated in each doc
    // by unique filler), doc 3 shares nothing, doc 4 repeats a span
    // within itself only (no cross-doc duplicate → not counted)
    val a = "alpha beta gamma delta uniqA1 uniqA2 epsilon zeta eta theta"
    val b = "alpha beta gamma delta uniqB1 uniqB2 epsilon zeta eta theta"
    val d = Seq(
      (1L, a), (2L, b),
      (3L, "nothing here matches any other document at all ever once"),
      (4L, "iota kappa lambda mu filler iota kappa lambda mu tail"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.spanDedup(d, k = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // per doc: spans {alpha..delta} (4 toks) and {epsilon..theta} (4
    // toks) → 2 islands, 8 duplicated tokens
    assert(got == Map(1L -> ((2L, 8L)), 2L -> ((2L, 8L))))
  }

  test("spanDedup chains overlapping windows across a long shared run") {
    // one 8-token run shared verbatim: with k=4 that is 5 overlapping
    // windows which must merge into ONE span of 8 tokens
    val run = "s1 s2 s3 s4 s5 s6 s7 s8"
    val d = Seq(
      (1L, s"prefixone $run suffixone"),
      (2L, s"prefixtwo $run suffixtwo"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.spanDedup(d, k = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 8L)), 2L -> ((1L, 8L))))
  }
}
