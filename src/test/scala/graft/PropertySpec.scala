package graft

import graft.functions.WinnowFp
import graft.index.KeyIndex
import graft.ops.{Maintenance, Pipeline}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks of the pure driver-side algorithms plus the
  * iterative CC operator against independent reimplementations.
  */
object PropertySpec extends Properties("graft") {

  // ---- CAS metadata NDJSON round trip --------------------------------
  // one snapshot manifest line per row, adversarial content: quotes,
  // backslashes, raw newlines, JSON braces, unicode — the classic ways
  // a hand-rolled line format loses rows. Jackson escapes embedded
  // newlines, so linesIterator parsing stays 1:1 with rows.

  private val nasty: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('"', '\\', '\n', '\t', ',', '{', '}'),
      1 -> Gen.oneOf('é', '雪', 'А'))).map(_.mkString))

  private val casRows: Gen[List[graft.core.CasMetadata.FullRow]] =
    Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n,
      for {
        t <- nasty; c <- nasty
        files <- Gen.chooseNum(0, 3).flatMap(Gen.listOfN(_, nasty))
        counts <- Gen.listOfN(files.size, Gen.chooseNum(0L, 1L << 40))
        kind <- nasty
        ri <- Gen.chooseNum(0L, Long.MaxValue)
        ts <- Gen.chooseNum(0L, Long.MaxValue)
      } yield graft.core.CasMetadata.FullRow(t, c, files, counts,
        "", kind, ri, ts)))

  property("CasMetadata commit/read round-trips adversarial content") =
    Prop.forAllNoShrink(casRows) { rows0 =>
      // distinct index_file keys (the merge replaces by key)
      val rows = rows0.zipWithIndex.map { case (r, i) =>
        r.copy(indexFile = s"idx$i\u0000${r.table}")
      }
      val dir = "norename://" + TestSpark.tmpDir("casprop")
      val spark = TestSpark.spark
      graft.core.CasMetadata.commit(spark, dir, rows)
      graft.core.CasMetadata.read(spark, dir).toSet == rows.toSet
    }

  // ---- winnowing fingerprints vs a direct reimplementation -----------

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.numChar))
        .map(_.mkString))

  private def bruteWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    if (s.length < k) return Seq.empty
    val cf = WinnowFp.coefs(k)
    val hs = s.sliding(k).map(g =>
      g.zipWithIndex.map { case (c, j) => c.toLong * cf(j) }.sum % WinnowFp.P).toVector
    hs.indices.map(i => hs.slice(i, math.min(i + w, hs.size)).min)
      .distinct.sorted
  }

  property("WinnowFp.compute == brute force") = Prop.forAll(asciiText) { s =>
    val a = WinnowFp.compute(UTF8String.fromString(s), 8, 4)
    (0 until a.numElements()).map(a.getLong) == bruteWinnow(s, 8, 4)
  }

  // ---- bin packing ----------------------------------------------------

  private val fileSets: Gen[List[(String, Long)]] =
    Gen.listOf(Gen.chooseNum(1L, 500L)).map(_.zipWithIndex.map {
      case (rows, i) => (s"f$i", rows)
    })

  property("binpack preserves order and respects the threshold") =
    Prop.forAll(fileSets, Gen.chooseNum(100L, 1000L)) { (files, threshold) =>
      val groups = Maintenance.binpack(files, threshold)
      val order = groups.flatten == files.map(_._1)
      val byName = files.toMap
      val bounded = groups.forall { g =>
        g.map(byName).sum <= threshold || g.size == 1
      }
      val nonEmpty = groups.forall(_.nonEmpty)
      order && bounded && nonEmpty
    }

  // ---- key prefix upper bound -----------------------------------------

  private val prefixGen: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n,
      Gen.frequency(8 -> Gen.alphaNumChar,
        1 -> Gen.oneOf('#', 'é', '中', '\uFF22', '\uE000', '\uFFFE')))
      .map(_.mkString))

  property("prefixUpperBound brackets exactly the prefixed strings") =
    Prop.forAll(prefixGen, prefixGen) { (prefix, suffix) =>
      KeyIndex.prefixUpperBound(prefix) match {
        case None => prefix.isEmpty ||
          (prefix.last >= '\uD7FF' &&
            (prefix.last < '\uE000' || prefix.last >= '\uFFFF'))
        case Some(hi) =>
          val inside = prefix + suffix
          // every prefixed string falls in [prefix, hi)
          prefix <= inside && inside < hi
      }
    }

  // ---- connected components vs union-find ------------------------------

  private final class UnionFind(n: Int) {
    private val p = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (p(x) != x) p(x) = find(p(x)); p(x) }
    def union(a: Int, b: Int): Unit = { val (x, y) = (find(a), find(b)); if (x != y) p(math.max(x, y)) = math.min(x, y) }
  }

  private val graphs: Gen[List[(Int, Int)]] = for {
    n <- Gen.chooseNum(2, 14)
    m <- Gen.chooseNum(1, 16)
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
    } yield (a, b))
  } yield es.filter { case (a, b) => a != b }

  // each CC sample runs an iterative Spark job set — 30 samples keep
  // the suite fast while still covering multi-component + multi-hop
  // shapes (the pure properties lose nothing that matters at 30)
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  property("connectedComponents == union-find") =
    Prop.forAllNoShrink(graphs) { edges =>
      edges.isEmpty || {
        val spark = TestSpark.spark
        import spark.implicits._
        val got = Pipeline.connectedComponents(
          edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("i", "j"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val n = edges.flatMap { case (a, b) => Seq(a, b) }.max + 1
        val uf = new UnionFind(n)
        edges.foreach { case (a, b) => uf.union(a, b) }
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        // representative = min node of the component on both sides
        val byRoot = nodes.groupBy(uf.find).map { case (_, ns) => (ns.toSet, ns.min) }
        nodes.forall { v =>
          val rep = byRoot.collectFirst { case (s, m) if s(v) => m }.get
          got.get(v.toLong).contains(rep.toLong)
        }
      }
    }

  // ---- code-point helpers vs Java's own code-point API ----------------

  private val unicodeText: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaLowerChar.map(_.toString),
      2 -> Gen.const(" "),
      1 -> Gen.const(new String(Character.toChars(0x1F600))), // surrogate pair
      1 -> Gen.const("\uffee"))).map(_.mkString))

  property("codePoints partitions any string into whole code points") =
    Prop.forAll(unicodeText) { s =>
      val cps = graft.text.Text.codePoints(s)
      cps.mkString == s &&
        cps.forall(c => c.codePointCount(0, c.length) == 1) &&
        cps.length == s.codePointCount(0, s.length)
    }

  property("cpGrams windows == brute code-point sliding") =
    Prop.forAll(unicodeText, Gen.chooseNum(1, 5)) { (s, n) =>
      val cps = graft.text.Text.codePoints(s)
      val want =
        if (cps.length < n) Seq.empty
        else (0 to cps.length - n).map(i => cps.slice(i, i + n).mkString)
      graft.text.Text.cpGrams(s, n) == want
    }

  property("sparkLower == Spark's lower() on UTF8String") =
    Prop.forAll(unicodeText) { s =>
      graft.text.Text.sparkLower(s) ==
        UTF8String.fromString(s).toLowerCase.toString
    }

  // ---- wavelet-matrix rank vs naive count ------------------------------

  private val codeSeqs: Gen[(Array[Int], Int)] = for {
    sigma <- Gen.chooseNum(2, 50)
    m <- Gen.chooseNum(1, 600)
    codes <- Gen.listOfN(m, Gen.chooseNum(0, sigma - 1))
  } yield (codes.toArray, sigma)

  // ---- subword tokenizer invariants ---------------------------------

  private val mixedText: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaChar, 2 -> Gen.const(' '), 2 -> Gen.numChar,
        1 -> Gen.oneOf('!', '-', '_', 'é', '雪')))
        .map(_.mkString))

  property("subword tokens concatenate back to the alnum stream") =
    Prop.forAll(mixedText) { s =>
      val toks = graft.text.Text.SubwordTokenizer.tokenizeQuery(s)
      // lossless over [a-z0-9]: joining the pieces reproduces the
      // lowercased text with every non-alphanumeric removed, and every
      // piece is either a vocab entry or a single symbol
      val want = graft.text.Text.sparkLower(s).replaceAll("[^a-z0-9]", "")
      toks.mkString == want &&
        toks.forall(t =>
          graft.text.Text.SubwordTokenizer.Vocab.contains(t) || t.length == 1)
    }

  property("wavelet rankInChunk == naive prefix count") =
    Prop.forAll(codeSeqs, Gen.chooseNum(0, 1000)) { case ((codes, sigma), seed) =>
      val depth = math.max(1, 32 - Integer.numberOfLeadingZeros(sigma - 1))
      val (w, z, b) = graft.index.WaveletIndex.encode(codes, depth)
      val ch = graft.index.WaveletIndex.WChunk(0L, codes.length, w, z, b,
        Map.empty, Nil)
      val rnd = new scala.util.Random(seed)
      (1 to 8).forall { _ =>
        val c = rnd.nextInt(sigma)
        val pos = rnd.nextInt(codes.length + 1)
        graft.index.WaveletIndex.rankInChunk(ch, c, depth, pos) ==
          codes.take(pos).count(_ == c).toLong
      }
    }
}
