package graft.ops

import graft.{Q, Tables}
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the reference's surface:
  * duplicate-cluster resolution (connected components over near-dup
  * pairs), repetition-based quality filters, deterministic stratified
  * sampling for dataset mixing, token-budget sequence packing, and
  * n-gram decontamination against a benchmark set.
  *
  * Everything is deterministic (hash-derived randomness only) so every
  * entry carries an exact DuckDB oracle.
  */
object Pipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ---- connected components over near-dup pairs ----------------------

  val MaxCcIters = 30

  /** Connected components of an undirected edge list (i, j) →
    * (id, cluster) with cluster = min node id in the component — the
    * step every fuzzy-dedup pipeline needs after pair generation to
    * pick one keeper per duplicate cluster.
    *
    * Neighbor-min label propagation: each round every node takes the
    * min of its own and its neighbors' labels (one shuffle join + one
    * shuffle agg per round), converging in O(graph diameter) rounds.
    * Near-dup graphs are clique-ish (diameter 2-3 in practice), so the
    * round count stays tiny at any corpus size; for adversarial
    * long-path graphs the alternating large-star/small-star variant
    * bounds rounds at O(log² n) with the same per-round shuffle shape.
    * localCheckpoint truncates the growing lineage each round so plan
    * size stays constant.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("i").as("a"), col("j").as("b"))
      .unionByName(edges.select(col("j").as("a"), col("i").as("b")))
      .distinct()
      .cache()
    var lab = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("cluster"))
      .localCheckpoint(false)
    // labels only ever decrease, so a falling Σlabels is the exact
    // "anything changed" fixpoint test — one lightweight agg per round
    // instead of a join-and-compare probe. DECIMAL(38,0) so the sum
    // cannot wrap (and spuriously repeat) at any node-count × id range.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(lab)
    var done = false
    var iter = 0
    while (!done && iter < MaxCcIters) {
      val prop = sym
        .join(lab.select(col("id").as("b"), col("cluster")), Seq("b"))
        .select(col("a").as("id"), col("cluster"))
      // LAZY localCheckpoint: the labelSum probe below materializes it
      // (one job per round) and truncates the logical plan — the loop
      // references lab twice per round, so anything short of plan
      // truncation (cache included) nests the plan 2^rounds deep.
      // Local checkpoints trade executor-loss recovery for speed; a
      // lost block fails the job rather than silently recomputing.
      val merged = prop.unionByName(lab)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .localCheckpoint(false)
      val curSum = labelSum(merged)
      // NOTE: localCheckpoint blocks are NOT CacheManager entries, so
      // this unpersist is a no-op for them — the old round's blocks are
      // reclaimed by the ContextCleaner when the RDD is GC'd (bounded:
      // one round's labels each, O(diameter) rounds)
      lab.unpersist()
      lab = merged
      done = curSum == prevSum
      prevSum = curSum
      iter += 1
    }
    sym.unpersist()
    lab
  }

  /** Edge set for the dedup_cc entry: MinHash near-dup pairs plus
    * deterministic 3-chains (doc, doc+100k, doc+200k for doc_id % 50 =
    * 0) — the chains force multi-hop label propagation, which 2-cliques
    * alone would never exercise.
    */
  // TWO live edge caches (plan-keyed LRU, same discipline as Dedup's
  // shingle cache): the CC loop re-reads the edge set every round, and
  // regenerating the minhash candidate pipeline per round would
  // dominate the operator
  private val edgeCache = new graft.core.PlanCache(2)

  def ccEdges(s: SparkSession, dir: String): DataFrame = synchronized {
    val d = docs(s, dir)
    // CC's operator under test is label propagation, not pair
    // discovery: edges come from the persisted verified pair table
    // (the artifact a production run hands to its CC stage)
    val pairs = Dedup.minhashPairsTable(s, dir, None)
      .select(col("i"), col("j"))
    val seeds = d.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("i"))
    val chains = seeds.select(col("i"), (col("i") + 100000).as("j"))
      .unionByName(
        seeds.select((col("i") + 100000).as("i"), (col("i") + 200000).as("j")))
    val edges = pairs.unionByName(chains)
    edgeCache.getOrPersist(edges)
  }

  /** The dedup pipeline's END PRODUCT: the surviving corpus. The
    * duplicated corpus (documents ∪ re-keyed copies) runs minhash →
    * CC, each cluster keeps its min-id member, edge-free docs keep
    * themselves — what actually ships to training after near-dup
    * resolution. One minhash pass + the O(diameter) CC loop + one
    * left join; the full row set never self-joins.
    */
  def dedupApply(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.withColumn("doc_id", col("doc_id") + 100000))
    // signatures AND the verified pair list persist once (the staged
    // production artifacts) — repeat runs pay only CC + the apply join
    val fx = Dedup.ensureMinhashFixtureFor(s, dir, "dedup_apply_fixture",
      corpus)
    val labels = connectedComponents(
      Dedup.ensurePairsFor(s, fx, None).select(col("i"), col("j")))
      .withColumnRenamed("id", "doc_id")
    corpus.join(labels, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  /** Quality-preferring dedup apply: keeper = the LONGEST member of
    * each near-dup cluster (tie: min id) instead of min-id — what a
    * real pipeline ships when duplicates differ in completeness (a
    * truncated crawl of the same page should lose to the full one).
    * Fixture: documents ∪ truncated low-id copies, so the min-id rule
    * would WRONGLY keep the truncated copy — this entry proves the
    * keeper policy is what decides. Same shape as [[dedupApply]]: one
    * minhash pass + O(diameter) CC + a per-cluster window (the window
    * partitions by cluster label — cluster sizes are near-dup clique
    * sizes, bounded after exact dedup, so no global sort exists).
    */
  def dedupApplyBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.select((col("doc_id") - 200000).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 10, lit(0))).as("text")))
    val fx = Dedup.ensureMinhashFixtureFor(s, dir,
      "dedup_apply_best_fixture", corpus)
    val labels = connectedComponents(
      Dedup.ensurePairsFor(s, fx, None).select(col("i"), col("j")))
      .withColumnRenamed("id", "doc_id")
    val lab = corpus.join(labels, Seq("doc_id"), "left")
      .withColumn("cl", coalesce(col("cluster"), col("doc_id")))
    val w = Window.partitionBy(col("cl"))
      .orderBy(length(col("text")).desc, col("doc_id"))
    lab.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  private def dedupApplyBestSql: String =
    s"""WITH RECURSIVE
       |corpus AS (SELECT doc_id, text FROM documents
       |           UNION ALL SELECT doc_id - 200000,
       |             substring(text, 1, greatest(length(text) - 10, 0))
       |           FROM documents),
       |pairs AS (
       |${Dedup.minhashSqlImpl(None, source = "corpus")}
       |),
       |sym AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
       |reach(id, r) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id),
       |labels AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
       |lab AS (SELECT c.doc_id, c.text,
       |          coalesce(l.cluster, c.doc_id) AS cl
       |        FROM corpus c LEFT JOIN labels l ON l.id = c.doc_id)
       |SELECT doc_id FROM (
       |  SELECT doc_id,
       |    row_number() OVER (PARTITION BY cl ORDER BY length(text) DESC, doc_id) AS rk
       |  FROM lab) t
       |WHERE rk = 1 ORDER BY doc_id""".stripMargin

  /** The PRODUCTION dedup composition at 100 TB — all three stages the
    * scale docs prescribe, in their load-bearing order:
    *   1. exact dedup (one hash groupBy) collapses identical-text mass
    *      FIRST, so boilerplate mega-cliques never reach LSH;
    *   2. CAPPED minhash LSH over the distinct-text survivors finds
    *      near-dups with per-bucket work bounded at cap² (the skew
    *      guard SkewSpec pins);
    *   3. connected components → keeper = min-id per cluster.
    * The stages compose exactly because stage 1 removes the one shape
    * (identical docs by the million) whose band buckets the cap would
    * otherwise drop — after it, every remaining near-dup clique is
    * content-diverse and small. Signatures persist once like the other
    * dedup fixtures.
    */
  def dedupProduction(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.withColumn("doc_id", col("doc_id") + 100000))
    val survivors = corpus
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"))
      .select("doc_id", "text")
    val fx = Dedup.ensureMinhashFixtureFor(s, dir,
      "dedup_production_fixture", survivors)
    val labels = connectedComponents(
      Dedup.ensurePairsFor(s, fx, Some(Dedup.BucketCap))
        .select(col("i"), col("j")))
      .withColumnRenamed("id", "doc_id")
    survivors.join(labels, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  private[graft] def dedupProductionSql: String =
    s"""WITH RECURSIVE
       |corpus AS (SELECT doc_id, text FROM documents
       |           UNION ALL SELECT doc_id + 100000, text FROM documents),
       |survivors AS (
       |  SELECT min(doc_id) AS doc_id, min(text) AS text
       |  FROM corpus GROUP BY md5(text)),
       |pairs AS (
       |${Dedup.minhashSqlImpl(Some(Dedup.BucketCap), source = "survivors")}
       |),
       |sym AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
       |reach(id, r) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id),
       |labels AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
       |SELECT s.doc_id FROM survivors s LEFT JOIN labels l ON l.id = s.doc_id
       |WHERE l.cluster IS NULL OR l.cluster = s.doc_id ORDER BY s.doc_id""".stripMargin

  private def dedupApplySql: String =
    s"""WITH RECURSIVE
       |corpus AS (SELECT doc_id, text FROM documents
       |           UNION ALL SELECT doc_id + 100000, text FROM documents),
       |pairs AS (
       |${Dedup.minhashSqlImpl(None, source = "corpus")}
       |),
       |sym AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
       |reach(id, r) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id),
       |labels AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
       |SELECT c.doc_id FROM corpus c LEFT JOIN labels l ON l.id = c.doc_id
       |WHERE l.cluster IS NULL OR l.cluster = c.doc_id ORDER BY c.doc_id""".stripMargin

  private def ccSql: String =
    s"""WITH RECURSIVE
       |pairs AS (
       |${Dedup.minhashSql}
       |),
       |chains AS (
       |  SELECT doc_id AS i, doc_id + 100000 AS j FROM documents WHERE doc_id % 50 = 0
       |  UNION ALL
       |  SELECT doc_id + 100000, doc_id + 200000 FROM documents WHERE doc_id % 50 = 0),
       |edges AS (SELECT i, j FROM pairs UNION ALL SELECT i, j FROM chains),
       |sym AS (SELECT i AS a, j AS b FROM edges UNION SELECT j, i FROM edges),
       |reach(id, r) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id)
       |SELECT id, min(r) AS cluster FROM reach GROUP BY id""".stripMargin

  // ---- repetition-based quality filters ------------------------------

  /** Per-document repetition metrics (the Gopher-style repetition
    * filters, adapted to single-line docs): duplicate-token fraction,
    * most-frequent-token fraction, and most-frequent-bigram token
    * fraction. One explode of unigrams+bigrams → two aggs; unigrams and
    * bigrams share a column (a bigram always contains a space, a token
    * never does), so one shuffle covers both statistics.
    */
  def repetition(d: DataFrame): DataFrame = {
    val base = d
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")))
      .filter(col("n_tok") > 0)
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
    // zip_with pads the shorter side with null, which would turn the
    // last token into a phantom unigram — slice the result to n−1
    val bigrams = slice(
      zip_with(col("toks"),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)),
      lit(1), greatest(size(col("toks")) - 1, lit(0)))
    val counts = base
      .select(col("doc_id"), explode(concat(col("toks"), bigrams)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
    val tops = counts.groupBy("doc_id").agg(
      max(when(col("g").contains(" "), col("n"))).as("top_bg"),
      max(when(!col("g").contains(" "), col("n"))).as("top_tok"))
    base.join(tops, Seq("doc_id"))
      .select(col("doc_id"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tok"), 4)
          .as("dup_token_frac"),
        round(col("top_tok").cast("double") / col("n_tok"), 4)
          .as("top_token_frac"),
        // fraction of the n−1 bigram SLOTS taken by the top bigram —
        // a true ≤1 fraction. (Covered-token counting, top_bg*2/n_tok,
        // exceeds 1 on overlapping runs like "a a a": the exact docs
        // the metric exists to flag.)
        round(coalesce(col("top_bg"), lit(0L)).cast("double") /
            greatest(col("n_tok") - 1, lit(1)), 4)
          .as("top_bigram_frac"))
  }

  private val repetitionSql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, toks, len(toks) AS n_tok,
      |    toks || [toks[i] || ' ' || toks[i + 1] for i in generate_series(1, len(toks) - 1)] AS grams
      |  FROM t WHERE len(toks) > 0),
      |c AS (SELECT doc_id, g, count(*) AS n
      |      FROM (SELECT doc_id, unnest(grams) AS g FROM b) x GROUP BY doc_id, g),
      |m AS (SELECT doc_id,
      |        max(CASE WHEN contains(g, ' ') THEN n END) AS top_bg,
      |        max(CASE WHEN NOT contains(g, ' ') THEN n END) AS top_tok
      |      FROM c GROUP BY doc_id)
      |SELECT b.doc_id,
      |  round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n_tok, 4) AS dup_token_frac,
      |  round(CAST(top_tok AS DOUBLE) / n_tok, 4) AS top_token_frac,
      |  round(CAST(coalesce(top_bg, 0) AS DOUBLE) / greatest(n_tok - 1, 1), 4) AS top_bigram_frac
      |FROM b JOIN m USING (doc_id)""".stripMargin

  // ---- deterministic stratified sampling (dataset mixing) ------------

  /** Per-language keep-percentages — the mixing weights a pipeline
    * applies when composing a training set from a multilingual corpus.
    */
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 60, "es" -> 40, "fr" -> 40, "de" -> 40, "zh" -> 20)

  /** Hash-based stratified sampling: bucket = md5(doc_id) % 100, keep
    * rows whose bucket falls under their language's rate. Deterministic
    * (same sample on every run and every engine — unlike sample()/rand()
    * there is no seed-and-partitioning dependence), map-only, and
    * trivially parallel at any scale.
    */
  def sampleStratified(d: DataFrame): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    d.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") <
        element_at(typedLit(SampleRates.toMap), col("lang")))
  }

  /** Per-source document cap (web-corpus "domain capping"): keep the
    * top [[SourceCap]] documents of each source by quality proxy
    * (n_chars desc, doc_id asc tie-break — fully deterministic). One
    * hash shuffle on source + a per-source window; the window state is
    * one counter per partition-local source run. A single dominant
    * source concentrates its rows in one partition — at 100 TB cap
    * FIRST with a coarse per-file pre-filter (zone maps on a
    * quality column bound how many rows can clear the cap) or raise
    * parallelism on the source key; the cap result itself is bounded
    * at cap × |sources| rows regardless of corpus size.
    */
  val SourceCap = 5

  def sourceCap(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    d.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SourceCap)
      .drop("rk")
  }

  private def sourceCapSql: String =
    s"""SELECT doc_id, source, n_chars FROM (
       |  SELECT doc_id, source, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM documents) t
       |WHERE rk <= $SourceCap""".stripMargin

  private def sampleSql: String = {
    val cases = SampleRates.map { case (l, p) => s"WHEN '$l' THEN $p" }
      .mkString(" ")
    s"""SELECT doc_id, lang, b AS bucket FROM (
       |  SELECT doc_id, lang,
       |    CAST(list_sum([(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1)::BIGINT << (4 * (8 - j)) for j in generate_series(1, 8)]) AS BIGINT) % 100 AS b
       |  FROM documents) t
       |WHERE b < CASE lang $cases ELSE 0 END""".stripMargin
  }

  // ---- token-budget sequence packing ---------------------------------

  val PackBudget = 512

  /** Greedy sequence packing: within each source shard, documents (in
    * doc_id order) are packed into bins of `PackBudget` tokens — a doc
    * opens a new bin when the tokens before it cross the budget
    * boundary. The cumulative sum is a window per source shard, so the
    * operator parallelizes across shards (never a global single
    * partition) — at 100 TB the shard key is whatever unit batches are
    * drawn from.
    */
  def packSequences(d: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    d.select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        expr(s"cum div $PackBudget").as("bin"))
  }

  private val packSql =
    s"""SELECT doc_id, source, n_tok, CAST((cum - n_tok) // $PackBudget AS BIGINT) AS bin
       |FROM (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tok,
       |    sum(CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT))
       |      OVER (PARTITION BY source ORDER BY doc_id) AS cum
       |  FROM documents) t""".stripMargin

  // ---- token-window chunking -----------------------------------------

  val ChunkW = 32 // tokens per chunk
  val ChunkS = 16 // stride (50% overlap)

  /** Sliding token-window chunking — the unit-of-embedding prep step: a
    * chunk of `ChunkW` tokens starts every `ChunkS` tokens (trailing
    * chunks shorter). Built with a codegen'd generator (explode of the
    * start sequence) + slice/concat_ws per row — no higher-order
    * functions, no shuffle: a pure map stage at any corpus size.
    */
  def chunkWindows(d: DataFrame): DataFrame = {
    d.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, (size(toks) - 1) div $ChunkS)")).as("k"))
      .select(col("doc_id"), col("k").cast("long").as("chunk_id"),
        concat_ws(" ",
          slice(col("toks"), col("k") * ChunkS + 1, lit(ChunkW))).as("chunk"),
        least(size(col("toks")) - col("k") * ChunkS, lit(ChunkW))
          .cast("long").as("n_chunk_tokens"))
  }

  private val chunkSql =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |ks AS (
       |  SELECT doc_id, toks, unnest(generate_series(0, (len(toks) - 1) // $ChunkS)) AS k
       |  FROM t WHERE len(toks) > 0)
       |SELECT doc_id, k AS chunk_id,
       |  array_to_string(toks[k * $ChunkS + 1 : k * $ChunkS + $ChunkW], ' ') AS chunk,
       |  least(len(toks) - k * $ChunkS, $ChunkW)::BIGINT AS n_chunk_tokens
       |FROM ks""".stripMargin

  // ---- token-budget mixture sampling ---------------------------------

  val MixBudget = 4000L
  /** Target mixture weights in basis points (integer, so each source's
    * token target `bp × MixBudget div 10000` is exact arithmetic in
    * both engines — no float-threshold hazards). Sources absent from
    * the map contribute nothing.
    */
  val MixBp: Seq[(String, Long)] = Seq(
    "src0" -> 3000L, "src1" -> 2000L, "src2" -> 2000L,
    "src3" -> 1500L, "src4" -> 1500L)

  /** Training-mix assembly: each source contributes documents, in
    * deterministic md5(doc_id) order, until its share of the token
    * budget (weight × MixBudget tokens) is reached — a doc is admitted
    * iff its source's target was not yet exhausted before it (greedy,
    * so the mix can overshoot by at most one document per source; the
    * standard mixture-sampling semantics). The cumulative sum is a
    * window per source partition — parallel across sources, never a
    * global sort; the md5 order makes the sample independent of file
    * layout and cluster shape, like [[sampleStratified]]. At 100 TB
    * this is THE operation that assembles a domain-reweighted training
    * mix from a curated lake.
    */
  def mixtureSample(d: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    d.filter(col("source").isin(MixBp.map(_._1): _*))
      .select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tok"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("cum", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("tbp", element_at(typedLit(MixBp.toMap), col("source")))
      // Column./ is always DOUBLE division — div keeps the target exact
      .filter(col("cum") < expr(s"(tbp * $MixBudget) div 10000"))
      .select(col("doc_id"), col("source"), col("n_tok"))
  }

  private def mixtureSql: String = {
    val inList = MixBp.map { case (s, _) => s"'$s'" }.mkString(", ")
    val cases = MixBp.map { case (s, bp) => s"WHEN '$s' THEN $bp" }
      .mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tok,
       |    md5(CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents WHERE source IN ($inList)),
       |c AS (
       |  SELECT doc_id, source, n_tok,
       |    sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id) - n_tok AS cum
       |  FROM t)
       |SELECT doc_id, source, n_tok FROM c
       |WHERE cum < (CASE source $cases END) * $MixBudget // 10000""".stripMargin
  }

  // ---- per-source dataset card ---------------------------------------

  /** Dataset-card statistics per source: document/token counts, mean
    * tokens, language spread, and exact-duplicate count (normalized-
    * fingerprint collisions). ONE partial-agg groupBy — the reporting
    * pass a pipeline runs after curation; countDistinct is Spark's
    * two-round distinct agg, never a driver collect.
    */
  def corpusStatsBySource(d: DataFrame): DataFrame =
    d.select(col("source"), col("lang"),
        Text.tokenCount(col("text")).cast("long").as("n_tok"),
        Text.fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        round(sum(col("n_tok")).cast("double") / count(lit(1)), 4)
          .as("avg_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"))

  private val statsSql =
    s"""SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(n_tok) AS DOUBLE) / count(*), 4) AS avg_tokens,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
       |FROM (
       |  SELECT source, lang,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tok,
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM documents) t
       |GROUP BY source""".stripMargin

  // ---- DSIR importance resampling ------------------------------------

  val DsirB = 512L      // hashed feature buckets
  val DsirS = 10000L    // ratio quantization scale
  val DsirK = 100       // selected documents
  val DsirTarget = "en" // the target slice the selection steers toward

  /** Per-document hashed n-gram bucket counts (doc_id, lang, b, c):
    * word unigrams + bigrams, each md5-hashed to one of [[DsirB]]
    * buckets, multiplicity kept as the count `c` (DSIR scores use
    * counts). Genuinely map-only up to the one groupBy: bigrams come
    * from an ARRAY-level adjacency transform (`ts[i] ts[i+1]`), not a
    * per-token window — no corpus-scale shuffle of the token stream —
    * and the aggregation to (doc, bucket) counts shrinks the stream to
    * ≤ B rows per document before anything downstream touches it.
    */
  private def dsirFeatures(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("lang"),
        explode(concat(col("ts"),
          when(size(col("ts")) >= 2,
            expr("transform(sequence(0, size(ts) - 2), " +
              "i -> concat_ws(' ', ts[i], ts[i + 1]))"))
            .otherwise(array()))).as("g"))
      .withColumn("b",
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % DsirB)
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("c"))

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each document
    * by how much more likely its hashed n-gram features are under the
    * TARGET distribution (the `lang = '`[[DsirTarget]]`'` slice stands
    * in for the curated target corpus) than under the raw corpus, and
    * keep the top [[DsirK]]. Per the library's ulp convention the
    * per-bucket log-ratio sum is replaced by a sum of INTEGER-quantized
    * Laplace-smoothed ratios — `rho(b) = (S·(t_b+1)·(R+B)) div
    * ((r_b+1)·(T+B))` in DECIMAL(38) intermediates (counts at web
    * scale overflow 64-bit products) — the same linearization as
    * text_keywords_tfidf's quantized IDF, exact in both engines.
    *
    * Scale shape: features are a map-only tokenize/hash pass into one
    * (doc, bucket)-count groupBy (no token-stream shuffle); BOTH
    * distributions come out of ONE B-bounded groupBy over those counts
    * (target = conditional sum in the same pass); rho is a B-row
    * broadcast joined back onto the per-doc counts; per-doc scores are
    * one groupBy(doc_id) with map-side combine; selection is
    * orderBy().limit() — per-partition top-K, never a global sort. The
    * tokenize runs twice (distribution pass + scoring pass) — inherent
    * to importance resampling, which needs the global ratios before any
    * document can be scored.
    */
  def dsirSample(d: DataFrame): DataFrame = {
    // one tokenize+hash pass instead of two: the feature table is
    // ≤ B rows per document (corpus-bounded, far smaller than the
    // text it derives from), and BOTH the distribution pass and the
    // scoring join read it — a lazy localCheckpoint materializes it on
    // the distribution side's broadcast build and the scoring side
    // reuses the blocks. Within-invocation only (each call checkpoints
    // afresh — nothing persists across runs); at 100 TB the block
    // write is f-sized, an order below the corpus re-tokenize it saves
    val f = dsirFeatures(d).localCheckpoint(false)
    val byB = f.groupBy("b").agg(
      sum("c").as("rc"),
      sum(when(col("lang") === DsirTarget, col("c")).otherwise(0L)).as("tc"))
    val tot = byB.agg(sum("rc").as("rr"), sum("tc").as("tt"))
    val rho = byB.crossJoin(broadcast(tot)).select(col("b"),
      expr(s"CAST(($DsirS * CAST(tc + 1 AS DECIMAL(38,0)) * (rr + $DsirB))" +
        s" div (CAST(rc + 1 AS DECIMAL(38,0)) * (tt + $DsirB)) AS BIGINT)")
        .as("rho"))
    f.join(broadcast(rho), Seq("b"))
      .groupBy("doc_id").agg(sum(col("rho") * col("c")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(DsirK)
  }

  private val dsirSql =
    s"""WITH base AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, lang,
       |    unnest(ts || [ts[i] || ' ' || ts[i+1] for i in generate_series(1, len(ts) - 1)]) AS g
       |  FROM base),
       |fb AS (
       |  SELECT doc_id, lang,
       |    CAST(list_sum([(strpos('0123456789abcdef', substr(md5(g),j,1)) - 1)::BIGINT << (4*(8-j)) for j in generate_series(1,8)]) AS BIGINT) % $DsirB AS b
       |  FROM f),
       |byb AS (
       |  SELECT b, count(*) AS rc,
       |    count(*) FILTER (WHERE lang = '$DsirTarget') AS tc
       |  FROM fb GROUP BY b),
       |tot AS (SELECT sum(rc) AS rr, sum(tc) AS tt FROM byb),
       |rho AS (
       |  SELECT b,
       |    CAST(($DsirS * CAST(tc + 1 AS HUGEINT) * (rr + $DsirB)) //
       |         (CAST(rc + 1 AS HUGEINT) * (tt + $DsirB)) AS BIGINT) AS rho
       |  FROM byb CROSS JOIN tot),
       |sc AS (
       |  SELECT doc_id, CAST(sum(rho) AS BIGINT) AS score
       |  FROM fb JOIN rho USING (b) GROUP BY doc_id)
       |SELECT doc_id, score FROM sc
       |ORDER BY score DESC, doc_id LIMIT $DsirK""".stripMargin

  // ---- n-gram decontamination ----------------------------------------

  val DecontamN: Int = Dedup.ShingleK // shares the cached shingle rows
  val BenchMod = 10 // benchmark set stand-in: doc_id % 10 = 0

  /** Benchmark decontamination: flag corpus documents sharing any word
    * `DecontamN`-gram with the benchmark set. The benchmark's distinct
    * gram set is tiny relative to the corpus, so the join is an
    * explicit broadcast — at 100 TB the corpus side streams map-only
    * against the broadcast gram set, no shuffle of corpus grams.
    * Shingles come from Dedup's relational (posexplode + window lead)
    * construction — the nested-array form costs ~3 ms/doc of object
    * churn (measured; see Dedup.shingleRows) — and share its cache
    * with the minhash/jaccard/cc entries (DecontamN = Dedup.ShingleK).
    */
  def decontaminate(d: DataFrame): DataFrame = {
    val grams = Dedup.shingleRows(d).withColumnRenamed("s", "g")
    val bench = grams.filter(col("doc_id") % BenchMod === 0)
      .select("g").distinct()
    grams.filter(col("doc_id") % BenchMod =!= 0)
      .join(broadcast(bench), Seq("g"))
      .groupBy("doc_id").agg(count_distinct(col("g")).as("n_shared"))
  }

  /** Gram-level false-positive rate of the decontamination Bloom
    * filter. A document is wrongly dropped if ANY of its G grams
    * false-positives (≈ G·fpp), so the per-gram rate must be sized
    * against typical document gram counts, not read as the doc-level
    * rate: 1e-4 keeps the expected overkill ≈ 1% at G ≈ 100.
    */
  val DecontamBloomFpp = 1e-4

  /** Doc-level overkill budget the bloom gate asserts: the share of
    * exactly-clean documents the filter may additionally drop.
    */
  val DecontamOverkillBound = 0.05

  /** SCALE variant of [[decontaminate]]: the benchmark gram set is
    * compacted into a fixed-size Bloom filter instead of a broadcast
    * set. The exact path broadcasts every distinct benchmark gram —
    * unbounded as benchmark suites grow (billions of grams at 100 TB
    * would blow any broadcast); the bloom is built by one mergeable
    * distributed aggregation (`DataFrame.stat.bloomFilter`, fixed seed
    * → deterministic bits) and stays a few hundred MB at ANY benchmark
    * size at [[DecontamBloomFpp]]. Membership errs only one way: a
    * benchmark gram is NEVER missed (no false negatives), so no
    * contaminated document can survive — false positives just drop a
    * bounded extra share of clean docs (training-data hygiene trades
    * exactly this way in production).
    *
    * Gate-style entry (the corpus_distinct_sketch convention): the
    * oracle-computable exact-kept count plus two booleans —
    * `no_contaminated_kept` (the structural no-false-negative
    * guarantee, asserted against the EXACT contaminated set) and
    * `overkill_ok` (measured doc-level overkill within
    * [[DecontamOverkillBound]]).
    */
  def decontaminateBloomGate(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val grams = Dedup.shingleRows(d).withColumnRenamed("s", "g")
    val bench = grams.filter(col("doc_id") % BenchMod === 0)
      .select("g").distinct()
    val nBench = bench.count()
    // an EMPTY benchmark gram set (no doc reaches the shingle length,
    // or no benchmark doc at all) makes stat.bloomFilter return a null
    // sketch — nothing is contaminated, so the probe is const-false
    val might: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (nBench == 0) _ => lit(false)
      else {
        val bloom = bench.stat.bloomFilter("g", nBench, DecontamBloomFpp)
        val bbl = s.sparkContext.broadcast(bloom)
        // a UDF probe: Spark's codegen'd BloomFilterMightContain is
        // internal to runtime join filters, and the probe sits behind a
        // hash-agg anyway — the scan stays whole-stage either side of it
        val u = udf((g: String) => g != null && bbl.value.mightContain(g))
        c => u(c)
      }
    val corpus = grams.filter(col("doc_id") % BenchMod =!= 0)
    val bloomKept = corpus.groupBy("doc_id")
      .agg(max(when(might(col("g")), 1).otherwise(0)).as("hit"))
      .filter(col("hit") === 0).select("doc_id")
    val exactContam = decontaminate(d).select("doc_id")
    // every per-doc verdict in ONE pass over the (small) doc id sets
    val r = corpus.select("doc_id").distinct()
      .join(bloomKept.withColumn("bk", lit(1)), Seq("doc_id"), "left")
      .join(exactContam.withColumn("ec", lit(1)), Seq("doc_id"), "left")
      // outer coalesce: a corpus where NO doc reaches the shingle
      // length has zero gram rows, and a groupless agg then returns
      // count=0 with NULL sums — getLong would NPE while the oracle
      // answers 0/true/true
      .agg(count(lit(1)).as("n_corpus"),
        coalesce(sum(coalesce(col("ec"), lit(0))), lit(0L)).as("n_contam"),
        coalesce(sum(coalesce(col("bk"), lit(0))), lit(0L))
          .as("n_bloom_kept"),
        coalesce(sum(when(col("bk") === 1 && col("ec") === 1, 1)
          .otherwise(0)), lit(0L)).as("contaminated_kept"))
      .head()
    val nExactKept = r.getLong(0) - r.getLong(1)
    val overkill = nExactKept - r.getLong(2)
    Seq((nExactKept, r.getLong(3) == 0L,
        overkill >= 0 && overkill.toDouble <= DecontamOverkillBound * nExactKept))
      .toDF("n_exact_kept", "no_contaminated_kept", "overkill_ok")
  }

  private[graft] val decontamBloomSql = {
    val km1 = DecontamN - 1
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i + $km1], ' ') for i in generate_series(1, len(toks) - $km1)])) AS g
       |  FROM t WHERE len(toks) >= $DecontamN),
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % $BenchMod = 0),
       |corpus AS (SELECT DISTINCT doc_id FROM sh WHERE doc_id % $BenchMod <> 0),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM sh JOIN bench USING (g)
       |  WHERE doc_id % $BenchMod <> 0)
       |SELECT (SELECT count(*) FROM corpus) - (SELECT count(*) FROM contaminated) AS n_exact_kept,
       |  true AS no_contaminated_kept, true AS overkill_ok""".stripMargin
  }

  private val decontamSql = {
    val km1 = DecontamN - 1
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i + $km1], ' ') for i in generate_series(1, len(toks) - $km1)])) AS g
       |  FROM t WHERE len(toks) >= $DecontamN),
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % $BenchMod = 0)
       |SELECT doc_id, count(DISTINCT g) AS n_shared
       |FROM sh JOIN bench USING (g)
       |WHERE doc_id % $BenchMod <> 0
       |GROUP BY doc_id""".stripMargin
  }

  // ---- composed end-to-end prep pipeline -----------------------------

  /** The whole training-data prep flow as ONE declarative plan:
    * quality gate (≥ [[E2EMinTokens]] tokens) → language gate (en) →
    * exact dedup (normalized-fingerprint keeper = min doc_id) →
    * benchmark decontamination (drop bench docs and any doc sharing a
    * word n-gram with them) → token-budget sequence packing of the
    * survivors. The point is composition: every stage is the same
    * DataFrame machinery the standalone entries use, so Catalyst fuses
    * the gates into the scan (one pass computes tokens/lang/fp), the
    * only shuffles are the dedup window, the decontamination gram agg,
    * and the final per-shard packing window — there is no
    * materialization boundary between stages. At 100 TB this is the
    * difference between one job and five pipeline hops with
    * intermediate parquet.
    */
  val E2EMinTokens = 10

  /** The map-only front of the pipeline — quality gate (the
    * text_quality entry's not-'poor' condition) then language gate
    * (the text_lang_id entry's 'en' branch, en wins ties). Pure
    * filters over one scan, so it applies unchanged to a STREAMING
    * DataFrame (no shuffle, no state).
    */
  def gates(d: DataFrame): DataFrame = {
    val enWords = graft.text.Text.langProfiles.toMap
    def sc(l: String) =
      TextAnalysis.stopwordCount(col("toks"), enWords(l)).as(s"s_$l")
    d.select(col("doc_id"), col("source"), col("text"),
        Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= E2EMinTokens)
      .select(col("doc_id"), col("source"), col("text"), col("toks"),
        sc("en"), sc("es"), sc("fr"), sc("de"))
      .filter(col("s_en") > 0 && col("s_en") >= col("s_es") &&
        col("s_en") >= col("s_fr") && col("s_en") >= col("s_de"))
      .select("doc_id", "source", "text", "toks")
  }

  def endToEnd(d: DataFrame): DataFrame = {
    val en = gates(d)
    // exact dedup: doc_fingerprint's normalized md5, keeper = min id
    val keep = en
      .withColumn("fp", Text.fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("rn") === 1)
    // decontamination: bench docs (the text_decontaminate stand-in set)
    // out, plus anything sharing an n-gram with them (broadcast grams)
    val contaminated = decontaminate(d).select("doc_id")
    val clean = keep.filter(col("doc_id") % BenchMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    // packing: q_pack_sequences' per-shard greedy bins over SURVIVORS
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    clean
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        expr(s"cum div $PackBudget").as("bin"))
  }

  /** Shared oracle fragments: the gate CTEs (toks → q → sc → en) and
    * the decontamination CTEs (sh → bench → contaminated). ONE
    * definition each — the batch pipeline's oracle and the streaming
    * twin's oracle compose from these, so a gate-semantics change
    * cannot leave one of them testing stale arithmetic.
    */
  private[graft] val gatesCtes: String = {
    def score(l: String, words: Seq[String]) =
      s"len(list_filter(toks, t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t))) AS s_$l"
    val scores = Text.langProfiles.map { case (l, ws) => score(l, ws) }
      .mkString(",\n    ")
    s"""toks AS (
       |  SELECT doc_id, source, text,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
       |  FROM documents),
       |q AS (SELECT * FROM toks WHERE len(toks) >= $E2EMinTokens),
       |sc AS (SELECT doc_id, source, text, toks,
       |    $scores
       |  FROM q),
       |en AS (SELECT doc_id, source, text, toks FROM sc
       |  WHERE s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de)""".stripMargin
  }

  private[graft] val contamCtes: String = {
    val km1 = DecontamN - 1
    s"""sh AS (
       |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i + $km1], ' ') for i in generate_series(1, len(toks) - $km1)])) AS g
       |  FROM toks WHERE len(toks) >= $DecontamN),
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % $BenchMod = 0),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM sh JOIN bench USING (g)
       |  WHERE doc_id % $BenchMod <> 0)""".stripMargin
  }

  private val e2eSql =
    s"""WITH $gatesCtes,
       |fp AS (SELECT doc_id, source, toks,
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM en),
       |keep AS (SELECT doc_id, source, toks FROM (
       |    SELECT doc_id, source, toks,
       |      row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
       |    FROM fp) t WHERE rn = 1),
       |$contamCtes,
       |clean AS (
       |  SELECT doc_id, source, len(toks)::BIGINT AS n_tok FROM keep
       |  WHERE doc_id % $BenchMod <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM contaminated))
       |SELECT doc_id, source, n_tok,
       |  CAST((cum - n_tok) // $PackBudget AS BIGINT) AS bin
       |FROM (
       |  SELECT doc_id, source, n_tok,
       |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
       |  FROM clean) t""".stripMargin

  /** The streaming twin's oracle: gates + decontamination survivors
    * (the stateless front of [[e2eSql]], before dedup/packing).
    */
  private[graft] val gatesSurvivorsSql =
    s"""WITH $gatesCtes,
       |$contamCtes
       |SELECT doc_id, source FROM en
       |WHERE doc_id % $BenchMod <> 0
       |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)""".stripMargin

  def entries: Map[String, Q] = Map(
    // near-dup pairs → duplicate clusters (keeper = min doc_id); the
    // oracle replays the same minhash pipeline then resolves components
    // with a recursive min-label CTE
    "dedup_cc" -> Q((s, dir) => connectedComponents(ccEdges(s, dir)), ccSql),

    // pairs → clusters → the SURVIVING corpus (keeper = min id per
    // cluster, singletons keep themselves) — the dedup pipeline's
    // actual output table
    "dedup_apply" -> Q((s, dir) => dedupApply(s, dir), dedupApplySql),

    // keeper POLICY matters: longest-member-wins over a fixture where
    // min-id would wrongly keep the truncated copy
    "dedup_apply_best" -> Q(
      (s, dir) => dedupApplyBest(s, dir), dedupApplyBestSql),

    // the full production composition: exact collapse → CAPPED LSH on
    // survivors → CC → keepers, each stage's oracle fragment already
    // proven by its standalone entry
    "dedup_production" -> Q((s, dir) => dedupProduction(s, dir),
      dedupProductionSql),

    // the composed prep flow: quality → lang → dedup → decontaminate →
    // pack, one Catalyst plan end-to-end
    "pipeline_end_to_end" -> Q(
      (s, dir) => endToEnd(docs(s, dir)).orderBy(col("doc_id")),
      e2eSql + " ORDER BY doc_id"),

    "text_repetition" -> Q((s, dir) => repetition(docs(s, dir)), repetitionSql),

    "q_sample_stratified" -> Q(
      (s, dir) => sampleStratified(docs(s, dir)), sampleSql),

    // domain capping: top-N docs per source by quality proxy, the
    // CommonCrawl-style per-domain bound (result ≤ cap × |sources|
    // rows at any corpus size)
    "q_source_cap" -> Q((s, dir) => sourceCap(docs(s, dir)), sourceCapSql),

    // domain-reweighted training-mix assembly: per-source token budgets
    // hit greedily in deterministic md5 order
    "q_mixture_sample" -> Q(
      (s, dir) => mixtureSample(docs(s, dir)), mixtureSql),

    // dataset-card reporting: per-source doc/token/lang/dup stats in
    // one partial-agg groupBy
    "corpus_stats_by_source" -> Q(
      (s, dir) => corpusStatsBySource(docs(s, dir)), statsSql),

    // DSIR data selection: hashed-ngram importance scores against the
    // target slice, integer-quantized ratio arithmetic
    "dsir_sample" -> Q((s, dir) => dsirSample(docs(s, dir)), dsirSql),

    "q_pack_sequences" -> Q((s, dir) => packSequences(docs(s, dir)), packSql),

    "q_chunk_windows" -> Q((s, dir) => chunkWindows(docs(s, dir)), chunkSql),

    "text_decontaminate" -> Q(
      (s, dir) => decontaminate(docs(s, dir)), decontamSql),
    // the 100 TB decontamination path: fixed-size bloomed benchmark
    // set instead of an unbounded broadcast — gate-style oracle
    "text_decontaminate_bloom" -> Q(
      (s, dir) => decontaminateBloomGate(s, docs(s, dir)),
      decontamBloomSql)
  )
}
