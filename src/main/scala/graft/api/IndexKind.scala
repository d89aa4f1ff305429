package graft.api

import graft.core.{Lake, Layout}
import graft.index.{Bm25Index, KeyIndex, NgramIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One pluggable index type for the [[GraftLake]] facade — the Spark
  * analogue of the reference's index interface, where the top-level lake
  * API takes the index object as a parameter for every type
  * (reference: python/rottnest/index_interface.py; backends/parquet.py
  * `index_parquet_lake(..., index)`).
  *
  * `searchLake` probes ALL covering index files plus the uncovered
  * (in-situ) lake files in ONE logical plan — a lake compacted into
  * hundreds of index groups must not pay hundreds of sequential Spark
  * jobs, so candidate postings are unioned tagged-by-index and the whole
  * search runs a constant number of jobs regardless of index-file count.
  */
trait IndexKind {

  /** Metadata `index_type` discriminator (e.g. "ngram", "bm25", "key"). */
  def name: String

  /** Build one index over a lake-file group at `path`. */
  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit

  /** Search every covering index (`paths`) plus in-situ files in one
    * plan. Returns lake rows for filter kinds (refined, no uid) or
    * ranked rows for ranking kinds (`ranked == true`).
    *
    * `live` restricts hits to files alive in the queried snapshot:
    * table-format backends can REMOVE files, and an index built before
    * the removal still holds their rows — hit row groups from dead
    * files must be dropped (the reference's Delta path searches
    * per-snapshot file sets, backends/delta.py:63-77).
    */
  def searchLake(spark: SparkSession, paths: Seq[String],
      insituFiles: Seq[String], column: String, query: String,
      k: Int, live: Option[Set[String]] = None): DataFrame

  /** Ranking kinds order + truncate inside `searchLake`; filter kinds
    * leave ordering/truncation to the facade.
    */
  def ranked: Boolean = false

  /** Merge two indexes of this kind (compaction). */
  def merge(spark: SparkSession, a: String, b: String, out: String): Unit

  /** Driver-cached meta sidecar rows `(uid, file_path, row_start,
    * num_rows)` per index path. Index dirs are immutable once built
    * (merge writes a NEW dir), so caching on the meta mtime is sound;
    * metas are metadata-sized (one row per covered row group). This is
    * the "cacheable metadata page on the driver" pattern — searches pay
    * zero Spark jobs for coverage/hit resolution.
    */
  protected def metaRows(spark: SparkSession,
      path: String): Seq[(Long, String, Long, Long)] =
    IndexKind.metaRows(spark, path)

  /** Lake files covered by `paths` and alive in `live`. */
  protected def coveredFiles(spark: SparkSession, paths: Seq[String],
      live: Option[Set[String]]): Seq[String] =
    paths.flatMap(p => metaRows(spark, p).map(_._2)).distinct
      .filter(f => live.forall(_.contains(f))).sorted

  /** Zero-row result with the lake row schema, for searches whose
    * live/snapshot file set is empty while covering indexes exist
    * (e.g. a snapshot predating every add) — the correct answer is an
    * EMPTY result, not a crash. Schema comes from the physically
    * present covered files (table-format removes are logical; the
    * parquet objects remain until a data vacuum), falling back to the
    * in-situ files for lakes with NO covering index yet (a short-query
    * early return on an unindexed lake must not require index
    * metadata that does not exist).
    */
  protected def emptyLike(spark: SparkSession, paths: Seq[String],
      insitu: Seq[String] = Seq.empty): DataFrame = {
    val all = (coveredFiles(spark, paths, None) ++ insitu).distinct
    require(all.nonEmpty, "no live files to search")
    spark.read.parquet(all: _*).limit(0)
  }

  /** The shared search tail of every filter kind: probe the covering
    * indexes when any exist (`viaIndex` returning None = the cost
    * switch chose brute), brute-refine the in-situ files, union — the
    * both-empty case answered by ONE schema-stable empty frame.
    * Extracted because eight hand-rolled copies of this block had
    * already diverged once (a short-query early return that crashed on
    * unindexed lakes); the guards live here exactly once.
    */
  protected def searchParts(spark: SparkSession, paths: Seq[String],
      insituFiles: Seq[String], covered: Seq[String],
      viaIndex: () => Option[DataFrame],
      refine: DataFrame => DataFrame): DataFrame = {
    val parts =
      (if (covered.isEmpty) Seq.empty
       else Seq(viaIndex().getOrElse(
         refine(spark.read.parquet(covered: _*))))) ++
      (if (insituFiles.isEmpty) Seq.empty
       else Seq(refine(spark.read.parquet(insituFiles: _*))))
    if (parts.isEmpty) emptyLike(spark, paths, insituFiles)
    else parts.reduce(_ unionByName _)
  }

  /** Uniform cost switch (reference: brute_force_threshold,
    * backends/utils.py:221-225): too many hits, or EVERY covered row
    * group hit (zero pruning value), → the brute scan beats a
    * selective fetch.
    */
  protected def bruteBeatsIndex(spark: SparkSession, paths: Seq[String],
      hits: Seq[(String, Long, Long, Long)]): Boolean =
    hits.size > Lake.BruteForceThreshold ||
      hits.size >= paths.map(metaRows(spark, _).size).sum

  /** Resolve tagged `(idx, uid)` candidates to their row-group hit
    * list: ONE job evaluates the candidate plan (its size is bounded by
    * the row-group count), resolution itself is a driver map lookup
    * against the cached metas.
    */
  protected def collectHits(spark: SparkSession, paths: Seq[String],
      cands: DataFrame, live: Option[Set[String]]): Seq[(String, Long, Long, Long)] = {
    val byIdx: Map[Int, Map[Long, (String, Long, Long)]] =
      paths.zipWithIndex.map { case (p, i) =>
        i -> metaRows(spark, p)
          .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      }.toMap
    cands.select("idx", "uid").distinct().collect()
      .flatMap { r =>
        byIdx(r.getInt(0)).get(r.getLong(1)).map {
          case (f, rs, n) => (f, r.getLong(1), rs, n)
        }
      }
      .filter(h => live.forall(_.contains(h._1)))
      .toSeq
  }
}

object IndexKind {
  /** Driver-local signal of the last NgramKind searchLake on this
    * thread: Some(hitRowGroups) when the index route decided the plan
    * over a fully-covered lake (then hits == 0 PROVES the refined
    * result is empty — the refine only filters candidate rows), None
    * when emptiness is not driver-decidable (in-situ part, brute cost
    * switch, empty-coverage early returns). Lets the facade's
    * analytical-k smartSearch route its fuzzy fallback without a
    * second Spark action.
    */
  private[graft] val lastProbe = new ThreadLocal[Option[Long]] {
    override def initialValue(): Option[Long] = None
  }

  /** The embedding column as array<double>: ArrayType casts (exact for
    * float sources), BinaryType decodes the reference's on-disk shape
    * — fixed-width little-endian float32 blobs, dimension inferred
    * from the byte width (reference indices/vector_index.py:42-48) —
    * so a reference-shaped lake indexes without a manual cast, and
    * both shapes of the same vectors score bit-identically.
    */
  private[graft] def vecAsDoubles(spark: SparkSession,
      df: DataFrame, column: String): org.apache.spark.sql.Column =
    df.schema(column).dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        graft.GraftExtensions.floatVec(spark, col(column))
      case _ => col(column).cast("array<double>")
    }

  // keep-latest-per-path (versioned keys would strand one dead entry
  // per rebuild/vacuum cycle) AND LRU-bounded (compaction writes NEW
  // dirs, so path churn under streaming maintenance would otherwise
  // leak one dead entry per retired dir forever)
  private val cache =
    new graft.core.LruMap[String, (Long, Seq[(Long, String, Long, Long)])](512)

  private val schemaCache =
    new graft.core.LruMap[String, (Long, org.apache.spark.sql.types.StructType)](512)

  // per-path key-column name (key vs key_hex), keyed by the keys dir
  // signature — same rationale as schemaCache: without it every KeyKind
  // search pays one eager footer-read job PER covering path at plan
  // time, growing with compaction history
  private val keyColCache = new graft.core.LruMap[String, (Long, String)](512)

  private[graft] def keyColCached(spark: SparkSession, path: String): String = {
    val dir = s"$path/keys"
    val sig = graft.core.Fs.dirSignature(spark, dir)
    keyColCache.get(dir) match {
      case Some((m, c)) if m == sig => c
      case _ =>
        val c = graft.index.KeyIndex.keyColOf(
          spark.read.parquet(dir).columns.toSeq)
        keyColCache.put(dir, (sig, c))
        c
    }
  }

  /** Union scan of the same sub-table across several index dirs, each
    * row tagged with its index ordinal (`idx`). Every read pins the
    * sub-table's schema (driver-cached from the first index, keyed by
    * mtime — all indexes of a kind share it by construction): a bare
    * `spark.read.parquet` resolves its schema EAGERLY with one listing/
    * schema job per call, which made facade searches pay one job PER
    * COVERING INDEX at plan time. With the schema pinned, planning runs
    * zero jobs and the search stays at a constant job count as
    * compaction history grows (pinned by JobCountSpec). Per-path reads
    * keep per-root partition discovery (and so partition pruning) —
    * one multi-root read would reject the conflicting `bucket=`
    * layouts.
    */
  private[graft] def readTagged(spark: SparkSession, paths: Seq[String],
      sub: String): DataFrame = {
    val first = s"${paths.head}/$sub"
    val mtime = graft.core.Fs.dirSignature(spark, first)
    val schema = schemaCache.get(first) match {
      case Some((m, s)) if m == mtime => s
      case _ =>
        val s = spark.read.parquet(first).schema
        schemaCache.put(first, (mtime, s))
        s
    }
    paths.zipWithIndex.map { case (p, i) =>
      spark.read.schema(schema).parquet(s"$p/$sub")
        .withColumn("idx", lit(i))
    }.reduce(_ unionByName _)
  }

  private[graft] def metaRows(spark: SparkSession,
      path: String): Seq[(Long, String, Long, Long)] = {
    val mtime = graft.core.Fs.dirSignature(spark, s"$path/meta")
    cache.get(path) match {
      case Some((m, rows)) if m == mtime => rows
      case _ =>
        val rows = spark.read.parquet(s"$path/meta")
          .select("uid", "file_path", "row_start", "num_rows")
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
          .toSeq
        cache.put(path, (mtime, rows))
        rows
    }
  }
}

/** Character-ngram substring index kind (contains semantics). */
object NgramKind extends IndexKind {

  val name = "ngram"

  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = NgramIndex.build(spark, files, column, path)

  def merge(spark: SparkSession, a: String, b: String, out: String): Unit =
    NgramIndex.merge(spark, a, b, out)

  def searchLake(spark: SparkSession, paths: Seq[String],
      insituFiles: Seq[String], column: String, query: String,
      k: Int, live: Option[Set[String]] = None): DataFrame = {
    val q = graft.text.Text.sparkLower(query)
    // metadata-sized; empty without a job when paths is empty
    val covered = coveredFiles(spark, paths, live)
    var probedHits: Option[Long] = None

    def viaIndex(): Option[DataFrame] = {
      if (q.isEmpty) return None // contains("") = every row: brute
      // short queries probe their exact 1/2-gram (no scan cliff);
      // grams are CODE-POINT windows to match the Spark-side build
      val qgrams = {
        val cpg = graft.text.Text.cpGrams(q, NgramIndex.N)
        if (cpg.nonEmpty) graft.text.QueryShaping.viableGrams(cpg.distinct)
        else Seq(q)
      }
      val qbuckets = qgrams.map(NgramIndex.bucketOfString).distinct
      // every covering index probed in ONE multi-path scan (a per-index
      // read+union would pay a listing/schema job per index)
      val post = IndexKind.readTagged(spark, paths, "postings")
        .filter(col("bucket").isin(qbuckets: _*) && col("gram").isin(qgrams: _*))
        .select(col("idx"), col("gram"), col("uid"))
      val cands = post.groupBy(col("idx"), col("uid"))
        .agg(countDistinct(col("gram")).as("ng"))
        .filter(col("ng") === qgrams.size)
      val hits = collectHits(spark, paths, cands, live)
      // ONE global cost switch over the whole lake's hit count
      if (bruteBeatsIndex(spark, paths, hits)) None
      else {
        probedHits = Some(hits.size.toLong)
        Some(
          Layout.readGroups(spark, hits, covered).drop("uid")
            .filter(lower(col(column)).contains(q)))
      }
    }

    // an empty live-restricted covered set (every indexed file removed,
    // or a snapshot predating all indexed files) must skip the indexed
    // branch — brute([]) / readGroups' empty-schema path would throw;
    // searchParts holds that guard for every filter kind
    val res = searchParts(spark, paths, insituFiles, covered,
      () => viaIndex(), d => d.filter(lower(col(column)).contains(q)))
    // the driver-local emptiness signal is only valid when the index
    // route decided the WHOLE plan (no in-situ part to scan)
    IndexKind.lastProbe.set(if (insituFiles.isEmpty) probedHits else None)
    res
  }
}

/** Regex search over the SAME committed ngram indexes (name = "ngram":
  * builds, coverage, compaction, vacuum are all shared with
  * [[NgramKind]] — regex is a query MODE of the substring index, not a
  * second index to maintain). The query string is a Java-regex pattern
  * matched with contains semantics against `lower(column)`; the index
  * is probed with the pattern's REQUIRED literal runs
  * ([[graft.text.QueryShaping.requiredLiterals]]) and the exact rlike
  * refine runs only over candidate row groups. Patterns with no
  * required literal (top-level alternation, all-optional) take the
  * scan-and-refine fallback; in-situ files always take the rlike scan.
  */
object NgramRegexKind extends IndexKind {

  val name = "ngram"

  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = NgramIndex.build(spark, files, column, path)

  def merge(spark: SparkSession, a: String, b: String, out: String): Unit =
    NgramIndex.merge(spark, a, b, out)

  def searchLake(spark: SparkSession, paths: Seq[String],
      insituFiles: Seq[String], column: String, query: String,
      k: Int, live: Option[Set[String]] = None): DataFrame = {
    val covered = coveredFiles(spark, paths, live)
    val lits = graft.text.QueryShaping.requiredLiterals(query)
      .map(graft.text.Text.sparkLower).filter(_.nonEmpty)

    def viaIndex(): Option[DataFrame] = {
      if (lits.isEmpty) return None // nothing required: brute
      // every literal's grams must all be present in a candidate row
      // group (a matching row contains every literal); literals below
      // the gram width probe their exact short gram
      val qgrams = lits.flatMap { l =>
        val cpg = graft.text.Text.cpGrams(l, NgramIndex.N)
        if (cpg.nonEmpty) cpg else Seq(l)
      }.distinct
      val probeGrams = graft.text.QueryShaping.viableGrams(qgrams)
      val qbuckets = probeGrams.map(NgramIndex.bucketOfString).distinct
      val post = IndexKind.readTagged(spark, paths, "postings")
        .filter(col("bucket").isin(qbuckets: _*) &&
          col("gram").isin(probeGrams: _*))
        .select(col("idx"), col("gram"), col("uid"))
      val cands = post.groupBy(col("idx"), col("uid"))
        .agg(countDistinct(col("gram")).as("ng"))
        .filter(col("ng") === probeGrams.size)
      val hits = collectHits(spark, paths, cands, live)
      if (bruteBeatsIndex(spark, paths, hits)) None
      else Some(
        Layout.readGroups(spark, hits, covered).drop("uid")
          .filter(lower(col(column)).rlike(query)))
    }

    searchParts(spark, paths, insituFiles, covered, () => viaIndex(),
      d => d.filter(lower(col(column)).rlike(query)))
  }
}

/** Boolean-query mode of the SAME committed ngram indexes (name =
  * "ngram", like [[NgramRegexKind]] — builds, coverage, compaction and
  * vacuum are shared; boolean is a query MODE, not a second index).
  * The query string is the [[graft.text.BoolQueryParser]] surface
  * (`"fast scan" OR slow AND NOT vector`); candidates compose by the
  * [[graft.index.BoolSearch]] set algebra over (idx, uid) pairs across
  * every covering index, one selective read, one combined refine.
  * In-situ files always take the full predicate scan.
  */
object BoolNgramKind extends IndexKind {

  val name = "ngram"

  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = NgramIndex.build(spark, files, column, path)

  def merge(spark: SparkSession, a: String, b: String, out: String): Unit =
    NgramIndex.merge(spark, a, b, out)

  def searchLake(spark: SparkSession, paths: Seq[String],
      insituFiles: Seq[String], column: String, query: String,
      k: Int, live: Option[Set[String]] = None): DataFrame = {
    import graft.index.BoolSearch
    val tree = graft.text.BoolQueryParser.parse(query)
    val covered = coveredFiles(spark, paths, live)
    def refine(d: DataFrame): DataFrame =
      d.filter(BoolSearch.predicate(column, tree))

    def viaIndex(): Option[DataFrame] = {
      import spark.implicits._
      // ONE batched probe for every distinct term across every
      // covering index (gram→term tagged postings; N terms never pay
      // N Spark jobs)
      val termGrams: Map[String, Seq[String]] = BoolSearch.termsOf(tree)
        .toSeq.flatMap(t => BoolSearch.gramsOf(t).map(t -> _)).toMap
      val perTerm: Map[String, Set[(Int, Long)]] =
        if (termGrams.isEmpty) Map.empty
        else {
          val pairs = termGrams.toSeq.flatMap { case (t, gs) =>
            gs.map(g => (g, t))
          }
          val allGrams = pairs.map(_._1).distinct
          val qbuckets = allGrams.map(NgramIndex.bucketOfString).distinct
          IndexKind.readTagged(spark, paths, "postings")
            .filter(col("bucket").isin(qbuckets: _*) &&
              col("gram").isin(allGrams: _*))
            .join(broadcast(pairs.toDF("gram", "term")), Seq("gram"))
            .groupBy(col("term"), col("idx"), col("uid"))
            .agg(countDistinct(col("gram")).as("ng"))
            .collect()
            .groupBy(_.getString(0))
            .map { case (t, rows) =>
              t -> rows
                .filter(_.getLong(3) == termGrams(t).size.toLong)
                .map(r => (r.getInt(1), r.getLong(2))).toSet
            }
        }
      def termCands(t: String): Option[Set[(Int, Long)]] = {
        val q = graft.text.Text.sparkLower(t)
        if (q.isEmpty) None // contains("") = every row: no bound
        else Some(perTerm.getOrElse(q, Set.empty))
      }
      BoolSearch.cands(tree, termCands) match {
        case None => None // unbounded tree: brute covered scan
        case Some(set) =>
          val hits = collectHits(spark, paths,
            set.toSeq.toDF("idx", "uid"), live)
          if (bruteBeatsIndex(spark, paths, hits)) None
          else Some(refine(
            Layout.readGroups(spark, hits, covered).drop("uid")))
      }
    }

    searchParts(spark, paths, insituFiles, covered, () => viaIndex(),
      refine)
  }
}

/** BM25 ranked full-text kind. `idCol` is the per-row document id.
  * Uncovered files are scored IN-SITU at query time (postings + doc
  * stats computed on the fly for the query tokens, reference fills from
  * unindexed files the same way, backends/utils.py:249-275) and unioned
  * with the index tables BEFORE scoring, so corpus statistics — and
  * therefore the ranking — stay global and exact at any coverage.
  */
case class Bm25Kind(idCol: String,
    tokenizer: graft.text.Text.Tokenizer = graft.text.Text.RegexTokenizer)
    extends IndexKind {

  // the tokenizer id keeps two tokenizations of one column apart in
  // the lake's index namespace — otherwise the second kind would see
  // the first's coverage as its own and search the wrong token stream
  val name = "bm25" +
    (if (tokenizer.id.isEmpty) "" else s"_${tokenizer.id}")

  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit =
    Bm25Index.build(spark, files, column, idCol, path, tokenizer)

  def merge(spark: SparkSession, a: String, b: String, out: String): Unit =
    Bm25Index.merge(spark, a, b, out)

  override def ranked: Boolean = true

  def searchLake(spark: SparkSession, paths: Seq[String],
      insituFiles: Seq[String], column: String, query: String,
      k: Int, live: Option[Set[String]] = None): DataFrame = {
    // corpus stats are whole-index aggregates: stale coverage (a file
    // removed after indexing) would silently skew IDF, so reject it
    live.foreach { l =>
      val stale = coveredFiles(spark, paths, None).filterNot(l)
      require(stale.isEmpty,
        s"bm25 index covers ${stale.size} file(s) not in the queried snapshot; re-index first")
    }
    val terms = tokenizer.tokenizeQuery(query).distinct.map(_ -> 1.0)
    val qtoks = terms.map(_._1)
    val qbuckets = qtoks.map(Bm25Index.bucketOfString).distinct
    // one tagged scan per sub-table across every covering index (the
    // same constant-jobs discipline as the other kinds); doc_ids are
    // globally unique so the ordinal tag is dropped after the read
    val idxParts =
      if (paths.isEmpty) Seq.empty
      else Seq((
        IndexKind.readTagged(spark, paths, "postings")
          .filter(col("bucket").isin(qbuckets: _*) && col("token").isin(qtoks: _*))
          .select(col("token"), col("doc_id"), col("tf")),
        IndexKind.readTagged(spark, paths, "docstats").drop("idx")))
    val insituParts =
      if (insituFiles.isEmpty) Seq.empty
      else Seq(Bm25Index.insituStats(spark, insituFiles, column, idCol,
        qtoks, tokenizer))
    val all = idxParts ++ insituParts
    require(all.nonEmpty, "no live files to search")
    Bm25Index.scoreWeighted(spark,
      all.map(_._1).reduce(_ unionByName _),
      all.map(_._2).reduce(_ unionByName _), terms, k)
  }
}

/** Exact/prefix key kind over sorted key tables. A trailing `%` in the
  * query selects prefix mode (reference type "uuid" is exact;
  * prefix walk: src/lava/uuid/uuid.rs:106-162).
  */
object KeyKind extends IndexKind {

  val name = "key"

  def build(spark: SparkSession, files: Seq[String], column: String,
      path: String): Unit = KeyIndex.build(spark, files, column, path)

  def merge(spark: SparkSession, a: String, b: String, out: String): Unit =
    KeyIndex.merge(spark, a, b, out)

  def searchLake(spark: SparkSession, paths: Seq[String],
      insituFiles: Seq[String], column: String, query: String,
      k: Int, live: Option[Set[String]] = None): DataFrame = {
    val prefixMode = query.endsWith("%")
    // the key table's own schema says whether this column was indexed
    // in canonical hex form (BinaryType source). Checked per PATH
    // footer: readTagged forces the first path's schema onto all of
    // them, so a mixed key/key_hex generation set would silently read
    // the other generation's key column as NULL and drop its hits —
    // mixed sets demote to the brute covered scan instead (correct,
    // just unpruned, until compaction unifies the generations).
    // Cached per keys-dir signature so warm searches stay footer-free.
    val keyCols =
      paths.map(p => IndexKind.keyColCached(spark, p)).distinct
    val mixedGenerations = keyCols.size > 1
    val keysAll =
      if (paths.isEmpty || mixedGenerations) None
      else Some(IndexKind.readTagged(spark, paths, "keys"))
    val hexMode = keyCols.contains(KeyIndex.HexKeyCol) ||
      (paths.isEmpty && insituFiles.nonEmpty &&
        spark.read.parquet(insituFiles.head).schema.fields.exists(f =>
          f.name == column &&
            f.dataType == org.apache.spark.sql.types.BinaryType))
    val kc = if (hexMode) KeyIndex.HexKeyCol else "key"
    val key0 = if (prefixMode) query.dropRight(1) else query
    val key = if (hexMode) key0.toUpperCase else key0
    def keyed: org.apache.spark.sql.Column =
      if (hexMode) hex(col(column)) else col(column)
    def refine(d: DataFrame): DataFrame =
      if (prefixMode) d.filter(keyed.startsWith(key))
      else d.filter(keyed === key)
    val covered = coveredFiles(spark, paths, live)

    def viaIndex(): Option[DataFrame] = {
      if (keysAll.isEmpty) return None // mixed generations: brute scan
      val keys = keysAll.get
        .select(col("idx"), col(kc).as("key"), col("uid"))
      val ranged =
        if (!prefixMode) keys.filter(col("key") === key)
        else KeyIndex.prefixUpperBound(key) match {
          case Some(hi) => keys.filter(col("key") >= key && col("key") < hi)
          case None     => keys.filter(col("key") >= key)
        }
      val hits = collectHits(spark, paths, ranged, live)
      if (bruteBeatsIndex(spark, paths, hits)) None
      else Some(refine(Layout.readGroups(spark, hits, covered).drop("uid")))
    }

    // same empty-covered guard as NgramKind (ADVICE r2), via searchParts
    searchParts(spark, paths, insituFiles, covered, () => viaIndex(), refine)
  }
}
