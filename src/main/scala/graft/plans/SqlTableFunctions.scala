package graft.plans

import graft.api._
import graft.core.{Lake, Layout}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL table functions over the lake facade — the surface a SQL-only
  * user (a BI tool, a notebook with no Scala cell) needs to run the
  * same index lifecycle the [[graft.api.GraftLake]] API exposes
  * (reference top-level flow: backends/parquet.py
  * `search_parquet_lake`, lifted into the Catalyst table-function
  * registry via `SparkSessionExtensions.injectTableFunction`):
  *
  *   - `graft_search(dir, kind, column, query, k [, order_col])` —
  *     filter kinds (ngram/regex/bool/token/fm/token_fm/wavelet/key/
  *     bloom/zonemap/minhash/fuzzy/logcloud); rows of the lake table, indexed
  *     probe + in-situ fill, refined then truncated to k. The lake
  *     backend is auto-detected from the dir ([[GraftLake.auto]]):
  *     Delta log ⇒ Delta, Iceberg metadata ⇒ Iceberg, else plain
  *     parquet prefix.
  *   - `graft_rank(dir, kind, column, query, k, id_col)` — ranking
  *     kinds (bm25/vector/vamana); scored rows, ordered desc.
  *   - `graft_suggest(dir, column, term)` — spell-correction
  *     suggestions: lev ≤ 1 vocabulary neighbors of `term` ranked by
  *     frequency, served from the committed bm25 postings.
  *   - `graft_explain(dir, kind, column)` — one routing-accounting row
  *     ([[GraftLake.explainSearch]]) with no data read.
  *   - `graft_layout(path)` — per-file footer layout rows
  *     ([[Layout.scan]]; reference get_parquet_layout,
  *     src/formats/parquet.rs:243-419).
  *
  * Arguments must be LITERALS (the winnow_fp discipline: table-function
  * resolution runs before constant folding). The builder runs at
  * ANALYSIS time, which is where the engine's index routing belongs —
  * candidate probes are metadata-scale jobs and the returned plan scans
  * only the pruned files, exactly like the Scala facade.
  */
object SqlTableFunctions {

  /** Filter kinds addressable by SQL name. */
  private val filterKinds: Map[String, IndexKind] = Map(
    "ngram" -> NgramKind,
    "regex" -> NgramRegexKind,
    "bool" -> BoolNgramKind,
    "token" -> TokenKind,
    "fm" -> FmKind,
    "token_fm" -> TokenFmKind,
    "wavelet" -> WaveletKind,
    "key" -> KeyKind,
    "bloom" -> BloomKind,
    "zonemap" -> ZoneMapKind,
    "minhash" -> MinHashKind,
    "fuzzy" -> FuzzyKind,
    "logcloud" -> LogCloudKind)

  /** Ranking kinds need the lake table's id column to score/decode. */
  private def rankedKind(name: String, idCol: String): IndexKind =
    name match {
      case "bm25"   => Bm25Kind(idCol)
      case "vector" => VectorKind(idCol)
      case "vamana" => VamanaKind(idCol)
      case other => throw new IllegalArgumentException(
        s"unknown ranking kind '$other' — one of: bm25, vector, vamana")
    }

  private def str(e: Expression, arg: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$arg must be a string LITERAL, got: $other")
  }

  private def int(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer LITERAL, got: $other")
  }

  /** The plan of a facade DataFrame: analysis of the OUTER query picks
    * it up from here, so the TVF composes with any surrounding SQL
    * (joins, CTEs, aggregation over the hits).
    */
  private def planOf(df: DataFrame): LogicalPlan = df.queryExecution.logical

  private def searchBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 5 || args.size == 6,
      "graft_search(dir, kind, column, query, k [, order_col])")
    val spark = SparkSession.active
    val kindName = str(args(1), "kind")
    val kind = filterKinds.getOrElse(kindName,
      throw new IllegalArgumentException(
        s"unknown filter kind '$kindName' — one of: " +
          filterKinds.keys.toSeq.sorted.mkString(", ") +
          " (ranking kinds go through graft_rank)"))
    val order = if (args.size == 6) Seq(str(args(5), "order_col")) else Seq.empty
    planOf(GraftLake.auto(spark, str(args(0), "dir")).search(
      kind, str(args(2), "column"), str(args(3), "query"),
      int(args(4), "k"), order))
  }

  /** `graft_smart(dir, column, query, k [, order_col])` — the raw
    * search-box entry point for SQL-only users: shape-routed
    * ([[graft.text.QueryShaping.route]]) exact/bool/regex with the
    * quoting escape and the empty→fuzzy fallback, warm-served when the
    * lake allows ([[GraftLake.smartSearch]]).
    */
  private def smartBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 4 || args.size == 5,
      "graft_smart(dir, column, query, k [, order_col])")
    val spark = SparkSession.active
    val order = if (args.size == 5) Seq(str(args(4), "order_col")) else Seq.empty
    planOf(GraftLake.auto(spark, str(args(0), "dir")).smartSearch(
      str(args(1), "column"), str(args(2), "query"),
      int(args(3), "k"), order))
  }

  private def rankBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 6,
      "graft_rank(dir, kind, column, query, k, id_col)")
    val spark = SparkSession.active
    val kind = rankedKind(str(args(1), "kind"), str(args(5), "id_col"))
    planOf(GraftLake.auto(spark, str(args(0), "dir")).search(
      kind, str(args(2), "column"), str(args(3), "query"),
      int(args(4), "k")))
  }

  private def explainBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 3 || args.size == 4,
      "graft_explain(dir, kind, column [, id_col])")
    val spark = SparkSession.active
    val kindName = str(args(1), "kind")
    val kind = filterKinds.getOrElse(kindName,
      rankedKind(kindName,
        if (args.size == 4) str(args(3), "id_col") else "doc_id"))
    planOf(GraftLake.auto(spark, str(args(0), "dir"))
      .explainSearch(kind, str(args(2), "column")))
  }

  private def statsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2, "graft_stats(dir, column)")
    val spark = SparkSession.active
    val prefix = str(args(0), "dir")
    val column = str(args(1), "column")
    import org.apache.spark.sql.functions.{col => c, count, lit, max, min}
    // the plain min/max/count(*)/count(col) aggregate over the lake —
    // with the rule enabled the Aggregate rewrite answers it from the
    // committed zone map without reading a data page; an uncovered
    // lake falls back to the real scan, same answer. Versioned
    // backends (Delta/Iceberg) scan their LIVE file set instead: a
    // prefix read would count logically-removed files, and the rewrite
    // never fires on a file-list read (multi-root), so semantics stay
    // the table's
    val lake = GraftLake.auto(spark, prefix)
    val src =
      if (!lake.backend.canRemove) {
        IndexPruneRule.enable(spark)
        spark.read.parquet(prefix)
      } else {
        val live = lake.backend.filesAt(None)
        if (live.isEmpty)
          // typed empty: schema from any historical file
          lake.backend.schemaFile match {
            case Some(f) => spark.read.parquet(f).limit(0)
            case None => spark.emptyDataFrame
          }
        else spark.read.parquet(live: _*)
      }
    planOf(src.agg(
      min(c(column)).as("lo"), max(c(column)).as("hi"),
      count(lit(1)).as("n"), count(c(column)).as("nn")))
  }

  /** `graft_suggest(dir, column, term)` — spell-correction
    * suggestions: corpus tokens within edit distance
    * [[graft.index.FuzzyIndex.MaxDist]] of `term`, ranked by
    * frequency. Frequencies come from the lake's committed bm25
    * postings (Σtf — no corpus rescan; a length-band filter prunes
    * the token dictionary before the levenshtein test); an
    * un-bm25-indexed lake falls back to one tokenize scan.
    */
  private def suggestBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 3, "graft_suggest(dir, column, term)")
    val spark = SparkSession.active
    val dir = str(args(0), "dir")
    val column = str(args(1), "column")
    val term = graft.text.Text.sparkLower(str(args(2), "term"))
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // snapshot/backend-aware routing, shared with search(): the lake's
    // LIVE file set (Delta/Iceberg removes are logical — a raw prefix
    // listing would count removed-but-unvacuumed files), and the
    // greedily-selected bm25 indexes (overlapping coverage during the
    // compaction append-then-delete window must not double-count
    // suggestion frequencies)
    val lake = GraftLake.auto(spark, dir)
    val live = lake.backend.files.toSet
    val paths = lake.coverageByName("bm25", column).map(_._1)
    val toks =
      if (paths.nonEmpty) {
        // (idx, uid) units whose covering file is live — metadata-scale
        // (driver-cached metaRows), broadcast semi-join onto postings
        val liveUids = paths.zipWithIndex.flatMap { case (p, i) =>
          IndexKind.metaRows(spark, p).collect {
            case (uid, f, _, _) if live.contains(f) => (i, uid)
          }
        }
        IndexKind.readTagged(spark, paths, "postings")
          .join(org.apache.spark.sql.functions.broadcast(
            liveUids.toDF("idx", "uid")), Seq("idx", "uid"), "left_semi")
          .select(col("token"), col("tf").cast("long").as("tf"))
      } else if (live.isEmpty)
        spark.emptyDataFrame.select(lit("").as("token"), lit(1L).as("tf"))
          .limit(0)
      else
        spark.read.parquet(live.toSeq.sorted: _*)
          .select(explode(graft.text.Text.tokens(col(column))).as("token"))
          .withColumn("tf", lit(1L))
    planOf(toks
      .filter(length(col("token"))
        .between(term.length - graft.index.FuzzyIndex.MaxDist,
          term.length + graft.index.FuzzyIndex.MaxDist))
      .filter(levenshtein(col("token"), lit(term)) <=
        graft.index.FuzzyIndex.MaxDist)
      .groupBy(col("token")).agg(sum(col("tf")).as("freq"))
      .orderBy(col("freq").desc, col("token")))
  }

  /** `graft_advise(path)` — the index advisor from SQL: per-column kind
    * recommendation over a lake prefix (live file set — Delta/Iceberg
    * removes are logical) or a single parquet file.
    */
  private def adviseBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1, "graft_advise(path)")
    val spark = SparkSession.active
    val path = str(args(0), "path")
    val df =
      if (path.endsWith(".parquet")) spark.read.parquet(path)
      else {
        val live = GraftLake.auto(spark, path).backend.files
        require(live.nonEmpty, s"graft_advise: no live files under $path")
        spark.read.parquet(live.sorted: _*)
      }
    planOf(graft.ops.Advisor.advise(spark, df))
  }

  /** `graft_dedup(dir)` — the production dedup composition (exact
    * collapse → capped-LSH pairs → connected components → keepers)
    * from one SQL statement: returns the SURVIVING doc_ids of the
    * lake's documents table.
    */
  private def dedupBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1, "graft_dedup(dir)")
    planOf(graft.ops.Pipeline.dedupProduction(
      SparkSession.active, str(args(0), "dir")))
  }

  /** `graft_wildcard(dir, column, pattern, k)` — ranked single-`*`
    * wildcard search (`pre*`, `*suf`, `pre*suf`) over the lake's
    * committed bm25 indexes: the pattern expands against each index's
    * vocabulary (rvocab sidecar for suffix shapes — a pushed
    * startsWith over the reversed tokens, never an O(vocabulary)
    * endsWith walk), then the standard weighted-BM25 plan scores with
    * GLOBAL corpus stats across the covering indexes.
    */
  private def wildcardBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 4, "graft_wildcard(dir, column, pattern, k)")
    val spark = SparkSession.active
    val column = str(args(1), "column")
    val pattern = str(args(2), "pattern")
    val i = pattern.indexOf('*')
    require(i >= 0 && pattern.indexOf('*', i + 1) < 0,
      s"single-* wildcard expected: $pattern")
    val lake = GraftLake.auto(spark, str(args(0), "dir"))
    val paths = lake.coverageByName("bm25", column).map(_._1)
    require(paths.nonEmpty,
      s"graft_wildcard: no bm25 index covers column '$column' — run " +
        s"graft_index(dir, 'bm25', '$column') first")
    val terms = paths.flatMap(p => graft.index.Bm25Index
        .expandWildcard(spark, p, pattern.take(i), pattern.drop(i + 1)))
      .distinct.sorted
    planOf(graft.index.Bm25Index.searchWeightedMany(
      spark, paths, terms.map(_ -> 1.0), int(args(3), "k")))
  }

  // ---- maintenance lifecycle (build / compact / vacuum) --------------
  //
  // These TVFs run their side effect when the statement is ANALYZED
  // (the same point the search TVFs run their metadata probes) and
  // return status rows. All three are idempotent — a covered lake
  // no-ops graft_index, a single surviving index no-ops graft_compact,
  // nothing-past-retention no-ops graft_vacuum — so re-analysis of the
  // same statement is safe. Together with graft_search they close the
  // SQL-only lifecycle the reference drives from Python
  // (backends/parquet.py index/compact/vacuum).

  private def lifecycleRows(spark: SparkSession,
      rows: Seq[(String, String)]): LogicalPlan = {
    import spark.implicits._
    planOf(rows.toDF("op", "detail"))
  }

  /** `graft_index(dir, kind, column [, binpack_rows [, id_col]])` —
    * index every not-yet-covered live file, bin-packed; one status row
    * per index built.
    */
  private def indexBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size >= 3 && args.size <= 5,
      "graft_index(dir, kind, column [, binpack_rows [, id_col]])")
    val spark = SparkSession.active
    val kindName = str(args(1), "kind")
    val idCol = if (args.size == 5) str(args(4), "id_col") else "doc_id"
    val kind = filterKinds.getOrElse(kindName, rankedKind(kindName, idCol))
    val binpack =
      if (args.size >= 4) int(args(3), "binpack_rows").toLong else 10000L
    val built = GraftLake.auto(spark, str(args(0), "dir"))
      .index(kind, str(args(2), "column"), binpack)
    lifecycleRows(spark,
      if (built.isEmpty) Seq(("noop", "lake already covered"))
      else built.map("indexed" -> _))
  }

  /** `graft_compact(dir, kind, column [, threshold])` — merge this
    * (kind, column)'s under-threshold indexes into one
    * ([[GraftLake.compact]]: generic merge driver + append-then-delete
    * metadata commit + vacuum of retired dirs past retention).
    */
  private def compactBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 3 || args.size == 4,
      "graft_compact(dir, kind, column [, threshold])")
    val spark = SparkSession.active
    val kindName = str(args(1), "kind")
    val kind = filterKinds.getOrElse(kindName, rankedKind(kindName, "doc_id"))
    val thr = if (args.size == 4) int(args(3), "threshold").toLong else 10000L
    val merged = GraftLake.auto(spark, str(args(0), "dir"))
      .compact(kind, str(args(2), "column"), thr)
    lifecycleRows(spark, merged match {
      case Some(p) => Seq(("compacted", p))
      case None => Seq(("noop", "nothing under threshold"))
    })
  }

  /** `graft_vacuum(dir [, retention_days])` — delete unreferenced index
    * dirs whose tombstone is older than the retention; one "vacuumed"
    * status row per dir actually deleted (the facade call returns the
    * SURVIVORS, so deletions are observed as a before/after listing
    * diff of the lake's index root), then one "live" row per surviving
    * referenced index.
    */
  private def vacuumBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      "graft_vacuum(dir [, retention_days])")
    val spark = SparkSession.active
    val dir = str(args(0), "dir")
    val ms =
      if (args.size == 2) int(args(1), "retention_days").toLong * 86400000L
      else graft.ops.Maintenance.DefaultRetentionMs
    val root = s"${graft.core.IndexStore.root}/" +
      graft.core.IndexStore.lakeId(dir)
    def dirs(): Set[String] =
      try graft.core.Fs.childStats(spark, root)
        .filter(_._2).map(_._1).toSet
      catch { case scala.util.control.NonFatal(_) => Set.empty }
    val before = dirs()
    val live = GraftLake.auto(spark, dir).vacuum(ms)
    val deleted = (before -- dirs()).toSeq.sorted
    lifecycleRows(spark,
      (if (deleted.isEmpty) Seq(("noop", "nothing past retention"))
       else deleted.map("vacuumed" -> _)) ++ live.map("live" -> _))
  }

  /** `graft_warm(dir, kind, column)` — explicit serve-tier pre-warm
    * (reference `populate_cache`, backends/utils.py:128-145): load
    * every covering index's warm slices (corpus stats, dl/vocab
    * tables, per-term posting slices, IVF code/vector slices, graph
    * nodes) under the serve budget, so first-query latency after
    * deploy/compaction/eviction is deterministic. One (idx, tbl,
    * entries) row per warmed slice family per covering index;
    * oversized indexes warm nothing (the tier declines their queries).
    */
  private def warmBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 3, "graft_warm(dir, kind, column)")
    val spark = SparkSession.active
    import spark.implicits._
    val lake = GraftLake.auto(spark, str(args(0), "dir"))
    val paths = lake.coverageByName(str(args(1), "kind"),
      str(args(2), "column")).map(_._1).sorted
    val rows = paths.zipWithIndex.flatMap { case (p, i) =>
      graft.index.Serve.populateRows(spark, p)
        .map { case (t, n) => (i.toLong, t, n) }
    }
    planOf(rows.toDF("idx", "tbl", "entries").orderBy("idx", "tbl"))
  }

  private def layoutBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1, "graft_layout(path)")
    val spark = SparkSession.active
    val path = str(args(0), "path")
    val files =
      if (path.endsWith(".parquet")) Seq(path) else Lake.listFiles(path)
    planOf(Layout.scan(spark, files))
  }

  /** (name, builder) for every table function this engine exposes. */
  private[graft] val all: Seq[(String, Seq[Expression] => LogicalPlan)] =
    Seq(
      "graft_search" -> (searchBuilder(_)),
      "graft_smart" -> (smartBuilder(_)),
      "graft_rank" -> (rankBuilder(_)),
      "graft_explain" -> (explainBuilder(_)),
      "graft_stats" -> (statsBuilder(_)),
      "graft_suggest" -> (suggestBuilder(_)),
      "graft_advise" -> (adviseBuilder(_)),
      "graft_dedup" -> (dedupBuilder(_)),
      "graft_wildcard" -> (wildcardBuilder(_)),
      "graft_warm" -> (warmBuilder(_)),
      "graft_index" -> (indexBuilder(_)),
      "graft_compact" -> (compactBuilder(_)),
      "graft_vacuum" -> (vacuumBuilder(_)),
      "graft_layout" -> (layoutBuilder(_)))

  /** injectTableFunction descriptors for [[graft.GraftExtensions]]. */
  def descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] =
    all.map { case (name, builder) =>
      (new FunctionIdentifier(name),
        new ExpressionInfo(SqlTableFunctions.getClass.getName, name),
        builder)
    }

  /** Register on an existing session (idempotent; the
    * `GraftExtensions.register` path for sessions built without the
    * extensions config).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
