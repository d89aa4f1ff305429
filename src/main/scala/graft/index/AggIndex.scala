package graft.index

import graft.core.Layout
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grouped-aggregate index (materialized-view matching, the BI "cube"
  * slice): per (row group, key-tuple) partials of
  * `GROUP BY k0[, k1…] → count(*), count(m), sum(m), min(m), max(m)`
  * for EVERY requested measure, all from one build pass.
  *
  * The zone map answers GLOBAL stats queries metadata-only
  * ([[ZoneMapIndex.statsAgg]] + the Aggregate rewrite); this kind
  * extends the same contract to grouped aggregates — the per-source /
  * per-tenant / per-day dashboard query a 100 TB lake cannot afford to
  * rescan. Partials are mergeable by construction (counts and
  * DECIMAL(38,0) sums add), so compaction is the standard uid re-offset
  * union and the index table stays ndv(keys) × row-groups —
  * metadata-scale whenever the key tuple is the low-cardinality
  * dimension an aggregate index is worth building for (the Catalyst
  * rewrite VETOES past a row budget instead of serving a data-scale
  * collect).
  *
  * Multi-measure rationale: a real dashboard key carries several
  * measures (revenue, quantity, latency). One index per (key, measure)
  * pair multiplies builds AND whole-lake scans by the measure count —
  * storing all measures' cells side by side in ONE groups table costs
  * one extra column quartet per measure and nothing at query time
  * (column pruning drops the unreferenced quartets at the scan).
  *
  * On-disk v2 layout:
  *   groups: uid, k0..k{K-1}, n, then per measure j: nn{j}, s{j},
  *           lo{j}, hi{j} (lo/hi in the measure's own type; s NULL for
  *           non-integral measures — the rewrite's sum path never fires
  *           for those, integralType gate)
  *   spec:   key_cols array<string>, measure_cols array<string>
  * A v1 single-pair index (groups: uid, key, n, nn, s[, lo, hi]; spec:
  * key_col, measure_col) is still readable everywhere and self-heals to
  * v2 on the next [[ensureRegistered]].
  *
  * Exactness argument: every row of a covered file lands in exactly one
  * (uid, key-tuple) cell; count(*) sums cells, count(measure) sums the
  * non-null cell counts, sum(measure) sums exact decimal cell sums —
  * each equal to the scan's answer by associativity of the underlying
  * aggregates (the same partial-aggregation Spark itself performs
  * map-side, persisted instead of recomputed).
  */
object AggIndex {

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Build over `files`: one pass computes every measure's quartet.
    * The reduce-side aggregation stays parallel (32-way); only the
    * WRITE is repartitioned to one file — `coalesce(1)` here would
    * collapse the aggregation itself into a single task.
    */
  def build(spark: SparkSession, files: Seq[String], keyCols: Seq[String],
      measureCols: Seq[String], path: String): Unit = {
    import spark.implicits._
    require(keyCols.nonEmpty && keyCols.distinct == keyCols,
      s"bad key columns: $keyCols")
    require(measureCols.nonEmpty && measureCols.distinct == measureCols,
      s"bad measure columns: $measureCols")
    val meta = Layout.buildMeta(spark, files, Some(keyCols.head)).cache()
    val data = Layout.withUid(spark, files, meta)
    // project keys/measures under internal names FIRST: a source key
    // column literally named "n" (or "nn0"…) would otherwise be
    // ambiguous against the aggregate aliases in the post-agg select
    val proj = data.select(col("uid") +:
      (keyCols.zipWithIndex.map { case (c, i) => col(c).as(s"__gk$i") } ++
        measureCols.zipWithIndex.map { case (m, j) =>
          col(m).as(s"__gm$j") }): _*)
    val aggs: Seq[Column] = count(lit(1)).as("n") +:
      measureCols.zipWithIndex.flatMap { case (m, j) =>
        val sCol =
          if (integral(data.schema(m).dataType))
            sum(col(s"__gm$j")
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          else lit(null).cast(org.apache.spark.sql.types.DecimalType(38, 0))
        Seq(count(col(s"__gm$j")).as(s"nn$j"), sCol.as(s"s$j"),
          min(col(s"__gm$j")).as(s"lo$j"), max(col(s"__gm$j")).as(s"hi$j"))
      }
    val outCols: Seq[Column] = col("uid") +:
      (keyCols.indices.map(i => col(s"__gk$i").as(s"k$i")) ++
        (col("n") +: measureCols.indices.flatMap(j =>
          Seq(col(s"nn$j"), col(s"s$j"), col(s"lo$j"), col(s"hi$j")))))
    proj.groupBy(col("uid") +: keyCols.indices.map(i => col(s"__gk$i")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/groups")
    Seq((keyCols, measureCols)).toDF("key_cols", "measure_cols")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/spec")
    meta.write.mode("overwrite").parquet(s"$path/meta")
    meta.unpersist()
  }

  /** Single-pair convenience (the v1 API shape). */
  def build(spark: SparkSession, files: Seq[String], keyCol: String,
      measureCol: String, path: String): Unit =
    build(spark, files, Seq(keyCol), Seq(measureCol), path)

  /** Merge two agg indexes: `b`'s uids re-based past `a`'s — cells stay
    * disjoint by (uid, keys), so the union IS the merged partial set.
    */
  def merge(spark: SparkSession, a: String, b: String, out: String): Unit = {
    require(specV2(spark, a) == specV2(spark, b),
      s"agg indexes disagree on (keys, measures): $a vs $b")
    val offset = spark.read.parquet(s"$a/meta")
      .agg(max("uid")).collect()(0).getLong(0)
    spark.read.parquet(s"$a/groups").unionByName(
      spark.read.parquet(s"$b/groups")
        .withColumn("uid", col("uid") + offset))
      .repartition(1).write.mode("overwrite").parquet(s"$out/groups")
    spark.read.parquet(s"$a/spec")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/spec")
    spark.read.parquet(s"$a/meta").unionByName(
      spark.read.parquet(s"$b/meta").withColumn("uid", col("uid") + offset))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/meta")
  }

  /** Build over a lake prefix (idempotent) and commit the coverage
    * metadata row (indexType "aggindex", column = sorted key cols
    * joined by "," — for one key that is just the key name, so v1
    * registrations keep matching). Returns the index path.
    */
  /** Reject specs whose key column names collide with the reserved
    * aggregate output aliases of [[groupStats]] (`n`, and `nn/s/lo/hi`
    * — suffixed `_<measure>` for multi-measure specs): the grouped
    * result would otherwise carry duplicate column names and every
    * downstream select would be ambiguous. Validated at registration
    * (fail fast, before anything is built) and again at read (an
    * artifact written by an older build still can't produce an
    * ambiguous frame).
    */
  private def validateNames(keyCols: Seq[String],
      measureCols: Seq[String]): Unit = {
    val reserved =
      if (measureCols.size == 1) Set("n", "nn", "s", "lo", "hi")
      else Set("n") ++ measureCols.flatMap(m =>
        Seq(s"nn_$m", s"s_$m", s"lo_$m", s"hi_$m"))
    val keyNames =
      if (keyCols.size == 1) Seq("key") else keyCols
    val bad = keyNames.filter(reserved.contains)
    require(bad.isEmpty,
      s"agg index key column(s) ${bad.mkString(", ")} collide with " +
        s"reserved aggregate aliases ${reserved.toSeq.sorted.mkString(", ")}" +
        "; rename the key column or use a different spec")
  }

  def ensureRegistered(spark: SparkSession, prefix: String,
      keyCols: Seq[String], measureCols: Seq[String]): String = {
    import graft.core.{IndexStore, Lake}
    validateNames(keyCols, measureCols)
    // the single-pair name keeps its v1 form (existing artifacts stay
    // valid); wider specs append the arity and a hash of the EXACT
    // split — a plain '_' join would alias (Seq("a","b"),Seq("c")) with
    // (Seq("a"),Seq("b","c")) (and any underscore-bearing column name),
    // and the second ensure would silently return the first's index
    val sigSrc = ((keyCols.map(c => s"${c.length}:$c") :+ "#") ++
      measureCols.map(c => s"${c.length}:$c")).mkString("|")
    val name =
      if (keyCols.size == 1 && measureCols.size == 1)
        s"agg_${keyCols.head}_${measureCols.head}"
      else {
        // 64-bit SHA-256 prefix of the length-prefixed split: a 32-bit
        // String.hashCode could collide across same-arity specs whose
        // columns share an underscore join, silently aliasing two
        // different indexes onto one path (the second ensure would
        // return the first's artifact and never build)
        val sig = java.security.MessageDigest.getInstance("SHA-256")
          .digest(sigSrc.getBytes("UTF-8")).take(8)
          .map(b => f"${b & 0xff}%02x").mkString
        s"agg_${(keyCols ++ measureCols).mkString("_")}" +
          s"_k${keyCols.size}m${measureCols.size}h$sig"
      }
    val p = IndexStore.indexPath(prefix, name)
    IndexStore.ensure(p) {
      build(spark, Lake.listFiles(prefix), keyCols, measureCols, p)
    }
    // self-heal a pre-v2 generation (v1 single-pair cells, with or
    // without lo/hi): rebuild in place (metadata row, if any, stays
    // valid — same coverage). Delete through the PATH's own
    // filesystem — a java.nio delete is a silent no-op on s3://-style
    // index roots, which would pin the stale generation forever
    if (!spark.read.parquet(s"$p/groups").schema.fieldNames.contains("k0")) {
      if (graft.core.Fs.isLocalPath(p))
        IndexStore.deleteRec(java.nio.file.Paths.get(p))
      else graft.core.Fs.deleteRec(spark, p)
      IndexStore.ensure(p) {
        build(spark, Lake.listFiles(prefix), keyCols, measureCols, p)
      }
    }
    if (!IndexStore.metadataRowsCached(spark, prefix)
        .exists(_.indexFile == p)) {
      val fc = spark.read.parquet(s"$p/meta")
        .groupBy(col("file_path"))
        .agg(sum(col("num_rows")).cast("long").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      IndexStore.commitMetadata(spark, prefix,
        IndexStore.metadataRows(spark, prefix,
          keyCols.sorted.mkString(","),
          fc.map(_._1), fc.map(_._2), p, "aggindex", fc.map(_._2).sum))
    }
    // the pre-SHA generation used a 32-bit hashCode suffix for
    // multi-column names: a same-spec artifact surviving under that
    // LEGACY name would otherwise stay registered forever next to the
    // new one (results stay correct — ownedUidPairs dedups the
    // double-coverage — but its storage and its per-plan probe cost
    // are never reclaimed). Deregister + delete it only AFTER the new
    // artifact is built and committed above, so a crash in between
    // leaves two valid artifacts, never zero.
    if (keyCols.size > 1 || measureCols.size > 1) {
      val legacy = IndexStore.indexPath(prefix,
        s"agg_${(keyCols ++ measureCols).mkString("_")}" +
          s"_k${keyCols.size}m${measureCols.size}" +
          f"h${sigSrc.hashCode & 0xffffffffL}%08x")
      if (legacy != p && IndexStore.isBuilt(legacy) &&
          (try specV2(spark, legacy) == ((keyCols, measureCols))
           catch { case scala.util.control.NonFatal(_) => false })) {
        IndexStore.deleteMetadata(spark, prefix, Seq(legacy))
        graft.core.Fs.deleteRec(spark, legacy)
      }
    }
    p
  }

  def ensureRegistered(spark: SparkSession, prefix: String,
      keyCol: String, measureCol: String): String =
    ensureRegistered(spark, prefix, Seq(keyCol), Seq(measureCol))

  /** (key_cols, measure_cols) the index was built for — reads both the
    * v2 array spec and the v1 single-pair spec. Driver-cached by the
    * spec dir's signature so plan-time consultation is footer-free on
    * warm paths.
    */
  def specV2(spark: SparkSession, path: String): (Seq[String], Seq[String]) = {
    val dir = s"$path/spec"
    val sig = graft.core.Fs.dirSignature(spark, dir)
    specCache.get(dir) match {
      case Some((m, v)) if m == sig => v
      case _ =>
        val df = spark.read.parquet(dir)
        val r = df.collect()(0)
        val v =
          if (df.schema.fieldNames.contains("key_cols"))
            (r.getSeq[String](df.schema.fieldIndex("key_cols")).toList,
              r.getSeq[String](df.schema.fieldIndex("measure_cols")).toList)
          else (List(r.getString(0)), List(r.getString(1)))
        specCache.put(dir, (sig, v))
        v
    }
  }

  private val specCache =
    new graft.core.LruMap[String, (Long, (Seq[String], Seq[String]))](512)

  /** Whether the groups table at `path` is the v2 layout (k0 et al.) —
    * cached with the same discipline as [[specV2]].
    */
  private[graft] def isV2(spark: SparkSession, path: String): Boolean = {
    val dir = s"$path/groups"
    val sig = graft.core.Fs.dirSignature(spark, dir)
    v2Cache.get(dir) match {
      case Some((m, v)) if m == sig => v
      case _ =>
        val v = spark.read.parquet(dir).schema.fieldNames.contains("k0")
        v2Cache.put(dir, (sig, v))
        v
    }
  }

  private val v2Cache = new graft.core.LruMap[String, (Long, Boolean)](512)

  /** First (key_col, measure_col) — v1 compatibility accessor. */
  def spec(spark: SparkSession, path: String): (String, String) = {
    val (k, m) = specV2(spark, path)
    (k.head, m.head)
  }

  /** The grouped aggregate served FROM the index tables (zero lake data
    * pages): the direct-call twin of the Catalyst rewrite. Single-key /
    * single-measure indexes keep the v1 output names (key, n, nn, s,
    * lo, hi); wider indexes name keys by their source columns and
    * measures as nn_col / s_col / lo_col / hi_col.
    */
  def groupStats(spark: SparkSession, path: String): DataFrame = {
    val g = spark.read.parquet(s"$path/groups")
    if (!g.columns.contains("k0")) // v1 cells
      return g.groupBy(col("key"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("nn")).cast("long").as("nn"),
          sum(col("s")).as("s"),
          min(col("lo")).as("lo"), max(col("hi")).as("hi"))
    val (kcols, mcols) = specV2(spark, path)
    validateNames(kcols, mcols)
    val single = mcols.size == 1
    def mName(suffix: String, m: String) =
      if (single) suffix else s"${suffix}_$m"
    val keyNames = kcols.indices.map(i =>
      if (kcols.size == 1) "key" else kcols(i))
    val renamed = kcols.indices.foldLeft(g) { (d, i) =>
      d.withColumnRenamed(s"k$i", keyNames(i))
    }
    val aggs = sum(col("n")).cast("long").as("n") +:
      mcols.zipWithIndex.flatMap { case (m, j) =>
        Seq(sum(col(s"nn$j")).cast("long").as(mName("nn", m)),
          sum(col(s"s$j")).as(mName("s", m)),
          min(col(s"lo$j")).as(mName("lo", m)),
          max(col(s"hi$j")).as(mName("hi", m)))
      }
    renamed.groupBy(keyNames.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
