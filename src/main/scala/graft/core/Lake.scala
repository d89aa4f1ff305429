package graft.core

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A plain-parquet lake: an append-only directory of immutable parquet
  * files (reference: python/rottnest/backends/parquet.py:57-63).
  *
  * The driver testdata ships one parquet file per table; real lakes have
  * many. `ensureSplit` materializes a deterministic multi-file copy of a
  * testdata table (inside the repo's target dir) so the multi-file index
  * paths — bin-packing, partial coverage, in-situ probing, merges — are
  * exercised for real.
  */
object Lake {

  def lakeRoot: String = {
    val r = sys.env.getOrElse("GRAFT_LAKE_DIR", "/root/repo/target/graft-lake")
    // same scheme-strip as IndexStore.root: the java.nio call sites
    // below (split spec read/write) mis-resolve a literal "file:/..."
    // string as a relative path
    if (r.startsWith("file:")) new org.apache.hadoop.fs.Path(r).toUri.getPath
    else r
  }

  /** The split lake directory for a testdata table — the ONE place the
    * path scheme lives (ensureSplit writes it, query entries read it).
    */
  def splitPath(dir: String, table: String): String =
    s"$lakeRoot/${IndexStore.lakeId(dir)}/$table"

  /** Split `table` into `parts` files range-partitioned on `key`.
    * Returns the sorted list of data-file paths. Built once per (dir,
    * table) under IndexStore's per-path lock (a multi-second Spark
    * write must not hold the global monitor metadata readers share);
    * the split spec is recorded and a later call with a DIFFERENT
    * key/parts fails loudly instead of silently returning the old
    * layout.
    */
  /** Ensure-gated PAGED copy of a base table: the same rows rewritten
    * with 64-row data pages (`parquet.page.row.count.limit`) — the
    * shared fixture every page-granularity entry builds its index
    * over. ONE owner of the artifact's layout: the page size and
    * partitioning here decide what every reader of
    * `lake_<table>_paged` sees (ensure is first-wins, so divergent
    * per-caller copies of this writer would silently build against
    * whichever ran first).
    */
  def ensurePagedCopy(spark: SparkSession, dir: String,
      table: String): String = {
    val p = IndexStore.indexPath(dir, s"lake_${table}_paged")
    IndexStore.ensure(p) {
      graft.Tables.load(spark, dir, table).coalesce(2)
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "64")
        .parquet(p)
    }
    p
  }

  def ensureSplit(spark: SparkSession, dir: String, table: String,
      key: String, parts: Int, alias: String = ""): Seq[String] = {
    // `alias` names the split lake dir, so one source table can carry
    // SEVERAL splits (e.g. events by event_id AND by ts) without the
    // different-spec guard below firing across them
    val path = splitPath(dir, if (alias.isEmpty) table else alias)
    val spec = s"$key|$parts"
    // spec read/write through the scheme-dispatched helpers: on a
    // scheme-carrying lake root a raw Paths.get("scheme:/...") is a
    // RELATIVE path and the spec file would silently land in $CWD
    def writeSpec(): Unit =
      if (Fs.isLocalPath(path))
        Files.writeString(Paths.get(path, "_GRAFT_SPLIT"), spec)
      else Fs.writeBytes(s"$path/_GRAFT_SPLIT",
        spec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def specExists(): Boolean =
      if (Fs.isLocalPath(path)) Files.exists(Paths.get(path, "_GRAFT_SPLIT"))
      else Fs.forPath(path).exists(
        new org.apache.hadoop.fs.Path(path, "_GRAFT_SPLIT"))
    def buildSplit(): Unit = IndexStore.ensure(path) {
      graft.Tables.load(spark, dir, table)
        .repartitionByRange(parts, col(key))
        .write.mode("overwrite").parquet(path)
      writeSpec()
    }
    buildSplit()
    // a dir split before the spec file existed cannot PROVE its layout
    // — rebuild under the caller's spec instead of adopting it blindly
    // (stamping would satisfy every later require while possibly
    // serving a different key/parts split). Split dirs are derived
    // fixtures, so a rebuild is always safe.
    if (!specExists()) {
      Fs.deleteRec(spark, path)
      buildSplit()
    }
    val stored =
      if (Fs.isLocalPath(path)) Files.readString(Paths.get(path, "_GRAFT_SPLIT"))
      else Fs.readString(s"$path/_GRAFT_SPLIT")
    require(stored == spec,
      s"$table at $dir is already split as '$stored' — a '$spec' split " +
        "of the same table needs its own lake dir")
    listFiles(path)
  }

  /** List a lake directory's parquet files. Scheme-carrying prefixes
    * (`file://`, `s3a://`, `hdfs://` — reference scheme dispatch:
    * src/formats/readers/mod.rs:259-294) list through the scheme's
    * Hadoop FileSystem and keep their scheme (callers canonicalize via
    * `Layout.canonPath`); bare local paths keep the direct-nio fast
    * path whose results feed `Paths.get` call sites.
    */
  def listFiles(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    if (path.matches("^[A-Za-z][A-Za-z0-9+.-]*:/.*")) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(Fs.anyConf()).listStatus(p).toList
        .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted
    } else
      scala.util.Using.resource(Files.list(Paths.get(path))) { s =>
        s.iterator().asScala
          .map(_.toString).filter(_.endsWith(".parquet")).toList
      }.sorted
  }

  /** Reference behavior: if the index returns more than this many hits
    * the caller is told to brute-force scan instead
    * (reference: backends/utils.py:221-225, brute_force_threshold=1000).
    */
  val BruteForceThreshold = 1000

  /** In-situ probing of files not covered by any index
    * (reference: backends/utils.py:235-282): scan them with the
    * brute-force predicate directly. Callers with possibly-complete
    * coverage must skip the call when the remainder is empty (a
    * zero-path parquet read cannot infer a schema) — the facade kinds
    * do this via their own empty guards.
    */
  def scanUnindexed(spark: SparkSession, files: Seq[String],
      pred: DataFrame => DataFrame): DataFrame = {
    require(files.nonEmpty,
      "scanUnindexed needs ≥1 file — skip the in-situ scan when coverage is complete")
    pred(spark.read.parquet(files: _*))
  }
}
