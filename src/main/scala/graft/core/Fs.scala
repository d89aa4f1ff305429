package graft.core

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Driver-side filesystem checks routed through the Hadoop FileSystem
  * of each path's scheme (reference: scheme-dispatched readers,
  * src/formats/readers/mod.rs:259-294).
  *
  * Index DIRECTORIES may live on any Hadoop-supported store (`file:`,
  * `hdfs:`, `s3a:` …): everything that reads them driver-side —
  * existence filters in coverage/compaction, the mtime keys of the
  * head/schema/meta caches — must go through these helpers, because a
  * `java.nio.Files` check on an `s3a://` path is always false and
  * would silently demote every search to a brute-force scan (the
  * failure mode this object exists to prevent). The metadata TABLE's
  * commit protocol (IndexStore's two-rename swap) still requires an
  * atomic-rename filesystem (local/HDFS) and documents that
  * separately.
  */
object Fs {

  // one Hadoop conf per session (newHadoopConf() copies the full conf;
  // stat calls happen several times per search)
  private val confCache = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, org.apache.hadoop.conf.Configuration]()

  private def conf(spark: SparkSession) =
    confCache.computeIfAbsent(spark, s => s.sessionState.newHadoopConf())

  /** Hadoop conf for call sites with no SparkSession in scope (lake
    * listing from a backend): the active session's conf when one
    * exists, cluster defaults otherwise.
    */
  private[graft] def anyConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(conf).getOrElse(new org.apache.hadoop.conf.Configuration())

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new HPath(path)
    p.getFileSystem(conf(spark)).exists(p)
  }

  /** Modification time in ms (directory or file). Fails if absent —
    * callers that tolerate absence should check [[exists]] first.
    */
  def mtime(spark: SparkSession, path: String): Long = {
    val p = new HPath(path)
    p.getFileSystem(conf(spark)).getFileStatus(p).getModificationTime
  }

  /** Child names of a directory (empty if the directory is absent).
    * The batch alternative to per-path [[exists]]: filtering N metadata
    * rows by existence costs N HEAD requests on an object store, but
    * one LIST per parent directory — which is how coverage/compaction
    * validate their index dirs.
    */
  def childNames(spark: SparkSession, dir: String): Set[String] = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf(spark))
    try fs.listStatus(p).map(_.getPath.getName).toSet
    catch { case _: java.io.FileNotFoundException => Set.empty }
  }

  /** Batch existence filter: `paths` grouped by parent, one LIST each.
    * Semantics match per-path [[exists]] for directory children.
    */
  def existing(spark: SparkSession, paths: Seq[String]): Set[String] = {
    val byParent = paths.distinct.groupBy(p => new HPath(p).getParent)
    byParent.iterator.flatMap { case (parent, ps) =>
      if (parent == null) ps.filter(exists(spark, _))
      else {
        val names = childNames(spark, parent.toString)
        ps.filter(p => names.contains(new HPath(p).getName))
      }
    }.toSet
  }
}
