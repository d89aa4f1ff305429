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

  def lakeRoot: String =
    sys.env.getOrElse("GRAFT_LAKE_DIR", "/root/repo/target/graft-lake")

  /** Split `table` into `parts` files range-partitioned on `key`.
    * Returns the sorted list of data-file paths.
    */
  def ensureSplit(spark: SparkSession, dir: String, table: String,
      key: String, parts: Int): Seq[String] = {
    val path = s"$lakeRoot/${IndexStore.lakeId(dir)}/$table"
    IndexStore.synchronized {
      if (!Files.exists(Paths.get(path, "_GRAFT_DONE"))) {
        graft.Tables.load(spark, dir, table)
          .repartitionByRange(parts, col(key))
          .write.mode("overwrite").parquet(path)
        Files.write(Paths.get(path, "_GRAFT_DONE"), Array.emptyByteArray)
      }
    }
    listFiles(path)
  }

  def listFiles(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
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
    * brute-force predicate directly.
    */
  def scanUnindexed(spark: SparkSession, files: Seq[String],
      pred: DataFrame => DataFrame): DataFrame =
    pred(spark.read.parquet(files: _*))
}
