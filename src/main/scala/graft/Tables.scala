package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-generated lake tables (TESTDATA.md).
  *
  * The lake is an append-only set of immutable Parquet files addressed by
  * prefix — mirroring the reference's plain-parquet backend
  * (reference: python/rottnest/backends/parquet.py:57-63). At 100 TB each
  * logical table is a directory of many files; here one file per table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** How the events `ts` column is physically encoded in the footer.
    * The testdata generator has shipped it both as TIMESTAMP(NANOS)
    * (which Spark's vectorized reader only accepts as a raw long under
    * the legacy flag) and as TIMESTAMP(MICROS); the loader dispatches
    * on the actual footer so either vintage of data reads identically.
    */
  sealed trait TsEncoding
  case object TsNanosAsLong extends TsEncoding
  case object TsNative extends TsEncoding

  // footer probe cached per (path, mtime): one open per distinct file,
  // immune to testdata regeneration between runs
  private val tsEncodingCache =
    new ConcurrentHashMap[(String, Long), TsEncoding]()

  /** Read the parquet footer of `file` (or of the first parquet inside
    * it, when it's a directory) and report how `ts` is annotated.
    */
  def tsEncoding(spark: SparkSession, file: String): TsEncoding = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val target =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .find(_.getName.endsWith(".parquet")).getOrElse(p)
      else p
    val mtime = fs.getFileStatus(target).getModificationTime
    tsEncodingCache.computeIfAbsent((target.toString, mtime), { _ =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(target, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val nanos = schema.containsField("ts") &&
          (schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          })
        if (nanos) TsNanosAsLong else TsNative
      } finally reader.close()
    })
  }

  /** Session-timezone-stable TimestampType view of `ts`, whatever the
    * raw reader produced: legacy nanos-as-long → truncate to micros;
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as TimestampNTZ →
    * cast (identity under the engine's UTC session timezone); plain
    * TimestampType passes through.
    */
  // private[graft]: the streaming twin (streaming/EventStream.readEvents)
  // must decode ts through THIS definition, or a batch-loader fix would
  // silently break the stream/batch equivalence the streaming oracles
  // assert
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** The footer probe + legacy-flag arm, shared by the batch loader
    * and the streaming source ([[graft.streaming.EventStream]]): any
    * change to the decode dispatch reaches both through this one
    * definition. The legacy flag is only touched when the footer
    * actually shows TIMESTAMP(NANOS), and the set is SESSION-level by
    * contract — the flag is consulted at scan time, so a scoped
    * set/restore would race lazy execution; every nanos read in this
    * engine goes through here.
    */
  private[graft] def armTsDecode(spark: SparkSession, file: String): Unit =
    if (tsEncoding(spark, file) == TsNanosAsLong)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Events loader: footer-dispatched timestamp decode via
    * [[armTsDecode]], result normalized to one TimestampType column.
    */
  def loadEvents(spark: SparkSession, file: String): DataFrame = {
    armTsDecode(spark, file)
    normalizeTs(spark.read.parquet(file))
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, path(dir, name))
    else spark.read.parquet(path(dir, name))
}
