package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) which Spark's vectorized reader
      // rejects; read nanos as long and truncate to microseconds.
      // Deliberately a SESSION-level set (the flag is consulted at scan
      // time, so a scoped set/restore would race lazy execution): by
      // contract every TIMESTAMP(NANOS) read in this engine goes
      // through Tables.load, and the long representation is what the
      // oracle compares against.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path(dir, name))
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(path(dir, name))
  }
}
