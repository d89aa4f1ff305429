package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (usually) an
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle == None` → driver records a weaker rows-only check.
  */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(fn, Some(sql))
}
