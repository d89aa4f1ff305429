package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch equivalence over the real sf0.001 events table. */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly window equals the batch aggregation") {
    val streamed = graft.streaming.EventStream.hourlyStream(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Relational.entries("q_events_hourly")
      .fn(spark, dir).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streamed prep gates equal the batch gates across micro-batch splits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // multi-file source + one file per trigger: the survivor set must
    // not depend on how ingestion batches the corpus
    val docs = Tables.load(spark, dir, "documents")
    val src = TestSpark.tmpDir("stream-gates-src")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val out = graft.ops.Pipeline.gates(stream).select("doc_id")
    val q = out.writeStream.format("memory")
      .queryName("gates_mb").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("gates_mb")
      .collect().map(_.getLong(0)).toSet
    val batch = graft.ops.Pipeline.gates(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("mapGroupsWithState user state equals the batch arg_max") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.EventStream.userStateStream(spark, dir)
      .collect().map(_.toSeq).toSet
    val e = Tables.load(spark, dir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc)
    val batch = e.withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("ts"), col("event_type"))).getField("event_type").as("last_type"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
