package graft.streaming

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table.
  *
  * The reference is batch-only (SURVEY §2.6 marks streaming absent),
  * but a training-data lake ingests continuously, so the engine ships
  * the streaming twin of the hourly windowed aggregation: readStream →
  * event-time watermark → tumbling window → sink. The query entry runs
  * it as a real micro-batch stream over the parquet directory (memory
  * sink, complete mode) and must produce exactly the batch result.
  */
object EventStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def hourlyStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
    val name = "graft_events_hourly_" + math.abs(dir.hashCode)
    val query = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .start()
    try query.processAllAvailable()
    finally query.stop()
    spark.table(name)
  }

  case class UserEvent(event_id: Long, ts: Long, user_id: Long,
      event_type: String)
  case class UserState(n: Long, lastTs: Long, lastType: String)

  /** Custom per-key streaming state via mapGroupsWithState: running
    * event count + latest event type per user. (ts stays raw nanos so
    * ordering matches the source exactly; (user_id, ts) is unique in
    * the data, making the fold deterministic.)
    */
  def userStateStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[UserEvent]
    val out = stream
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, (Long, Long, String)](
        GroupStateTimeout.NoTimeout) { (uid, events, state) =>
        var st = state.getOption.getOrElse(UserState(0L, Long.MinValue, ""))
        events.foreach { e =>
          val last =
            if (e.ts > st.lastTs) (e.ts, e.event_type)
            else (st.lastTs, st.lastType)
          st = UserState(st.n + 1, last._1, last._2)
        }
        state.update(st)
        (uid, st.n, st.lastType)
      }
      .toDF("user_id", "n", "last_type")
    val name = "graft_user_state_" + math.abs(dir.hashCode)
    val query = out.writeStream
      .format("memory").queryName(name)
      .outputMode("update")
      .start()
    try query.processAllAvailable()
    finally query.stop()
    spark.table(name)
  }

  /** Streaming deduplication: distinct (user_id, event_type) pairs via
    * dropDuplicates state. Exact regardless of micro-batch boundaries
    * (state is unbounded here so the result equals batch DISTINCT; a
    * production stream bounds state with dropDuplicatesWithinWatermark,
    * trading exactness outside the watermark horizon for O(window)
    * state).
    */
  def dedupStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    val name = "graft_stream_dedup_" + math.abs(dir.hashCode)
    val query = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .start()
    try query.processAllAvailable()
    finally query.stop()
    spark.table(name)
  }

  def entries: Map[String, Q] = Map(
    "streaming_dedup" -> Q((s, dir) => dedupStream(s, dir),
      "SELECT DISTINCT user_id, event_type FROM events"),

    "streaming_user_state" -> Q((s, dir) => userStateStream(s, dir),
      """SELECT user_id, count(*) AS n, arg_max(event_type, ts) AS last_type
        |FROM events GROUP BY user_id""".stripMargin),

    "streaming_events_hourly" -> Q((s, dir) => hourlyStream(s, dir),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin)
  )
}
