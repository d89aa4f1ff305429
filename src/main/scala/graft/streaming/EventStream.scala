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
  * event-time watermark → tumbling window → sink. The query entries run
  * real micro-batch streams over the parquet directory (memory sink)
  * and must produce exactly the batch result REGARDLESS of how the
  * source split into micro-batches.
  */
object EventStream {

  /** The shared streaming source over the events parquet.
    *
    * Streaming sources need an explicit schema, and the testdata has
    * shipped `ts` both as TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * ([[graft.Tables.tsEncoding]]), so the source schema is the BATCH
    * reader's inferred schema for the same file — whatever that reader
    * can decode, the stream decodes identically — and `ts` is then
    * normalized to one TimestampType (µs) column exactly as the batch
    * loader does. Downstream operators never see the raw encoding.
    */
  private def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val file = graft.Tables.path(dir, "events")
    graft.Tables.armTsDecode(spark, file)
    val schema = spark.read.parquet(file).schema
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // ONE ts-normalization definition for batch and stream: any change
    // to the batch decode reaches the streaming twin automatically
    graft.Tables.normalizeTs(raw)
  }

  /** Documents as a stream, schema pinned from the batch reader —
    * the shared source of every document-pipeline streaming entry.
    */
  private def readDocs(spark: SparkSession, dir: String): DataFrame = {
    val staticDocs = graft.Tables.load(spark, dir, "documents")
    spark.readStream
      .schema(staticDocs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** Stable, name-safe suffix for per-lake memory-sink query names.
    * The previous `math.abs(dir.hashCode)` collided across dirs
    * (32-bit string hashes) — the second stream would silently REPLACE
    * the temp view a previous entry's returned DataFrame still reads —
    * and mapped Int.MinValue to a '-'-bearing identifier spark.table
    * cannot parse. lakeId is the repo's stable dir key.
    */
  private def sinkId(dir: String): String =
    // lakeId keeps '.'/'-', which temp-view names reject — restrict to
    // identifier characters (still injective enough: distinct dirs that
    // collide here must differ ONLY in punctuation class)
    graft.core.IndexStore.lakeId(dir).replaceAll("[^A-Za-z0-9_]", "_")

  /** Run the stream to completion into a memory sink, return the table. */
  private def runToMemory(out: DataFrame, name: String,
      mode: String): DataFrame = {
    val spark = out.sparkSession
    val query = out.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .start()
    try query.processAllAvailable()
    finally query.stop()
    spark.table(name)
  }

  def hourlyStream(spark: SparkSession, dir: String): DataFrame = {
    val stream = readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
    // complete mode rewrites the whole table each batch: multi-batch safe
    runToMemory(stream, "graft_events_hourly_" + sinkId(dir),
      "complete")
  }

  case class UserEvent(event_id: Long, ts: Long, user_id: Long,
      event_type: String)
  case class UserState(n: Long, lastTs: Long, lastType: String)

  /** Custom per-key streaming state via mapGroupsWithState: running
    * event count + latest event type per user. (ts is folded as raw
    * epoch-micros so ordering matches the source exactly; (user_id, ts)
    * is unique in the data, making the fold deterministic.)
    */
  def userStateStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val stream = readEvents(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts"),
        col("user_id"), col("event_type"))
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
    // update mode APPENDS each batch's changed keys to the memory sink,
    // so a user active in several micro-batches leaves one row per
    // batch; the event count only ever grows, so the max-n row per user
    // IS the final state — keep exactly that one
    val table = runToMemory(out,
      "graft_user_state_" + sinkId(dir), "update")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n").desc)
    table.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Streaming deduplication: distinct (user_id, event_type) pairs via
    * dropDuplicates state. Exact regardless of micro-batch boundaries
    * (state is unbounded here so the result equals batch DISTINCT; a
    * production stream bounds state with dropDuplicatesWithinWatermark,
    * trading exactness outside the watermark horizon for O(window)
    * state).
    */
  def dedupStream(spark: SparkSession, dir: String): DataFrame = {
    val stream = readEvents(spark, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    // append mode emits each pair exactly once: multi-batch safe
    runToMemory(stream, "graft_stream_dedup_" + sinkId(dir),
      "append")
  }

  /** The prep pipeline's streaming twin: the map-only quality/language
    * gates apply unchanged to a document stream (they are stateless
    * filters — [[graft.ops.Pipeline.gates]]), and decontamination
    * becomes a STREAM-STATIC left-anti join against the benchmark-
    * contaminated id set (the gram agg runs once, batch-side; the
    * stream never shuffles). This is the continuous-ingest shape: docs
    * arriving in any micro-batch split produce exactly the batch
    * pipeline's survivor set.
    */
  def docPipelineStream(spark: SparkSession, dir: String): DataFrame = {
    val staticDocs = graft.Tables.load(spark, dir, "documents")
    // persisted: the static side of a stream-static join re-executes
    // every micro-batch — without the cache each trigger would re-run
    // the whole gram agg over the corpus instead of reading the
    // materialized id set
    val contaminated = graft.ops.Pipeline.decontaminate(staticDocs)
      .select("doc_id").persist()
    try {
      contaminated.count() // materialize before the first trigger
      val out = graft.ops.Pipeline.gates(readDocs(spark, dir))
        .filter(col("doc_id") % graft.ops.Pipeline.BenchMod =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"))
      // stateless filters + anti join: append mode, multi-batch safe
      runToMemory(out, "graft_doc_pipeline_" + sinkId(dir),
        "append")
    } finally contaminated.unpersist()
  }

  /** Held-out documents scored by the batch-trained classifier model
    * on a STREAM: training runs once at setup (batch side), the model
    * ships as a broadcast map literal, and every micro-batch scores
    * map-only (no stream-side shuffle, append mode) — the deploy shape
    * of a quality classifier at ingest. Oracle = the batch predictor's
    * SQL: stream and batch scoring are the same arithmetic.
    */
  def classifierStream(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.ops.Classifier.scoreWithModel(spark, dir,
      readDocs(spark, dir)
        .filter(col("doc_id") % graft.ops.Classifier.TestMod === 0))
    runToMemory(out, "graft_classifier_" + sinkId(dir), "append")
  }

  def entries: Map[String, Q] = Map(
    "streaming_dedup" -> Q((s, dir) => dedupStream(s, dir),
      "SELECT DISTINCT user_id, event_type FROM events"),

    // classifier-at-ingest: batch-trained model, map-only stream scoring
    "streaming_classifier" -> Q((s, dir) => classifierStream(s, dir),
      graft.ops.Classifier.predictSql),

    // gates + decontamination over a document STREAM; oracle = the
    // batch pipeline's survivor set before the stateful stages (the
    // SAME CTE fragments the batch oracle composes from)
    "streaming_doc_pipeline" -> Q((s, dir) => docPipelineStream(s, dir),
      graft.ops.Pipeline.gatesSurvivorsSql),

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
