package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The testdata generator has shipped `events.ts` as TIMESTAMP(NANOS)
  * stored int64 (rounds 1-5) and as TIMESTAMP(MICROS) (round 6+) — the
  * round-6 regeneration silently broke 9 queries because the loader
  * hard-coded the nanos assumption. This spec pins the fix: the SAME
  * logical rows written under every encoding the generator has used
  * (µs adjusted-to-UTC, µs naive, ns-as-int64) must load identically
  * through BOTH the batch loader ([[Tables.loadEvents]]) and the
  * streaming source (via the hourly-window entry), so the next
  * regeneration cannot regress the engine unnoticed.
  */
class TsEncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 120 events across 3 hours, 2 types — enough for a multi-row hourly agg
  private val baseMicros = 1700000000000000L // 2023-11-14T22:13:20Z
  private val rows: Seq[(Long, Long, Long, String, Double, String)] =
    (0 until 120).map { i =>
      (i.toLong, baseMicros + i * 90L * 1000000L, (i % 7).toLong,
        if (i % 2 == 0) "click" else "view", i * 0.5, s"p$i")
    }

  private def eventsDf(tsType: DataType) = {
    val df = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    df.withColumn("ts", timestamp_micros(col("ts_us")).cast(tsType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Spark writes TIMESTAMP(MICROS): adjusted-to-UTC for TimestampType,
    * naive (the current testdata shape) for TimestampNTZType. */
  private def writeSpark(tsType: DataType): String = {
    val dir = TestSpark.tmpDir("tsenc")
    eventsDf(tsType).coalesce(1).write
      .option("parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .mode("overwrite").parquet(s"$dir/_stage")
    // the real testdata ships ONE flat file per table, and the streaming
    // source globs on that exact name — reproduce the shape
    import java.nio.file.{Files, Paths}
    val part = Files.list(Paths.get(dir, "_stage")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(dir, "events.parquet"))
    dir
  }

  /** Hand-written footer: int64 annotated TIMESTAMP(NANOS, naive) — the
    * pre-round-6 testdata shape Spark only reads under the legacy
    * nanos-as-long flag. Spark cannot write this; use the parquet
    * example writer directly. */
  private def writeNanos(): String = {
    val dir = TestSpark.tmpDir("tsenc-ns")
    val mt: MessageType = Types.buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(Types.required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(DOUBLE).named("value"))
      .addField(Types.required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val conf = spark.sessionState.newHadoopConf()
    val file = new Path(s"$dir/events.parquet")
    val writer = ExampleParquetWriter.builder(
      org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withType(mt).withConf(conf).build()
    val factory = new SimpleGroupFactory(mt)
    try rows.foreach { case (id, us, uid, et, v, p) =>
      val g = factory.newGroup()
      g.add("event_id", id)
      g.add("ts", us * 1000L) // nanos
      g.add("user_id", uid)
      g.add("event_type", et)
      g.add("value", v)
      g.add("props", p)
      writer.write(g)
    } finally writer.close()
    dir
  }

  private def canonical(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy("event_id").collect().toSeq

  test("batch loader reads all three ts encodings identically") {
    val dirs = Map(
      "micros-utc" -> writeSpark(TimestampType),
      "micros-naive" -> writeSpark(TimestampNTZType),
      "nanos-int64" -> writeNanos())
    val loaded = dirs.map { case (k, d) =>
      val df = Tables.load(spark, d, "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$k: ts must normalize to TimestampType")
      k -> canonical(df)
    }
    val expect = loaded("micros-utc")
    assert(expect.size == rows.size)
    loaded.foreach { case (k, got) => assert(got == expect, s"$k differs") }
  }

  test("streaming source reads all three ts encodings identically") {
    val dirs = Map(
      "micros-naive" -> writeSpark(TimestampNTZType),
      "nanos-int64" -> writeNanos())
    val hourly = graft.streaming.EventStream.entries("streaming_events_hourly")
    val results = (dirs + ("micros-utc" -> writeSpark(TimestampType))).map {
      case (k, d) =>
        k -> hourly.fn(spark, d).orderBy("hour", "event_type").collect().toSeq
    }
    val expect = results("micros-utc")
    assert(expect.size > 3, "hourly agg must span several windows")
    results.foreach { case (k, got) => assert(got == expect, s"$k differs") }
  }
}
