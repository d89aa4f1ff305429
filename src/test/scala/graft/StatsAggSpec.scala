package graft

import graft.plans.IndexPruneRule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only aggregate answering: a global min/max/count over a
  * fully zone-mapped lake is served from the index tables — the scan
  * disappears from the plan. Negative cases pin when the rewrite must
  * NOT fire (filter present, partial coverage, non-covered column).
  */
class StatsAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // global aggregates carry an Exchange, so AQE wraps the physical
  // plan and hides FileSourceScanExec from collect — assert on the
  // OPTIMIZED LOGICAL plan (the level the rewrite operates at): a
  // rewritten query has no lake relation left at all
  private def scansLake(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.nonEmpty

  private def mkLake(dir: String, parts: Seq[(String, Seq[(Long, Long)])]): Unit = {
    for ((name, rows) <- parts) {
      val staging = TestSpark.tmpDir(s"stage-sa-$name")
      rows.toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
  }

  test("covered min/max/count answered without scanning the lake") {
    val dir = TestSpark.tmpDir("aggzm")
    mkLake(dir, Seq(
      "a" -> Seq(5L -> 10L, 9L -> 11L),
      "b" -> Seq(100L -> 12L, 150L -> 13L),
      "c" -> Seq(900L -> 14L, 990L -> 15L)))
    api.GraftLake(spark, dir).index(api.ZoneMapKind, "k", binpackRows = 1)
    IndexPruneRule.enable(spark)

    val q = spark.read.parquet(dir).agg(
      min(col("k")).as("lo"), max(col("k")).as("hi"),
      count(lit(1)).as("n"))
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 990L, 6L)))
    assert(!scansLake(q), "expected the scan replaced by stats")

    // count(*) alone rides the same zone map
    val c = spark.read.parquet(dir).agg(count(lit(1)).as("n"))
    assert(c.collect()(0).getLong(0) == 6L && !scansLake(c))

    // single-aggregate forms too
    val m = spark.read.parquet(dir).agg(max(col("k")).as("hi"))
    assert(m.collect()(0).getLong(0) == 990L && !scansLake(m))

    // sum(col) rides the zone map's per-group decimal sums
    val sm = spark.read.parquet(dir).agg(sum(col("k")).as("s"))
    assert(sm.collect()(0).getLong(0) == 2154L && !scansLake(sm))
  }

  test("rewrite does NOT fire with a filter, uncovered column, or partial coverage") {
    val dir = TestSpark.tmpDir("aggzm2")
    mkLake(dir, Seq(
      "a" -> Seq(5L -> 10L, 9L -> 11L),
      "b" -> Seq(100L -> 12L, 150L -> 13L)))
    api.GraftLake(spark, dir).index(api.ZoneMapKind, "k", binpackRows = 1)
    IndexPruneRule.enable(spark)

    // a WHERE makes zone min/max unsound — the scan must stay (the
    // filter path may still prune files; correctness is what matters)
    val f = spark.read.parquet(dir).filter(col("k") >= 100)
      .agg(min(col("k")).as("lo"), count(lit(1)).as("n"))
    val fr = f.collect()(0)
    assert((fr.getLong(0), fr.getLong(1)) == ((100L, 2L)))

    // v has no zone map: scan stays, result exact
    val v = spark.read.parquet(dir).agg(min(col("v")).as("lo"))
    assert(v.collect()(0).getLong(0) == 10L)
    assert(scansLake(v), "uncovered column must not be rewritten")

    // a new uncovered file vetoes the rewrite (full coverage required)
    mkLake(dir, Seq("d" -> Seq(1L -> 9L)))
    val q = spark.read.parquet(dir).agg(min(col("k")).as("lo"),
      count(lit(1)).as("n"))
    val qr = q.collect()(0)
    assert((qr.getLong(0), qr.getLong(1)) == ((1L, 5L)))
    assert(scansLake(q), "partial coverage must not be rewritten")
  }

  test("string min/max and count(col) with nulls, metadata-only") {
    val dir = TestSpark.tmpDir("aggzm4")
    val rows = Seq(
      (1L, "delta"), (2L, null), (3L, "alpha"),
      (4L, "zulu"), (5L, null), (6L, "mike"))
    for ((name, part) <- Seq("a" -> rows.take(3), "b" -> rows.drop(3))) {
      val staging = TestSpark.tmpDir(s"stage-sa4-$name")
      part.toDF("k", "s").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    api.GraftLake(spark, dir).index(api.ZoneMapKind, "s", binpackRows = 1)
    IndexPruneRule.enable(spark)
    val q = spark.read.parquet(dir).agg(
      min(col("s")).as("lo"), max(col("s")).as("hi"),
      count(col("s")).as("nn"), count(lit(1)).as("n"))
    val r = q.collect()(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      == (("alpha", "zulu", 4L, 6L)))
    assert(!scansLake(q), "string stats must be metadata-only")
    // count(DISTINCT s) must NOT be rewritten (zone map cannot know it)
    val d = spark.read.parquet(dir)
      .agg(countDistinct(col("s")).as("nd"))
    assert(d.collect()(0).getLong(0) == 4L)
    assert(scansLake(d), "distinct count must stay a scan")
  }

  test("timestamp zones: range prune + metadata-only min/max") {
    import java.sql.Timestamp
    val dir = TestSpark.tmpDir("aggzm5")
    def ts(s: String) = Timestamp.valueOf(s)
    val parts = Seq(
      "a" -> Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 12:00:00"))),
      "b" -> Seq((3L, ts("2024-01-05 00:00:00")), (4L, ts("2024-01-05 12:00:00"))),
      "c" -> Seq((5L, ts("2024-01-09 00:00:00")), (6L, ts("2024-01-09 12:00:00"))))
    for ((name, rows) <- parts) {
      val staging = TestSpark.tmpDir(s"stage-sa5-$name")
      rows.toDF("id", "t").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    api.GraftLake(spark, dir).index(api.ZoneMapKind, "t", binpackRows = 1)
    IndexPruneRule.enable(spark)
    // time-range filter prunes to the one overlapping file
    val q = spark.read.parquet(dir)
      .filter(col("t") >= lit("2024-01-04 00:00:00").cast("timestamp") &&
        col("t") <= lit("2024-01-06 00:00:00").cast("timestamp"))
      .select("id")
    assert(q.collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    val scanned = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }.sum
    assert(scanned == 1, s"expected 1 file kept, scanned $scanned")
    // min/max(ts) metadata-only
    val m = spark.read.parquet(dir).agg(
      min(col("t")).as("lo"), max(col("t")).as("hi"),
      count(col("t")).as("nn"))
    val r = m.collect()(0)
    assert(r.getTimestamp(0) == ts("2024-01-01 00:00:00"))
    assert(r.getTimestamp(1) == ts("2024-01-09 12:00:00"))
    assert(r.getLong(2) == 6L)
    assert(!scansLake(m), "timestamp stats must be metadata-only")
  }

  test("top-k pushdown prunes to the row groups that can hold top-k") {
    val dir = TestSpark.tmpDir("aggzm6")
    mkLake(dir, Seq(
      "a" -> Seq(5L -> 1L, 9L -> 2L),
      "b" -> Seq(100L -> 3L, 150L -> 4L),
      "c" -> Seq(900L -> 5L, 990L -> 6L)))
    api.GraftLake(spark, dir).index(api.ZoneMapKind, "k", binpackRows = 1)
    IndexPruneRule.enable(spark)
    def keptFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles.length
      }.sum
    // latest-2: only file c can hold them
    val top = spark.read.parquet(dir).orderBy(col("k").desc).limit(2)
      .select("k")
    assert(top.collect().map(_.getLong(0)).toSeq == Seq(990L, 900L))
    assert(keptFiles(top) == 1, "desc top-2 must scan one file")
    // smallest-3 spills into the second file
    val bot = spark.read.parquet(dir)
      .orderBy(col("k").asc_nulls_last).limit(3).select("k")
    assert(bot.collect().map(_.getLong(0)).toSeq == Seq(5L, 9L, 100L))
    assert(keptFiles(bot) == 2, "asc top-3 must scan two files")
    // k past the corpus: every file stays, result exact
    val all = spark.read.parquet(dir).orderBy(col("k").desc).limit(100)
    assert(all.count() == 6)
    // default asc = NULLS FIRST: never rewritten (zones cannot place
    // nulls first)
    val nf = spark.read.parquet(dir).orderBy(col("k").asc).limit(2)
    assert(keptFiles(nf) == 3, "NULLS FIRST must not be pruned")
  }

  test("stats and top-k rewrites stay exact across compaction") {
    val dir = TestSpark.tmpDir("aggzm7")
    mkLake(dir, Seq(
      "a" -> Seq(5L -> 1L, 9L -> 2L),
      "b" -> Seq(100L -> 3L, 150L -> 4L),
      "c" -> Seq(900L -> 5L, 990L -> 6L)))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.ZoneMapKind, "k", binpackRows = 1) // one index per file
    // merge the per-file generations into one (uids re-based)
    lake.compact(api.ZoneMapKind, "k")
    IndexPruneRule.enable(spark)
    val q = spark.read.parquet(dir).agg(
      min(col("k")).as("lo"), max(col("k")).as("hi"),
      count(lit(1)).as("n"), sum(col("k")).as("s"))
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((5L, 990L, 6L, 2154L)))
    assert(!scansLake(q), "merged zone map must still answer stats")
    val top = spark.read.parquet(dir).orderBy(col("k").desc).limit(2)
      .select("k")
    assert(top.collect().map(_.getLong(0)).toSeq == Seq(990L, 900L))
  }

  test("statsAgg answers from index tables and matches the data") {
    val dir = TestSpark.tmpDir("aggzm3")
    mkLake(dir, Seq(
      "a" -> Seq(7L -> 1L, 3L -> 2L),
      "b" -> Seq(42L -> 3L)))
    val files = graft.core.Lake.listFiles(dir)
    val idx = TestSpark.tmpDir("aggzm3-idx")
    graft.index.ZoneMapIndex.build(spark, files, "k", idx)
    val r = graft.index.ZoneMapIndex.statsAgg(spark, idx).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 42L, 3L)))
  }
}
