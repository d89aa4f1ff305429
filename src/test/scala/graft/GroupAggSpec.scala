package graft

import graft.index.AggIndex
import graft.plans.IndexPruneRule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Materialized-view matching ([[graft.index.AggIndex]] + the grouped
  * Aggregate rewrite): `GROUP BY key` count/sum over a fully covered
  * lake is answered from the committed partials — the scan disappears.
  * Negative cases pin every veto as semantics-preserving.
  */
class GroupAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def scansLake(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.nonEmpty

  // (key, measure) rows incl. NULL keys and NULL measures
  private def mkLake(dir: String,
      parts: Seq[(String, Seq[(String, java.lang.Long)])]): Unit = {
    for ((name, rows) <- parts) {
      val staging = TestSpark.tmpDir(s"stage-ga-$name")
      rows.toDF("src", "m").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
  }

  private lazy val dir: String = {
    val d = TestSpark.tmpDir("gagg")
    mkLake(d, Seq(
      "a" -> Seq(("red", 10L), ("red", null), ("blue", 5L)),
      "b" -> Seq(("red", 7L), (null, 3L), ("green", null))))
    AggIndex.ensureRegistered(spark, d, "src", "m")
    IndexPruneRule.enable(spark)
    d
  }

  test("grouped count/sum/min/max answered without scanning the lake") {
    val q = spark.read.parquet(dir).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), count(col("m")).as("nn"),
        sum(col("m")).as("sm"), min(col("m")).as("lo"),
        max(col("m")).as("hi"))
      .orderBy(col("src"))
    def optL(r: org.apache.spark.sql.Row, i: Int): Any =
      if (r.isNullAt(i)) null else r.getLong(i)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), optL(r, 3), optL(r, 4), optL(r, 5)))
    assert(got.toSeq == Seq(
      (null, 1L, 1L, 3L, 3L, 3L), ("blue", 1L, 1L, 5L, 5L, 5L),
      ("green", 1L, 0L, null, null, null),
      ("red", 3L, 2L, 17L, 7L, 10L)))
    assert(!scansLake(q), "expected the grouped agg served from the index")
  }

  test("rewrite result equals the raw scan exactly") {
    val raw = spark.read.parquet(dir)
      .where(lit(true)) // a filter blocks the rewrite → true scan plan
      .groupBy(col("src")).agg(count(lit(1)).as("n"), sum(col("m")).as("sm"))
      .orderBy(col("src")).collect().toSeq
    val idx = spark.read.parquet(dir)
      .groupBy(col("src")).agg(count(lit(1)).as("n"), sum(col("m")).as("sm"))
      .orderBy(col("src")).collect().toSeq
    assert(raw.map(_.toString) == idx.map(_.toString))
  }

  test("vetoes keep the scan: filter, wrong measure, multi-key, distinct") {
    val f = spark.read.parquet(dir).filter(col("m") > 0)
      .groupBy(col("src")).agg(count(lit(1)).as("n"))
    assert(scansLake(f), "filter must veto (partials carry no predicate)")
    val w = spark.read.parquet(dir).groupBy(col("src"))
      .agg(sum(col("src").cast("long")).as("x"))
    assert(scansLake(w), "non-attribute measure expression must veto")
    val m2 = spark.read.parquet(dir).groupBy(col("src"), col("m"))
      .agg(count(lit(1)).as("n"))
    assert(scansLake(m2), "multi-key grouping must veto")
    val d = spark.read.parquet(dir).groupBy(col("src"))
      .agg(countDistinct(col("m")).as("nd"))
    assert(scansLake(d), "distinct aggregate must veto")
  }

  test("a measure the index was not built for vetoes") {
    val d4 = TestSpark.tmpDir("gagg4")
    val staging = TestSpark.tmpDir("stage-ga4")
    Seq(("red", 1L, 100L), ("blue", 2L, 200L)).toDF("src", "m", "other")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$d4/a.parquet"))
    AggIndex.ensureRegistered(spark, d4, "src", "m")
    val q = spark.read.parquet(d4).groupBy(col("src"))
      .agg(sum(col("other")).as("so"))
    assert(scansLake(q), "sum over a non-indexed measure must veto")
    assert(q.orderBy(col("src")).collect().map(_.getLong(1)).toSeq ==
      Seq(200L, 100L))
    // count(*)-only rides the index regardless of measure
    val c = spark.read.parquet(d4).groupBy(col("src"))
      .agg(count(lit(1)).as("n"))
    assert(!scansLake(c), "count(*) needs no measure and must rewrite")
  }

  test("partial coverage vetoes: a new uncovered file keeps the scan") {
    val d2 = TestSpark.tmpDir("gagg2")
    mkLake(d2, Seq("a" -> Seq(("red", 1L))))
    AggIndex.ensureRegistered(spark, d2, "src", "m")
    mkLake(d2, Seq("b" -> Seq(("red", 100L)))) // appended AFTER the index
    val q = spark.read.parquet(d2).groupBy(col("src"))
      .agg(sum(col("m")).as("sm"))
    assert(scansLake(q), "uncovered append must veto")
    assert(q.collect()(0).getLong(1) == 101L, "and the scan sees all rows")
  }

  test("incremental coverage: two part-indexes combine exactly") {
    val d5 = TestSpark.tmpDir("gagg5")
    mkLake(d5, Seq("a" -> Seq(("x", 1L), ("y", 2L))))
    val pa = AggIndex.ensureRegistered(spark, d5, "src", "m")
    // append a file, index ONLY it, register the second coverage row
    mkLake(d5, Seq("b" -> Seq(("x", 10L), ("z", 4L))))
    val newFile = graft.core.Lake.listFiles(d5).filterNot(f =>
      spark.read.parquet(s"$pa/meta").select("file_path")
        .collect().map(_.getString(0)).contains(f))
    val pb = graft.core.IndexStore.indexPath(d5, "agg_src_m_part2")
    graft.core.IndexStore.ensure(pb) {
      AggIndex.build(spark, newFile, "src", "m", pb)
    }
    graft.core.IndexStore.commitMetadata(spark, d5,
      graft.core.IndexStore.metadataRows(spark, d5, "src",
        newFile, Seq(2L), pb, "aggindex", 2L))
    val q = spark.read.parquet(d5).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"))
      .orderBy(col("src"))
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", 2L, 11L), ("y", 1L, 2L), ("z", 1L, 4L)))
    assert(!scansLake(q), "combined part-index coverage must rewrite")
  }

  test("timestamp measure: min/max serve, a projection above survives") {
    val d6 = TestSpark.tmpDir("gagg6")
    val staging = TestSpark.tmpDir("stage-ga6")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(("click", ts("2024-01-01 10:00:00")),
      ("click", ts("2024-01-03 10:00:00")),
      ("view", ts("2024-01-02 09:00:00")))
      .toDF("et", "ts").coalesce(1).write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$d6/a.parquet"))
    AggIndex.ensureRegistered(spark, d6, "et", "ts")
    val q = spark.read.parquet(d6).groupBy(col("et"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("tlo"),
        max(col("ts")).as("thi"))
      .select(col("et"), col("n"), unix_micros(col("tlo")).as("lo"),
        unix_micros(col("thi")).as("hi"))
      .orderBy(col("et"))
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def us(s: String) = ts(s).getTime * 1000L
    assert(got.toSeq == Seq(
      ("click", 2L, us("2024-01-01 10:00:00"), us("2024-01-03 10:00:00")),
      ("view", 1L, us("2024-01-02 09:00:00"), us("2024-01-02 09:00:00"))))
    assert(!scansLake(q), "ts-measure grouped agg must serve from index")
    // sum over the time measure must veto (no decimal sums stored)
    val sq = spark.read.parquet(d6).groupBy(col("et"))
      .agg(sum(unix_micros(col("ts"))).as("x"))
    assert(scansLake(sq))
  }

  // (src, reg, m, w) lake with NULLs in both measures
  private def mkLake3(dir: String, name: String,
      rows: Seq[(String, String, java.lang.Long, java.lang.Long)]): Unit = {
    val staging = TestSpark.tmpDir(s"stage-ga3c-$name")
    rows.toDF("src", "reg", "m", "w").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$dir/$name.parquet"))
  }

  test("multi-measure: both measures served from ONE index, no scan") {
    val d7 = TestSpark.tmpDir("gagg7")
    mkLake3(d7, "a", Seq(("red", "eu", 1L, 100L), ("red", "us", 2L, null),
      ("blue", "eu", null, 300L)))
    AggIndex.ensureRegistered(spark, d7, Seq("src"), Seq("m", "w"))
    IndexPruneRule.enable(spark)
    val q = spark.read.parquet(d7).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"),
        count(col("w")).as("nw"), min(col("w")).as("lw"),
        max(col("m")).as("hm"))
      .orderBy(col("src"))
    def optL(r: org.apache.spark.sql.Row, i: Int): Any =
      if (r.isNullAt(i)) null else r.getLong(i)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      optL(r, 2), r.getLong(3), optL(r, 4), optL(r, 5)))
    assert(got.toSeq == Seq(
      ("blue", 1L, null, 1L, 300L, null),
      ("red", 2L, 3L, 1L, 100L, 2L)))
    assert(!scansLake(q), "both measures must serve from the one index")
  }

  test("two-key grouping served; query key order independent of spec") {
    val d8 = TestSpark.tmpDir("gagg8")
    mkLake3(d8, "a", Seq(("red", "eu", 1L, 1L), ("red", "eu", 4L, 1L),
      ("red", "us", 2L, 1L), ("blue", "eu", 8L, 1L)))
    mkLake3(d8, "b", Seq(("red", "eu", 16L, 1L), ("blue", "us", null, 1L)))
    AggIndex.ensureRegistered(spark, d8, Seq("src", "reg"), Seq("m"))
    IndexPruneRule.enable(spark)
    // grouping order (reg, src) is the REVERSE of the spec's key order
    val q = spark.read.parquet(d8).groupBy(col("reg"), col("src"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"))
      .orderBy(col("reg"), col("src"))
    val got = q.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3)))
    assert(got.toSeq == Seq(
      ("eu", "blue", 1L, 8L), ("eu", "red", 3L, 21L),
      ("us", "blue", 1L, null), ("us", "red", 1L, 2L)))
    assert(!scansLake(q), "composite-key grouping must serve from index")
    // grouping by a SUBSET of the spec keys also serves: cells
    // re-combine driver-side (exact by associativity)
    val s1 = spark.read.parquet(d8).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"))
      .orderBy(col("src"))
    val g1 = s1.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getLong(2)))
    assert(g1.toSeq == Seq(("blue", 2L, 8L), ("red", 4L, 23L)))
    assert(!scansLake(s1), "subset-key grouping must serve from index")
    // …but a key the spec does not carry still vetoes
    val s2 = spark.read.parquet(d8).groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
    assert(scansLake(s2), "non-spec key must veto")
  }

  test("key-only filters evaluate on the cells; others still veto") {
    val dA = TestSpark.tmpDir("gaggA")
    mkLake3(dA, "a", Seq(("red", "eu", 1L, 9L), ("red", "eu", 4L, 9L),
      ("red", "us", 2L, 9L), ("blue", "eu", 8L, 9L), (null, "eu", 32L, 9L)))
    mkLake3(dA, "b", Seq(("red", "eu", 16L, 9L), ("blue", "us", null, 9L)))
    AggIndex.ensureRegistered(spark, dA, Seq("src", "reg"), Seq("m"))
    IndexPruneRule.enable(spark)
    // WHERE on a NON-grouped spec key: filter runs per cell, grouping
    // re-combines the survivors — Catalyst eval semantics (null key
    // rows drop under src <> 'blue' like the scan drops them)
    val q = spark.read.parquet(dA)
      .filter(col("reg") === "eu" && col("src").isNotNull)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"),
        min(col("m")).as("lo"), max(col("m")).as("hi"))
      .orderBy(col("src"))
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("blue", 1L, 8L, 8L, 8L),
      ("red", 3L, 21L, 1L, 16L)))
    assert(!scansLake(q), "key-only filter must serve from the cells")
    // exactness against the true scan (filter on m blocks the rewrite)
    val raw = spark.read.parquet(dA).where(col("w") === 9L)
      .filter(col("reg") === "eu" && col("src").isNotNull)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"),
        min(col("m")).as("lo"), max(col("m")).as("hi"))
      .orderBy(col("src")).collect().toSeq
    assert(scansLake(spark.read.parquet(dA).where(col("w") === 9L)
      .groupBy(col("src")).agg(count(lit(1)).as("n"))))
    assert(raw.map(_.toString) == q.collect().map(_.toString).toSeq)
    // IN / LIKE shapes ride the same eval
    val q2 = spark.read.parquet(dA)
      .filter(col("src").isin("red", "green") && col("reg").like("e%"))
      .groupBy(col("reg")).agg(count(lit(1)).as("n"))
    assert(!scansLake(q2))
    assert(q2.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("eu", 3L)))
    // a filter referencing a MEASURE column still vetoes
    val v = spark.read.parquet(dA).filter(col("m") > 0)
      .groupBy(col("src")).agg(count(lit(1)).as("n"))
    assert(scansLake(v), "measure filter must veto")
    // the filtered KPI tile: EMPTY grouping under a key-only WHERE —
    // one row, served from the cells
    val kpi = spark.read.parquet(dA).filter(col("reg") === "eu")
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"),
        min(col("m")).as("lo"))
    val kr = kpi.collect()(0)
    assert((kr.getLong(0), kr.getLong(1), kr.getLong(2)) == (5L, 61L, 1L))
    assert(!scansLake(kpi), "filtered global agg must serve from cells")
    // …and the always-one-row contract when the filter kills every
    // cell: count 0, sum/min NULL — exactly the scan's answer
    val dead = spark.read.parquet(dA).filter(col("reg") === "nope")
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"),
        min(col("m")).as("lo"))
    val dr = dead.collect()
    assert(dr.length == 1 && dr(0).getLong(0) == 0L &&
      dr(0).isNullAt(1) && dr(0).isNullAt(2))
    assert(!scansLake(dead), "empty-result KPI must still serve")
  }

  test("coexisting specs on one prefix: narrowest qualifying spec serves") {
    val d9 = TestSpark.tmpDir("gagg9")
    mkLake3(d9, "a", Seq(("red", "eu", 1L, 10L), ("blue", "us", 2L, 20L)))
    AggIndex.ensureRegistered(spark, d9, Seq("src"), Seq("m"))
    AggIndex.ensureRegistered(spark, d9, Seq("src"), Seq("m", "w"))
    IndexPruneRule.enable(spark)
    val narrow = spark.read.parquet(d9).groupBy(col("src"))
      .agg(sum(col("m")).as("sm")).orderBy(col("src"))
    assert(!scansLake(narrow))
    assert(narrow.collect().map(_.getLong(1)).toSeq == Seq(2L, 1L))
    val wide = spark.read.parquet(d9).groupBy(col("src"))
      .agg(sum(col("m")).as("sm"), max(col("w")).as("hw"))
      .orderBy(col("src"))
    assert(!scansLake(wide), "w must route to the two-measure spec")
    assert(wide.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((2L, 20L), (1L, 10L)))
  }

  test("HAVING evaluates above the rewritten aggregate: still no scan") {
    // a post-aggregation filter sits ABOVE the Aggregate node, so the
    // rewrite fires underneath it and the HAVING predicate runs over
    // the LocalRelation rows — the filtered-dashboard shape end to end
    val q = spark.read.parquet(dir).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"))
      .filter(col("n") > 1)
      .orderBy(col("src"))
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2)))
    assert(got.toSeq == Seq(("red", 3L, 17L)))
    assert(!scansLake(q), "HAVING must not block the rewrite")
  }

  test("pure-SQL GROUP BY over parquet.`dir` rides the same rewrite") {
    val q = spark.sql(
      s"SELECT src, count(*) AS n, sum(m) AS sm FROM parquet.`$dir` " +
        "GROUP BY src ORDER BY src")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getLong(2)))
    assert(got.toSeq == Seq((null, 1L, 3L), ("blue", 1L, 5L),
      ("green", 1L, null), ("red", 3L, 17L)))
    assert(!scansLake(q), "SQL statement must serve from the index")
  }

  test("derived grouping keys (year/date_trunc) serve from cells, no scan") {
    val d = TestSpark.tmpDir("gagg-dt")
    val staging = TestSpark.tmpDir("stage-ga-dt")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((ts("2024-01-05 00:00:00"), 1L), (ts("2024-01-20 00:00:00"), 2L),
      (ts("2024-02-03 00:00:00"), 3L), (ts("2025-02-03 00:00:00"), 4L))
      .toDF("ts", "m").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$d/a.parquet"))
    AggIndex.ensureRegistered(spark, d, "ts", "m")
    IndexPruneRule.enable(spark)
    val q = spark.sql(
      s"""SELECT CAST(year(ts) AS BIGINT) AS y, count(*) AS n, sum(m) AS sm
         |FROM parquet.`$d` GROUP BY year(ts) ORDER BY y""".stripMargin)
    assert(!scansLake(q), "year(key) grouping must serve from the index")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((2024L, 3L, 6L), (2025L, 1L, 4L)))
    val qm = spark.sql(
      s"""SELECT date_trunc('MONTH', ts) AS mth, count(*) AS n
         |FROM parquet.`$d` GROUP BY date_trunc('MONTH', ts)
         |ORDER BY mth""".stripMargin)
    assert(!scansLake(qm), "date_trunc grouping must serve from the index")
    assert(qm.collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      .toSeq == Seq(("2024-01-01 00:00:00.0", 2L),
        ("2024-02-01 00:00:00.0", 1L), ("2025-02-01 00:00:00.0", 1L)))
    // mixed bare + derived keys under a key-only WHERE, still no scan
    val qx = spark.sql(
      s"""SELECT CAST(year(ts) AS BIGINT) AS y, count(*) AS n
         |FROM parquet.`$d` WHERE ts >= timestamp'2024-01-10 00:00:00'
         |GROUP BY year(ts) ORDER BY y""".stripMargin)
    assert(!scansLake(qx))
    assert(qx.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2024L, 2L), (2025L, 1L)))
    // an expression over a NON-key column vetoes: the scan stays and
    // semantics are untouched
    val qv = spark.sql(
      s"""SELECT CAST(m AS INT) AS g, count(*) AS n
         |FROM parquet.`$d` GROUP BY CAST(m AS INT) ORDER BY g""".stripMargin)
    assert(scansLake(qv), "non-key-derived grouping must keep the scan")
    // a FLOAT-typed derived key vetoes: Spark normalizes NaN/-0.0
    // grouping keys (NormalizeFloatingNumbers); boxed-Double equality
    // driver-side would not — semantics win, the scan stays
    val qd = spark.sql(
      s"""SELECT unix_micros(ts) / 2.0 AS g, count(*) AS n
         |FROM parquet.`$d` GROUP BY unix_micros(ts) / 2.0
         |ORDER BY g""".stripMargin)
    assert(scansLake(qd), "double-typed derived keys must keep the scan")
    assert(qd.collect().length == 4)
  }

  test("top-N and explicit-avg tiles ride the rewrite: no scan") {
    val qt = spark.read.parquet(dir).groupBy(col("src"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("src")).limit(2)
    assert(!scansLake(qt), "ORDER BY/LIMIT above the rewrite must serve")
    assert(qt.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("red", 3L), (null, 1L))) // n=1 tie → src asc, nulls first
    val qa = spark.read.parquet(dir).groupBy(col("src"))
      .agg((sum(col("m")).cast("double") / count(col("m"))).as("avg_m"))
      .orderBy(col("src"))
    assert(!scansLake(qa), "sum/count division must serve")
    val got = qa.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) null else r.getDouble(1))).toSeq
    assert(got == Seq((null, 3.0), ("blue", 5.0), ("green", null),
      ("red", 8.5)))
  }

  test("COUNT(DISTINCT spec-key) serves from cells; distinct measure vetoes") {
    val d = TestSpark.tmpDir("gagg-cd")
    val staging = TestSpark.tmpDir("stage-ga-cd")
    Seq(("a", "x", 1L), ("a", "y", 2L), ("a", "x", 3L),
      ("b", "x", 4L), ("b", null, 5L))
      .toDF("src", "reg", "m").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$d/a.parquet"))
    AggIndex.ensureRegistered(spark, d, Seq("src", "reg"), Seq("m"))
    IndexPruneRule.enable(spark)
    val q = spark.read.parquet(d).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), countDistinct(col("reg")).as("dr"),
        sum(col("m")).as("sm"))
      .orderBy(col("src"))
    assert(!scansLake(q), "count(distinct key) must serve from the index")
    assert(q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("a", 3L, 2L, 6L), ("b", 2L, 1L, 9L))) // NULL reg not counted
    // under a key-only filter, still served and still exact
    val qf = spark.read.parquet(d).filter(col("reg") === "x")
      .groupBy(col("src"))
      .agg(countDistinct(col("reg")).as("dr"), count(lit(1)).as("n"))
      .orderBy(col("src"))
    assert(!scansLake(qf))
    assert(qf.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSeq == Seq(("a", 1L, 2L), ("b", 1L, 1L)))
    // count(DISTINCT measure) is not derivable from cells — scan stays
    val qv = spark.read.parquet(d).groupBy(col("src"))
      .agg(countDistinct(col("m")).as("dm"))
    assert(scansLake(qv), "distinct over a non-key must keep the scan")
    assert(qv.orderBy(col("src")).collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L), ("b", 2L)))
  }

  test("an alias shadowing a spec measure vetoes; a pure rename serves") {
    // `m` here is NOT the lake's m: a surviving Project computes m*2
    // under the same name (referenced by two aggregates, so
    // CollapseProject keeps the alias). Serving the indexed column's
    // stats for it would be silently wrong — the rewrite must resolve
    // the aggregate child through the alias substitution and veto the
    // non-attribute result.
    val shadowed = spark.read.parquet(dir)
      .select(col("src"), (col("m") * 2).as("m"))
      .groupBy(col("src"))
      .agg(sum(col("m")).as("sm"), min(col("m")).as("lo"))
      .orderBy(col("src"))
    assert(scansLake(shadowed), "shadowing alias must veto the rewrite")
    def optL(r: org.apache.spark.sql.Row, i: Int): Any =
      if (r.isNullAt(i)) null else r.getLong(i)
    val got = shadowed.collect().map(r =>
      (r.getString(0), optL(r, 1), optL(r, 2))).toSeq
    assert(got == Seq((null, 6L, 6L), ("blue", 10L, 10L),
      ("green", null, null), ("red", 34L, 14L)))
    // a PURE rename resolves back to the spec column and serves
    val renamed = spark.read.parquet(dir)
      .select(col("src"), col("m").as("mm"))
      .groupBy(col("src")).agg(sum(col("mm")).as("sm"))
      .orderBy(col("src"))
    val got2 = renamed.collect().map(r =>
      (r.getString(0), optL(r, 1))).toSeq
    assert(got2 == Seq((null, 3L), ("blue", 5L), ("green", null),
      ("red", 17L)))
    assert(!scansLake(renamed), "rename must serve from the index")
  }

  test("legacy hashCode-named artifact is reclaimed after the SHA build") {
    val d = TestSpark.tmpDir("gagg-legacy")
    val staging = TestSpark.tmpDir("stage-ga-legacy")
    Seq(("red", 10L, 1L), ("blue", 5L, 2L)).toDF("src", "m", "m2")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
      java.nio.file.Paths.get(s"$d/a.parquet"))
    val (keyCols, measureCols) = (Seq("src"), Seq("m", "m2"))
    // fabricate the pre-SHA generation: same spec, 32-bit hashCode name
    val sigSrc = ((keyCols.map(c => s"${c.length}:$c") :+ "#") ++
      measureCols.map(c => s"${c.length}:$c")).mkString("|")
    val legacy = graft.core.IndexStore.indexPath(d,
      s"agg_${(keyCols ++ measureCols).mkString("_")}_k1m2" +
        f"h${sigSrc.hashCode & 0xffffffffL}%08x")
    graft.core.IndexStore.ensure(legacy) {
      AggIndex.build(spark, graft.core.Lake.listFiles(d),
        keyCols, measureCols, legacy)
    }
    assert(graft.core.Fs.exists(spark, legacy))
    val p = AggIndex.ensureRegistered(spark, d, keyCols, measureCols)
    assert(p != legacy)
    assert(graft.core.Fs.exists(spark, p), "SHA-named artifact must exist")
    assert(!graft.core.Fs.exists(spark, legacy),
      "legacy same-spec artifact must be deregistered and deleted")
    // a second ensure is a clean no-op (nothing legacy left to reclaim)
    assert(AggIndex.ensureRegistered(spark, d, keyCols, measureCols) == p)
  }

  test("key names colliding with aggregate aliases are rejected at registration") {
    def lake(tag: String, cols: Seq[String]): String = {
      val d = TestSpark.tmpDir(s"gagg-$tag")
      val staging = TestSpark.tmpDir(s"stage-ga-$tag")
      Seq(("red", "a", 1L, 2L)).toDF(cols: _*).coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$d/a.parquet"))
      d
    }
    // multi-key output uses raw source key names: a key literally
    // named "n" would duplicate the count alias → rejected up front
    val d1 = lake("collide1", Seq("n", "g", "m", "w"))
    val ex = intercept[IllegalArgumentException] {
      AggIndex.ensureRegistered(spark, d1, Seq("n", "g"), Seq("m", "w"))
    }
    assert(ex.getMessage.contains("reserved aggregate aliases"))
    // a key named like a measure alias ("s_m") is equally rejected
    val d2 = lake("collide2", Seq("s_m", "g", "m", "w"))
    intercept[IllegalArgumentException] {
      AggIndex.ensureRegistered(spark, d2, Seq("s_m", "g"), Seq("m", "w"))
    }
    // SINGLE-key specs output the key as "key", so a source key named
    // "n" is legal — and the build must not trip on its own aggregate
    // alias (col("n") ambiguity in the post-agg projection)
    val d3 = lake("collide3", Seq("n", "g", "m", "w"))
    val p = AggIndex.ensureRegistered(spark, d3, Seq("n"), Seq("m", "w"))
    val got = AggIndex.groupStats(spark, p).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[String]("key") == "red" && r.getAs[Long]("n") == 1L &&
      r.getAs[Long]("nn_m") == 1L && r.getAs[Long]("nn_w") == 1L)
  }

  test("merge: uid re-offset union answers the whole corpus") {
    val d3 = TestSpark.tmpDir("gagg3")
    mkLake(d3, Seq(
      "a" -> Seq(("x", 1L), ("y", 2L)),
      "b" -> Seq(("x", 10L), ("z", null))))
    val files = graft.core.Lake.listFiles(d3)
    val (pa, pb, pm) = (TestSpark.tmpDir("ga-a"), TestSpark.tmpDir("ga-b"),
      TestSpark.tmpDir("ga-m"))
    AggIndex.build(spark, files.take(1), "src", "m", pa)
    AggIndex.build(spark, files.drop(1), "src", "m", pb)
    AggIndex.merge(spark, pa, pb, pm)
    val got = AggIndex.groupStats(spark, pm)
      .orderBy(col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", 2L, 2L), ("y", 1L, 1L), ("z", 1L, 0L)))
  }
}
