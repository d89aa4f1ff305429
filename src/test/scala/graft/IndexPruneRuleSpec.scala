package graft

import graft.plans.IndexPruneRule
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Catalyst stretch (SURVEY §7.4): plain
  * `spark.read.parquet(lake).filter(contains)` is rewritten to scan
  * only the files the ngram index cannot rule out.
  */
class IndexPruneRuleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }.sum

  test("contains-filters over an indexed lake scan only hit files") {
    val dir = TestSpark.tmpDir("prunelake")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-pr-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> "needle in this one", 2L -> "plain row"))
    write("b", Seq(3L -> "nothing here", 4L -> "still nothing"))
    write("c", Seq(5L -> "another needle row", 6L -> "filler"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.NgramKind, "text", binpackRows = 1) // one index per file

    IndexPruneRule.enable(spark)
    val q = spark.read.parquet(dir)
      .filter(lower(col("text")).contains("needle"))
      .select("doc_id")
    // correctness: identical to the unpruned scan
    assert(q.collect().map(_.getLong(0)).toSet == Set(1L, 5L))
    // pruning: file b (no candidate row groups) is NOT scanned
    assert(scannedFiles(q) == 2, "expected the no-hit file to be pruned")
    // a query with no matches prunes every covered file
    val none = spark.read.parquet(dir)
      .filter(lower(col("text")).contains("zzzqqq"))
    assert(none.count() == 0 && scannedFiles(none) == 0)
    // an unindexed sibling lake is untouched (no index -> no rewrite)
    val dir2 = TestSpark.tmpDir("prunelake2")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir2))
    Seq(7L -> "needle too").toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir2)
    val plain = spark.read.parquet(dir2)
      .filter(lower(col("text")).contains("needle"))
    assert(plain.count() == 1)
  }

  test("range filters over a zone-mapped lake scan only overlapping files") {
    val dir = TestSpark.tmpDir("prunezm")
    def write(name: String, rows: Seq[(Long, Long)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-zm-$name")
      rows.toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> 10L, 5L -> 11L))
    write("b", Seq(100L -> 12L, 150L -> 13L))
    write("c", Seq(900L -> 14L, 990L -> 15L))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.ZoneMapKind, "k", binpackRows = 1)
    IndexPruneRule.enable(spark)
    val q = spark.read.parquet(dir).filter(col("k") >= 90 && col("k") < 200)
    assert(q.select("k").collect().map(_.getLong(0)).toSet == Set(100L, 150L))
    assert(scannedFiles(q) == 1, "expected non-overlapping files pruned")
    // strict bounds and equality forms prune too
    val eq = spark.read.parquet(dir).filter(col("k") === 990)
    assert(eq.count() == 1 && scannedFiles(eq) == 1)
    // an empty range prunes every covered file
    val none = spark.read.parquet(dir).filter(col("k") > 2000)
    assert(none.count() == 0 && scannedFiles(none) == 0)
  }

  test("equality, IN and prefix filters over a key-indexed lake prune files") {
    val dir = TestSpark.tmpDir("prunekey")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-pk-$name")
      rows.toDF("id", "name").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> "alpha", 2L -> "beta"))
    write("b", Seq(3L -> "gamma", 4L -> "delta"))
    write("c", Seq(5L -> "epsilon", 6L -> "zeta"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.KeyKind, "name", binpackRows = 1) // one index per file
    IndexPruneRule.enable(spark)

    // equality: only the file holding the key is scanned
    val eq = spark.read.parquet(dir).filter(col("name") === "gamma")
    assert(eq.select("id").collect().map(_.getLong(0)).toSet == Set(3L))
    assert(scannedFiles(eq) == 1, "expected equality to prune to one file")
    // IN-list spanning two files scans exactly those two
    val in = spark.read.parquet(dir)
      .filter(col("name").isin("alpha", "zeta"))
    assert(in.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 6L))
    assert(scannedFiles(in) == 2)
    // prefix: startsWith routes through the key-range probe
    val pf = spark.read.parquet(dir).filter(col("name").startsWith("de"))
    assert(pf.select("id").collect().map(_.getLong(0)).toSet == Set(4L))
    assert(scannedFiles(pf) == 1)
    // equality is case-exact — no candidate file, nothing scanned
    val none = spark.read.parquet(dir).filter(col("name") === "GAMMA")
    assert(none.count() == 0 && scannedFiles(none) == 0)
    // lists past spark.sql.optimizer.inSetConversionThreshold (10)
    // reach the rule as InSet, not In — they must prune identically
    val big = Seq("alpha", "zeta") ++ (1 to 9).map(i => s"nope$i")
    val inset = spark.read.parquet(dir).filter(col("name").isin(big: _*))
    assert(inset.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 6L))
    assert(scannedFiles(inset) == 2, "InSet form must prune like In")
  }

  // AQE wraps join plans (AdaptiveSparkPlanExec is a leaf), so scan
  // sets for joins are read off the optimized LOGICAL plan
  private def logicalScanFiles(df: org.apache.spark.sql.DataFrame,
      marker: String): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.toSeq.filter(_.contains(marker))
    }.flatten.toSet

  test("equi-join with a literal small side prunes lake files (DFP)") {
    val dir = TestSpark.tmpDir("prunedfp")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-dfp-$name")
      rows.toDF("id", "name").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> "alpha", 2L -> "beta"))
    write("b", Seq(3L -> "gamma", 4L -> "delta"))
    write("c", Seq(5L -> "epsilon", 6L -> "zeta"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.KeyKind, "name", binpackRows = 1)
    IndexPruneRule.enable(spark)

    val dim = Seq("gamma" -> 30, "zeta" -> 60).toDF("name", "score")
    val q = spark.read.parquet(dir).join(dim, "name")
    assert(q.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 6L))
    assert(logicalScanFiles(q, "prunedfp").size == 2,
      "expected the join keys to prune the no-match file")
    // left_semi prunes the same way
    val semi = spark.read.parquet(dir)
      .join(dim, Seq("name"), "left_semi")
    assert(semi.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 6L))
    assert(logicalScanFiles(semi, "prunedfp").size == 2)
    // left_anti must NOT be pruned (non-matching rows are the result)
    val anti = spark.read.parquet(dir)
      .join(dim, Seq("name"), "left_anti")
    assert(anti.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 4L, 5L))
    assert(logicalScanFiles(anti, "prunedfp").size == 3)
  }

  test("join pruning against a small deterministic PARQUET side (DFP)") {
    val dir = TestSpark.tmpDir("prunedfp2")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-dfp2-$name")
      rows.toDF("id", "name").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> "alpha", 2L -> "beta"))
    write("b", Seq(3L -> "gamma", 4L -> "delta"))
    write("c", Seq(5L -> "epsilon", 6L -> "zeta"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.KeyKind, "name", binpackRows = 1)
    IndexPruneRule.enable(spark)

    // the production shape: the dim side is a FILTERED PARQUET table,
    // not a literal list — its key set is evaluated once (it is under
    // Catalyst's broadcast threshold) and drives the same file pruning
    val dimDir = TestSpark.tmpDir("prunedim")
    Seq(("gamma", 30), ("zeta", 60), ("omega", 99))
      .toDF("name", "score").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("score") < 90)
    val q = spark.read.parquet(dir).join(dim, "name")
    assert(q.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 6L))
    assert(logicalScanFiles(q, "prunedfp2").size == 2,
      "expected the evaluated dim keys to prune the no-match file")

    // a non-deterministic dim side must NOT drive pruning (its keys at
    // execution could differ from any probed set). The predicate must
    // be one the optimizer cannot fold away (rand >= -1 folds to true)
    val rnd = spark.read.parquet(dimDir).filter(rand(7L) < 0.99)
    val q2 = spark.read.parquet(dir).join(rnd, "name")
    assert(q2.select("id").collect().map(_.getLong(0)).toSet
      .subsetOf(Set(3L, 6L)))
    assert(logicalScanFiles(q2, "prunedfp2").size == 3,
      "non-deterministic side must disable pruning")

    // a LIMIT on the probed side passes the expression-determinism
    // screen (Literal(2) is deterministic) but selects DIFFERENT rows
    // per execution over unordered input — its key set must never
    // drive pruning (execution-time keys could hit pruned files)
    val lim = spark.read.parquet(dir)
      .join(spark.read.parquet(dimDir).limit(2), "name")
    assert(logicalScanFiles(lim, "prunedfp2").size == 3,
      "limit on the probed side must disable pruning")
    // sample: same row-set instability, deterministic-looking seed
    val samp = spark.read.parquet(dir)
      .join(spark.read.parquet(dimDir).sample(0.5, 42L), "name")
    assert(logicalScanFiles(samp, "prunedfp2").size == 3,
      "sample on the probed side must disable pruning")
    // an order-INSENSITIVE aggregate small side still drives pruning
    // (group keys are stable under re-execution)
    val agg = spark.read.parquet(dimDir).filter(col("score") < 90)
      .groupBy("name").agg(max("score").as("mx"))
    val q5 = spark.read.parquet(dir).join(agg, "name")
    assert(q5.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 6L))
    assert(logicalScanFiles(q5, "prunedfp2").size == 2,
      "order-insensitive aggregate side must still prune")
  }

  test("join pruning bails out under row-position-sensitive operators") {
    val dir = TestSpark.tmpDir("prunelim")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-lim-$name")
      rows.toDF("id", "name").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> "alpha", 2L -> "beta"))
    write("b", Seq(3L -> "gamma", 4L -> "delta"))
    write("c", Seq(5L -> "epsilon", 6L -> "zeta"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.KeyKind, "name", binpackRows = 1)
    IndexPruneRule.enable(spark)
    val dim = Seq("gamma" -> 30).toDF("name", "score")

    // limit between the scan and the join: pruning first would change
    // WHICH rows the limit selects — every file must stay
    val lim = spark.read.parquet(dir).limit(4).join(dim, "name")
    assert(logicalScanFiles(lim, "prunelim").size == 3,
      "limit under a join must disable file pruning")
    // sample: same row-position sensitivity
    val samp = spark.read.parquet(dir).sample(0.5, 42L).join(dim, "name")
    assert(logicalScanFiles(samp, "prunelim").size == 3,
      "sample under a join must disable file pruning")
    // a non-deterministic projection (monotonically_increasing_id)
    // yields different values once files are pruned — every file stays
    val mid = spark.read.parquet(dir)
      .withColumn("rid", monotonically_increasing_id())
      .join(dim, "name")
    assert(logicalScanFiles(mid, "prunelim").size == 3,
      "non-deterministic projection under a join must disable pruning")
    // prune-transparent operators (deterministic project + filter)
    // still allow pruning
    val ok = spark.read.parquet(dir)
      .select(col("name"), (col("id") * 2).as("id2"))
      .filter(col("id2") >= 0)
      .join(dim, "name")
    assert(ok.select("id2").collect().map(_.getLong(0)).toSet == Set(6L))
    assert(logicalScanFiles(ok, "prunelim").size == 1,
      "deterministic project/filter must stay prune-transparent")
  }

  test("join pruning ignores non-string/integral local key types") {
    val dir = TestSpark.tmpDir("prunedate")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-dt-$name")
      rows.toDF("id", "d").select(col("id"), col("d").cast("date"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> "2024-01-01", 2L -> "2024-01-02"))
    write("b", Seq(3L -> "2024-06-01", 4L -> "2024-06-02"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.BloomKind, "d", binpackRows = 1)
    IndexPruneRule.enable(spark)
    // a DateType local key's internal form (days int) is NOT what the
    // bloom was built from; probing with it would prune files that
    // hold matches. The rule must skip such joins entirely.
    val dim = Seq("2024-06-01").toDF("ds")
      .select(col("ds").cast("date").as("d"))
    val q = spark.read.parquet(dir).join(dim, "d")
    assert(q.select("id").collect().map(_.getLong(0)).toSet == Set(3L),
      "date-keyed join must still return the matching row")
    assert(logicalScanFiles(q, "prunedate").size == 2,
      "date-typed keys must not drive (possibly wrong) pruning")
  }

  test("conjunctions intersect the prune sets of EVERY applicable index") {
    val dir = TestSpark.tmpDir("pruneboth")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-pb-$name")
      rows.toDF("k", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(10L -> "needle here", 11L -> "filler"))
    write("b", Seq(500L -> "needle far away", 501L -> "filler"))
    write("c", Seq(12L -> "nothing", 13L -> "also nothing"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.NgramKind, "text", binpackRows = 1)
    lake.index(api.ZoneMapKind, "k", binpackRows = 1)
    IndexPruneRule.enable(spark)

    // text index alone keeps {a,b}; zone map alone keeps {a,c};
    // the conjunction must scan only the intersection {a}
    val q = spark.read.parquet(dir)
      .filter(lower(col("text")).contains("needle") &&
        col("k") >= 0 && col("k") <= 100)
    assert(q.select("k").collect().map(_.getLong(0)).toSet == Set(10L))
    assert(scannedFiles(q) == 1,
      "expected BOTH indexes to prune (intersection of keep sets)")
  }

  test("disjunctions prune by the UNION of arm keep sets") {
    val dir = TestSpark.tmpDir("pruneor")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-or-$name")
      rows.toDF("k", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(10L -> "alpha needle", 11L -> "filler"))
    write("b", Seq(20L -> "beta thimble", 21L -> "filler"))
    write("c", Seq(30L -> "nothing", 31L -> "also nothing"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.NgramKind, "text", binpackRows = 1)
    lake.index(api.ZoneMapKind, "k", binpackRows = 1)
    IndexPruneRule.enable(spark)

    // needle keeps {a}, thimble keeps {b} → OR scans {a, b}, prunes c
    val q = spark.read.parquet(dir)
      .filter(lower(col("text")).contains("needle") ||
        lower(col("text")).contains("thimble"))
    assert(q.select("k").collect().map(_.getLong(0)).toSet ==
      Set(10L, 20L))
    assert(scannedFiles(q) == 2,
      "expected the no-arm-hit file to be pruned from the OR")

    // an arm over an UNINDEXED bound (k range has a zone map, but the
    // text arm uses an unindexable expression) unbounds the OR — every
    // file kept, results still exact
    val unb = spark.read.parquet(dir)
      .filter(col("k") <= 15 || length(col("text")) > 1000)
    assert(unb.select("k").collect().map(_.getLong(0)).toSet ==
      Set(10L, 11L))
    assert(scannedFiles(unb) == 3, "one unbounded arm must keep all files")

    // mixed-kind arms: text-contains arm ∪ zone-range arm
    val mixed = spark.read.parquet(dir)
      .filter(lower(col("text")).contains("thimble") ||
        (col("k") >= 0 && col("k") <= 15))
    assert(mixed.select("k").collect().map(_.getLong(0)).toSet ==
      Set(10L, 11L, 20L))
    assert(scannedFiles(mixed) == 2,
      "expected union of the contains-arm and zone-arm keep sets")

    // nested: (needle OR thimble) AND k <= 15 → OR-union {a,b} ∩ zone
    // keep {a} = {a}
    val nested = spark.read.parquet(dir)
      .filter((lower(col("text")).contains("needle") ||
        lower(col("text")).contains("thimble")) && col("k") <= 15)
    assert(nested.select("k").collect().map(_.getLong(0)).toSet ==
      Set(10L))
    assert(scannedFiles(nested) == 1,
      "expected OR-union intersected with the zone keep set")
  }

  test("case-sensitive contains prunes soundly (superset candidates)") {
    val dir = TestSpark.tmpDir("prunelake3")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-pr3-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> "NeEdLe mixed", 2L -> "needle lower"))
    write("b", Seq(3L -> "no match at all"))
    val lake = api.GraftLake(spark, dir)
    lake.index(api.NgramKind, "text", binpackRows = 1)
    IndexPruneRule.enable(spark)
    // bare (case-sensitive) contains: index candidates are the
    // case-insensitive superset, refine keeps exact semantics
    val q = spark.read.parquet(dir).filter(col("text").contains("needle"))
    assert(q.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
    assert(scannedFiles(q) == 1)
  }

  test("probe memo retires when the index is rebuilt in place") {
    val dir = TestSpark.tmpDir("prunerebuild")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-rb-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$dir/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    write("a", Seq(1L -> "needle here", 2L -> "filler"))
    write("b", Seq(3L -> "nothing", 4L -> "still nothing"))
    // binpackRows = 4 puts BOTH 2-row files in one group, so the
    // rebuild below produces the SAME index path (group id = hash of
    // the file list) — the adversarial delete-and-rebuild-in-place
    // shape whose stale probe memo would otherwise survive the TTL
    val lake = api.GraftLake(spark, dir)
    lake.index(api.NgramKind, "text", binpackRows = 4)
    IndexPruneRule.enable(spark)
    val q1 = spark.read.parquet(dir)
      .filter(lower(col("text")).contains("needle")).select("doc_id")
    assert(q1.collect().map(_.getLong(0)).toSet == Set(1L)) // memoizes probe

    // out-of-band rebuild: file b is REWRITTEN to contain the needle,
    // the whole index store for this lake is dropped and rebuilt over
    // the same file list (same index path), metadata recommitted
    write("b", Seq(3L -> "a needle appears", 4L -> "still nothing"))
    graft.core.Fs.deleteRec(spark,
      s"${graft.core.IndexStore.root}/${graft.core.IndexStore.lakeId(dir)}")
    lake.index(api.NgramKind, "text", binpackRows = 4)

    // within the memo TTL: the metadata version token must retire the
    // stale keep set, or b's new matching row would be silently pruned
    val q2 = spark.read.parquet(dir)
      .filter(lower(col("text")).contains("needle")).select("doc_id")
    assert(q2.collect().map(_.getLong(0)).toSet == Set(1L, 3L),
      "stale probe memo served after an in-place index rebuild")
  }
}
