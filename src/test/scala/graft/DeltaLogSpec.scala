package graft

import java.nio.file.{Files, Paths}
import graft.api.{DeltaBackend, GraftLake, NgramKind}
import graft.core.{DeltaLog, Lake}
import org.scalatest.funsuite.AnyFunSuite

/** Delta transaction-log protocol: replay, removes, checkpoints,
  * time travel, optimistic-concurrency commit, and the facade lifecycle
  * over a DeltaBackend.
  */
class DeltaLogSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mkTable(name: String): String = TestSpark.tmpDir(name)

  private def addFile(table: String, fname: String,
      rows: Seq[(Long, String)]): DeltaLog.Add = {
    val stage = TestSpark.tmpDir(s"stage-$fname")
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    Files.move(Paths.get(Lake.listFiles(stage).head),
      Paths.get(s"$table/$fname"))
    DeltaLog.Add(fname, Files.size(Paths.get(s"$table/$fname")))
  }

  test("decodePath decodes absolute non-file URIs, not just file:/relative") {
    // the multi-arg URI constructor re-encodes getPath — a hand-rolled
    // assembly must return the DECODED name for every scheme
    assert(DeltaLog.decodePath("s3a://bucket/a%20b.parquet") ==
      "s3a://bucket/a b.parquet")
    assert(DeltaLog.decodePath("file:///t/a%20b.parquet") ==
      "/t/a b.parquet")
    assert(DeltaLog.decodePath("part-a%20b.parquet") == "part-a b.parquet")
    assert(DeltaLog.decodePath("/t/a%25b.parquet") == "/t/a%b.parquet")
    // non-conforming raw string (unencoded space): used as-is
    assert(DeltaLog.decodePath("a b.parquet") == "a b.parquet")
    // a ':' inside the first segment is not a scheme
    assert(DeltaLog.decodePath("2024:01:01-x.parquet") ==
      "2024:01:01-x.parquet")
  }

  test("replay applies adds and removes in version order") {
    val t = mkTable("delta1")
    val a = addFile(t, "a.parquet", Seq(1L -> "one"))
    val b = addFile(t, "b.parquet", Seq(2L -> "two"))
    val c = addFile(t, "c.parquet", Seq(3L -> "three"))
    DeltaLog.commit(t, 0, Seq(a, b))
    DeltaLog.commit(t, 1, Seq(c), removes = Seq("a.parquet"))

    assert(DeltaLog.currentVersion(t) == 1)
    assert(DeltaLog.liveFiles(spark, t).map(_.split('/').last) ==
      Seq("b.parquet", "c.parquet"))
    // time travel to v0
    assert(DeltaLog.liveFiles(spark, t, Some(0L)).map(_.split('/').last) ==
      Seq("a.parquet", "b.parquet"))
  }

  test("changes() is the file-set diff and reads ONLY changed files") {
    val t = mkTable("delta-cdf")
    val a = addFile(t, "a.parquet", Seq(1L -> "one"))
    val b = addFile(t, "b.parquet", Seq(2L -> "two"))
    val c = addFile(t, "c.parquet", Seq(3L -> "three"))
    DeltaLog.commit(t, 0, Seq(a, b))
    DeltaLog.commit(t, 1, Seq(c), removes = Seq("a.parquet"))

    val cdf = DeltaLog.changes(spark, t, 0L, 1L)
    assert(cdf.select("doc_id", "_change_type").as[(Long, String)]
      .collect().toSet == Set((3L, "insert"), (1L, "delete")))
    // the unchanged b.parquet must not appear in the scan at all
    val scanned = cdf.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.toSeq
      }).flatten.map(_.split('/').last).toSet
    assert(scanned == Set("a.parquet", "c.parquet"), scanned.toString)
    // identical versions: empty feed, schema preserved
    assert(DeltaLog.changes(spark, t, 1L, 1L).count() == 0)
  }

  test("checkpoint replaces json replay and the tail still applies") {
    val t = mkTable("delta2")
    val a = addFile(t, "a.parquet", Seq(1L -> "one"))
    val b = addFile(t, "b.parquet", Seq(2L -> "two"))
    val c = addFile(t, "c.parquet", Seq(3L -> "three"))
    DeltaLog.commit(t, 0, Seq(a))
    DeltaLog.commit(t, 1, Seq(b), removes = Seq("a.parquet"))
    DeltaLog.checkpoint(spark, t, 1L)
    DeltaLog.commit(t, 2, Seq(c))

    assert(DeltaLog.liveFiles(spark, t).map(_.split('/').last) ==
      Seq("b.parquet", "c.parquet"))
    assert(DeltaLog.liveFiles(spark, t, Some(1L)).map(_.split('/').last) ==
      Seq("b.parquet"))

    // spec interop: a checkpoint must carry protocol + metaData actions
    // and partitionValues inside add, so external Delta readers can
    // bootstrap table state from it (PROTOCOL.md)
    val cp = spark.read.parquet(f"$t/_delta_log/${1L}%020d.checkpoint.parquet")
    assert(Seq("add", "remove", "metaData", "protocol")
      .forall(cp.columns.contains))
    assert(cp.filter(org.apache.spark.sql.functions.col("protocol").isNotNull).count() == 1)
    val md = cp.select("metaData.schemaString", "metaData.format.provider")
      .filter(org.apache.spark.sql.functions.col("schemaString").isNotNull).collect()
    assert(md.length == 1 && md(0).getString(1) == "parquet")
    assert(cp.select("add.partitionValues")
      .filter(org.apache.spark.sql.functions.col("partitionValues").isNotNull).count() == 1)
  }

  test("checkpoint stores raw add paths so later removes still match") {
    val t = mkTable("delta_absuri")
    val a = addFile(t, "a.parquet", Seq(1L -> "one"))
    val abs = addFile(t, "abs.parquet", Seq(2L -> "two"))
    // spec-legal absolute-URI add (e.g. after SHALLOW CLONE): the log
    // stores it verbatim and replay matches add/remove on the RAW
    // string — a checkpoint that re-derived (decoded + relativized)
    // the path would never match the remove and the file would stay
    // live forever
    val absUri = s"file://$t/abs.parquet"
    DeltaLog.commit(t, 0, Seq(a, DeltaLog.Add(absUri, abs.size)))
    DeltaLog.checkpoint(spark, t, 0L)
    DeltaLog.commit(t, 1, removes = Seq(absUri))
    assert(DeltaLog.liveFiles(spark, t).map(_.split('/').last) ==
      Seq("a.parquet"))
    assert(DeltaLog.liveFiles(spark, t, Some(0L)).map(_.split('/').last) ==
      Seq("a.parquet", "abs.parquet"))
  }

  test("a lost commit race throws instead of clobbering") {
    val t = mkTable("delta3")
    val a = addFile(t, "a.parquet", Seq(1L -> "one"))
    DeltaLog.commit(t, 0, Seq(a))
    intercept[IllegalStateException] { DeltaLog.commit(t, 0, Seq(a)) }
  }

  test("the full log lifecycle runs on a rename-free object store") {
    // norename:// rejects every rename: commit (conditional PUT),
    // replay, CDF, checkpoint and the race check must all survive —
    // the object-store twin of the local hardlink protocol
    val local = mkTable("deltanr")
    val t = "norename://" + local
    def addNr(fname: String, rows: Seq[(Long, String)]): DeltaLog.Add = {
      val a = addFile(local, fname, rows) // stage via the local tree
      a
    }
    val a = addNr("a.parquet", Seq(1L -> "one"))
    val b = addNr("b.parquet", Seq(2L -> "two"))
    val c = addNr("c.parquet", Seq(3L -> "three"))
    DeltaLog.commit(t, 0, Seq(a, b))
    DeltaLog.commit(t, 1, Seq(c), removes = Seq("a.parquet"))

    assert(DeltaLog.currentVersion(t) == 1)
    assert(DeltaLog.liveFiles(spark, t).map(_.split('/').last) ==
      Seq("b.parquet", "c.parquet"))
    assert(DeltaLog.liveFiles(spark, t, Some(0L)).map(_.split('/').last) ==
      Seq("a.parquet", "b.parquet"))
    // CDF over the scheme-qualified table
    assert(DeltaLog.changes(spark, t, 0L, 1L)
      .select("doc_id", "_change_type").as[(Long, String)]
      .collect().toSet == Set((3L, "insert"), (1L, "delete")))
    // double-commit of a version loses the race loudly
    intercept[IllegalStateException] { DeltaLog.commit(t, 1, Seq(c)) }
    // checkpoint streams the staged part through the target FS
    DeltaLog.checkpoint(spark, t, 1L)
    DeltaLog.commit(t, 2, removes = Seq("b.parquet"))
    assert(DeltaLog.liveFiles(spark, t).map(_.split('/').last) ==
      Seq("c.parquet"))
  }

  test("facade over a DeltaBackend: removed files drop out of search") {
    val t = mkTable("delta4")
    val a = addFile(t, "a.parquet",
      Seq(1L -> "alpha search engine", 2L -> "beta rig"))
    val junk = addFile(t, "junk.parquet", Seq(-1L -> "junk search row"))
    val b = addFile(t, "b.parquet", Seq(3L -> "gamma search index"))
    DeltaLog.commit(t, 0, Seq(a, junk))
    DeltaLog.commit(t, 1, Seq(b), removes = Seq("junk.parquet"))

    val lake = GraftLake(spark, DeltaBackend(spark, t))
    lake.index(NgramKind, "text")
    def ids(snapshot: Option[Long]) =
      lake.search(NgramKind, "text", "search", 100, Seq("doc_id"),
        snapshot = snapshot).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
    // latest: junk removed even though its row matches
    assert(ids(None) == Seq(1L, 3L))
    // snapshot 0: junk live (in-situ probe), b not yet added (hit filter)
    assert(ids(Some(0L)) == Seq(-1L, 1L))
  }

  test("search at a snapshot with an empty live set answers empty, all kinds") {
    val t = mkTable("delta5")
    val a = addFile(t, "a.parquet", Seq(1L -> "alpha search"))
    DeltaLog.commit(t, 0, Seq(a))
    DeltaLog.commit(t, 1, removes = Seq("a.parquet"))
    val lake = GraftLake(spark, DeltaBackend(spark, t))
    lake.index(NgramKind, "text")
    lake.index(graft.api.Bm25Kind("doc_id"), "text")
    // fully-emptied table: the correct answer is a schema-stable empty
    // frame for EVERY kind — the ranked path used to trip bm25's
    // stale-coverage guard into a "re-index first" crash
    val ngram = lake.search(NgramKind, "text", "search", 10,
      Seq("doc_id"), snapshot = Some(1L))
    assert(ngram.columns.contains("doc_id") && ngram.count() == 0)
    val bm25 = lake.search(graft.api.Bm25Kind("doc_id"), "text",
      "search", 10, snapshot = Some(1L))
    assert(bm25.count() == 0)
  }
}
