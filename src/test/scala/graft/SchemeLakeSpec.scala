package graft

import java.nio.file.{Files, Paths}
import graft.api.{GraftLake, NgramKind}
import graft.core.{DeltaLog, Lake}
import org.scalatest.funsuite.AnyFunSuite

/** Non-local-URI handling: a lake prefix that carries a scheme
  * (`file://` — the only Hadoop filesystem available in the sandbox,
  * standing in for `s3a://`/`hdfs://`; reference scheme dispatch:
  * src/formats/readers/mod.rs:259-294) must run the full facade
  * lifecycle, and Delta log paths must round-trip the protocol's
  * percent-encoding.
  */
class SchemeLakeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val lakeDir = TestSpark.tmpDir("schemelake")

  private def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
    val staging = TestSpark.tmpDir(s"stage-scheme-$name")
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    Files.move(Paths.get(Lake.listFiles(staging).head),
      Paths.get(s"$lakeDir/$name.parquet"))
  }

  test("file:// scheme prefix runs the index/search/compact lifecycle") {
    writeFile("a", Seq(1L -> "alpha search engine", 2L -> "beta testing rig"))
    writeFile("b", Seq(3L -> "gamma search index", 4L -> "delta rays"))
    val lake = GraftLake(spark, s"file://$lakeDir")

    // scheme-listed files canonicalize to the same physical set
    assert(lake.files == Lake.listFiles(lakeDir).map(graft.core.Layout.canonPath))

    assert(lake.index(NgramKind, "text", binpackRows = 2).size == 2)
    def searchIds(q: String) =
      lake.search(NgramKind, "text", q, 100, Seq("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(searchIds("search") == Seq(1L, 3L))

    // growth is probed in-situ through the scheme'd listing too
    writeFile("c", Seq(5L -> "epsilon search party", 6L -> "zeta zone"))
    assert(searchIds("search") == Seq(1L, 3L, 5L))
    assert(lake.index(NgramKind, "text").size == 1)

    val merged = lake.compact(NgramKind, "text", threshold = 1000000)
    assert(merged.isDefined)
    assert(lake.vacuum() == Seq(merged.get))
    assert(searchIds("search") == Seq(1L, 3L, 5L))
  }

  test("a non-file scheme (mock://) runs scan, build, search, and selective fetch") {
    // a registered custom FileSystem ([[MockFs]]) stands in for
    // s3a/hdfs: nothing below may fall back to java.nio or assume the
    // path is local — footer scans, uid joins, and the selective fetch
    // must all resolve through the scheme's Hadoop FS with the
    // session-shipped conf
    val localDir = TestSpark.tmpDir("mocklake")
    Seq(1L -> "alpha search engine", 2L -> "beta testing rig",
      3L -> "gamma search index", 4L -> "delta rays")
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"mock://$localDir/lake")

    val files = Lake.listFiles(s"mock://$localDir/lake")
    assert(files.nonEmpty && files.forall(_.startsWith("mock:/")),
      s"listing must keep the scheme: $files")

    // footer scan + meta over mock:/ paths (executor-side opens)
    val meta = graft.core.Layout.buildMeta(spark, files)
    assert(meta.select("file_path").collect()
      .forall(_.getString(0).startsWith("mock:/")))

    // full index lifecycle against the scheme'd lake
    val idx = s"$localDir/idx"
    graft.index.NgramIndex.build(spark, files, "text", idx)
    val got = graft.index.NgramIndex.search(spark, idx, "text", "search")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 3L))

    // the driver-side FS helpers dispatch by scheme too
    assert(graft.core.Fs.exists(spark, files.head))
    assert(graft.core.Fs.childNames(spark, s"mock://$localDir/lake")
      .exists(_.endsWith(".parquet")))
  }

  test("an authority-bearing URI (mocks://bucket/...) runs the full lifecycle") {
    // the object-store URI shape: scheme://bucket/key. Every layer that
    // string-handles paths (canonPath, listings, meta joins, the
    // selective fetch, facade metadata) must keep the authority intact
    // — an s3a lake dies silently if anything drops or mangles it
    val localDir = TestSpark.tmpDir("authlake")
    val prefix = s"mocks://bucket$localDir/lake"
    Seq(1L -> "alpha search engine", 2L -> "beta testing rig")
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$prefix/seg=a")
    Seq(3L -> "gamma search index", 4L -> "delta rays")
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(s"$prefix/seg=b")
    val fs0 = new org.apache.hadoop.fs.Path(prefix)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq("a", "b").foreach { seg =>
      val part = Lake.listFiles(s"$prefix/seg=$seg").head
      fs0.rename(new org.apache.hadoop.fs.Path(part),
        new org.apache.hadoop.fs.Path(s"$prefix/$seg.parquet"))
      fs0.delete(new org.apache.hadoop.fs.Path(s"$prefix/seg=$seg"), true)
    }

    val files = Lake.listFiles(prefix)
    assert(files.nonEmpty && files.forall(_.startsWith("mocks://bucket/")),
      s"listing must keep scheme AND authority: $files")
    // canonPath must pass authority URIs through untouched
    assert(files.map(graft.core.Layout.canonPath) == files)

    // footer scan + uid join + selective row-group fetch over
    // authority'd paths (executor-side opens through the shipped conf)
    val meta = graft.core.Layout.buildMeta(spark, files)
    val metaRows = meta.collect()
    assert(metaRows.map(_.getAs[String]("file_path"))
      .forall(_.startsWith("mocks://bucket/")))
    val withUid = graft.core.Layout.withUid(spark, files, meta)
    assert(withUid.count() == 4)
    val hits = metaRows.map(r => (r.getAs[String]("file_path"),
      r.getAs[Long]("uid"), r.getAs[Long]("row_start"),
      r.getAs[Long]("num_rows"))).toSeq
    assert(graft.core.Layout.readGroups(spark, hits, files).count() == 4)

    // facade lifecycle: index → search → in-situ growth → compact
    val lake = GraftLake(spark, prefix)
    assert(lake.index(NgramKind, "text", binpackRows = 2).size == 2)
    def searchIds(q: String) =
      lake.search(NgramKind, "text", q, 100, Seq("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(searchIds("search") == Seq(1L, 3L))
    val staging = TestSpark.tmpDir("stage-auth")
    Seq(5L -> "epsilon search party").toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(prefix)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(
      new org.apache.hadoop.fs.Path(Lake.listFiles(staging).head),
      new org.apache.hadoop.fs.Path(s"$prefix/grow.parquet"))
    assert(searchIds("search") == Seq(1L, 3L, 5L))
    assert(lake.index(NgramKind, "text").size == 1)
    assert(lake.compact(NgramKind, "text", threshold = 1000000).isDefined)
    assert(searchIds("search") == Seq(1L, 3L, 5L))

    // the newest kind must survive the same authority'd paths: bloom
    // equality probe through the facade over mocks://bucket/...
    assert(lake.index(graft.api.BloomKind, "doc_id").nonEmpty)
    assert(lake.search(graft.api.BloomKind, "doc_id", "3", 100, Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("delta log percent-encodes special-character paths per the spec") {
    val t = TestSpark.tmpDir("deltaenc")
    def add(fname: String, rows: Seq[(Long, String)]): DeltaLog.Add = {
      val stage = TestSpark.tmpDir("stage-deltaenc")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      Files.move(Paths.get(Lake.listFiles(stage).head),
        Paths.get(s"$t/$fname"))
      DeltaLog.Add(fname, Files.size(Paths.get(s"$t/$fname")))
    }
    val spaced = add("part a b.parquet", Seq(1L -> "one"))
    val pct = add("part%20c.parquet", Seq(2L -> "two")) // literal %20 in NAME
    DeltaLog.commit(t, 0, Seq(spaced, pct))

    // the log stores the ENCODED form (external-reader interop): a
    // space becomes %20, a literal '%' becomes %25
    val logText = Files.readString(
      Paths.get(s"$t/_delta_log/00000000000000000000.json"))
    assert(logText.contains("part%20a%20b.parquet"))
    assert(logText.contains("part%2520c.parquet"))

    // replay decodes back to the real physical paths
    val live = DeltaLog.liveFiles(spark, t)
    assert(live.map(_.split('/').last).sorted ==
      Seq("part a b.parquet", "part%20c.parquet"))
    live.foreach(f => assert(Files.exists(Paths.get(f)), f))
    assert(spark.read.parquet(live: _*).count() == 2)

    // removes match on the raw encoded form and decode the same way
    DeltaLog.commit(t, 1, removes = Seq("part a b.parquet"))
    assert(DeltaLog.liveFiles(spark, t).map(_.split('/').last) ==
      Seq("part%20c.parquet"))

    // checkpoint preserves the encoding: replay-from-checkpoint agrees
    DeltaLog.checkpoint(spark, t, 1L)
    assert(DeltaLog.liveFiles(spark, t).map(_.split('/').last) ==
      Seq("part%20c.parquet"))
  }

  test("single-slash scheme URIs resolve as absolute, not table-relative") {
    // Hadoop Path.toUri renders file URIs with ONE slash (file:/tmp/x)
    // — spec-legal absolute adds that must not be resolved against the
    // table root
    val t = TestSpark.tmpDir("deltass")
    val ext = TestSpark.tmpDir("deltass-ext")
    val stage = TestSpark.tmpDir("stage-deltass")
    Seq((1L, "external")).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    Files.move(Paths.get(Lake.listFiles(stage).head),
      Paths.get(s"$ext/ext file.parquet"))
    DeltaLog.commit(t, 0,
      Seq(DeltaLog.Add(s"file:$ext/ext file.parquet", 1L)))
    // the log form is encoded, the resolved form is the real local path
    val logText = Files.readString(
      Paths.get(s"$t/_delta_log/00000000000000000000.json"))
    assert(logText.contains("ext%20file.parquet"))
    assert(DeltaLog.liveFiles(spark, t) == Seq(s"$ext/ext file.parquet"))
  }

  test("delta paths with adversarial names round-trip add and remove") {
    val t = TestSpark.tmpDir("deltanames")
    // every shape a conforming writer may emit: spaces, literal percent
    // escapes, plus (must NOT decode as space), rfc-reserved chars
    // (unicode names are excluded only because this sandbox JVM runs a
    // POSIX file.encoding that cannot create them)
    val names = Seq(
      "a b c.parquet", "x%2Fy.parquet", "p+q.parquet",
      "semi;colon.parquet", "eq=ual.parquet",
      // ':' in the FIRST segment + an encoded char: a bare URI parse
      // would misread the colon as a scheme and skip the decode
      "2024-01-01T12:30:00 run.parquet")
    val adds = names.zipWithIndex.map { case (fname, i) =>
      val stage = TestSpark.tmpDir(s"stage-n$i")
      Seq((i.toLong, s"row $i")).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      Files.move(Paths.get(Lake.listFiles(stage).head),
        Paths.get(s"$t/$fname"))
      DeltaLog.Add(fname, 1L)
    }
    DeltaLog.commit(t, 0, adds)
    val live = DeltaLog.liveFiles(spark, t)
    assert(live.map(_.split('/').last).sorted == names.sorted)
    live.foreach(f => assert(Files.exists(Paths.get(f)), f))
    // remove each by its ORIGINAL (decoded) name; all must resolve
    names.foreach(n => DeltaLog.commit(t,
      DeltaLog.currentVersion(t) + 1, removes = Seq(n)))
    assert(DeltaLog.liveFiles(spark, t).isEmpty)
  }
}
