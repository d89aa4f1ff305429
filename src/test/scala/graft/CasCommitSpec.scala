package graft

import graft.core.CasMetadata
import org.scalatest.funsuite.AnyFunSuite

/** The put-if-absent metadata commit protocol on filesystems WITHOUT
  * atomic rename — the object-store gap `core/Fs.scala` documents for
  * the two-rename swap. Everything here runs over the `norename://`
  * scheme, whose rename always throws: a green suite proves the
  * protocol never touches rename at all.
  */
class CasCommitSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def row(idx: String, files: String*): CasMetadata.FullRow =
    CasMetadata.FullRow("documents", "text", files.toSeq,
      files.toSeq.map(_ => 10L), idx, "ngram", 10L, 0L)

  private def dir(name: String): String =
    "norename://" + TestSpark.tmpDir(name)

  test("commit/read lifecycle with idempotent-rebuild merge semantics") {
    val d = dir("caslife")
    assert(CasMetadata.read(spark, d).isEmpty)
    assert(CasMetadata.latestVersion(spark, d).isEmpty)

    val v1 = CasMetadata.commit(spark, d, Seq(row("idx1", "a.parquet")))
    assert(v1 == 1L)
    assert(CasMetadata.read(spark, d) == Seq(row("idx1", "a.parquet")))

    // a second index appends; re-committing an index_file REPLACES its
    // row (idempotent rebuild), matching IndexStore.commitMetadata
    val v2 = CasMetadata.commit(spark, d,
      Seq(row("idx2", "b.parquet", "c.parquet")))
    val v3 = CasMetadata.commit(spark, d,
      Seq(row("idx1", "a.parquet", "d.parquet")))
    assert((v2, v3) == (2L, 3L))
    assert(CasMetadata.read(spark, d).toSet == Set(
      row("idx2", "b.parquet", "c.parquet"),
      row("idx1", "a.parquet", "d.parquet")))

    // delete half of compaction's append-then-delete
    CasMetadata.deleteRows(spark, d, Seq("idx1"))
    assert(CasMetadata.read(spark, d) ==
      Seq(row("idx2", "b.parquet", "c.parquet")))
  }

  test("two racing committers cannot both win a version") {
    val d = dir("casrace")
    CasMetadata.commit(spark, d, Seq(row("base", "a.parquet")))

    // deterministic interleaving of the race: A and B both observe
    // version 1, both prepare version 2; exactly one create-if-absent
    // succeeds
    val a = CasMetadata.tryClaim(spark, d, 2L, "{}")
    val b = CasMetadata.tryClaim(spark, d, 2L, "{}")
    assert(a && !b, "create-if-absent must admit exactly one winner")

    // the full commit loop: the loser's NEXT attempt re-reads the
    // winner's snapshot, so no committed rows are ever lost
    val d2 = dir("casrace2")
    CasMetadata.commit(spark, d2, Seq(row("base", "a.parquet")))
    // winner claims version 2 out from under the loser...
    def nd(idx: String, file: String) =
      "{\"table_name\":\"documents\",\"column_name\":\"text\"," +
        "\"file_path\":[\"" + file + "\"],\"record_counts\":[10]," +
        "\"index_file\":\"" + idx + "\",\"index_type\":\"ngram\"," +
        "\"rows_indexed\":10,\"index_timestamp\":0}\n"
    assert(CasMetadata.tryClaim(spark, d2, 2L,
      nd("base", "a.parquet") + nd("winner", "w.parquet") +
        "{\"__rows__\":2}\n"))
    // ...the loser's commit() retries internally and lands at 3 with
    // BOTH writers' rows present
    val v = CasMetadata.commit(spark, d2, Seq(row("loser", "l.parquet")))
    assert(v == 3L)
    assert(CasMetadata.read(spark, d2).map(_.indexFile).toSet ==
      Set("base", "winner", "loser"))
  }

  test("concurrent committers from real threads lose no rows") {
    val d = dir("casthreads")
    val n = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (1 to n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            CasMetadata.commit(spark, d, Seq(row(s"t$i", s"$i.parquet")))
        })
      }
      val versions = futures.map(_.get())
      // every commit won SOME version, all versions distinct
      assert(versions.toSet.size == n, versions.toString)
      // and the final snapshot carries every thread's row
      assert(CasMetadata.read(spark, d).map(_.indexFile).toSet ==
        (1 to n).map(i => s"t$i").toSet)
    } finally pool.shutdown()
  }

  test("vacuum drops old manifests, never the live snapshot") {
    val d = dir("casvac")
    (1 to 5).foreach(i =>
      CasMetadata.commit(spark, d, Seq(row(s"idx$i", s"$i.parquet"))))
    assert(CasMetadata.vacuum(spark, d, keep = 2) == 3)
    // the live snapshot still resolves with all five rows
    assert(CasMetadata.read(spark, d).map(_.indexFile).toSet ==
      (1 to 5).map(i => s"idx$i").toSet)
    assert(CasMetadata.latestVersion(spark, d).contains(5L))
    // a later commit keeps working on the vacuumed log
    CasMetadata.commit(spark, d, Seq(row("idx6", "6.parquet")))
    assert(CasMetadata.read(spark, d).size == 6)
  }

  test("a torn manifest is detected, never served as the table") {
    val d = dir("castorn")
    CasMetadata.commit(spark, d, Seq(row("idx1", "a.parquet")))
    // a truncated upload / out-of-band writer leaves a manifest without
    // the integrity trailer at the max version: reads must fail loudly
    // — serving it would cache an empty table forever and the next
    // merge would drop every committed row
    assert(CasMetadata.tryClaim(spark, d, 2L,
      "{\"table_name\":\"documents\",\"column_name\":\"text\"," +
        "\"file_path\":[\"a.parquet\"],\"record_counts\":[10],"))
    val err = intercept[IllegalArgumentException] {
      CasMetadata.read(spark, d)
    }
    assert(err.getMessage.contains("torn CAS manifest"))
  }

  test("stream-visible schemes publish claims atomically with content") {
    // mock:// is RawLocal-backed: create(overwrite=false) streams are
    // visible before close, so createIfAbsent must stage + rename
    // there. Observable contract: the claim lands whole, the second
    // claim loses, and no staging temp survives
    val d = "mock://" + TestSpark.tmpDir("casstaged")
    val p = s"$d/claim.json"
    assert(graft.core.Fs.createIfAbsent(p, "abc".getBytes("UTF-8")))
    assert(!graft.core.Fs.createIfAbsent(p, "xyz".getBytes("UTF-8")))
    assert(graft.core.Fs.readString(p) == "abc")
    val names = graft.core.Fs.childNames(spark, d)
    assert(names == Set("claim.json"), names.toString)
    // and the CAS lifecycle runs end-to-end on the staged-rename scheme
    val d2 = "mock://" + TestSpark.tmpDir("casstaged2")
    CasMetadata.commit(spark, d2, Seq(row("idx1", "a.parquet")))
    CasMetadata.commit(spark, d2, Seq(row("idx2", "b.parquet")))
    assert(CasMetadata.read(spark, d2).map(_.indexFile).toSet ==
      Set("idx1", "idx2"))
  }

  test("legacy manifests without the integrity trailer stay readable") {
    val d = dir("caslegacy")
    // a snapshot written by the pre-trailer protocol: complete NDJSON
    // rows, no __rows__ line. Refusing it would brick an existing
    // lake's metadata on upgrade — it must read, and the next commit
    // must merge on top of it (and write the trailer going forward)
    val legacy =
      "{\"table_name\":\"documents\",\"column_name\":\"text\"," +
        "\"file_path\":[\"a.parquet\"],\"record_counts\":[10]," +
        "\"index_file\":\"idx1\",\"index_type\":\"ngram\"," +
        "\"rows_indexed\":10,\"index_timestamp\":0}\n"
    assert(CasMetadata.tryClaim(spark, d, 1L, legacy))
    assert(CasMetadata.read(spark, d) == Seq(row("idx1", "a.parquet")))
    val v = CasMetadata.commit(spark, d, Seq(row("idx2", "b.parquet")))
    assert(v == 2L)
    assert(CasMetadata.read(spark, d).map(_.indexFile).toSet ==
      Set("idx1", "idx2"))
  }

  test("a legacy DATA row containing the literal __rows__ is not a trailer") {
    val d = dir("caslookalike")
    // pre-trailer snapshot whose LAST row carries the value "__rows__"
    // in a string field: substring-matching the trailer would treat the
    // row as the integrity trailer (null field -> NPE, or a spurious
    // torn-manifest error); detection must PARSE and check the field
    val lookalike =
      "{\"table_name\":\"documents\",\"column_name\":\"text\"," +
        "\"file_path\":[\"a.parquet\"],\"record_counts\":[10]," +
        "\"index_file\":\"idx1\",\"index_type\":\"ngram\"," +
        "\"rows_indexed\":10,\"index_timestamp\":0}\n" +
      "{\"table_name\":\"documents\",\"column_name\":\"text\"," +
        "\"file_path\":[\"b.parquet\"],\"record_counts\":[10]," +
        "\"index_file\":\"idx2\",\"index_type\":\"__rows__\"," +
        "\"rows_indexed\":10,\"index_timestamp\":0}\n"
    assert(CasMetadata.tryClaim(spark, d, 1L, lookalike))
    val rows = CasMetadata.read(spark, d)
    assert(rows.size == 2)
    assert(rows.map(_.indexType).toSet == Set("ngram", "__rows__"))
  }

  test("vacuum spares a commit-in-flight staging file, sweeps aged ones") {
    val d = "mock://" + TestSpark.tmpDir("casvactmp")
    (1 to 3).foreach(i =>
      CasMetadata.commit(spark, d, Seq(row(s"idx$i", s"$i.parquet"))))
    val log = CasMetadata.logDir(d)
    val fs = new org.apache.hadoop.fs.Path(log)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // a FRESH staging tmp = a committer mid write-then-rename: vacuum
    // must not delete it (deleting it would fail a commit that lost no
    // race); an AGED one is a crashed committer's orphan and goes
    val fresh = new org.apache.hadoop.fs.Path(log, ".00000000000000000004.manifest.aaaa.tmp")
    val aged = new org.apache.hadoop.fs.Path(log, ".00000000000000000004.manifest.bbbb.tmp")
    Seq(fresh, aged).foreach { p =>
      val out = fs.create(p, true); out.write(1); out.close()
    }
    fs.setTimes(aged,
      System.currentTimeMillis() - CasMetadata.OrphanTmpMinAgeMs - 60000, -1)
    CasMetadata.vacuum(spark, d, keep = 1)
    val left = graft.core.Fs.childNames(spark, log)
    assert(left.contains(fresh.getName), s"in-flight tmp deleted: $left")
    assert(!left.contains(aged.getName), s"aged orphan survived: $left")
    // the live snapshot is intact
    assert(CasMetadata.read(spark, d).map(_.indexFile).toSet ==
      Set("idx1", "idx2", "idx3"))
  }

  test("the norename scheme really rejects rename") {
    val p = new org.apache.hadoop.fs.Path(dir("casnorename") + "/x")
    val fs = p.getFileSystem(
      spark.sessionState.newHadoopConf())
    intercept[UnsupportedOperationException] {
      fs.rename(p, new org.apache.hadoop.fs.Path(p.toString + "2"))
    }
  }
}
