package graft

import graft.core.IcebergLog
import org.scalatest.funsuite.AnyFunSuite

class IcebergLogSpec extends AnyFunSuite {

  private def df(table: String, name: String): IcebergLog.DataFile = {
    val p = java.nio.file.Paths.get(table, "data", name)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, name)
    IcebergLog.DataFile(p.toString, 10L, java.nio.file.Files.size(p))
  }

  test("snapshot commits carry files forward and honor removes") {
    val t = TestSpark.tmpDir("icelog")
    val (a, b) = (df(t, "a.parquet"), df(t, "b.parquet"))
    val s1 = IcebergLog.commit(t, Seq(a, b))
    val c = df(t, "c.parquet")
    val s2 = IcebergLog.commit(t, Seq(c), removes = Seq(b.path))
    assert(IcebergLog.snapshots(t) == Seq(s1, s2))
    assert(IcebergLog.currentSnapshot(t) == s2)
    def names(snap: Option[Long]) =
      IcebergLog.liveFiles(t, snap).map(_.split('/').last)
    assert(names(Some(s1)) == Seq("a.parquet", "b.parquet"))
    assert(names(None) == Seq("a.parquet", "c.parquet"))
    val err = intercept[IllegalArgumentException] {
      IcebergLog.liveFiles(t, Some(99L))
    }
    assert(err.getMessage.contains("unknown Iceberg snapshot"))

    // reversed snapshot order must fail fast, not swap insert/delete
    val rev = intercept[IllegalArgumentException] {
      IcebergLog.changes(TestSpark.spark, t, s2, s1)
    }
    assert(rev.getMessage.contains("reversed"))
  }

  test("the snapshot log runs on a rename-free object store") {
    // norename:// rejects every rename: avro manifests, metadata json
    // (conditional-PUT claim) and the version hint must all commit
    // without one — the object-store shape of the Iceberg protocol
    val local = TestSpark.tmpDir("icenr")
    val t = "norename://" + local
    val (a, b) = (df(local, "a.parquet"), df(local, "b.parquet"))
    val s1 = IcebergLog.commit(t, Seq(a, b))
    val c = df(local, "c.parquet")
    val s2 = IcebergLog.commit(t, Seq(c), removes = Seq(b.path))
    assert(IcebergLog.snapshots(t) == Seq(s1, s2))
    def names(snap: Option[Long]) =
      IcebergLog.liveFiles(t, snap).map(_.split('/').last)
    assert(names(Some(s1)) == Seq("a.parquet", "b.parquet"))
    assert(names(None) == Seq("a.parquet", "c.parquet"))
    // the claim itself arbitrates racing commits of the same version:
    // exactly one create-if-absent of a versioned metadata name wins
    val v3 = "norename://" + local + "/metadata/v3.metadata.json"
    assert(graft.core.Fs.createIfAbsent(v3, "{}".getBytes("UTF-8")))
    assert(!graft.core.Fs.createIfAbsent(v3, "{}".getBytes("UTF-8")))
    graft.core.Fs.forPath(v3).delete(new org.apache.hadoop.fs.Path(v3),
      false)
  }

  test("a crash between claim and hint neither pins readers nor wedges commits") {
    val local = TestSpark.tmpDir("icehint")
    val t = "norename://" + local
    val s1 = IcebergLog.commit(t, Seq(df(local, "a.parquet")))
    val s2 = IcebergLog.commit(t, Seq(df(local, "b.parquet")))
    // simulate a committer that claimed v2 but died before the hint
    // write by rolling the hint BACK to v1: version resolution must
    // come from LISTING the metadata dir, the hint is advisory
    graft.core.Fs.writeBytes(s"$t/metadata/version-hint.text",
      "1".getBytes("UTF-8"))
    // readers still resolve the claimed snapshot (not pinned to v1)...
    assert(IcebergLog.currentSnapshot(t) == s2)
    assert(IcebergLog.snapshots(t) == Seq(s1, s2))
    // ...and the next commit lands at v3 instead of wedging forever on
    // the orphaned v2 claim
    val s3 = IcebergLog.commit(t, Seq(df(local, "c.parquet")))
    assert(s3 == s2 + 1)
    assert(IcebergLog.liveFiles(t).map(_.split('/').last) ==
      Seq("a.parquet", "b.parquet", "c.parquet"))
  }
}
