package graft

import graft.core.IndexStore
import graft.ops.Maintenance
import org.scalatest.funsuite.AnyFunSuite

/** Metadata commit protocol + vacuum behavior. */
class IndexStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def rows(idx: String, files: Seq[String]) =
    IndexStore.metadataRows(spark, "t", "c", files,
      files.map(_ => 10L), idx, "ngram", 10L * files.size)

  test("commit appends, rebuild replaces, delete removes") {
    val ns = s"spec-commit-${System.nanoTime()}"
    IndexStore.commitMetadata(spark, ns, rows("idxA", Seq("f1", "f2")))
    IndexStore.commitMetadata(spark, ns, rows("idxB", Seq("f3")))
    val m1 = IndexStore.readMetadata(spark, ns).get
    assert(m1.count() == 2)
    // idempotent rebuild of idxA replaces its row instead of duplicating
    IndexStore.commitMetadata(spark, ns, rows("idxA", Seq("f1", "f2")))
    assert(IndexStore.readMetadata(spark, ns).get.count() == 2)
    IndexStore.deleteMetadata(spark, ns, Seq("idxA"))
    val m2 = IndexStore.readMetadata(spark, ns).get
      .select("index_file").collect().map(_.getString(0)).toSeq
    assert(m2 == Seq("idxB"))
  }

  test("vacuum deletes unreferenced index dirs and keeps referenced ones") {
    val ns = s"spec-vacuum-${System.nanoTime()}"
    val live = IndexStore.indexPath(ns, "live_idx")
    val orphan = IndexStore.indexPath(ns, "orphan_idx")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(live))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(orphan))
    IndexStore.commitMetadata(spark, ns, rows(live, Seq("f1")))
    val kept = Maintenance.vacuum(spark, ns, retentionMs = 0L)
    assert(kept == Seq(live))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(live)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(orphan)))
  }

  test("a crash between the swap renames is recovered on the next read") {
    val ns = s"spec-recover-${System.nanoTime()}"
    IndexStore.commitMetadata(spark, ns, rows("idxA", Seq("f1")))
    // simulate the crash window: the live table was moved to _old but
    // the replacement never landed
    val target = java.nio.file.Paths.get(IndexStore.metadataPath(ns))
    val bak = java.nio.file.Paths.get(IndexStore.metadataPath(ns) + "_old")
    java.nio.file.Files.move(target, bak)
    assert(!java.nio.file.Files.exists(target))
    // any read restores the backup as the authoritative table
    val m = IndexStore.readMetadata(spark, ns)
    assert(m.isDefined && m.get.count() == 1)
    assert(java.nio.file.Files.exists(target) &&
      !java.nio.file.Files.exists(bak))
    // and the row cache serves it too
    assert(IndexStore.metadataRowsCached(spark, ns).map(_.indexFile) ==
      Seq("idxA"))
  }

  test("back-to-back commits never alias the metadata row cache") {
    val ns = s"spec-alias-${System.nanoTime()}"
    IndexStore.commitMetadata(spark, ns, rows("idxA", Seq("f1")))
    assert(IndexStore.metadataRowsCached(spark, ns).size == 1)
    // compact's append-then-delete commits twice within one clock
    // granule; the writer bumps mtimes monotonically so each read sees
    // its own version
    IndexStore.commitMetadata(spark, ns, rows("idxB", Seq("f2")))
    assert(IndexStore.metadataRowsCached(spark, ns).size == 2)
    IndexStore.deleteMetadata(spark, ns, Seq("idxA"))
    assert(IndexStore.metadataRowsCached(spark, ns).map(_.indexFile) ==
      Seq("idxB"))
  }
}
