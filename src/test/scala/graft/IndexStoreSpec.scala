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
}
