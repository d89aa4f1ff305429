package graft

import graft.ops.Maintenance
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceSpec extends AnyFunSuite {

  test("binpack groups until the row threshold") {
    val files = Seq("a" -> 100L, "b" -> 100L, "c" -> 100L, "d" -> 50L)
    assert(Maintenance.binpack(files, 200) ==
      Seq(Seq("a", "b"), Seq("c", "d")))
  }

  test("binpack keeps oversized files as singleton groups") {
    val files = Seq("a" -> 500L, "b" -> 10L)
    assert(Maintenance.binpack(files, 100) == Seq(Seq("a"), Seq("b")))
  }

  test("vacuum retention: young unreferenced index survives, then dies") {
    val spark = TestSpark.spark
    val ns = TestSpark.tmpDir("vacns")
    val idxDir = graft.core.IndexStore.indexPath(ns, "orphan")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idxDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(idxDir, "part.parquet"), "x")
    // within the retention window: unreferenced but too young → kept
    Maintenance.vacuum(spark, ns)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(idxDir)))
    // past expiry (retention 0): same orphan is deleted
    Maintenance.vacuum(spark, ns, retentionMs = 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(idxDir)))
  }

  test("retention clock starts when UNREFERENCED, not at build time") {
    val spark = TestSpark.spark
    val ns = TestSpark.tmpDir("vacns2")
    val idxDir = graft.core.IndexStore.indexPath(ns, "oldbuild")
    val f = java.nio.file.Paths.get(idxDir, "part.parquet")
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.writeString(f, "x")
    // a 30-day-old BUILD that just became unreferenced must get the
    // full grace window (in-flight readers still hold its path) — the
    // old build-age clock would delete it on this very first sweep
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 30L * 24 * 3600 * 1000)
    java.nio.file.Files.setLastModifiedTime(f, old)
    Maintenance.vacuum(spark, ns)
    assert(java.nio.file.Files.exists(f.getParent))
    val tomb = java.nio.file.Paths.get(idxDir, Maintenance.UnreferencedMarker)
    assert(java.nio.file.Files.exists(tomb)) // clock started
    // once the tombstone itself ages past retention, the dir dies
    java.nio.file.Files.setLastModifiedTime(tomb, old)
    Maintenance.vacuum(spark, ns)
    assert(!java.nio.file.Files.exists(f.getParent))
  }

  test("a re-referenced dir has its tombstone cleared (clock reset)") {
    val spark = TestSpark.spark
    val ns = TestSpark.tmpDir("vacns3")
    val idxDir = graft.core.IndexStore.indexPath(ns, "revived")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idxDir))
    Maintenance.vacuum(spark, ns) // stamps the tombstone
    val tomb = java.nio.file.Paths.get(idxDir, Maintenance.UnreferencedMarker)
    assert(java.nio.file.Files.exists(tomb))
    // the dir is committed again (an in-place rebuild): the next sweep
    // must clear the tombstone so a LATER un-referencing restarts the
    // clock instead of inheriting the stale one
    graft.core.IndexStore.commitMetadata(spark, ns,
      graft.core.IndexStore.metadataRows(spark, "documents", "text",
        Seq("f1"), Seq(-1L), idxDir, "ngram", -1L))
    Maintenance.vacuum(spark, ns)
    assert(!java.nio.file.Files.exists(tomb))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(idxDir)))
  }

  test("greedy max-coverage index selection") {
    // reference: backends/delta.py:77-93
    val live = Set("f1", "f2", "f3", "f4", "f5")
    val idx = Seq(
      "a" -> Set("f1", "f2"),
      "b" -> Set("f2", "f3", "f4"),
      "c" -> Set("f5"),
      "d" -> Set("f9")) // covers nothing live
    val picks = Maintenance.selectIndexes(live, idx)
    assert(picks == Seq("b", "a", "c")) // by marginal coverage
    assert(Maintenance.selectIndexes(Set.empty, idx) == Seq.empty)
  }

  test("binpack partitions the input in order, within threshold") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val rows = Seq.fill(rnd.nextInt(20))(1L + rnd.nextInt(300))
      val files = rows.zipWithIndex.map { case (r, i) => (s"f$i", r) }
      val groups = Maintenance.binpack(files, 400)
      assert(groups.flatten == files.map(_._1)) // order-preserving cover
      groups.foreach { g =>
        val sum = g.map(f => files(f.drop(1).toInt)._2).sum
        assert(g.size == 1 || sum <= 400)
      }
    }
  }
}
