package graft

import graft.api.{GraftLake, NgramKind}
import org.apache.spark.sql.functions.{col, lower}
import org.scalatest.funsuite.AnyFunSuite

/** The index ROOT on an authority-bearing object-store-style scheme
  * (`mocks://bucket/...`): build markers, index tables, coverage
  * stats, compaction and vacuum all flow through the root's Hadoop
  * FileSystem, and the metadata table automatically switches from the
  * local two-rename swap to the rename-free [[graft.core.CasMetadata]]
  * protocol — the configuration a real `s3a://` index root would run.
  */
class SchemeRootSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("full facade lifecycle with the index root on mocks://bucket") {
    val localRoot = TestSpark.tmpDir("schemeroot")
    val prev = sys.props.get("graft.index.dir")
    // MockAuthFs stores by dropping the authority: this root reads and
    // writes the local tree while every path STRING carries the
    // object-store shape
    sys.props("graft.index.dir") = "mocks://bucket" + localRoot
    try {
      val dir = TestSpark.tmpDir("schemerootlake")
      def write(name: String, rows: Seq[(Long, String)]): Unit = {
        val staging = TestSpark.tmpDir(s"stage-sr-$name")
        rows.toDF("doc_id", "text").coalesce(1)
          .write.mode("overwrite").parquet(staging)
        java.nio.file.Files.move(
          java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
          java.nio.file.Paths.get(s"$dir/$name.parquet"))
      }
      write("a", Seq(1L -> "alpha search engine", 2L -> "beta rig"))
      write("b", Seq(3L -> "gamma search index", 4L -> "delta rays"))
      val lake = GraftLake(spark, dir)

      val built = lake.index(NgramKind, "text", binpackRows = 2)
      assert(built.size == 2)
      assert(built.forall(_.startsWith("mocks://bucket/")),
        s"index tables not under the scheme root: $built")

      // the metadata table committed through the CAS log, not the swap
      val caslog = java.nio.file.Paths.get(
        s"$localRoot/${graft.core.IndexStore.lakeId(dir)}/_metadata_caslog")
      assert(java.nio.file.Files.isDirectory(caslog),
        "non-local root must use the CAS metadata protocol")

      def searchIds(q: String) =
        lake.search(NgramKind, "text", q, 100, Seq("doc_id"))
          .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(searchIds("search") == Seq(1L, 3L))

      // append → in-situ probe; incremental index; compact; vacuum
      write("c", Seq(5L -> "epsilon search party", 6L -> "zeta zone"))
      assert(searchIds("search") == Seq(1L, 3L, 5L))
      assert(lake.index(NgramKind, "text").size == 1)
      val merged = lake.compact(NgramKind, "text", threshold = 1000000)
      assert(merged.isDefined)
      val kept = lake.vacuum()
      assert(kept == Seq(merged.get))
      // vacuum also trims the CAS manifest log (5+ commits happened
      // above; only a bounded trailing window may remain, and the live
      // snapshot must still resolve — asserted by the searches below)
      val manifests = java.nio.file.Files.list(caslog).iterator()
      val nManifests = {
        var n = 0
        while (manifests.hasNext) {
          if (manifests.next().getFileName.toString.endsWith(".manifest")) n += 1
        }
        n
      }
      assert(nManifests <= 3, s"CAS log not trimmed: $nManifests manifests")
      assert(searchIds("search") == Seq(1L, 3L, 5L))
      assert(searchIds("zone") == Seq(6L))
      assert(searchIds("nothing-here").isEmpty)

      // streaming maintenance against the same scheme root: per-batch
      // index builds, the checkpoint, and the batch-dir listing all go
      // through the root's FileSystem
      val sf = "/root/testdata/sf0.001"
      val q = graft.ops.IndexQueries.QueryStr
      val got = graft.streaming.StreamingIndex.search(spark, sf, q)
        .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      val want = graft.Tables.load(spark, sf, "documents")
        .filter(lower(col("text")).contains(q))
        .select("doc_id").orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == want && want.nonEmpty)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.index.dir") = v
        case None => sys.props.remove("graft.index.dir")
      }
    }
  }
}
