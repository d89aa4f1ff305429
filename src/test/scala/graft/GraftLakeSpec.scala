package graft

import graft.api.GraftLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full lake lifecycle through the public facade: incremental index →
  * partial-coverage search with in-situ fill → compaction → vacuum.
  */
class GraftLakeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val lakeDir = TestSpark.tmpDir("apilake")

  private def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
    val staging = TestSpark.tmpDir(s"stage-$name")
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    val part = graft.core.Lake.listFiles(staging).head
    java.nio.file.Files.move(
      java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(s"$lakeDir/$name.parquet"))
  }

  private def allRows(): Seq[(Long, String)] =
    spark.read.parquet(graft.core.Lake.listFiles(lakeDir): _*)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def brute(q: String): Seq[Long] =
    allRows().filter(_._2.toLowerCase.contains(q)).map(_._1).sorted

  test("index, search with in-situ fill, compact, vacuum") {
    writeFile("a", Seq(1L -> "alpha search engine", 2L -> "beta testing rig"))
    writeFile("b", Seq(3L -> "gamma search index", 4L -> "delta rays"))
    val lake = GraftLake(spark, lakeDir)

    // incremental indexing with a tiny bin-pack threshold → 2 groups
    val built = lake.index("text", binpackRows = 2)
    assert(built.size == 2)
    assert(lake.index("text").isEmpty) // nothing new → no-op

    def searchIds(q: String) =
      lake.search("text", q, 100, Seq("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(searchIds("search") == brute("search"))

    // append-only lake grows; new files are probed in-situ
    writeFile("c", Seq(5L -> "epsilon search party", 6L -> "zeta zone"))
    assert(searchIds("search") == brute("search"))

    // incremental index picks up only the new file
    assert(lake.index("text").size == 1)

    // compaction merges everything into one index, then vacuums
    val merged = lake.compact("text", threshold = 1000000)
    assert(merged.isDefined)
    val kept = lake.vacuum()
    assert(kept == Seq(merged.get))
    assert(searchIds("search") == brute("search"))
    assert(searchIds("zone") == Seq(6L))
    assert(searchIds("nothing-here").isEmpty)
  }
}
