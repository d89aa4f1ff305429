package graft

import graft.index.ZoneMapIndex
import graft.ops.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  test("magic-mask interleave matches the bit-loop reference") {
    val vals = Seq((0L, 0L), (1L, 0L), (0L, 1L), (12345L, 67890L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (7L, 1048576L))
    val got = vals.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got == vals.map { case (a, b) => ZOrder.zValueRef(a, b) })
  }

  test("z-clustered layout prunes 2-D ranges; single-sort layout cannot") {
    val dir = TestSpark.tmpDir("zorder")
    // 64x64 grid, one row per cell, 16 files: a z-ordered layout gives
    // each file a compact 2-D tile; an x-sorted layout gives x-stripes
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    val zLake = s"$dir/z"
    ZOrder.cluster(grid, "x", "y", 16, zLake)
    val xLake = s"$dir/x"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xLake)

    def zones(lake: String, colName: String, tag: String): String = {
      val p = s"$dir/zm_${tag}_$colName"
      ZoneMapIndex.build(s, graft.core.Lake.listFiles(lake), colName, p)
      p
    }
    val (zx, zy) = (zones(zLake, "x", "z"), zones(zLake, "y", "z"))
    val (xx, xy) = (zones(xLake, "x", "x"), zones(xLake, "y", "x"))

    def candCount(pa: String, pb: String): Long =
      s.read.parquet(s"$pa/zones")
        .filter(col("hi") >= 8L && col("lo") <= 15L).select("uid")
        .join(s.read.parquet(s"$pb/zones")
          .filter(col("hi") >= 8L && col("lo") <= 15L).select("uid"),
          Seq("uid"))
        .count()

    val total = s.read.parquet(s"$zx/meta").count()
    val zCands = candCount(zx, zy)   // 8<=x<=15 && 8<=y<=15
    val xCands = candCount(xx, xy)
    // the 8..15 tile is 1/64 of the grid: z-order isolates it to a
    // small fraction of units; the x-sorted layout keeps its 2 x-stripe
    // files but every stripe's y zone spans 0..63, so y prunes nothing
    assert(zCands < total / 2, s"z layout: $zCands of $total")
    assert(zCands <= xCands, s"z $zCands should not exceed x-sort $xCands")

    // exactness: pruned read + refine == brute filter
    val got = ZOrder.searchRange2(s, zx, "x", 8, 15, zy, "y", 8, 15)
      .select("x", "y").as[(Long, Long)].collect().toSet
    val want = (8L to 15L).flatMap(a => (8L to 15L).map(b => (a, b))).toSet
    assert(got == want)

    // indexes from DIFFERENT lakes (z-clustered vs x-sorted: disjoint
    // file sets, unrelated uid spaces) must fail fast, not silently
    // intersect colliding uids
    val err = intercept[IllegalArgumentException] {
      ZOrder.searchRange2(s, zx, "x", 8, 15, xy, "y", 8, 15).collect()
    }
    assert(err.getMessage.contains("different"))
  }
}
