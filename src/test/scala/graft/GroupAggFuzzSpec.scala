package graft

import graft.index.AggIndex
import graft.plans.IndexPruneRule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized semantics-equivalence fuzz of the grouped-aggregate
  * rewrite: the SAME rows live in an indexed lake (where the rewrite
  * serves from cells) and in an identical un-indexed lake (plain
  * scan); for a seeded sample of query shapes — bare / derived / mixed
  * grouping keys, key-only filters, plain and distinct aggregates,
  * global aggregates — the two results must match row-for-row. The
  * single-shape pins in GroupAggSpec each freeze one contract; this
  * fuzz sweeps the cross product (null keys × null measures × derived
  * keys × filters × distinct) where semantics bugs hide.
  */
class GroupAggFuzzSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def scansLake(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.nonEmpty

  /** Deterministic (k1: nullable string, k2: timestamp, m: nullable
    * long) lake — built twice from the same seed so both dirs hold
    * identical rows.
    */
  private def mkLake(tag: String): String = {
    val d = TestSpark.tmpDir(s"gafz-$tag")
    val rnd = new scala.util.Random(42)
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      f"202${1 + day % 4}%d-0${1 + day % 9}%d-1${day % 9}%d 00:00:00")
    val rows = (0 until 200).map { _ =>
      val k1 = if (rnd.nextInt(10) == 0) null else "k" + rnd.nextInt(5)
      val k2 = ts(rnd.nextInt(12))
      val m: java.lang.Long =
        if (rnd.nextInt(8) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(1000).toLong - 100L)
      (k1, k2, m)
    }
    rows.grouped(100).zipWithIndex.foreach { case (part, pi) =>
      val staging = TestSpark.tmpDir(s"gafz-st-$tag-$pi")
      part.toDF("k1", "k2", "m").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(graft.core.Lake.listFiles(staging).head),
        java.nio.file.Paths.get(s"$d/p$pi.parquet"))
    }
    d
  }

  test("rewrite equals the plain scan over 60 random query shapes") {
    val indexed = mkLake("idx")
    val plain = mkLake("plain")
    AggIndex.ensureRegistered(spark, indexed, Seq("k1", "k2"), Seq("m"))
    IndexPruneRule.enable(spark)
    val rnd = new scala.util.Random(7)
    val aggPool: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "cnt" -> count(lit(1)),
      "cm" -> count(col("m")),
      "sm" -> sum(col("m")),
      "lo" -> min(col("m")),
      "hi" -> max(col("m")),
      "dk1" -> countDistinct(col("k1")),
      "dk2" -> countDistinct(col("k2")))
    var served = 0
    for (trial <- 1 to 60) {
      val gPick = rnd.nextInt(6)
      val fPick = rnd.nextInt(5)
      val nAggs = 1 + rnd.nextInt(4)
      val aggs = rnd.shuffle(aggPool).take(nAggs)
        .map { case (n, c) => c.as(n) }
      def build(dir: String): org.apache.spark.sql.DataFrame = {
        var df = spark.read.parquet(dir)
        df = fPick match {
          case 0 => df
          case 1 => df.filter(col("k1") === "k2")
          case 2 => df.filter(col("k2") >=
            java.sql.Timestamp.valueOf("2022-06-01 00:00:00"))
          case 3 => df.filter(col("k1").isin("k0", "k3", "nope"))
          case 4 => df.filter(col("k1").isNotNull)
        }
        gPick match {
          case 0 => df.agg(aggs.head, aggs.tail: _*)
          case 1 => df.groupBy(col("k1")).agg(aggs.head, aggs.tail: _*)
          case 2 => df.groupBy(col("k2")).agg(aggs.head, aggs.tail: _*)
          case 3 => df.groupBy(col("k1"), col("k2"))
            .agg(aggs.head, aggs.tail: _*)
          case 4 => df.groupBy(year(col("k2")))
            .agg(aggs.head, aggs.tail: _*)
          case 5 => df.groupBy(col("k1"), date_trunc("MONTH", col("k2")))
            .agg(aggs.head, aggs.tail: _*)
        }
      }
      val viaIndex = build(indexed)
      if (!scansLake(viaIndex)) served += 1
      val a = viaIndex.collect().map(_.toString).sorted.toSeq
      val b = build(plain).collect().map(_.toString).sorted.toSeq
      assert(a == b,
        s"trial $trial: grouping=$gPick filter=$fPick aggs=" +
          aggs.mkString(","))
    }
    // the fuzz must actually exercise the rewrite, not an all-veto sweep
    assert(served >= 20, s"only $served/60 shapes served from the index")
  }
}
