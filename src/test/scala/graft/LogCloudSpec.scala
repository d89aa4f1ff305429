package graft

import graft.index.LogCloudIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LogCloudSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("type bitmask ports the reference classification") {
    // reference: src/lava/logcloud/logcloud_common.rs:9-24
    assert(LogCloudIndex.typeBits("123") == 1)
    assert(LogCloudIndex.typeBits("abc") == 2)
    assert(LogCloudIndex.typeBits("ABC") == 4)
    assert(LogCloudIndex.typeBits("XYZ") == 8)
    assert(LogCloudIndex.typeBits("xyz") == 16)
    assert(LogCloudIndex.typeBits("!?") == 32)
    assert(LogCloudIndex.typeBits("deadbeef42") == 3)
    assert(LogCloudIndex.typeBits("{\"k\":87}") == (1 | 16 | 32))
  }

  test("build-side type column equals the driver bitmask (no phantom 32)") {
    // split(c, "") emits a trailing empty string; unfiltered it set the
    // 'other' bit on EVERY value, neutering the type prune for
    // punctuation-free values — the column twin must match typeBits
    // exactly, including values with no 'other' characters
    val vals = Seq("123", "abc", "ABC", "XYZ", "xyz", "!?",
      "deadbeef42", "{\"k\":87}", "Grz9", "a")
    val got = vals.toDF("value")
      .select(org.apache.spark.sql.functions.col("value"),
        LogCloudIndex.typeBitsCol(
          org.apache.spark.sql.functions.col("value")).as("t"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    vals.foreach { v =>
      assert(got(v) == LogCloudIndex.typeBits(v),
        s"'$v': col=${got(v)} driver=${LogCloudIndex.typeBits(v)}")
    }
  }

  test("variable queries contain digits and no whitespace") {
    assert(LogCloudIndex.isVariableQuery("87"))
    assert(LogCloudIndex.isVariableQuery("piece219"))
    assert(!LogCloudIndex.isVariableQuery("error"))
    assert(!LogCloudIndex.isVariableQuery("k 87"))
    assert(!LogCloudIndex.isVariableQuery(""))
  }

  test("query type bits are always a subset of a containing value's") {
    val rnd = new scala.util.Random(11)
    def str() = Seq.fill(rnd.nextInt(10))((33 + rnd.nextInt(94)).toChar).mkString
    for (_ <- 0 until 200) {
      val (pre, q, post) = (str(), str(), str())
      val qt = LogCloudIndex.typeBits(q)
      val vt = LogCloudIndex.typeBits(pre + q + post)
      assert((vt & qt) == qt) // the partition-pruning invariant
    }
  }

  private val logLines = Seq(
    (0L, "connect from 10.0.0.1 port 22"),
    (1L, "connect from 10.0.0.2 port 22"),
    (2L, "disconnect user alice session 9173"),
    (3L, "error no digits at all here"),
    (4L, "connect from 10.0.0.1 port 8080"))

  test("reconstruction stream round-trips every line") {
    val idx = TestSpark.tmpDir("lc_recon")
    LogCloudIndex.build(spark, logLines.toDF("line_id", "line"), idx)
    val got = LogCloudIndex.reconstruct(spark, idx)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == logLines.toSet)
  }

  test("merged index searches like the union and still round-trips") {
    val (a, b) = (TestSpark.tmpDir("lc_a"), TestSpark.tmpDir("lc_b"))
    val out = TestSpark.tmpDir("lc_m")
    val (la, lb) = logLines.splitAt(3)
    val lbLocal = lb.map { case (id, l) => (id - 3, l) } // per-index ids
    LogCloudIndex.build(spark, la.toDF("line_id", "line"), a)
    LogCloudIndex.build(spark, lbLocal.toDF("line_id", "line"), b)
    LogCloudIndex.merge(spark, a, b, out, offset = 3L)
    val lines = logLines.toDF("line_id", "line")
    val got = LogCloudIndex.search(spark, out, lines, "10.0.0.1")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 4L))
    val rt = LogCloudIndex.reconstruct(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rt == logLines.toSet)
  }

  test("timestamp extraction backfills invalid lines from the last valid") {
    val lines = Seq(
      (0L, "????-??-?? ??:??:?? boot"),             // invalid, nothing before → 0
      (1L, "2024-03-01 10:00:01 start"),
      (2L, "garbage line without timestamp prefix"), // backfilled from line 1
      (3L, "1980-01-01 00:00:00 too old"),           // out of range → backfill
      (4L, "2024-03-01 10:00:05 next")).toDF("line_id", "line")
    val got = LogCloudIndex
      .extractTimestamps(spark, lines, 19, "yyyy-MM-dd HH:mm:ss", segRows = 2)
      .orderBy(col("line_id")).collect().map(_.getLong(1)).toSeq
    val t1 = 1709287201L // 2024-03-01 10:00:01 UTC
    assert(got == Seq(0L, t1, t1, t1, t1 + 4))
  }
}
