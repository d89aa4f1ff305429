package graft

import graft.index.{FmIndex, WaveletIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent searches through the shared BwtDriver caches: the chunk
  * and head fetches run their Spark jobs OUTSIDE the driver monitor
  * (round-6 change), so racing threads must neither deadlock nor see
  * each other's partially-inserted state — every thread's results must
  * equal the sequential answer.
  */
class BwtConcurrencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int, len: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcd "
    (0L until n.toLong).map { id =>
      id -> (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
  }

  test("parallel FM+wavelet searches equal their sequential answers") {
    val rows = corpus(40, 100, seed = 41)
    val dir = TestSpark.tmpDir("bwt-conc")
    rows.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/data")
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .toSeq.sorted
    FmIndex.build(spark, files, "text", s"$dir/fm")
    WaveletIndex.build(spark, files, "text", s"$dir/wv")

    val rnd = new scala.util.Random(43)
    val alpha = "abcd "
    val queries = (1 to 12).map { _ =>
      (0 until (1 + rnd.nextInt(6)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct

    def fmIds(q: String): Set[Long] =
      FmIndex.search(spark, s"$dir/fm", "text", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    def wvIds(q: String): Set[Long] =
      WaveletIndex.search(spark, s"$dir/wv", "text", q)
        .select("doc_id").collect().map(_.getLong(0)).toSet

    // sequential ground truth (also warms nothing persistent: caches
    // are per-driver-object, shared with the parallel phase — which is
    // exactly the shared state under test)
    val want = queries.map(q => q -> (fmIds(q), wvIds(q))).toMap

    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (1 to 3).flatMap(_ => queries).map { q =>
        scala.concurrent.Future {
          q -> (fmIds(q), wvIds(q))
        }
      }
      val got = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(300, "s"))
      got.foreach { case (q, res) =>
        assert(res == want(q), s"query '$q' diverged under concurrency")
      }
    } finally pool.shutdown()
  }
}
