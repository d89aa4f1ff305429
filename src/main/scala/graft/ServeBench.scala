package graft

import org.apache.spark.sql.SparkSession

/** ANN serving-latency micro-bench: per-query latency of the three
  * vector serving paths over the 20-query recall panel, against the
  * indexes the correctness entries build —
  *
  *   - `ivf_probe`    — IVF half-cells probe ([[graft.index.VectorIndex.search]])
  *   - `vamana_spark` — graph beam + Spark rerank ([[graft.index.VamanaIndex.search]])
  *   - `vamana_fast`  — graph beam + driver rerank, warm node cache
  *                      ([[graft.index.VamanaIndex.searchFast]]) — the
  *                      zero-Spark-jobs steady-state serving shape
  *
  * Prints one JSON line with mean/min per-query seconds per path
  * (panel pass 2 of 2, pass 1 warms JIT + caches). Feeds the SCALE.md
  * serving-latency table; correctness of every path is pinned by the
  * CORRECTNESS entries and VamanaSpec's bit-identical fast-path test.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = graft.ops.Similarity.K
    val ivf = graft.index.VectorIndex.ensureBuilt(spark, sfDir)
    val vam = graft.index.VamanaIndex.ensureBuilt(spark, sfDir)
    val np = graft.index.VectorIndex.probeCount(spark, ivf)
    val panel = graft.index.VectorIndex.queryPanel(spark, sfDir, 20)

    def lat(f: Seq[Double] => Unit): (Double, Double) = {
      val ts = panel.map { q =>
        val t0 = System.nanoTime(); f(q); (System.nanoTime() - t0) / 1e9
      }
      (ts.sum / ts.size, ts.min)
    }
    val paths = Seq[(String, Seq[Double] => Unit)](
      "ivf_probe" -> (q =>
        graft.index.VectorIndex.search(spark, ivf, q, k, np).collect()),
      "vamana_spark" -> (q =>
        graft.index.VamanaIndex.search(spark, vam, q, k).collect()),
      "vamana_fast" -> (q =>
        graft.index.VamanaIndex.searchFast(spark, vam, q, k).collect()))

    paths.foreach { case (_, f) => lat(f) } // pass 1: warm
    val out = paths.map { case (name, f) =>
      val (mean, min) = lat(f) // pass 2: timed
      f""""$name":{"mean_s":$mean%.4f,"min_s":$min%.4f}"""
    }
    println(s"""{"metric":"ann_serving_latency","sf":"$sfDir",${out.mkString(",")}}""")
    spark.stop()
  }
}
