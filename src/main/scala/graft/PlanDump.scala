package graft

import org.apache.spark.sql.SparkSession

/** Measurement tool (OPTIMIZATION_r12.md deliverable): dump
  * `.explain("formatted")` for named queries to files.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <q1,q2,...>
  * Writes <outDir>/<name>.txt per query. Runs each query's plan through
  * the same SparkEntry path the bench uses (fixtures ensure-built by a
  * prior untimed call, so the dumped plan is the warm-path plan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          // fixture-building pass (ensure-gated), so the dumped plan is
          // the warm query plan, not the build pipeline; NonFatal only —
          // a failed warm pass must be visible, and fatal errors (OOM)
          // must not be swallowed into a silently-cold dump
          try fn(spark, sfDir).count()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[plandump] warm pass for $name failed: $e") }
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
