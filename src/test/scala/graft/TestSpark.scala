package graft

import org.apache.spark.sql.SparkSession

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def tmpDir(name: String): String = {
    val p = s"/root/repo/target/test-tmp/$name-${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    p
  }
}
