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
      // non-file scheme for dispatch tests (SchemeLakeSpec): must be
      // set at session build so conf caches copied from the session
      // (graft.core.Fs) already carry it
      .config("spark.hadoop.fs.mock.impl", "graft.MockFs")
      .config("spark.hadoop.fs.mocks.impl", "graft.MockAuthFs")
      .config("spark.hadoop.fs.norename.impl", "graft.NoRenameFs")
      .config("spark.hadoop.fs.httpr.impl", "graft.core.HttpRangeFs")
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
