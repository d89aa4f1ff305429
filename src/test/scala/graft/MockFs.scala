package graft

/** A non-`file:` Hadoop FileSystem for scheme-dispatch tests: behaves
  * like the local filesystem but registers under `mock://`, so every
  * path that flows through it exercises the same code paths an
  * `s3a://`/`hdfs://` lake would — scheme-preserving listings,
  * conf-shipped executor opens, no `java.nio` shortcuts (registered in
  * [[TestSpark]] via `spark.hadoop.fs.mock.impl`).
  */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
  override def getScheme: String = "mock"
}
