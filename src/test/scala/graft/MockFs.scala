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
  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(MockFs.plainStat)
  override def getFileStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus =
    MockFs.plainStat(super.getFileStatus(f))
}

object MockFs {
  /** RawLocal's lazy permission load does `new java.io.File(uri)`,
    * which rejects any non-`file:` scheme the moment something wraps a
    * status into a LocatedFileStatus (FileSystem.listFiles). Real
    * object-store filesystems return materialized statuses; these
    * mocks must too.
    */
  def plainStat(s: org.apache.hadoop.fs.FileStatus)
      : org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory,
      s.getReplication, s.getBlockSize, s.getModificationTime, s.getPath)
}

/** A RENAME-FREE variant (`norename://`): every rename throws, the way
  * a strict object-store contract would if rename weren't emulated —
  * any protocol that survives on this filesystem provably never relies
  * on (atomic or otherwise) rename. CasCommitSpec runs the whole CAS
  * metadata lifecycle on it.
  */
class NoRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("norename:///")
  override def getScheme: String = "norename"
  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(MockFs.plainStat)
  override def getFileStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus =
    MockFs.plainStat(super.getFileStatus(f))
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    throw new UnsupportedOperationException(
      s"rename($src, $dst) on a no-rename object store")

  // conditional-PUT semantics are the STORE's guarantee the CAS
  // protocols build on (`PUT If-None-Match: *`): the object becomes
  // visible ATOMICALLY WITH ITS CONTENT, and a lost race surfaces at
  // the PUT's completion. RawLocal's create(overwrite=false) is only
  // check-then-create with incremental visibility, so the mock
  // emulates the real contract — buffer the bytes, and on close()
  // publish them via hardlink of a fully-written temp file (atomic
  // claim + content in one syscall; FileAlreadyExists if a racer won).
  // The CLIENT still never calls rename — this is store-internal
  // machinery, like the store's own replication.
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else atomicPut(f)

  // FileSystem.create(Path, boolean) routes through THIS overload, not
  // the permission one — both must arbitrate atomically
  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    else atomicPut(f)

  private def atomicPut(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FSDataOutputStream = {
      val file = pathToFile(f)
      java.nio.file.Files.createDirectories(file.getParentFile.toPath)
      val buf = new java.io.ByteArrayOutputStream() {
        override def close(): Unit = {
          val tmp = java.nio.file.Files.createTempFile(
            file.getParentFile.toPath, "_put", ".tmp")
          java.nio.file.Files.write(tmp, toByteArray)
          try java.nio.file.Files.createLink(file.toPath, tmp)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              java.nio.file.Files.delete(tmp)
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                f.toString)
          }
          java.nio.file.Files.delete(tmp)
        }
      }
      new org.apache.hadoop.fs.FSDataOutputStream(buf, null)
  }
}

/** An AUTHORITY-BEARING variant (`mocks://bucket/...`) — the shape of
  * every object-store URI (`s3a://bucket/key`). The authority is
  * captured at initialize and echoed from `getUri`, so Hadoop's
  * `checkPath`/`makeQualified` keep `scheme://authority` on every
  * listed path — any code that round-trips paths through string
  * handling must preserve the authority or reads break loudly
  * (registered in [[TestSpark]] via `spark.hadoop.fs.mocks.impl`).
  * Storage maps to the local tree by dropping the authority.
  */
class MockAuthFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  private var uri: java.net.URI = java.net.URI.create("mocks:///")
  override def initialize(name: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    uri = java.net.URI.create(
      s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
    super.initialize(name, conf)
  }
  // the superclass constructor consults getUri before Scala field
  // initializers run — fall back to the bare scheme until initialize
  override def getUri: java.net.URI =
    if (uri == null) java.net.URI.create("mocks:///") else uri
  override def getScheme: String = "mocks"
  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(MockFs.plainStat)
  override def getFileStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus =
    MockFs.plainStat(super.getFileStatus(f))
}
