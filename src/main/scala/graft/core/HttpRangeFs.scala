package graft.core

import java.io.FileNotFoundException
import java.net.{HttpURLConnection, URI, URL}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop filesystem over plain HTTP with Range requests —
  * the reference reads indexes and parquet straight off any HTTP
  * server via byte-range GETs (reference:
  * src/formats/readers/http_reader.rs:65, `Range: bytes=from-to`);
  * this is the same capability surfaced where Spark consumes it: a
  * `FileSystem`, so parquet footers, page ranges and whole scans work
  * unchanged over `httpr://host:port/path` paths.
  *
  * Register with `spark.hadoop.fs.httpr.impl=graft.core.HttpRangeFs`
  * (TLS twin: `fs.httprs.impl=graft.core.HttpsRangeFs`; the scheme
  * names avoid colliding with Hadoop's built-in non-seekable `http`
  * filesystem). Semantics:
  *
  *   - `getFileStatus` = one HEAD (length from Content-Length; 404 →
  *     FileNotFoundException). Plain HTTP has no directory protocol,
  *     so paths must name FILES — lakes over HTTP enumerate their
  *     files explicitly, exactly like the reference's http reader.
  *   - `open().read(pos, …)` = `Range: bytes=pos-end` GETs via
  *     [[FSInputStream]]'s seek+read contract; the columnar readers'
  *     footer/page access pattern maps 1:1 onto range requests.
  *   - every mutation throws: the store is someone else's web server.
  */
class HttpRangeFs extends FileSystem {
  private var fsUri: URI = URI.create(s"$getScheme:///")

  /** Wire protocol behind the range reads. */
  protected def wireScheme: String = "http"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(
      s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
  }

  override def getUri: URI = fsUri
  override def getScheme: String = "httpr"

  private def toUrl(f: Path): URL = {
    val u = f.toUri
    val auth = Option(u.getAuthority).getOrElse(fsUri.getAuthority)
    new URL(s"$wireScheme://" + auth + u.getPath)
  }

  override def getFileStatus(f: Path): FileStatus = {
    val c = toUrl(f).openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("HEAD")
    val code = c.getResponseCode
    if (code == 404) throw new FileNotFoundException(f.toString)
    require(code / 100 == 2, s"HEAD $f -> HTTP $code")
    val len = c.getHeaderFieldLong("Content-Length", -1L)
    // a length is non-negotiable: every positioned read derives its
    // Range bound from it, and -1 would silently read as empty
    require(len >= 0,
      s"HEAD $f returned no Content-Length — range reads impossible")
    new FileStatus(len, false, 1, 1 << 16, 0L, f)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val len = getFileStatus(f).getLen
    new FSDataInputStream(new HttpRangeInputStream(toUrl(f), len))
  }

  /** A FILE path lists as itself (what a parquet scan over explicit
    * files needs); directories are not a plain-HTTP concept.
    */
  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f))

  private def ro = new UnsupportedOperationException(
    "httpr:// is a read-only filesystem")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = throw ro
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = throw ro
  override def rename(src: Path, dst: Path): Boolean = throw ro
  override def delete(f: Path, recursive: Boolean): Boolean = throw ro
  override def mkdirs(f: Path, permission: FsPermission): Boolean = throw ro
  override def setWorkingDirectory(d: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(fsUri.toString + "/")
}

/** TLS twin (`httprs://` → https GETs; the JVM's default SSL context
  * handles trust). Register as `fs.httprs.impl`.
  */
class HttpsRangeFs extends HttpRangeFs {
  override protected def wireScheme: String = "https"
  override def getScheme: String = "httprs"
}

/** Positioned reads as HTTP Range GETs. [[FSInputStream]] supplies the
  * thread-safe pread (seek + read) contract on top.
  */
private[core] class HttpRangeInputStream(url: URL, len: Long)
    extends FSInputStream {
  private var pos = 0L

  override def seek(p: Long): Unit = {
    if (p < 0 || p > len)
      throw new java.io.EOFException(s"seek($p) outside [0, $len]")
    pos = p
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    val b = new Array[Byte](1)
    val n = read(b, 0, 1)
    if (n < 0) -1 else b(0) & 0xff
  }

  override def read(buf: Array[Byte], off: Int, want: Int): Int = {
    if (pos >= len) return -1
    if (want == 0) return 0
    val end = math.min(len - 1, pos + want - 1)
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestProperty("Range", s"bytes=$pos-$end")
    val code = c.getResponseCode
    require(code == 206 || code == 200, s"GET $url [$pos-$end] -> HTTP $code")
    val in = c.getInputStream
    try {
      // a 200 (server ignored Range) still serves correctness: skip to
      // pos and read the window — slow path, never a wrong byte
      if (code == 200) {
        var toSkip = pos
        while (toSkip > 0) {
          val s = in.skip(toSkip)
          require(s > 0, s"GET $url: cannot skip to $pos")
          toSkip -= s
        }
      }
      var got = 0
      val lim = (end - pos + 1).toInt
      while (got < lim) {
        val n = in.read(buf, off + got, lim - got)
        if (n < 0) {
          require(got > 0, s"GET $url [$pos-$end]: premature EOF")
          pos += got
          return got
        }
        got += n
      }
      pos += got
      got
    } finally in.close()
  }
}
