package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP(S) read path: parquet + index search over a real HTTP
  * server speaking byte ranges — the reference's http_reader flow
  * (range GETs against any web server), here exercised end to end
  * through Spark: footer reads, page-range fetches, full scans and
  * the index→search materialization all ride `httpr://` paths.
  */
class HttpLakeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Minimal static file server with HEAD + Range GET (206) support. */
  private def serve(dir: String): (HttpServer, Int) = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val f = Paths.get(dir, ex.getRequestURI.getPath)
        if (!Files.isRegularFile(f)) {
          ex.sendResponseHeaders(404, -1); ex.close(); return
        }
        val len = Files.size(f)
        val range = Option(ex.getRequestHeaders.getFirst("Range"))
        ex.getRequestMethod match {
          case "HEAD" =>
            ex.getResponseHeaders.set("Content-Length", len.toString)
            // sendResponseHeaders(code, -1) means "no body" for HEAD;
            // the Content-Length header above is what the client reads
            ex.sendResponseHeaders(200, -1)
            ex.close()
          case _ =>
            val bytes = Files.readAllBytes(f)
            range match {
              case Some(r) =>
                val Array(lo, hi) =
                  r.stripPrefix("bytes=").split("-").map(_.toLong)
                val slice = java.util.Arrays.copyOfRange(
                  bytes, lo.toInt, (hi + 1).toInt)
                ex.getResponseHeaders.set("Content-Range",
                  s"bytes $lo-$hi/$len")
                ex.sendResponseHeaders(206, slice.length.toLong)
                ex.getResponseBody.write(slice)
              case None =>
                ex.sendResponseHeaders(200, len)
                ex.getResponseBody.write(bytes)
            }
            ex.close()
        }
      }
    })
    srv.start()
    (srv, srv.getAddress.getPort)
  }

  test("index -> search lifecycle over range-request HTTP") {
    val dir = TestSpark.tmpDir("httplake")
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = TestSpark.tmpDir(s"stage-http-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      Files.move(
        Paths.get(graft.core.Lake.listFiles(staging).head),
        Paths.get(s"$dir/$name.parquet"))
    }
    write("a", Seq(1L -> "needle in the haystack", 2L -> "plain row"))
    write("b", Seq(3L -> "nothing here", 4L -> "still nothing"))
    write("c", Seq(5L -> "another needle row", 6L -> "filler"))
    val (srv, port) = serve(dir)
    try {
      val files = Seq("a", "b", "c")
        .map(n => s"httpr://127.0.0.1:$port/$n.parquet")

      // plain parquet read over HTTP ranges (footer + pages)
      val df = spark.read.parquet(files: _*)
      assert(df.count() == 6)
      assert(df.filter(col("text").contains("needle")).count() == 2)

      // full index lifecycle: build (reads the lake over HTTP), then
      // search — candidate resolution on the local index, row
      // materialization back over HTTP range reads
      val idx = TestSpark.tmpDir("httplake-idx")
      api.NgramKind.build(spark, files, "text", idx)
      val hits = api.NgramKind.searchLake(spark, Seq(idx), Seq.empty,
        "text", "needle", 10)
      assert(hits.select("doc_id").collect().map(_.getLong(0)).toSet ==
        Set(1L, 5L))

      // selective fetch really happened: the searched row groups come
      // from the covered http files, not a local copy
      val meta = spark.read.parquet(s"$idx/meta")
      val metaFiles = meta.select("file_path").distinct()
        .collect().map(_.getString(0)).toSet
      assert(metaFiles.forall(_.startsWith("httpr://")), metaFiles.toString)
    } finally srv.stop(0)
  }

  test("http filesystem contract: 404s, lengths, reads") {
    val dir = TestSpark.tmpDir("httpfs")
    Files.writeString(Paths.get(s"$dir/hello.txt"), "hello, ranges!")
    val (srv, port) = serve(dir)
    try {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(
        s"httpr://127.0.0.1:$port/hello.txt")
      val fs = p.getFileSystem(conf)
      assert(fs.isInstanceOf[graft.core.HttpRangeFs])
      assert(fs.getFileStatus(p).getLen == 14L)
      intercept[java.io.FileNotFoundException] {
        fs.getFileStatus(new org.apache.hadoop.fs.Path(
          s"httpr://127.0.0.1:$port/absent.txt"))
      }
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](6)
        in.readFully(7L, buf) // positioned read -> Range: bytes=7-12
        assert(new String(buf, "UTF-8") == "ranges")
        in.seek(0L)
        assert(in.read() == 'h'.toInt)
      } finally in.close()
    } finally srv.stop(0)
  }
}
