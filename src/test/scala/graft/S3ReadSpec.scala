package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.Collections

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.source.S3SigV4
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end `s3a://` reads against an in-JVM S3-dialect stub — the
  * object-store scheme the reference's host httpfs provides
  * (/root/reference/README.md:58-69; the sandbox has no egress and no
  * AWS connector jars, so an in-JVM stub speaking the S3 GET/HEAD
  * subset is the honest way to exercise it).
  *
  * The stub is NOT a pushover: it verifies real AWS SigV4 header
  * signatures (recomputed server-side with the shared secret — a
  * wrong secret key is a 403), serves HEAD with Content-Length +
  * Accept-Ranges + ETag, honors Range with 206/Content-Range, and
  * answers missing keys with S3-shaped XML 404s. The assertions mirror
  * RangedHttpReadSpec: identical results to local reads, ranged (not
  * whole-object) data movement, failed auth fails the scan.
  */
class S3ReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  case class Req(method: String, path: String, range: Option[String],
      served: Long, authOk: Boolean)

  private val reqs = Collections.synchronizedList(
    new java.util.ArrayList[Req]())
  private var server: HttpServer = _
  private var port: Int = 0

  private val Access = "GRAFTTESTACCESSKEY"
  private val Secret = "graft-test-secret-key-not-a-real-one"
  private val Region = "us-east-1"

  private val objects = Map(
    "/test-bucket/pst/unittest.pst" -> "/root/reference/test/unittest.pst",
    "/test-bucket/mbx/synth_a.mbx"  -> "fixtures/mailbox/synth_a.mbx",
    "/test-bucket/mbx/synth_a.mbx.idx" -> "fixtures/mailbox/synth_a.mbx.idx"
  )

  private val RangeSpec = """bytes=(\d+)-(\d*)""".r

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("s3-read-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.hadoop.fs.s3a.impl", "graft.source.S3LiteFileSystem")
    .config("spark.hadoop.fs.s3a.access.key", Access)
    .config("spark.hadoop.fs.s3a.secret.key", Secret)
    .config("spark.hadoop.fs.s3a.endpoint.region", Region)
    .getOrCreate()

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path   = ex.getRequestURI.getPath
        val method = ex.getRequestMethod
        val range  = Option(ex.getRequestHeaders.getFirst("Range"))
        val authOk = verify(ex)
        if (!authOk) {
          reqs.add(Req(method, path, range, 0, authOk = false))
          val err = ("<?xml version=\"1.0\"?><Error>" +
            "<Code>SignatureDoesNotMatch</Code></Error>").getBytes
          ex.sendResponseHeaders(403, err.length.toLong)
          ex.getResponseBody.write(err)
        } else objects.get(path) match {
          case None =>
            reqs.add(Req(method, path, range, 0, authOk = true))
            val err = ("<?xml version=\"1.0\"?><Error>" +
              "<Code>NoSuchKey</Code></Error>").getBytes
            if (method == "HEAD") ex.sendResponseHeaders(404, -1)
            else {
              ex.sendResponseHeaders(404, err.length.toLong)
              ex.getResponseBody.write(err)
            }
          case Some(f) =>
            val bytes = Files.readAllBytes(Paths.get(f))
            ex.getResponseHeaders.set("Accept-Ranges", "bytes")
            ex.getResponseHeaders.set("ETag",
              "\"" + Integer.toHexString(java.util.Arrays.hashCode(bytes)) + "\"")
            ex.getResponseHeaders.set("x-amz-request-id", "GRAFTSTUB")
            method match {
              case "HEAD" =>
                reqs.add(Req("HEAD", path, range, 0, authOk = true))
                ex.getResponseHeaders.set("Content-Length",
                  bytes.length.toString)
                ex.sendResponseHeaders(200, -1)
              case _ =>
                range match {
                  case Some(RangeSpec(a, b)) =>
                    val from = a.toLong.toInt
                    val to = (if (b.isEmpty) bytes.length - 1L
                              else math.min(b.toLong, bytes.length - 1L)).toInt
                    val n = math.max(to - from + 1, 0)
                    reqs.add(Req("GET", path, range, n.toLong, authOk = true))
                    ex.getResponseHeaders.set("Content-Range",
                      s"bytes $from-$to/${bytes.length}")
                    ex.sendResponseHeaders(206, n.toLong)
                    ex.getResponseBody.write(bytes, from, n)
                  case _ =>
                    reqs.add(Req("GET", path, range, bytes.length.toLong,
                      authOk = true))
                    ex.sendResponseHeaders(200, bytes.length.toLong)
                    ex.getResponseBody.write(bytes)
                }
            }
        }
        ex.close()
      }
    })
    server.start()
    port = server.getAddress.getPort
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3a.endpoint", s"http://127.0.0.1:$port")
  }

  /** Recompute the SigV4 signature with the shared secret; a request
    * is authorized iff its Authorization header matches exactly.
    */
  private def verify(ex: HttpExchange): Boolean = {
    val h = ex.getRequestHeaders
    (for {
      auth    <- Option(h.getFirst("Authorization"))
      amzDate <- Option(h.getFirst("x-amz-date"))
      host    <- Option(h.getFirst("Host"))
    } yield {
      val expect = S3SigV4.authorization(ex.getRequestMethod,
        ex.getRequestURI.getPath, host, amzDate, Region, Access, Secret)
      auth == expect
    }).getOrElse(false)
  }

  override def afterAll(): Unit = {
    spark.stop()
    if (server != null) server.stop(0)
  }

  private def snapshot(): Seq[Req] = reqs.synchronized(reqs.asScala.toVector)
  private def reset(): Unit = reqs.synchronized(reqs.clear())

  private def read(mode: String, path: String): DataFrame =
    spark.read.format("mailbox").option("mode", mode).load(path)

  test("PST contacts via s3a equal the local read, over signed ranged GETs") {
    reset()
    val url = "s3a://test-bucket/pst/unittest.pst"
    val remote = read("contacts", url)
      .select("given_name", "surname").orderBy("given_name")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val local = read("contacts", "/root/reference/test/unittest.pst")
      .select("given_name", "surname").orderBy("given_name")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(remote.nonEmpty && remote.sameElements(local))

    val rs = snapshot().filter(_.path == "/test-bucket/pst/unittest.pst")
    assert(rs.nonEmpty && rs.forall(_.authOk), "every request SigV4-signed")
    assert(rs.exists(_.method == "HEAD"), "expected HEAD-based sizing")
    val gets = rs.filter(_.method == "GET")
    assert(gets.nonEmpty && gets.forall(_.range.isDefined),
      s"every S3 data GET must be ranged: ${gets.filter(_.range.isEmpty)}")
  }

  test("rows carry the user's s3a URL") {
    val url = "s3a://test-bucket/pst/unittest.pst"
    val paths = read("folders", url).select("pst_path")
      .distinct().collect().map(_.getString(0))
    assert(paths.toSeq === Seq(url))
  }

  test("mbx + sidecar via s3a: counts match local, sidecar read is ranged") {
    reset()
    val url = "s3a://test-bucket/mbx/synth_a.mbx"
    val remote = read("messages", url)
    val local  = read("messages", "fixtures/mailbox/synth_a.mbx")
    assert(remote.count() === local.count())
    assert(remote.count() > 0)
    val idx = snapshot()
      .filter(r => r.path == "/test-bucket/mbx/synth_a.mbx.idx" &&
        r.method == "GET")
    assert(idx.nonEmpty && idx.forall(_.range.isDefined),
      "sidecar planning must ride ranged GETs")
  }

  test("a wrong secret key fails the read (403, not silent emptiness)") {
    // isolated conf (cache-busted) so the shared session's credentials
    // are untouched; a bad signature makes sizing unusable (-1) and
    // the first data read surfaces the 403 as an IOException
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("fs.s3a.secret.key", "not-the-secret")
    conf.set("fs.s3a.impl.disable.cache", "true")
    val p  = new org.apache.hadoop.fs.Path("s3a://test-bucket/pst/unittest.pst")
    val fs = p.getFileSystem(conf)
    assert(fs.getFileStatus(p).getLen === -1L,
      "403 HEAD/probe must yield no usable length, not a fake size")
    val e = intercept[java.io.IOException] { fs.open(p).read() }
    assert(e.getMessage.contains("403"), s"expected HTTP 403, got: $e")
  }

  test("missing key fails the scan cleanly") {
    val e = intercept[Exception] {
      read("messages", "s3a://test-bucket/mbx/nope.mbx").count()
    }
    assert(e != null)
  }
}
