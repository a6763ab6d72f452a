package graft.source

import java.io.FileNotFoundException
import java.net.{HttpURLConnection, URL}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileStatus, Path}

/** Minimal S3-dialect filesystem for `s3a://bucket/key` reads — the
  * object-store scheme the reference inherits from its host's httpfs
  * (/root/reference/README.md:58-69 and extension_config.cmake:14-18
  * load httpfs, whose S3 support is the same ranged-GET machinery with
  * bucket/key addressing and SigV4 auth). The container has no AWS
  * connector jars and no egress, so this speaks the public S3 REST
  * object API directly on top of [[RangedHttpFileSystem]]:
  *
  *  - `s3a://bucket/key` maps to path-style `ENDPOINT/bucket/key`
  *    (the addressing every S3-compatible store accepts);
  *  - every request carries real AWS Signature V4 header auth
  *    (HMAC-SHA256 chain over the canonical request, UNSIGNED-PAYLOAD,
  *    `host;x-amz-content-sha256;x-amz-date` signed) derived from the
  *    standard config keys;
  *  - sizing is the inherited HEAD(+range-probe), data moves as
  *    bounded range GETs, and a range-less endpoint degrades to the
  *    LocalBuffer whole-object fallback — identical I/O discipline to
  *    the http(s) path, which is exactly the point: the mailbox/PST
  *    stack is scheme-agnostic, and S3ReadSpec proves the s3a scheme
  *    end-to-end against an in-JVM signature-verifying S3 stub.
  *
  * Config (standard s3a names, so a deployment that swaps in the AWS
  * connector reads the same settings):
  * `fs.s3a.endpoint`, `fs.s3a.access.key`, `fs.s3a.secret.key`,
  * region from `fs.s3a.endpoint.region` (default `us-east-1`).
  * Activate with `spark.hadoop.fs.s3a.impl=graft.source.S3LiteFileSystem`.
  */
class S3LiteFileSystem extends RangedHttpFileSystem {

  override def getScheme: String = "s3a"

  private def endpoint: String = {
    val e = getConf.get("fs.s3a.endpoint")
    require(e != null && e.nonEmpty, "fs.s3a.endpoint is required")
    e.stripSuffix("/")
  }

  private def region: String =
    Option(getConf.get("fs.s3a.endpoint.region")).getOrElse("us-east-1")

  /** s3a://bucket/key → ENDPOINT/bucket/key (path-style). */
  override protected def urlOf(f: Path): URL = {
    val u = f.toUri
    new URL(s"$endpoint/${u.getAuthority}${u.getPath}")
  }

  override protected def decorate(c: HttpURLConnection, method: String,
      f: Path): Unit = sign(c, method)

  /** SigV4-sign a request, including its query string (object reads
    * have none; ListObjectsV2 does).
    */
  private def sign(c: HttpURLConnection, method: String): Unit = {
    val access = getConf.get("fs.s3a.access.key", "")
    val secret = getConf.get("fs.s3a.secret.key", "")
    if (access.isEmpty || secret.isEmpty) return // anonymous access
    val now = java.time.Instant.now().atOffset(ZoneOffset.UTC)
    val amzDate = now.format(S3SigV4.TsFmt)
    // the Host header itself is restricted (HttpURLConnection sets it);
    // compute the exact value it will send and sign that
    val host = {
      val u = c.getURL
      if (u.getPort > 0 && u.getPort != u.getDefaultPort)
        s"${u.getHost}:${u.getPort}"
      else u.getHost
    }
    c.setRequestProperty("x-amz-date", amzDate)
    c.setRequestProperty("x-amz-content-sha256", S3SigV4.UnsignedPayload)
    val auth = S3SigV4.authorization(method, c.getURL.getPath,
      Option(c.getURL.getQuery).getOrElse(""), host, amzDate, region,
      access, secret)
    c.setRequestProperty("Authorization", auth)
  }

  // ---- object LISTing (ListObjectsV2) — the glob path ------------------
  //
  // The reference gets `read_pst_messages('s3://bucket/*.pst')` for free
  // from its host httpfs, which globs via ListObjectsV2
  // (/root/reference/README.md:58-69). Hadoop's Globber drives glob
  // resolution through getFileStatus/listStatus, so implementing those
  // two over `GET /bucket?list-type=2&prefix=...&delimiter=/` gives the
  // same capability: `s3a://bucket/dir/*.pst` enumerates, the mailbox
  // planner's per-file sidecar pass stays O(#files), and pagination
  // (`fs.s3a.paging.maximum`, AWS cap 1000) keeps a million-object
  // prefix off the driver heap one page at a time.

  private case class ListPage(contents: Seq[(String, Long)],
      prefixes: Seq[String], nextToken: Option[String])

  private def pageSize: Int =
    math.min(getConf.getInt("fs.s3a.paging.maximum", 1000), 1000)

  /** One signed ListObjectsV2 page. `delimiter=/` groups child
    * "directories" into CommonPrefixes; no delimiter lists the whole
    * subtree (the max-keys=1 directory-existence probe).
    */
  private def listPage(bucket: String, prefix: String,
      delimiter: Option[String], maxKeys: Int,
      token: Option[String]): ListPage = {
    val q = (Seq(
      "list-type" -> "2",
      "max-keys"  -> maxKeys.toString) ++
      (if (prefix.nonEmpty) Seq("prefix" -> prefix) else Nil) ++
      delimiter.map("delimiter" -> _) ++
      token.map("continuation-token" -> _))
      .map { case (k, v) =>
        s"${S3SigV4.encodeQueryValue(k)}=${S3SigV4.encodeQueryValue(v)}"
      }.mkString("&")
    val url = new URL(s"$endpoint/$bucket?$q")
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("GET")
    c.setConnectTimeout(30000)
    c.setReadTimeout(120000)
    sign(c, "GET")
    val code = c.getResponseCode
    if (code / 100 != 2) {
      c.disconnect()
      throw new java.io.IOException(
        s"HTTP $code listing s3a://$bucket/$prefix")
    }
    val in = c.getInputStream
    try {
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder().parse(in)
      def texts(tag: String, child: String): Seq[String] = {
        val nodes = doc.getElementsByTagName(tag)
        (0 until nodes.getLength).flatMap { i =>
          val kids = nodes.item(i).getChildNodes
          (0 until kids.getLength)
            .find(j => kids.item(j).getNodeName == child)
            .map(j => kids.item(j).getTextContent)
        }
      }
      def text(tag: String): Option[String] = {
        val nodes = doc.getElementsByTagName(tag)
        if (nodes.getLength == 0) None else Some(nodes.item(0).getTextContent)
      }
      val keys  = texts("Contents", "Key")
      val sizes = texts("Contents", "Size").map(_.toLong)
      val next =
        if (text("IsTruncated").contains("true")) text("NextContinuationToken")
        else None
      ListPage(keys.zip(sizes), texts("CommonPrefixes", "Prefix"), next)
    } finally { in.close(); c.disconnect() }
  }

  private def bucketOf(f: Path): String = f.toUri.getAuthority
  private def keyOf(f: Path): String =
    Option(f.toUri.getPath).getOrElse("").stripPrefix("/")

  private def qualify(p: Path): Path =
    p.makeQualified(getUri, getWorkingDirectory)

  private def dirStatus(f: Path): FileStatus =
    new FileStatus(0, true, 1, 64L * 1024 * 1024, 0L, qualify(f))

  /** Object HEAD first (a real key wins); a 404 falls through to a
    * max-keys=1 prefix probe — any key under `key/` makes `f` a
    * "directory" exactly as S3 consoles and connectors model it.
    */
  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return dirStatus(f) // bucket root
    try super.getFileStatus(f)
    catch {
      case e: FileNotFoundException =>
        val probe = listPage(bucketOf(f), key.stripSuffix("/") + "/",
          None, maxKeys = 1, None)
        if (probe.contents.nonEmpty || probe.prefixes.nonEmpty) dirStatus(f)
        else throw e
    }
  }

  /** Directory listing over paginated ListObjectsV2 with `delimiter=/`:
    * Contents → files (exact sizes, no per-object HEAD), CommonPrefixes
    * → child directories. A path that is an existing object lists as
    * itself (Hadoop contract); an unknown path throws.
    */
  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    if (key.nonEmpty) {
      try return Array(super.getFileStatus(f))
      catch { case _: FileNotFoundException => () }
    }
    val bucket = bucketOf(f)
    val prefix = if (key.isEmpty) "" else key.stripSuffix("/") + "/"
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    var token: Option[String] = None
    var first = true
    while (first || token.isDefined) {
      first = false
      val page = listPage(bucket, prefix, Some("/"), pageSize, token)
      out ++= page.contents.collect {
        case (k, size) if k != prefix => // skip a zero-byte dir marker
          new FileStatus(size, false, 1, 64L * 1024 * 1024, 0L,
            qualify(new Path(s"s3a://$bucket/$k")))
      }
      out ++= page.prefixes.map(p =>
        dirStatus(new Path(s"s3a://$bucket/${p.stripSuffix("/")}")))
      token = page.nextToken
    }
    if (out.isEmpty && key.nonEmpty)
      throw new FileNotFoundException(f.toString)
    out.toArray
  }
}

/** AWS Signature Version 4 (header auth, UNSIGNED-PAYLOAD) — the
  * published algorithm, shared by the client above and the verifying
  * stub server in S3ReadSpec. Object reads sign an empty canonical
  * query; ListObjectsV2 requests sign their query string (pairs are
  * built pre-encoded by [[S3SigV4.encodeQueryValue]], so the canonical
  * form is the raw pairs sorted — AWS's name-then-value order, which
  * whole-pair sort reproduces for the distinct-name key sets this
  * dialect uses).
  */
object S3SigV4 {

  val TsFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
  val UnsignedPayload = "UNSIGNED-PAYLOAD"
  val SignedHeaders = "host;x-amz-content-sha256;x-amz-date"

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hmac(key: Array[Byte], s: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(s.getBytes("UTF-8"))
  }

  /** RFC 3986 path encoding, preserving `/` (S3 canonical-URI rule). */
  private def encodePath(p: String): String =
    p.split("/", -1).map { seg =>
      seg.flatMap {
        case c if c.isLetterOrDigit || "-._~".contains(c) => c.toString
        case c => c.toString.getBytes("UTF-8").map("%%%02X".format(_)).mkString
      }
    }.mkString("/")

  /** RFC 3986 strict encoding for a query name or value (everything
    * but unreserved percent-encoded — the S3 canonical-query rule).
    */
  def encodeQueryValue(s: String): String =
    s.flatMap {
      case c if c.isLetterOrDigit && c < 128 => c.toString
      case c if "-._~".contains(c) => c.toString
      case c => c.toString.getBytes("UTF-8").map("%%%02X".format(_)).mkString
    }

  /** Canonical query from a raw (already percent-encoded) query
    * string: pairs sorted. Empty/null → empty.
    */
  def canonicalQuery(rawQuery: String): String =
    if (rawQuery == null || rawQuery.isEmpty) ""
    else rawQuery.split("&").toSeq.sorted.mkString("&")

  def authorization(method: String, path: String, host: String,
      amzDate: String, region: String, access: String,
      secret: String): String =
    authorization(method, path, "", host, amzDate, region, access, secret)

  def authorization(method: String, path: String, rawQuery: String,
      host: String, amzDate: String, region: String, access: String,
      secret: String): String = {
    val date  = amzDate.take(8)
    val scope = s"$date/$region/s3/aws4_request"
    val canonical = Seq(
      method,
      encodePath(path),
      canonicalQuery(rawQuery),
      s"host:$host",
      s"x-amz-content-sha256:$UnsignedPayload",
      s"x-amz-date:$amzDate",
      "", // end of canonical headers
      SignedHeaders,
      UnsignedPayload
    ).mkString("\n")
    val stringToSign = Seq(
      "AWS4-HMAC-SHA256", amzDate, scope, sha256Hex(canonical)
    ).mkString("\n")
    val kSigning =
      hmac(hmac(hmac(hmac(("AWS4" + secret).getBytes("UTF-8"), date),
        region), "s3"), "aws4_request")
    val signature = hmac(kSigning, stringToSign)
      .map("%02x".format(_)).mkString
    s"AWS4-HMAC-SHA256 Credential=$access/$scope, " +
      s"SignedHeaders=$SignedHeaders, Signature=$signature"
  }
}
