package graft.source

import java.net.{HttpURLConnection, URL}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path

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
      f: Path): Unit = {
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
    val auth = S3SigV4.authorization(method, c.getURL.getPath, host,
      amzDate, region, access, secret)
    c.setRequestProperty("Authorization", auth)
  }
}

/** AWS Signature Version 4 (header auth, UNSIGNED-PAYLOAD) — the
  * published algorithm, shared by the client above and the verifying
  * stub server in S3ReadSpec. Query strings are not used by this
  * client, so the canonical query is always empty.
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

  def authorization(method: String, path: String, host: String,
      amzDate: String, region: String, access: String,
      secret: String): String = {
    val date  = amzDate.take(8)
    val scope = s"$date/$region/s3/aws4_request"
    val canonical = Seq(
      method,
      encodePath(path),
      "", // canonical query (none)
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
