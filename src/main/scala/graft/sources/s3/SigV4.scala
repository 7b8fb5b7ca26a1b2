package graft.sources.s3

import java.nio.charset.StandardCharsets

/** AWS Signature Version 4 for the S3 REST API, implemented from the public
  * AWS signing documentation (canonical request -> string-to-sign -> derived
  * signing key -> signature). Shared by [[S3HttpFileSystem]] (signing) and
  * `graft.tools.MiniS3` (verification); the verifier recanonicalizes from
  * the raw received request, so the two sides only share the HMAC math and
  * the canonical string layout mandated by the public spec.
  */
object SigV4 {
  val EmptyPayloadHash: String =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
  val UnsignedPayload = "UNSIGNED-PAYLOAD"

  def hex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  def sha256Hex(b: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** AWS URI-encoding: unreserved characters (A-Za-z0-9 - _ . ~) pass
    * through, everything else is %XX (uppercase hex, UTF-8 bytes), space is
    * %20 (never '+'). `encodeSlash = false` for object-key paths.
    */
  def uriEncode(s: String, encodeSlash: Boolean = true): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') ||
          c == '-' || c == '_' || c == '.' || c == '~' ||
          (c == '/' && !encodeSlash)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  private def pctDecode(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  /** Canonical query string per the AWS rules: split the wire query into
    * (key, value) pairs (bare flags like `uploads` get an empty value),
    * percent-DECODE the wire form, re-encode with [[uriEncode]] (%20 for
    * space, unreserved '~'), and sort by key name then value — NOT by the
    * concatenated `k=v` string, which misorders pairs where one key is a
    * prefix of another (`tag` vs `tagging`). AWS recanonicalizes received
    * requests exactly this way, so signing any other form fails on real
    * S3/MinIO even when a self-consistent verifier accepts it.
    */
  def canonicalQuery(rawQuery: String): String =
    if (rawQuery == null || rawQuery.isEmpty) ""
    else rawQuery.split("&").toSeq.filter(_.nonEmpty)
      .map { kv =>
        val eq = kv.indexOf('=')
        val k = if (eq < 0) kv else kv.substring(0, eq)
        val v = if (eq < 0) "" else kv.substring(eq + 1)
        (uriEncode(pctDecode(k)), uriEncode(pctDecode(v)))
      }
      .sorted // tuple order: key name first, then value
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")

  /** The canonical request per the public algorithm. `pathEnc` is the
    * percent-encoded URI path as sent on the wire (S3 rule: no double
    * encoding); `headers` must be lowercase-keyed and pre-sorted.
    */
  def canonicalRequest(method: String, pathEnc: String, rawQuery: String,
      headers: collection.SortedMap[String, String], payloadHash: String): String = {
    val hdrs = headers.map { case (k, v) => s"$k:${v.trim}\n" }.mkString
    val signed = headers.keys.mkString(";")
    s"$method\n$pathEnc\n${canonicalQuery(rawQuery)}\n$hdrs\n$signed\n$payloadHash"
  }

  def stringToSign(amzDate: String, scope: String, canonical: String): String =
    s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n" +
      sha256Hex(canonical.getBytes(StandardCharsets.UTF_8))

  def signingKey(secretKey: String, dateStamp: String, region: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secretKey).getBytes(StandardCharsets.UTF_8), dateStamp)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, "s3")
    hmac(kService, "aws4_request")
  }

  /** Full Authorization header value for a request. */
  def authorization(method: String, pathEnc: String, rawQuery: String,
      headers: collection.SortedMap[String, String], payloadHash: String,
      amzDate: String, region: String, accessKey: String, secretKey: String): String = {
    val dateStamp = amzDate.take(8)
    val scope = s"$dateStamp/$region/s3/aws4_request"
    val cr = canonicalRequest(method, pathEnc, rawQuery, headers, payloadHash)
    val sig = hex(hmac(signingKey(secretKey, dateStamp, region),
      stringToSign(amzDate, scope, cr)))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=${headers.keys.mkString(";")}, Signature=$sig"
  }

  def amzDateNow(): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
    fmt.format(java.time.Instant.now())
  }
}
