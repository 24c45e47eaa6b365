package graft.delta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}

/** Minimal AWS Signature V4 HTTP client over `java.net.http` — the one
  * request signer behind BOTH wire-level backends ([[S3HttpLogStore]],
  * service `s3`; [[DynamoDbHttpLockBackend]], service `dynamodb`). No
  * SDK, no added dependencies: canonical request → string-to-sign → HMAC
  * chain per the published SigV4 spec. `host` is computed into the
  * signature but never set explicitly (the JDK client forbids overriding
  * it and sends the same value itself).
  *
  * Transient-failure policy (what the replaced SDK clients do for free):
  * every request carries a hard per-request timeout (a stalled endpoint
  * must never wedge the commit or lock thread — the rename lease would
  * expire underneath it), and 5xx responses (S3 `503 SlowDown`, internal
  * errors) plus request-layer IOExceptions retry up to [[maxAttempts]]
  * with exponential backoff, RE-SIGNING each attempt (a replayed
  * x-amz-date outside the endpoint's clock skew window is rejected).
  * Replay is safe for every request this client carries: S3 ops are
  * idempotent full-content PUT/GET/DELETE/Copy, and DynamoDB ops are
  * endpoint-side conditional writes — an ambiguous failure whose first
  * attempt actually landed makes the retry's condition miss, which the
  * lock protocol already treats as "lost the race" (lease expiry
  * restores liveness). */
private[delta] final class AwsSigV4Http(endpoint: String, region: String,
                                        service: String, accessKey: String,
                                        secretKey: String,
                                        requestTimeout: java.time.Duration =
                                          java.time.Duration.ofSeconds(60),
                                        maxAttempts: Int = 4,
                                        backoffBaseMs: Long = 100L) {

  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  private val endpointUri = URI.create(endpoint)
  private val hostHeader = {
    val p = endpointUri.getPort
    if (p == -1) endpointUri.getHost else s"${endpointUri.getHost}:$p"
  }
  private val amzDateFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def sha256Hex(b: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(b))
  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** RFC 3986 strict encode (AWS canonical form): unreserved chars bare,
    * everything else %XX; '/' preserved only for URI paths. */
  def enc(s: String, keepSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c) ||
          (keepSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Sign and send, retrying transient failures (see class doc).
    * `canonicalUri` must be the ALREADY-ENCODED absolute path ("/" for
    * service roots). */
  def send(method: String, canonicalUri: String,
           query: Seq[(String, String)] = Nil,
           payload: Array[Byte] = Array.emptyByteArray,
           extraHeaders: Seq[(String, String)] = Nil)
      : HttpResponse[Array[Byte]] = {
    var attempt = 0
    var last: Either[java.io.IOException, HttpResponse[Array[Byte]]] = null
    while (attempt < maxAttempts) {
      if (attempt > 0)
        Thread.sleep(backoffBaseMs << (attempt - 1)) // 100/200/400 ms
      attempt += 1
      last =
        try {
          val r = sendOnce(method, canonicalUri, query, payload, extraHeaders)
          if (r.statusCode() < 500) return r
          Right(r) // 5xx: transient endpoint trouble — back off and re-sign
        } catch {
          case e: java.io.IOException => Left(e) // connect reset / timeout
        }
    }
    last.fold(throw _, identity) // exhausted: surface the final attempt
  }

  private def sendOnce(method: String, canonicalUri: String,
                       query: Seq[(String, String)],
                       payload: Array[Byte],
                       extraHeaders: Seq[(String, String)])
      : HttpResponse[Array[Byte]] = {
    val now = ZonedDateTime.now(ZoneOffset.UTC)
    val amzDate = amzDateFmt.format(now)
    val date = amzDate.substring(0, 8)
    val canonicalQuery = query.map { case (k, v) =>
        (enc(k, keepSlash = false), enc(v, keepSlash = false)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val payloadHash = sha256Hex(payload)
    val headers: Seq[(String, String)] = (Seq(
      "host" -> hostHeader,
      "x-amz-content-sha256" -> payloadHash,
      "x-amz-date" -> amzDate) ++
      extraHeaders.map { case (k, v) => (k.toLowerCase, v) }).sortBy(_._1)
    val signedHeaderNames = headers.map(_._1).mkString(";")
    val canonicalRequest = Seq(method, canonicalUri, canonicalQuery,
      headers.map { case (k, v) => s"$k:${v.trim}" }.mkString("", "\n", "\n"),
      signedHeaderNames, payloadHash).mkString("\n")
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(StandardCharsets.UTF_8))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      ("AWS4" + secretKey).getBytes(StandardCharsets.UTF_8),
      date), region), service), "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    val auth = s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaderNames, Signature=$signature"
    val url = endpoint + canonicalUri +
      (if (canonicalQuery.isEmpty) "" else "?" + canonicalQuery)
    var b = HttpRequest.newBuilder(URI.create(url))
      .timeout(requestTimeout)
      .header("Authorization", auth)
    headers.filterNot(_._1 == "host").foreach { case (k, v) => b = b.header(k, v) }
    b = method match {
      case "GET" => b.GET()
      case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofByteArray(payload))
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofByteArray(payload))
      case "DELETE" => b.DELETE()
    }
    http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
  }
}
