package graft.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP layer with the reference's retry/backoff/timeout policy.
  *
  * Reference: /root/reference/src/common_crawl_index.cpp:208-304 (retry
  * loop: 5 attempts, exponential backoff 100→1600 ms, retry only on
  * 503/504/connection/timeout, wall-clock `timeout` budget),
  * /root/reference/src/d1_http.cpp:122-226 (30 s D1 request timeout,
  * Bearer auth), /root/reference/src/r2_http.cpp:50-86 (60 s timeout).
  *
  * Error strings are observable behavior (they surface in the
  * `response.error` struct field) and follow the reference's formats.
  */
object Http {

  final case class FetchResult(body: Array[Byte], error: String) {
    def isError: Boolean = error.nonEmpty
  }

  final case class Response(status: Int, body: Array[Byte]) {
    def bodyString: String = new String(body, java.nio.charset.StandardCharsets.UTF_8)
  }

  lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  /** Percent-encode the characters java.net.URI rejects but that appear
    * raw in CDX filter expressions (curl, used by the reference, accepts
    * them as-is; the canonical URL string we display stays raw).
    */
  def encodeUrl(url: String): String =
    url.replace(" ", "%20").replace("|", "%7C").replace("^", "%5E")
      .replace("{", "%7B").replace("}", "%7D").replace("\"", "%22")
      .replace("<", "%3C").replace(">", "%3E").replace("`", "%60")
      .replace("\\", "%5C")

  /** Single GET, optional Range header and bearer token. */
  def get(
      url: String,
      headers: Map[String, String] = Map.empty,
      timeoutSeconds: Int = 30): Response = {
    val b = HttpRequest.newBuilder(URI.create(encodeUrl(url)))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    Response(resp.statusCode(), resp.body())
  }

  /** Single PUT with a raw body (S3-style object PUT / CopyObject when
    * paired with an `x-amz-copy-source` header). Used by the r2
    * filesystem's optional write surface only.
    */
  def put(
      url: String,
      body: Array[Byte],
      headers: Map[String, String] = Map.empty,
      timeoutSeconds: Int = 60): Response = {
    val b = HttpRequest.newBuilder(URI.create(encodeUrl(url)))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .PUT(HttpRequest.BodyPublishers.ofByteArray(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    Response(resp.statusCode(), resp.body())
  }

  /** Single PUT streaming a local file as the body — the large-object
    * path of the r2 write surface: the writer spools to local disk and
    * publishes without ever holding the object on the heap (a
    * whole-object byte-array PUT caps files at ~2 GB and holds every
    * in-flight part file in memory — s3a solves the same problem with a
    * disk spool / multipart).
    *
    * The timeout SCALES WITH THE FILE: a fixed cap would fail exactly
    * the multi-GB uploads the disk spool exists for (5 GB over a
    * 15 MB/s uplink is ~340 s — past the old fixed 300 s). The default
    * allows 1 MiB/s — floor-of-modest-uplink, not a liveness bound —
    * floored at `timeoutSeconds` for small files; callers with a real
    * throughput model can still pass an explicit budget.
    */
  def putFile(
      url: String,
      file: java.nio.file.Path,
      headers: Map[String, String] = Map.empty,
      timeoutSeconds: Int = 300): Response = {
    val sized = math.max(timeoutSeconds.toLong,
      try java.nio.file.Files.size(file) >> 20 catch { case _: java.io.IOException => 0L })
    val b = HttpRequest.newBuilder(URI.create(encodeUrl(url)))
      .timeout(Duration.ofSeconds(sized))
      .PUT(HttpRequest.BodyPublishers.ofFile(file))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    Response(resp.statusCode(), resp.body())
  }

  /** Single DELETE (S3-style object delete). */
  def delete(
      url: String,
      headers: Map[String, String] = Map.empty,
      timeoutSeconds: Int = 60): Response = {
    val b = HttpRequest.newBuilder(URI.create(encodeUrl(url)))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .DELETE()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    Response(resp.statusCode(), resp.body())
  }

  /** Single POST with a JSON body. */
  def postJson(
      url: String,
      json: String,
      headers: Map[String, String] = Map.empty,
      timeoutSeconds: Int = 30): Response = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    Response(resp.statusCode(), resp.body())
  }

  private def isRetryable(msg: String): Boolean =
    msg.contains("503") || msg.contains("504") ||
      msg.contains("Service Unavailable") || msg.contains("Gateway Timeout") ||
      msg.contains("connection") || msg.contains("timeout")

  /** Ranged fetch with the reference's retry policy: 5 attempts, backoff
    * 100/200/400/800/1600 ms, wall-clock budget in seconds measured from
    * `startNanos`, retry only on 503/504/connection/timeout. Errors are
    * in-band (`FetchResult.error`), never thrown — a failed body fetch must
    * not fail the whole scan.
    */
  def fetchWithRetry(
      url: String,
      rangeStart: Long = -1L,
      rangeLen: Long = -1L,
      startNanos: Long,
      timeoutSeconds: Int): FetchResult = {
    val maxRetries = 5
    var retryDelayMs = 100L
    var lastError = ""
    var attempt = 0
    while (attempt < maxRetries) {
      val elapsedSec = (System.nanoTime() - startNanos) / 1000000000L
      if (elapsedSec >= timeoutSeconds)
        return FetchResult(Array.emptyByteArray,
          s"Timeout after ${elapsedSec}s (limit: ${timeoutSeconds}s)")
      try {
        if (attempt > 0) {
          Thread.sleep(retryDelayMs)
          retryDelayMs *= 2
        }
        val hdrs =
          if (rangeStart >= 0 && rangeLen > 0)
            Map("Range" -> s"bytes=$rangeStart-${rangeStart + rangeLen - 1}")
          else Map.empty[String, String]
        val resp = get(url, hdrs, timeoutSeconds = 60)
        if (resp.status == 503 || resp.status == 504) {
          lastError = s"HTTP ${resp.status}"
          // retryable — fall through to next attempt
        } else if (resp.status >= 400) {
          return FetchResult(Array.emptyByteArray, s"HTTP ${resp.status}")
        } else if (resp.body.isEmpty) {
          lastError = "Failed to read data"
        } else {
          return FetchResult(resp.body, "")
        }
      } catch {
        case e: Exception =>
          lastError = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
          if (!isRetryable(lastError) && attempt == 0)
            return FetchResult(Array.emptyByteArray, lastError)
      }
      attempt += 1
    }
    FetchResult(Array.emptyByteArray, s"Failed after $maxRetries retries: $lastError")
  }
}
