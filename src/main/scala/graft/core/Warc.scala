package graft.core

import java.nio.charset.StandardCharsets

/** WARC record parsing + gzip member decompression.
  *
  * Reference: /root/reference/src/web_archive_utils.cpp
  *  - ParseHeaders:      :274-315 (": " separator, duplicates joined ", ")
  *  - ParseWARCResponse: :317-419
  *  - DecompressGzip:    :225-268 (zlib inflateInit2(15+16))
  */
object Warc {

  /** Parsed WARC record: warc-layer metadata + embedded HTTP response. */
  final case class WarcResponse(
      warcVersion: String = "",
      warcHeaders: Map[String, String] = Map.empty,
      httpVersion: String = "",
      httpStatusCode: Int = 0,
      httpHeaders: Map[String, String] = Map.empty,
      body: Array[Byte] = Array.emptyByteArray,
      error: String = "")

  /** Decompress one (or more concatenated) gzip member(s). Errors are
    * reported in-band as an `[Error: ...]` string, like the reference.
    */
  def decompressGzip(data: Array[Byte]): Either[String, Array[Byte]] = {
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(data))
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](32768)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      Right(out.toByteArray)
    } catch {
      case e: Exception => Left(s"[Error: Gzip decompression failed: ${e.getMessage}]")
    }
  }

  /** Parse an HTTP/WARC header block. Lines split on CRLF or LF; only
    * `": "`-separated lines contribute; duplicate keys concatenate with
    * `", "` (multi-value headers).
    */
  def parseHeaders(headerText: String): Map[String, String] = {
    var headers = scala.collection.immutable.ListMap.empty[String, String]
    var pos = 0
    var done = false
    while (pos < headerText.length && !done) {
      var lineEnd = headerText.indexOf("\r\n", pos)
      if (lineEnd < 0) {
        lineEnd = headerText.indexOf('\n', pos)
        if (lineEnd < 0) done = true
      }
      if (!done) {
        val line = headerText.substring(pos, lineEnd)
        val colon = line.indexOf(": ")
        if (colon >= 0) {
          val key = line.substring(0, colon)
          val value = line.substring(colon + 2)
          headers = headers.updatedWith(key) {
            case Some(prev) => Some(prev + ", " + value)
            case None       => Some(value)
          }
        }
        pos = lineEnd + 1
        if (pos < headerText.length && headerText.charAt(pos) == '\n') pos += 1
      }
    }
    headers
  }

  // returns (index, newlineSize) of first \r\n\r\n else \n\n, else (-1, 0);
  // operates on the single ISO-8859-1 view built by the caller (the WARC
  // payload is materialized exactly once per record)
  private def findDouble(text: String, from: Int): (Int, Int) = {
    val i4 = text.indexOf("\r\n\r\n", from)
    if (i4 >= 0) (i4, 4)
    else {
      val i2 = text.indexOf("\n\n", from)
      if (i2 >= 0) (i2, 2) else (-1, 0)
    }
  }

  /** Parse a decompressed WARC record: WARC version line + WARC headers,
    * then HTTP status line + HTTP headers, then body (raw bytes).
    */
  def parseWarcResponse(data: Array[Byte]): WarcResponse = {
    val text = new String(data, StandardCharsets.ISO_8859_1)
    val (warcHeadersEnd, nlSize) = findDouble(text, 0)
    if (warcHeadersEnd < 0) return WarcResponse()

    val warcSection = text.substring(0, warcHeadersEnd)
    var warcVersion = ""
    var warcHeaders = Map.empty[String, String]
    var firstLineEnd = warcSection.indexOf("\r\n")
    if (firstLineEnd < 0) firstLineEnd = warcSection.indexOf('\n')
    if (firstLineEnd >= 0) {
      val versionLine = warcSection.substring(0, firstLineEnd)
      if (versionLine.startsWith("WARC/")) warcVersion = versionLine.substring(5)
      var hStart = firstLineEnd + 1
      if (hStart < warcSection.length && warcSection.charAt(hStart) == '\n') hStart += 1
      warcHeaders = parseHeaders(warcSection.substring(hStart))
    }

    val httpStart = warcHeadersEnd + nlSize
    val (httpHeadersEnd, httpNlSize) = findDouble(text, httpStart)
    if (httpHeadersEnd < 0)
      return WarcResponse(warcVersion, warcHeaders)

    val httpSection = text.substring(httpStart, httpHeadersEnd)
    var httpVersion = ""
    var statusCode = 0
    var httpHeaders = Map.empty[String, String]
    var httpFirstLineEnd = httpSection.indexOf("\r\n")
    if (httpFirstLineEnd < 0) httpFirstLineEnd = httpSection.indexOf('\n')
    if (httpFirstLineEnd >= 0) {
      val statusLine = httpSection.substring(0, httpFirstLineEnd)
      val space1 = statusLine.indexOf(' ')
      if (space1 >= 0 && statusLine.startsWith("HTTP/")) {
        httpVersion = statusLine.substring(5, space1)
        val space2 = statusLine.indexOf(' ', space1 + 1)
        val statusStr =
          if (space2 >= 0) statusLine.substring(space1 + 1, space2)
          else statusLine.substring(space1 + 1)
        statusCode = try statusStr.toInt catch { case _: Exception => 0 }
      }
      var hStart = httpFirstLineEnd + 1
      if (hStart < httpSection.length && httpSection.charAt(hStart) == '\n') hStart += 1
      httpHeaders = parseHeaders(httpSection.substring(hStart))
    }

    val body = java.util.Arrays.copyOfRange(data, httpHeadersEnd + httpNlSize, data.length)
    WarcResponse(warcVersion, warcHeaders, httpVersion, statusCode, httpHeaders, body)
  }
}
