package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1

class WarcSpec extends AnyFunSuite {

  def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  val warcRecord: String =
    "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.com/\r\n" +
      "\r\n" +
      "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html\r\n" +
      "Set-Cookie: a=1\r\n" +
      "Set-Cookie: b=2\r\n" +
      "X-Last: z\r\n" +
      "\r\n" +
      "<html>body</html>"

  test("parseHeaders joins duplicates with comma-space") {
    val h = Warc.parseHeaders("A: 1\r\nB: 2\r\nA: 3\r\nno-colon-line\r\n")
    assert(h == Map("A" -> "1, 3", "B" -> "2"))
  }

  test("parseHeaders handles bare-LF lines") {
    val h = Warc.parseHeaders("A: 1\nB: 2\n")
    assert(h == Map("A" -> "1", "B" -> "2"))
  }

  test("parseWarcResponse full record") {
    val r = Warc.parseWarcResponse(warcRecord.getBytes(ISO_8859_1))
    assert(r.warcVersion == "1.0")
    assert(r.warcHeaders("WARC-Type") == "response")
    assert(r.httpVersion == "1.1")
    assert(r.httpStatusCode == 200)
    assert(r.httpHeaders("Content-Type") == "text/html")
    assert(r.httpHeaders("Set-Cookie") == "a=1, b=2")
    // Reference quirk: the final header line before the blank separator is
    // unterminated after the substring split, so it is dropped
    // (src/web_archive_utils.cpp:281-286 breaks on no-newline).
    assert(!r.httpHeaders.contains("X-Last"))
    assert(new String(r.body, ISO_8859_1) == "<html>body</html>")
  }

  test("parseWarcResponse tolerates LF-only separators") {
    val rec = "WARC/1.1\nX: y\n\nHTTP/1.0 404\nA: b\n\nnope"
    val r = Warc.parseWarcResponse(rec.getBytes(ISO_8859_1))
    assert(r.warcVersion == "1.1")
    assert(r.httpStatusCode == 404)
    assert(r.httpVersion == "1.0")
    assert(new String(r.body, ISO_8859_1) == "nope")
  }

  test("parseWarcResponse invalid input returns empty") {
    val r = Warc.parseWarcResponse("garbage".getBytes(ISO_8859_1))
    assert(r.warcVersion == "" && r.httpStatusCode == 0)
  }

  test("gzip roundtrip") {
    val data = warcRecord.getBytes(ISO_8859_1)
    val out = Warc.decompressGzip(gzip(data))
    assert(out.isRight)
    assert(java.util.Arrays.equals(out.toOption.get, data))
    assert(Warc.decompressGzip(Array[Byte](1, 2, 3)).isLeft)
  }

  test("gzip then parse (fixture pipeline)") {
    val decompressed = Warc.decompressGzip(gzip(warcRecord.getBytes(ISO_8859_1))).toOption.get
    val r = Warc.parseWarcResponse(decompressed)
    assert(r.httpStatusCode == 200)
  }
}
