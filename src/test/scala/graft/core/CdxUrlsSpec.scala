package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden URL-generation cases ported from the reference's pushdown tests
  * (/root/reference/test/sql/internet_archive_pushdown.test,
  * URL_GENERATION_TESTS.md) — the de-facto golden-output surface.
  */
class CdxUrlsSpec extends AnyFunSuite {

  test("wayback basic: url equality + limit") {
    val url = CdxUrls.buildWaybackUrl(CdxUrls.WaybackEndpoint, "example.com", "exact",
      Seq("original", "timestamp"), Nil, "", "", 5, Nil, fastLatest = false, 0)
    assert(url.startsWith("https://web.archive.org/cdx/search/cdx?url=example.com&output=csv"))
    assert(url.contains("&fl=timestamp,original"))
    assert(url.contains("&limit=5"))
    assert(!url.contains("matchType"))
  }

  test("wayback fl order is canonical regardless of input order") {
    val url = CdxUrls.buildWaybackUrl(CdxUrls.WaybackEndpoint, "example.com", "exact",
      Seq("length", "original", "urlkey"), Nil, "", "", 100, Nil, fastLatest = false, 0)
    assert(url.contains("&fl=urlkey,original,length"))
  }

  test("wayback fastLatest negative limit") {
    val url = CdxUrls.buildWaybackUrl(CdxUrls.WaybackEndpoint, "example.com", "exact",
      Seq("timestamp"), Nil, "", "", 10, Nil, fastLatest = true, 0)
    assert(url.contains("&fastLatest=true&limit=-10"))
  }

  test("wayback filters, collapse, offset, from/to") {
    val url = CdxUrls.buildWaybackUrl(CdxUrls.WaybackEndpoint, "example.com", "exact",
      Seq("timestamp"), Seq("statuscode:200", "!mimetype:text/html"),
      "2020", "2023", 100, Seq("timestamp:8"), fastLatest = false, 7)
    assert(url.contains("&from=2020"))
    assert(url.contains("&to=2023"))
    assert(url.contains("&limit=100&offset=7"))
    assert(url.contains("&filter=statuscode:200&filter=!mimetype:text/html"))
    assert(url.endsWith("&collapse=timestamp:8"))
  }

  test("common crawl URL with field mapping") {
    val url = CdxUrls.buildCommonCrawlUrl(CdxUrls.CommonCrawlIndexEndpoint,
      "CC-MAIN-2024-46", "*.example.com/*", Seq("url", "mimetype", "statuscode"),
      Seq("=status:200"), 100, "", "")
    assert(url == "https://index.commoncrawl.org/CC-MAIN-2024-46-index?url=*.example.com/*" +
      "&output=json&fl=url,mime,status&limit=100&filter==status:200")
  }

  test("common crawl from/to") {
    val url = CdxUrls.buildCommonCrawlUrl(CdxUrls.CommonCrawlIndexEndpoint,
      "CC-MAIN-2024-46", "example.com/*", Seq("url"), Nil, 50, "20240101", "202406")
    assert(url.contains("&from=20240101&to=202406"))
  }
}
