package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CollInfoSpec extends AnyFunSuite {

  val json: String =
    """[
      |{"id":"CC-MAIN-2025-47","name":"November 2025 Index","from":"2025-11-06T20:07:18","to":"2025-11-19T12:34:13"},
      |{"id":"CC-MAIN-2025-43","name":"October 2025 Index","from":"2025-10-09T00:00:00","to":"2025-10-22T00:00:00"},
      |{"id":"CC-MAIN-2024-46","name":"November 2024 Index","from":"2024-11-01T00:00:00","to":"2024-11-14T00:00:00"}
      |]""".stripMargin

  def micros(s: String): Long = CollInfo.parseIso8601Micros(s)

  test("parse + latest is first entry") {
    val cache = new CollInfo.Cache("unused", fetcher = _ => json)
    assert(cache.latestCrawlId() == "CC-MAIN-2025-47")
    assert(cache.crawlInfos().size == 3)
  }

  test("timestamp range overlap") {
    val cache = new CollInfo.Cache("unused", fetcher = _ => json)
    // Range covering Oct-Nov 2025 matches two crawls
    val ids = cache.crawlIdsForRange(micros("2025-10-15T00:00:00"), micros("2025-11-10T00:00:00"))
    assert(ids == Seq("CC-MAIN-2025-47", "CC-MAIN-2025-43"))
    // Unset upper bound
    val ids2 = cache.crawlIdsForRange(micros("2025-11-01T00:00:00"), 0L)
    assert(ids2 == Seq("CC-MAIN-2025-47"))
    // Unset lower bound
    val ids3 = cache.crawlIdsForRange(0L, micros("2024-12-01T00:00:00"))
    assert(ids3 == Seq("CC-MAIN-2024-46"))
  }

  test("fetcher called once within TTL") {
    var calls = 0
    val cache = new CollInfo.Cache("unused", fetcher = { _ => calls += 1; json })
    cache.latestCrawlId(); cache.crawlInfos(); cache.crawlIdsForRange(0, 0)
    assert(calls == 1)
  }
}
