package graft.core

/** CDX URL construction — byte-for-byte the reference's URL generation,
  * which is its de-facto golden-output surface (tier-2 tests assert these
  * strings via the `debug := true` `cdx_url` column).
  *
  * Reference:
  *  - wayback:      /root/reference/src/internet_archive.cpp:84-144
  *    (BuildArchiveOrgCDXUrl)
  *  - common crawl: /root/reference/src/common_crawl_index.cpp:96-117
  *    (URL assembly inside QueryCDXAPI)
  */
object CdxUrls {

  val WaybackEndpoint = "https://web.archive.org/cdx/search/cdx"
  val CommonCrawlIndexEndpoint = "https://index.commoncrawl.org"
  val CommonCrawlDataEndpoint = "https://data.commoncrawl.org"

  /** Wayback CDX field order for the `fl=` list. */
  private val waybackOrderedFields =
    Seq("urlkey", "timestamp", "original", "mimetype", "statuscode", "digest", "length")

  /** Build the Internet Archive CDX URL. `fieldsNeeded` is the projected
    * CDX field set (any order); emitted in canonical order.
    */
  def buildWaybackUrl(
      endpoint: String,
      urlPattern: String,
      matchType: String,
      fieldsNeeded: Seq[String],
      cdxFilters: Seq[String],
      fromDate: String,
      toDate: String,
      maxResults: Long,
      collapses: Seq[String],
      fastLatest: Boolean,
      offset: Long): String = {
    val needed = fieldsNeeded.toSet
    val fieldList = waybackOrderedFields.filter(needed.contains).mkString(",")
    val sb = new StringBuilder(endpoint)
    sb ++= "?url="
    sb ++= urlPattern
    sb ++= "&output=csv"
    if (fieldList.nonEmpty) { sb ++= "&fl="; sb ++= fieldList }
    if (matchType != "exact") { sb ++= "&matchType="; sb ++= matchType }
    if (fromDate.nonEmpty) { sb ++= "&from="; sb ++= fromDate }
    if (toDate.nonEmpty) { sb ++= "&to="; sb ++= toDate }
    if (fastLatest) { sb ++= "&fastLatest=true&limit=-"; sb ++= maxResults.toString }
    else { sb ++= "&limit="; sb ++= maxResults.toString }
    if (offset > 0) { sb ++= "&offset="; sb ++= offset.toString }
    cdxFilters.foreach { f => sb ++= "&filter="; sb ++= f }
    collapses.foreach { c => sb ++= "&collapse="; sb ++= c }
    sb.result()
  }

  /** Wayback field order helper used by the CSV parser (fields arrive in
    * `fl=` order).
    */
  def waybackFieldsInOrder(fieldsNeeded: Seq[String]): Seq[String] = {
    val needed = fieldsNeeded.toSet
    waybackOrderedFields.filter(needed.contains)
  }

  /** Map a Common Crawl column name to the CDX API field name
    * (mimetype→mime, statuscode→status).
    */
  def ccColumnToField(col: String): String = col match {
    case "mimetype"   => "mime"
    case "statuscode" => "status"
    case other        => other
  }

  /** Build the Common Crawl CDX index URL for one crawl shard.
    *
    * `page` ≥ 0 appends pywb's documented `&page=` pagination parameter
    * (the CC index is pywb's zipnum server: pages are enumerated with
    * `&showNumPages=true` and addressed 0-based with `&page=k`). The IA
    * CDX server's `offset=` parameter is NOT supported by the CC index,
    * so CC sharding must be page-based.
    */
  def buildCommonCrawlUrl(
      endpoint: String,
      indexName: String,
      urlPattern: String,
      fieldsNeeded: Seq[String],
      cdxFilters: Seq[String],
      maxResults: Long,
      fromCdxTs: String,
      toCdxTs: String,
      page: Int = -1): String = {
    val fieldList = fieldsNeeded.map(ccColumnToField).mkString(",")
    val sb = new StringBuilder(endpoint)
    sb += '/'
    sb ++= indexName
    sb ++= "-index?url="
    sb ++= urlPattern
    sb ++= "&output=json&fl="
    sb ++= fieldList
    sb ++= "&limit="
    sb ++= maxResults.toString
    if (page >= 0) { sb ++= "&page="; sb ++= page.toString }
    if (fromCdxTs.nonEmpty) { sb ++= "&from="; sb ++= fromCdxTs }
    if (toCdxTs.nonEmpty) { sb ++= "&to="; sb ++= toCdxTs }
    cdxFilters.foreach { f => sb ++= "&filter="; sb ++= f }
    sb.result()
  }
}
