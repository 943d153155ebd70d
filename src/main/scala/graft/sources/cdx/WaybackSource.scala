package graft.sources.cdx

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{CdxUrls, Codecs, Http, Warc}

/** Internet Archive (Wayback Machine) CDX connector.
  *
  * Spark-native re-expression of the reference's `wayback_machine()` table
  * function (/root/reference/src/internet_archive.cpp): DSv2 TableProvider
  * with filter/column/limit/TopN/offset pushdown instead of DuckDB
  * pushdown_complex_filter + OptimizerExtension hooks.
  *
  * Usage: `spark.read.format("wayback").option("url", "example.com").load()`
  *
  * Pushdown matrix (reference :806-1318):
  *  - url =        → `url=<v>` (matchType exact), consumed
  *  - url LIKE 'x%'/'%x' (Catalyst StartsWith/EndsWith) → `url=x*` / `url=*x`
  *  - urlkey/mimetype/statuscode prefix/suffix/contains/= /!= /IN →
  *    `&filter=[!]<field>:<regex>`, consumed
  *  - timestamp </>/between → `&from=`/`&to=` (CDX prefix ts), consumed
  *    (wayback TRUSTS the remote — filters removed, :1196,1264)
  *  - year =,<,<=,>,>= → from/to with ±1 adjustment (:1272-1311)
  *  - LIMIT → `&limit=N` (node elimination ⇒ fully pushed)
  *  - ORDER BY timestamp DESC LIMIT n → `fastLatest=true&limit=-n`, sort
  *    kept (isPartiallyPushed) (:1331-1403)
  *  - OFFSET → `&offset=N` (:1448-1469)
  *  - DISTINCT ON → collapse, via graft.plans.CollapseRule setting the
  *    `collapse` option
  *
  * Debug mode (`debug=true`): extra `cdx_url` column; when the pruned
  * schema needs nothing but `cdx_url` (or only collapse-covered fields) no
  * network request is made (reference :510-558) — the golden-output test
  * surface.
  *
  * Scale design: the CDX API is a single remote endpoint; by default one
  * InputPartition mirrors the reference. `partitions=N` shards a large
  * scan into N offset-paged partitions (`limit=ceil(max/N)&offset=i*chunk`)
  * so a 1000-executor cluster can pull a big result set in parallel; page
  * bodies are fetched lazily per row batch on executors with the
  * reference's retry policy — never buffered on the driver.
  */
class WaybackSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wayback"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    CdxOptions.validate("wayback_machine", options, CdxOptions.waybackAllowed)
    WaybackTable.schema(options.getBoolean("debug", false))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WaybackTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object WaybackTable {
  val responseType: StructType = StructType(Seq(
    StructField("body", BinaryType), StructField("error", StringType)))

  def schema(debug: Boolean): StructType = {
    val base = StructType(Seq(
      StructField("url", StringType),
      StructField("timestamp", TimestampType),
      StructField("urlkey", StringType),
      StructField("mimetype", StringType),
      StructField("statuscode", IntegerType),
      StructField("digest", StringType),
      StructField("length", LongType),
      StructField("response", responseType),
      StructField("year", IntegerType),
      StructField("month", IntegerType)))
    if (debug) base.add(StructField("cdx_url", StringType)) else base
  }

  /** Spark column → CDX `fl=` field (url→original); year/month derive from
    * timestamp; response/cdx_url need no CDX field.
    */
  def columnToCdxField(col: String): Option[String] = col match {
    case "url"                  => Some("original")
    case "timestamp"            => Some("timestamp")
    case "urlkey"               => Some("urlkey")
    case "mimetype"             => Some("mimetype")
    case "statuscode"           => Some("statuscode")
    case "digest"               => Some("digest")
    case "length"               => Some("length")
    case "year" | "month"       => Some("timestamp")
    case _                      => None
  }
}

class WaybackTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val debug = options.getBoolean("debug", false)
  override def name(): String = "wayback_machine"
  override def schema(): StructType = WaybackTable.schema(debug)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new WaybackScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** Fully-resolved request spec shipped to executors. */
case class WaybackRequest(
    cdxEndpoint: String,
    pageEndpoint: String,
    urlFilter: String,
    matchType: String,
    fieldsNeeded: Seq[String],
    cdxFilters: Seq[String],
    fromDate: String,
    toDate: String,
    maxResults: Long,
    collapses: Seq[String],
    fastLatest: Boolean,
    offset: Long,
    debug: Boolean,
    cdxUrlOnly: Boolean,
    fetchResponse: Boolean,
    timeoutSeconds: Int,
    prunedColumns: Seq[String]) extends Serializable {

  def cdxUrl: String = CdxUrls.buildWaybackUrl(cdxEndpoint, urlFilter, matchType,
    fieldsNeeded, cdxFilters, fromDate, toDate, maxResults, collapses, fastLatest, offset)
}

class WaybackScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownOffset {

  private val debug = options.getBoolean("debug", false)

  // ---- mutable pushdown state (mirrors the reference's bind_data) ----
  private var urlFilter: String =
    Option(options.get("pushed_url")) // CdxFilterRule injection wins
      .orElse(Option(options.get("url_like")).map(_.replace('%', '*')))
      .orElse(Option(options.get("url"))).getOrElse("*")
  private var matchType: String = Option(options.get("match_type")).getOrElse("exact")
  // filters injected by graft.plans.CdxFilterRule (shapes v1 Filters
  // can't express: generic NOT LIKE, regexes) arrive as an option
  private var cdxFilters: Vector[String] =
    Option(options.get("extra_filters")).toVector.flatMap(_.split(";")).filter(_.nonEmpty)
  private var fromDate: String = Option(options.get("from")).getOrElse("")
  private var toDate: String = Option(options.get("to")).getOrElse("")
  private var maxResults: Long = options.getLong("max_results", 100L)
  private var collapses: Vector[String] =
    Option(options.get("collapse")).toVector.flatMap(_.split(";")).filter(_.nonEmpty)
  private var fastLatest = false
  private var offsetVal: Long = 0L
  private var pushed: Vector[Filter] = Vector.empty
  private var prunedSchema: StructType = WaybackTable.schema(debug)

  private val cdxRegexColumns = Set("urlkey", "mimetype", "statuscode")

  // When CdxFilterRule already claimed the url= slot (it deleted a complex
  // LIKE from the plan), v1 url predicates must stay residual rather than
  // overwrite the pushed pattern — Spark then re-evaluates them locally.
  private val urlSlotFrozen = options.containsKey("pushed_url")

  // ---- filter pushdown ----------------------------------------------
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // IsNotNull(year|month) is decided AFTER the range filters: a pushed
    // year/timestamp bound guarantees parseable timestamps (non-null
    // year/month), so the bookkeeping IsNotNull that Catalyst attaches to
    // a year comparison can be consumed; standalone `year IS NOT NULL`
    // without a range stays residual (year CAN be null on malformed
    // remote timestamps).
    val (yearMonthNotNull, rest) = filters.partition {
      case IsNotNull("year") | IsNotNull("month") => true
      case _ => false
    }
    val residual = rest.filterNot(tryConsume)
    val ymResidual =
      if (fromDate.nonEmpty || toDate.nonEmpty) {
        pushed ++= yearMonthNotNull
        Array.empty[Filter]
      } else yearMonthNotNull
    residual ++ ymResidual
  }

  override def pushedFilters(): Array[Filter] = pushed.toArray

  /** Returns true when the filter was consumed (removed from the plan). */
  private def tryConsume(f: Filter): Boolean = {
    val consumed = f match {
      // ---- url --------------------------------------------------------
      case EqualTo("url", _) | StringStartsWith("url", _) | StringEndsWith("url", _)
          if urlSlotFrozen => false
      case EqualTo("url", v: String) =>
        urlFilter = v; matchType = "exact"; true
      case StringStartsWith("url", v) =>
        urlFilter = v + "*"; true
      case StringEndsWith("url", v) =>
        urlFilter = "*" + v; true
      case Not(StringContains("url", v)) =>
        cdxFilters :+= ("!original:.*" + backslashEscape(v) + ".*"); true
      case Not(StringStartsWith("url", v)) =>
        cdxFilters :+= ("!original:" + Codecs.likeToRegex(v + "%")); true

      // ---- urlkey / mimetype / statuscode regex-able ------------------
      case StringStartsWith(c, v) if cdxRegexColumns(c) =>
        cdxFilters :+= (c + ":^" + v + ".*"); true
      case StringEndsWith(c, v) if cdxRegexColumns(c) =>
        cdxFilters :+= (c + ":.*" + v + "$"); true
      case StringContains(c, v) if cdxRegexColumns(c) =>
        cdxFilters :+= (c + ":.*" + Codecs.escapeRegexWayback(v) + ".*"); true
      case Not(StringContains(c, v)) if c == "urlkey" =>
        cdxFilters :+= ("!urlkey:.*" + backslashEscape(v) + ".*"); true
      case Not(StringStartsWith(c, v)) if c == "urlkey" =>
        cdxFilters :+= ("!urlkey:^" + v + ".*"); true
      case Not(StringEndsWith(c, v)) if c == "urlkey" =>
        cdxFilters :+= ("!urlkey:.*" + v + "$"); true
      case EqualTo("statuscode", v) =>
        cdxFilters :+= ("statuscode:" + intOf(v)); true
      case Not(EqualTo("statuscode", v)) =>
        cdxFilters :+= ("!statuscode:" + intOf(v)); true
      case EqualTo("mimetype", v: String) =>
        cdxFilters :+= ("mimetype:" + v); true
      case Not(EqualTo("mimetype", v: String)) =>
        cdxFilters :+= ("!mimetype:" + v); true
      case In(c, vs) if cdxRegexColumns(c) && vs.nonEmpty =>
        val parts =
          if (c == "statuscode") vs.map(intOf)
          else vs.collect { case s: String => Codecs.escapeRegexWayback(s) }
        if (parts.length == vs.length) {
          cdxFilters :+= (c + ":(" + parts.mkString("|") + ")"); true
        } else false

      // ---- timestamp: trusted remote, filters REMOVED -----------------
      case GreaterThan("timestamp", v) =>
        fromDate = Codecs.toCdxTimestamp(v.toString); true
      case GreaterThanOrEqual("timestamp", v) =>
        fromDate = Codecs.toCdxTimestamp(v.toString); true
      case LessThan("timestamp", v) =>
        toDate = Codecs.toCdxTimestamp(v.toString); true
      case LessThanOrEqual("timestamp", v) =>
        toDate = Codecs.toCdxTimestamp(v.toString); true

      // ---- year → from/to prefix mapping ------------------------------
      case GreaterThan("year", v) => fromDate = (intOf(v) + 1).toString; true
      case GreaterThanOrEqual("year", v) => fromDate = intOf(v).toString; true
      case LessThan("year", v) => toDate = (intOf(v) - 1).toString; true
      case LessThanOrEqual("year", v) => toDate = intOf(v).toString; true
      case EqualTo("year", v) =>
        fromDate = intOf(v).toString; toDate = intOf(v).toString; true

      case And(l, r) =>
        // consume only if both sides consume (reference flattens ANDs)
        val lc = tryConsume(l); val rc = tryConsume(r)
        lc && rc

      // Catalyst adds IsNotNull alongside every pushed comparison; the
      // connector never produces NULLs for scalar CDX columns (year/month
      // only when the remote timestamp is malformed, which a pushed
      // from/to range already excludes), so consume it — leaving it
      // residual would force the column into the scan and defeat the
      // no-network cdx_url-only path and limit pushdown.
      // year/month CAN be null (malformed remote timestamps) — their
      // IsNotNull stays residual
      case IsNotNull(c) if c != "response" && c != "year" && c != "month" => true

      case _ => false
    }
    if (consumed) pushed :+= f
    consumed
  }

  private def intOf(v: Any): Int = v match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case other => other.toString.toInt
  }

  /** The reference's NOT-contains escape variant (backslash, not %5C):
    * src/internet_archive.cpp:1136-1146.
    */
  private def backslashEscape(v: String): String = {
    val sb = new StringBuilder
    v.foreach {
      case c @ ('.' | '(' | ')' | '[' | ']' | '{' | '}' | '+' | '?' | '^' | '$' | '|' | '\\' | '*') =>
        sb += '\\'; sb += c
      case c => sb += c
    }
    sb.result()
  }

  // ---- limit / topN / offset ----------------------------------------
  override def pushLimit(limit: Int): Boolean = {
    maxResults = limit.toLong
    true // fully pushed: reference deletes the LIMIT node
  }

  override def isPartiallyPushed: Boolean = fastLatest

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    // ORDER BY timestamp DESC → fastLatest (sort kept in plan)
    val isTsDesc = orders.length >= 1 && {
      val o = orders.head
      o.direction() == SortDirection.DESCENDING && (o.expression() match {
        case nr: NamedReference => nr.fieldNames().mkString(".").contains("timestamp")
        case _ => false
      })
    }
    if (isTsDesc) {
      maxResults = limit.toLong
      fastLatest = true
      true // isPartiallyPushed=true ⇒ Spark keeps the sort (API returns
           // latest-N but unordered — reference :1399-1402)
    } else {
      // regular TopN: push the limit into the remote request but report
      // "not pushed" so Spark keeps sort+limit (reference :1405-1411)
      maxResults = limit.toLong
      false
    }
  }

  override def pushOffset(offset: Int): Boolean = {
    offsetVal = offset.toLong
    true
  }

  // ---- column pruning -----------------------------------------------
  override def pruneColumns(requiredSchema: StructType): Unit = {
    prunedSchema = requiredSchema
  }

  override def build(): Scan = {
    val cols = prunedSchema.fieldNames.toSeq
    val fetchResponse = cols.contains("response")
    // Page fetches need timestamp+original to build the /web/<ts>id_/<url>
    // URL — force them into fl= when response is projected (the reference
    // only does the analogous fix for Common Crawl's WARC fields,
    // common_crawl_index.cpp:500-511; without this a
    // `SELECT response FROM ...` yields only "Missing timestamp or URL").
    val fieldsNeeded = (cols.flatMap(WaybackTable.columnToCdxField) ++
      (if (fetchResponse) Seq("timestamp", "original") else Nil)).distinct

    // cdx_url-only detection incl. the collapse-covered variant
    // (reference :510-558)
    var cdxUrlOnly = debug && fieldsNeeded.isEmpty && !fetchResponse
    if (!cdxUrlOnly && debug && collapses.nonEmpty && !fetchResponse) {
      val collapseBases = collapses.map(c => c.split(":").head).toSet
      if (fieldsNeeded.forall(collapseBases.contains)) cdxUrlOnly = true
    }

    // Spark pushes the COMBINED limit (limit+offset) before pushOffset;
    // the remote applies offset first, so the effective limit is the
    // difference (reference emits limit=<n>&offset=<o>).
    val effectiveMax =
      if (offsetVal > 0 && maxResults > offsetVal) maxResults - offsetVal else maxResults

    val req = WaybackRequest(
      cdxEndpoint = Option(options.get("cdx_endpoint")).getOrElse(CdxUrls.WaybackEndpoint),
      pageEndpoint = Option(options.get("page_endpoint")).getOrElse("https://web.archive.org/web"),
      urlFilter = urlFilter, matchType = matchType,
      fieldsNeeded = fieldsNeeded, cdxFilters = cdxFilters,
      fromDate = fromDate, toDate = toDate, maxResults = effectiveMax,
      collapses = collapses, fastLatest = fastLatest, offset = offsetVal,
      debug = debug, cdxUrlOnly = cdxUrlOnly, fetchResponse = fetchResponse,
      timeoutSeconds = options.getInt("timeout", 180),
      prunedColumns = cols)
    new WaybackScan(req, prunedSchema, options.getInt("partitions", 1))
  }
}

class WaybackScan(req: WaybackRequest, prunedSchema: StructType, numPartitions: Int)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String = s"wayback_machine ${req.cdxUrl}"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(req.maxResults)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (req.urlFilter == "*" || req.urlFilter.isEmpty)
      throw new IllegalArgumentException(
        "wayback_machine() requires a URL filter. Use WHERE url = 'example.com', WHERE url " +
          "LIKE 'example.com/%', or WHERE url LIKE '%.example.com' for subdomains")
    if (numPartitions <= 1 || req.cdxUrlOnly) Array(WaybackPartition(req))
    else {
      // Offset-paged sharding for cluster-parallel pulls of large scans.
      // Shard limits must sum EXACTLY to the pushed limit (the LIMIT node
      // was deleted — nothing downstream re-trims).
      val chunk = (req.maxResults + numPartitions - 1) / numPartitions
      (0 until numPartitions).flatMap { i =>
        val thisChunk = math.min(chunk, req.maxResults - i * chunk)
        if (thisChunk <= 0) None
        else Some(WaybackPartition(req.copy(maxResults = thisChunk, offset = req.offset + i * chunk)))
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = new WaybackReaderFactory()
}

case class WaybackPartition(req: WaybackRequest) extends InputPartition

class WaybackReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WaybackPartitionReader(partition.asInstanceOf[WaybackPartition].req)
}

/** Executor-side reader: one CDX fetch at open, then row-at-a-time
  * emission with lazy batched page fetches (batch of 64, parallel futures
  * — the Spark analogue of the reference's per-chunk std::async prefetch,
  * src/internet_archive.cpp:582-605).
  */
class WaybackPartitionReader(req: WaybackRequest) extends PartitionReader[InternalRow] {

  case class Rec(urlkey: String, timestamp: String, original: String, mimetype: String,
                 statuscode: Int, digest: String, length: Long)

  private val startNanos = System.nanoTime()
  private lazy val records: IndexedSeq[Rec] = fetchRecords()
  private var pos = -1
  private var responses: Map[Int, Http.FetchResult] = Map.empty

  private def fetchRecords(): IndexedSeq[Rec] = {
    if (req.cdxUrlOnly) {
      // single dummy record; cdx_url computed without network
      return IndexedSeq(Rec("", "202501010000", "", "", 0, "", 0L))
    }
    val resp = Http.get(req.cdxUrl, timeoutSeconds = 60)
    if (resp.status >= 400)
      throw new java.io.IOException(s"Error querying Internet Archive CDX API: HTTP ${resp.status}")
    val text = Codecs.sanitizeUtf8(resp.body)
    val fieldsInOrder = CdxUrls.waybackFieldsInOrder(req.fieldsNeeded)
    text.split("\n").iterator.filter(_.nonEmpty).flatMap { line =>
      val values = line.trim.split("\\s+").toIndexedSeq
      if (values.length < fieldsInOrder.length || (fieldsInOrder.isEmpty && values.forall(_.isEmpty))) None
      else {
        var r = Rec("", "", "", "", 0, "", 0L)
        fieldsInOrder.zipWithIndex.foreach { case (f, i) =>
          val v = values(i)
          f match {
            case "urlkey"     => r = r.copy(urlkey = v)
            case "timestamp"  => r = r.copy(timestamp = v)
            case "original"   => r = r.copy(original = v)
            case "mimetype"   => r = r.copy(mimetype = v)
            case "statuscode" => r = r.copy(statuscode =
              if (v.isEmpty || v == "-") 0 else try v.toInt catch { case _: Exception => 0 })
            case "digest"     => r = r.copy(digest = v)
            case "length"     => r = r.copy(length =
              if (v.isEmpty || v == "-") 0L else try v.toLong catch { case _: Exception => 0L })
            case _ =>
          }
        }
        Some(r)
      }
    }.toIndexedSeq
  }

  private val PrefetchBatch = 64

  private def ensureResponse(idx: Int): Http.FetchResult = {
    responses.getOrElse(idx, {
      val end = math.min(idx + PrefetchBatch, records.length)
      val fetched = (idx until end).par2map { i =>
        val rec = records(i)
        val r =
          if (rec.timestamp.isEmpty || rec.original.isEmpty)
            Http.FetchResult(Array.emptyByteArray, "Missing timestamp or URL")
          else Http.fetchWithRetry(
            s"${req.pageEndpoint}/${rec.timestamp}id_/${rec.original}",
            startNanos = startNanos, timeoutSeconds = req.timeoutSeconds)
        i -> r
      }
      responses ++= fetched
      responses(idx)
    })
  }

  // tiny parallel-map helper over an index range
  implicit private class RangeOps(r: Range) {
    def par2map[T](f: Int => (Int, T)): Seq[(Int, T)] = {
      import java.util.concurrent.CompletableFuture
      val futs = r.map(i => CompletableFuture.supplyAsync(() => f(i)))
      futs.map(_.join())
    }
  }

  override def next(): Boolean = { pos += 1; pos < records.length }

  override def get(): InternalRow = {
    val rec = records(pos)
    val values: Array[Any] = req.prunedColumns.map {
      case "url"       => UTF8String.fromString(Codecs.sanitizeUtf8(rec.original))
      case "timestamp" => java.lang.Long.valueOf(Codecs.parseCdxTimestampMicros(rec.timestamp))
      case "urlkey"    => UTF8String.fromString(Codecs.sanitizeUtf8(rec.urlkey))
      case "mimetype"  => UTF8String.fromString(Codecs.sanitizeUtf8(rec.mimetype))
      case "statuscode" => java.lang.Integer.valueOf(rec.statuscode)
      case "digest"    => UTF8String.fromString(Codecs.sanitizeUtf8(rec.digest))
      case "length"    => java.lang.Long.valueOf(rec.length)
      case "response" =>
        if (req.fetchResponse && !req.cdxUrlOnly) {
          val fr = ensureResponse(pos)
          val err = if (fr.error.isEmpty) null else UTF8String.fromString(fr.error)
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](fr.body, err))
        } else null
      case "year" =>
        // malformed (non-numeric) remote timestamps yield NULL, like the
        // '-' guards on statuscode/length — never a task failure
        if (rec.timestamp.length >= 4)
          try java.lang.Integer.valueOf(rec.timestamp.substring(0, 4).toInt)
          catch { case _: NumberFormatException => null }
        else null
      case "month" =>
        if (rec.timestamp.length >= 6)
          try java.lang.Integer.valueOf(rec.timestamp.substring(4, 6).toInt)
          catch { case _: NumberFormatException => null }
        else null
      case "cdx_url" => UTF8String.fromString(req.cdxUrl)
      case _ => null
    }.toArray
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  override def close(): Unit = {}
}
