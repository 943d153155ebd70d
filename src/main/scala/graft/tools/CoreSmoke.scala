package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._

/** Smoke driver: exercises the graft.core layer from a live Spark session,
  * including on executor threads (serialization check). Run with:
  * `sbt "runMain graft.tools.CoreSmoke"`.
  */
object CoreSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-core-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. Codecs on executors via a UDF over real testdata
    val likeToRegexUdf = udf((s: String) => Codecs.likeToRegex(s))
    val cdxTsUdf = udf((s: String) => Codecs.toCdxTimestamp(s))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.withColumn("rx", likeToRegexUdf(concat(lit("%"), col("lang"), lit(".com"))))
      .where(col("rx").endsWith(".com$")).count()
    println(s"[smoke] codecs-on-executors rows=$n")

    // 2. CDX URL generation (pure, driver side)
    val wb = CdxUrls.buildWaybackUrl(CdxUrls.WaybackEndpoint, "example.com", "exact",
      Seq("original", "timestamp"), Seq("statuscode:200"), "2020", "", 10, Nil, false, 0)
    println(s"[smoke] wayback url: $wb")
    val cc = CdxUrls.buildCommonCrawlUrl(CdxUrls.CommonCrawlIndexEndpoint, "CC-MAIN-2024-46",
      "*.example.com/*", Seq("url", "statuscode"), Nil, 100, "", "")
    println(s"[smoke] cc url: $cc")

    // 3. WARC fixture parse inside a Spark job (mapPartitions on executors)
    val warcText = "WARC/1.0\r\nWARC-Type: response\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html\r\nX: y\r\n\r\n<html>ok</html>"
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(warcText.getBytes("ISO-8859-1")); gz.close()
    val gzBytes = bos.toByteArray
    val parsed = spark.sparkContext.parallelize(Seq(gzBytes), 2).map { bytes =>
      Warc.decompressGzip(bytes) match {
        case Right(d) =>
          val r = Warc.parseWarcResponse(d)
          s"status=${r.httpStatusCode} ct=${r.httpHeaders.getOrElse("Content-Type", "?")} body=${new String(r.body)}"
        case Left(e) => e
      }
    }.collect()
    println(s"[smoke] warc-on-executors: ${parsed.mkString(" | ")}")

    // 4. D1 JSON parse + affinity-derived Spark schema
    val qr = D1Client.parseQueryResponse(
      """{"success":true,"result":[{"results":[{"id":7,"name":"x","ok":true}],"meta":{"rows_read":1}}]}""")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", Codecs.sqliteAffinity("INTEGER")),
      org.apache.spark.sql.types.StructField("name", Codecs.sqliteAffinity("TEXT"))))
    println(s"[smoke] d1 rows=${qr.rows} cols=${qr.columnOrder} schema=${schema.simpleString}")

    // 5. collinfo range resolution
    val cache = new CollInfo.Cache("unused", fetcher = _ =>
      """[{"id":"CC-MAIN-2025-47","name":"n","from":"2025-11-06T20:07:18","to":"2025-11-19T12:34:13"}]""")
    println(s"[smoke] latest crawl=${cache.latestCrawlId()}")

    println("[smoke] OK")
    spark.stop()
    sys.exit(0)
  }
}
