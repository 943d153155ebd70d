package graft.sources.cdx

import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** Named-parameter validation, mirroring the reference's binder errors for
  * unknown parameters (test/sql/common_crawl_errors.test:7-17 — "Invalid
  * named parameter"). Spark-internal keys (path/paths) and rule-injected
  * keys are always allowed.
  */
object CdxOptions {

  private val internal = Set("path", "paths", "extra_filters", "pushed_url")

  val waybackAllowed: Set[String] = internal ++ Set(
    "url", "url_like", "match_type", "max_results", "collapse", "debug",
    "timeout", "from", "to", "cdx_endpoint", "page_endpoint", "partitions")

  val ccAllowed: Set[String] = internal ++ Set(
    "url", "url_like", "crawl", "crawls", "max_results", "debug", "timeout",
    "index_endpoint", "data_endpoint", "collinfo_endpoint", "partitions")

  def validate(fn: String, options: CaseInsensitiveStringMap, allowed: Set[String]): Unit = {
    options.keySet().asScala.foreach { k =>
      if (!allowed.contains(k.toLowerCase))
        throw new IllegalArgumentException(s"Invalid named parameter '$k' for $fn")
    }
  }
}
