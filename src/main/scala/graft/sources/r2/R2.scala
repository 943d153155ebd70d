package graft.sources.r2

import java.util

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Http, Secrets}

/** R2 SQL passthrough surface (reference src/r2_functions.cpp,
  * src/r2_http.cpp): POST `{"query": sql}` to
  * `api.sql.cloudflarestorage.com/api/v1/accounts/<acct>/r2-sql/query/
  * <bucket>`, 60 s timeout; every function returns 1 row × 1 VARCHAR
  * column holding the raw JSON response:
  *  - r2_sql_query     → column `response`
  *  - r2_sql_databases → `namespace` (SHOW DATABASES)
  *  - r2_sql_tables    → `table_name` (SHOW TABLES [IN ns])
  *  - r2_sql_describe  → `schema` (DESCRIBE t)
  *
  * This passthrough is the parity surface. The NATIVE R2 table path is
  * [[R2FileSystem]]: `spark.read.parquet("r2://bucket/prefix")` scans
  * R2-hosted parquet through Spark's own source with full pushdown and
  * byte-ranged reads (Iceberg-on-R2 would layer iceberg-spark-runtime's
  * REST catalog on the same filesystem).
  */
object R2 {

  case class Config(accountId: String, apiToken: String, bucket: String,
                    apiBase: String = "https://api.sql.cloudflarestorage.com") {
    def queryUrl: String = s"$apiBase/api/v1/accounts/$accountId/r2-sql/query/$bucket"
  }

  private val mapper = new ObjectMapper()

  def query(config: Config, sql: String): String = {
    val body = mapper.createObjectNode()
    body.put("query", sql)
    val resp = Http.postJson(config.queryUrl, mapper.writeValueAsString(body),
      Map("Authorization" -> s"Bearer ${config.apiToken}"), timeoutSeconds = 60)
    if (resp.status < 200 || resp.status >= 300)
      throw new java.io.IOException(
        s"HTTP request failed with status ${resp.status}: ${resp.bodyString}")
    val raw = resp.bodyString
    if (!raw.contains("\"results\""))
      throw new java.io.IOException("R2 SQL query failed: Invalid response format: missing 'results' field")
    raw
  }

  private def configOf(spark: SparkSession, secretName: String, bucket: String,
                       apiBase: String): Config = {
    val conf: String => Option[String] = k => spark.conf.getOption(k)
    val s = Secrets.lookup("r2_sql", secretName, conf).getOrElse(
      throw new IllegalArgumentException(s"r2_sql secret '$secretName' not found"))
    Config(s.accountId, s.apiToken, bucket, apiBase)
  }

  private def oneRow(spark: SparkSession, colName: String, value: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(value)), 1),
      StructType(Seq(StructField(colName, StringType))))

  def sqlQuery(spark: SparkSession, secret: String, bucket: String, sql: String,
               apiBase: String = "https://api.sql.cloudflarestorage.com"): DataFrame =
    oneRow(spark, "response", query(configOf(spark, secret, bucket, apiBase), sql))

  def databases(spark: SparkSession, secret: String, bucket: String,
                apiBase: String = "https://api.sql.cloudflarestorage.com"): DataFrame =
    oneRow(spark, "namespace", query(configOf(spark, secret, bucket, apiBase), "SHOW DATABASES"))

  def tables(spark: SparkSession, secret: String, bucket: String, namespace: String = "",
             apiBase: String = "https://api.sql.cloudflarestorage.com"): DataFrame = {
    val sql = if (namespace.isEmpty) "SHOW TABLES" else s"SHOW TABLES IN $namespace"
    oneRow(spark, "table_name", query(configOf(spark, secret, bucket, apiBase), sql))
  }

  def describe(spark: SparkSession, secret: String, bucket: String, table: String,
               apiBase: String = "https://api.sql.cloudflarestorage.com"): DataFrame =
    oneRow(spark, "schema", query(configOf(spark, secret, bucket, apiBase), s"DESCRIBE $table"))
}

/** DSv2 form: `spark.read.format("r2sql").option("secret", ...)
  * .option("bucket", ...).option("query", sql).load()`.
  */
class R2SqlSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "r2sql"

  private def colFor(options: CaseInsensitiveStringMap): String =
    Option(options.get("function")).getOrElse("query") match {
      case "databases" => "namespace"
      case "tables"    => "table_name"
      case "describe"  => "schema"
      case _            => "response"
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(StructField(colFor(options), StringType)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new Table with SupportsRead {
      override def name(): String = "r2_sql_" + Option(options.get("function")).getOrElse("query")
      override def schema(): StructType = inferSchema(options)
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = () =>
        new Scan with Batch {
          private val out = schema()
          override def readSchema(): StructType = out
          override def toBatch: Batch = this
          override def planInputPartitions(): Array[InputPartition] = {
            val spark = org.apache.spark.sql.SparkSession.active
            val secret = Option(options.get("secret")).getOrElse(
              throw new IllegalArgumentException("r2sql requires option 'secret'"))
            val bucket = Option(options.get("bucket")).getOrElse(
              throw new IllegalArgumentException("r2sql requires option 'bucket'"))
            val apiBase = Option(options.get("api_base"))
              .getOrElse("https://api.sql.cloudflarestorage.com")
            val sql = Option(options.get("function")).getOrElse("query") match {
              case "databases" => "SHOW DATABASES"
              case "tables" =>
                Option(options.get("namespace")).filter(_.nonEmpty)
                  .map(ns => s"SHOW TABLES IN $ns").getOrElse("SHOW TABLES")
              case "describe" => s"DESCRIBE ${options.get("table")}"
              case _ => Option(options.get("query")).getOrElse(
                throw new IllegalArgumentException("r2sql requires option 'query'"))
            }
            val conf: String => Option[String] = k => spark.conf.getOption(k)
            val s = Secrets.lookup("r2_sql", secret, conf).getOrElse(
              throw new IllegalArgumentException(s"r2_sql secret '$secret' not found"))
            val raw = R2.query(R2.Config(s.accountId, s.apiToken, bucket, apiBase), sql)
            Array(R2Partition(raw))
          }
          override def createReaderFactory(): PartitionReaderFactory =
            (partition: InputPartition) => new PartitionReader[InternalRow] {
              private var done = false
              override def next(): Boolean = { val r = !done; done = true; r }
              override def get(): InternalRow = new GenericInternalRow(
                Array[Any](UTF8String.fromString(partition.asInstanceOf[R2Partition].raw)))
              override def close(): Unit = {}
            }
        }
    }
  }
}

case class R2Partition(raw: String) extends InputPartition
