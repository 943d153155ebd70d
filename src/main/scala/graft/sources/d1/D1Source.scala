package graft.sources.d1

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Codecs, D1Client, Secrets}

/** Cloudflare D1 (SQLite-over-HTTP) connector — the Spark-native
  * `d1_scan` (/root/reference/src/d1_scan.cpp).
  *
  * Usage: `spark.read.format("d1").option("table", "users")
  * .option("secret", "cloudflare").option("database_id", uuid).load()`.
  *
  * Schema is remote-introspected at analysis time via
  * `PRAGMA table_info(<table>)` mapped through SQLite affinity rules
  * (reference :37-64 + d1_http.cpp:723-763). Pushdown builds the same
  * remote SQL: comparison filters + AND conjunctions → WHERE string
  * (:92-232), constant LIMIT → `LIMIT n` with node elimination, TopN →
  * limit pushed / sort kept (:325-393). Projection is applied
  * reader-side (the remote SQL stays `SELECT *`, like the reference).
  *
  * Scale: the D1 REST API is not range-partitionable — one
  * InputPartition, documented; D1 is a dimension-sized source that a real
  * pipeline joins against big parquet facts (broadcast it).
  */
class D1Source extends TableProvider with DataSourceRegister {
  override def shortName(): String = "d1"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    D1SourceUtil.tableFor(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    D1SourceUtil.tableFor(new CaseInsensitiveStringMap(properties))
}

object D1SourceUtil {
  def configFrom(options: CaseInsensitiveStringMap): D1Client.Config = {
    val conf: String => Option[String] = k =>
      try Option(org.apache.spark.sql.SparkSession.active.conf.getOption(k)).flatten
      catch { case _: Exception => None }
    val secret = Option(options.get("secret"))
      .flatMap(n => Secrets.lookup("d1", n, conf))
      .orElse {
        (Option(options.get("account_id")), Option(options.get("api_token"))) match {
          case (Some(a), Some(t)) => Some(Secrets.Secret("__inline", "d1", a, t))
          case _ => Secrets.resolveD1(None, conf)
        }
      }
      .getOrElse(throw new IllegalArgumentException(
        "d1 source requires a secret (option 'secret'), inline account_id/api_token, " +
          "or CLOUDFLARE_ACCOUNT_ID/CLOUDFLARE_API_TOKEN environment"))
    val apiBase = Option(options.get("api_base"))
      .getOrElse("https://api.cloudflare.com/client/v4")
    var cfg = Secrets.d1Config(secret, Option(options.get("database_id")).getOrElse(""), apiBase)
    // database name → UUID resolution (36-char heuristic, d1_storage.cpp:75)
    Option(options.get("database")).foreach { name =>
      if (name.length == 36 && name.count(_ == '-') == 4) cfg = cfg.copy(databaseId = name)
      else cfg = cfg.copy(databaseId = D1Client.databaseIdByName(cfg, name))
    }
    if (cfg.databaseId.isEmpty)
      throw new IllegalArgumentException("database or database_id required")
    cfg
  }

  def tableFor(options: CaseInsensitiveStringMap): D1ScanTable = {
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("d1 source requires option 'table'"))
    val cfg = configFrom(options)
    new D1ScanTable(cfg, table)
  }

  def affinitySchema(cols: Seq[D1Client.ColumnInfo]): StructType =
    StructType(cols.map(c => StructField(c.name, Codecs.sqliteAffinity(c.tpe))))
}

class D1ScanTable(val config: D1Client.Config, val tableName: String)
    extends Table with SupportsRead with SupportsWrite {

  private lazy val tableSchema: StructType =
    D1SourceUtil.affinitySchema(D1Client.tableColumns(config, tableName))

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new D1ScanBuilder(config, tableName, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new D1WriteBuilder(config, tableName, info.schema())
}

class D1ScanBuilder(config: D1Client.Config, tableName: String, fullSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var whereClause = ""
  private var limit: Long = 0L
  private var pushed: Vector[Filter] = Vector.empty
  private var prunedSchema: StructType = fullSchema

  /** Literal → SQLite SQL text (reference ValueToSQL: strings
    * ''-escaped, booleans 1/0).
    */
  private def lit(v: Any): Option[String] = v match {
    case null => Some("NULL")
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case b: Boolean => Some(if (b) "1" else "0")
    case n @ (_: Int | _: Long | _: Short | _: Byte | _: Double | _: Float) => Some(n.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case t: java.sql.Timestamp => Some("'" + t.toString + "'")
    case t: java.time.Instant => Some("'" + t.toString + "'")
    case d: java.sql.Date => Some("'" + d.toString + "'")
    case d: java.time.LocalDate => Some("'" + d.toString + "'")
    case _ => None
  }

  private def toSql(f: Filter): Option[String] = f match {
    // IS [NOT] NULL: Catalyst emits IsNotNull with every comparison;
    // translating keeps the Filter node out of the plan so LIMIT pushdown
    // can reach the scan.
    case IsNull(c) => Some(s"$c IS NULL")
    case IsNotNull(c) => Some(s"$c IS NOT NULL")
    case EqualTo(c, v) => lit(v).map(l => s"$c = $l")
    case Not(EqualTo(c, v)) => lit(v).map(l => s"$c != $l")
    case GreaterThan(c, v) => lit(v).map(l => s"$c > $l")
    case GreaterThanOrEqual(c, v) => lit(v).map(l => s"$c >= $l")
    case LessThan(c, v) => lit(v).map(l => s"$c < $l")
    case LessThanOrEqual(c, v) => lit(v).map(l => s"$c <= $l")
    case And(l, r) =>
      (toSql(l), toSql(r)) match {
        case (Some(a), Some(b)) => Some(s"($a AND $b)")
        case _ => None
      }
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, residual) = filters.partition(f => toSql(f).isDefined)
    pushed = consumed.toVector
    whereClause = consumed.flatMap(toSql).mkString(" AND ")
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pushLimit(l: Int): Boolean = { limit = l.toLong; true }

  override def isPartiallyPushed: Boolean = false

  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    // TopN: push limit into remote SQL, keep sort in plan (reference
    // :327-351 keeps the TOP_N node).
    limit = l.toLong
    false
  }

  override def pruneColumns(requiredSchema: StructType): Unit = prunedSchema = requiredSchema

  override def build(): Scan =
    new D1Scan(config, tableName, fullSchema, prunedSchema, whereClause, limit)
}

class D1Scan(config: D1Client.Config, tableName: String, fullSchema: StructType,
             prunedSchema: StructType, whereClause: String, limit: Long)
    extends Scan with Batch {

  def remoteSql: String = {
    var sql = s"SELECT * FROM $tableName"
    if (whereClause.nonEmpty) sql += s" WHERE $whereClause"
    if (limit > 0) sql += s" LIMIT $limit"
    sql
  }

  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String = s"d1_scan $remoteSql"

  override def planInputPartitions(): Array[InputPartition] =
    Array(D1Partition(config, remoteSql, prunedSchema.json))

  override def createReaderFactory(): PartitionReaderFactory = new D1ReaderFactory()
}

case class D1Partition(config: D1Client.Config, sql: String, schemaJson: String)
    extends InputPartition

class D1ReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[D1Partition]
    new D1PartitionReader(p.config, p.sql,
      DataType.fromJson(p.schemaJson).asInstanceOf[StructType])
  }
}

/** Executor-side reader: one remote query, per-cell string→typed
  * conversion with the reference's semantics (empty string → NULL for
  * every type; unparseable numerics → NULL — d1_scan.cpp:262-303).
  */
class D1PartitionReader(config: D1Client.Config, sql: String, schema: StructType)
    extends PartitionReader[InternalRow] {

  private lazy val rows: Seq[scala.collection.immutable.ListMap[String, String]] = {
    val res = D1Client.executeQuery(config, sql)
    if (!res.success) throw new java.io.IOException(s"D1 query failed: ${res.error}")
    res.rows
  }
  private var pos = -1

  private def convert(value: String, dt: DataType): Any = dt match {
    case LongType => try java.lang.Long.valueOf(value.trim.toLong) catch { case _: Exception => null }
    case IntegerType => try java.lang.Integer.valueOf(value.trim.toInt) catch { case _: Exception => null }
    case DoubleType => try java.lang.Double.valueOf(value.trim.toDouble) catch { case _: Exception => null }
    case BooleanType => java.lang.Boolean.valueOf(value == "1" || value == "true")
    case DateType =>
      try java.lang.Integer.valueOf(java.time.LocalDate.parse(value.take(10)).toEpochDay.toInt)
      catch { case _: Exception => null }
    case TimestampType =>
      try {
        val norm = value.trim.replace(' ', 'T')
        val withTime = if (norm.length == 10) norm + "T00:00:00" else norm
        java.lang.Long.valueOf(java.time.LocalDateTime.parse(withTime.stripSuffix("Z"))
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      } catch { case _: Exception => null }
    case BinaryType => value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case _ => UTF8String.fromString(value)
  }

  override def next(): Boolean = { pos += 1; pos < rows.length }

  override def get(): InternalRow = {
    val row = rows(pos)
    val values: Array[Any] = schema.fields.map { f =>
      row.get(f.name) match {
        case Some(v) if v.nonEmpty => convert(v, f.dataType)
        case _ => null
      }
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = {}
}
