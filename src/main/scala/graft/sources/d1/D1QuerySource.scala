package graft.sources.d1

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.core.D1Client

/** `d1_query(sql)` — raw SQL passthrough (reference
  * src/d1_functions.cpp:92-177). The query executes EAGERLY at schema
  * inference (the reference runs it at bind time); the result is cached so
  * action time does not re-execute, and every column is VARCHAR in
  * first-row key order ("D1 returns strings anyway", :119-131). Empty
  * result → single VARCHAR column named `result`.
  *
  * Usage: `spark.read.format("d1query").option("query", sql)...`
  */
class D1QuerySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "d1query"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    D1QueryCache.resultFor(options)._1

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new D1QueryTable(new CaseInsensitiveStringMap(properties))
}

/** Bind-time execution cache: schema inference triggers the remote call;
  * the scan replays the cached rows (mirrors the reference's
  * execute-during-bind + reuse).
  */
object D1QueryCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, (StructType, Seq[Seq[String]])]()

  def resultFor(options: CaseInsensitiveStringMap): (StructType, Seq[Seq[String]]) = {
    val sql = Option(options.get("query")).orElse(Option(options.get("sql"))).getOrElse(
      throw new IllegalArgumentException("d1query requires option 'query'"))
    val cfg = D1SourceUtil.configFrom(options)
    val key = s"${cfg.apiBase}|${cfg.accountId}|${cfg.databaseId}|$sql"
    cache.computeIfAbsent(key, _ => {
      val res = D1Client.executeQuery(cfg, sql)
      if (!res.success) throw new java.io.IOException(s"D1 query failed: ${res.error}")
      if (res.rows.isEmpty) {
        (StructType(Seq(StructField("result", StringType))), Nil)
      } else {
        val schema = StructType(res.columnOrder.map(c => StructField(c, StringType)))
        val rows = res.rows.map(r => res.columnOrder.map(c => r.getOrElse(c, "")))
        (schema, rows)
      }
    })
  }

  def clear(): Unit = cache.clear()
}

class D1QueryTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "d1_query"
  override def schema(): StructType = D1QueryCache.resultFor(options)._1
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(scanOptions)
    val opts = new CaseInsensitiveStringMap(merged)
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private val (fullSchema, rows) = D1QueryCache.resultFor(opts)
      private var pruned = fullSchema
      override def pruneColumns(requiredSchema: StructType): Unit = pruned = requiredSchema
      override def build(): Scan = new D1QueryScan(fullSchema, pruned, rows)
    }
  }
}

class D1QueryScan(fullSchema: StructType, prunedSchema: StructType, rows: Seq[Seq[String]])
    extends Scan with Batch {
  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val idx = prunedSchema.fieldNames.map(fullSchema.fieldIndex)
    Array(D1QueryPartition(rows.map(r => idx.map(r.apply).toSeq), prunedSchema.length))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[D1QueryPartition]
      new PartitionReader[InternalRow] {
        private var pos = -1
        override def next(): Boolean = { pos += 1; pos < p.rows.length }
        override def get(): InternalRow = new GenericInternalRow(
          p.rows(pos).map(v =>
            if (v.isEmpty) null else UTF8String.fromString(v): Any).toArray)
        override def close(): Unit = {}
      }
    }
}

case class D1QueryPartition(rows: Seq[Seq[String]], width: Int) extends InputPartition
