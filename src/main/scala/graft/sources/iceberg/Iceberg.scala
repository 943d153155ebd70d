package graft.sources.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Http

/** Shared Iceberg REST resolution + the merge-on-read-capable DataFrame
  * read API.
  *
  * [[IcebergRestCatalog]] (the SQL path) serves copy-on-write tables and
  * fails in-band on delete manifests — a DSv2 `loadTable` must return a
  * single Table, and Spark's parquet table can't express the delete
  * anti-join. This API can: `Iceberg.read` plans
  *
  * {{{ data ⟕anti deletes ON (_metadata.file_path, _metadata.row_index) }}}
  *
  * which is exactly Iceberg v2 position-delete semantics — a delete row
  * (file_path, pos) masks the pos-th row of that data file. Spark's
  * `_metadata` columns supply the file path and row index without any
  * custom reader; the delete side is tiny relative to data (tombstones),
  * so AQE broadcasts it and the data side never shuffles. Equality
  * deletes stay unsupported in-band.
  */
object Iceberg {

  private val mapper = new ObjectMapper()

  private[iceberg] def getJson(uri: String, token: String, path: String): JsonNode = {
    val headers = if (token.isEmpty) Map.empty[String, String]
    else Map("Authorization" -> s"Bearer $token")
    val r = Http.get(s"$uri$path", headers)
    if (r.status / 100 != 2)
      throw new RuntimeException(
        s"Iceberg REST catalog: GET $path -> HTTP ${r.status}: ${r.bodyString.take(200)}")
    mapper.readTree(r.body)
  }

  private[iceberg] def readString(conf: Configuration, pathStr: String): String = {
    val p = new Path(pathStr)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** LoadTableResult → TableMeta (inline metadata or metadata-location). */
  private[iceberg] def resolveMeta(conf: Configuration, uri: String, token: String,
                                   namespace: Seq[String], table: String): IcebergMeta.TableMeta = {
    val ns = Http.encodeUrl(namespace.mkString(""))
    val result = getJson(uri, token, s"/v1/namespaces/$ns/tables/${Http.encodeUrl(table)}")
    Option(result.get("metadata")) match {
      case Some(m) if !m.isNull => IcebergMeta.parseNode(m)
      case _ =>
        val loc = Option(result.get("metadata-location")).map(_.asText).getOrElse(
          throw new RuntimeException(
            s"LoadTableResult for ${namespace.mkString(".")}.$table has neither " +
              "metadata nor metadata-location"))
        IcebergMeta.parse(readString(conf, loc))
    }
  }

  /** Read an Iceberg table into a DataFrame — position deletes applied.
    *
    * @param uri   REST catalog endpoint (same value as the catalog's
    *              `spark.sql.catalog.<name>.uri`)
    * @param token bearer token ("" for none)
    */
  def read(spark: SparkSession, uri: String, namespace: Seq[String], table: String,
           token: String = ""): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = resolveMeta(conf, uri.stripSuffix("/"), token, namespace, table)
    meta.currentSnapshot match {
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
      case Some(snap) =>
        val (dataManifests, deleteManifests) =
          IcebergManifests.snapshotManifests(conf, snap.manifestList)
        val dataFiles = dataManifests
          .flatMap(m => IcebergManifests.dataFilesOfManifest(conf, m)).map(_.path)
        if (dataFiles.isEmpty)
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
        val data = spark.read.schema(meta.schema).parquet(dataFiles: _*)
        val deleteFiles = deleteManifests
          .flatMap(m => IcebergManifests.deleteFilesOfManifest(conf, m)).map(_.path)
        if (deleteFiles.isEmpty) data
        else {
          val withPos = data.select(col("*"),
            col("_metadata.file_path").as("__ice_file"),
            col("_metadata.row_index").as("__ice_pos"))
          val deletes = spark.read.parquet(deleteFiles: _*)
            .select(col("file_path").as("__ice_file"), col("pos").as("__ice_pos"))
          withPos.join(deletes, Seq("__ice_file", "__ice_pos"), "left_anti")
            .drop("__ice_file", "__ice_pos")
        }
    }
  }
}
