package graft.fixtures

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** Iceberg-on-R2 test fixture: publishes a DataFrame as an Iceberg
  * table inside the stub's S3 bucket — parquet data files + spec-shaped
  * Avro manifests/manifest-list + `vN.metadata.json` — and serves the
  * REST catalog protocol (config/namespaces/tables/loadTable) from the
  * same stub. Everything the catalog reads in tests is generated here
  * per the public Iceberg table spec (field names and layout), since the
  * environment has no Iceberg writer to produce golden files.
  *
  * Layout written under the `r2-lake` bucket:
  * {{{
  * iceberg/<ns>/<tbl>/data/part-<i>.parquet
  * iceberg/<ns>/<tbl>/metadata/v<N>.metadata.json
  * iceberg/<ns>/<tbl>/metadata/snap-<id>.avro          (manifest list)
  * iceberg/<ns>/<tbl>/metadata/manifest-<id>-<i>.avro  (manifests)
  * }}}
  */
object IcebergFixture {

  /** (namespace, table) → metadata-location (r2:// path). */
  val tables = TrieMap.empty[(String, String), String]

  // ---- Avro schemas: the read-path subset of the spec'd manifest formats

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":515}
      |]}""".stripMargin)

  private val manifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"data_file","type":{"type":"record","name":"r2_data_file","fields":[
      |  {"name":"content","type":"int","field-id":134},
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104},
      |  {"name":"lower_bounds","type":["null",{"type":"array","items":
      |    {"type":"record","name":"k126_v127","fields":[
      |      {"name":"key","type":"int","field-id":126},
      |      {"name":"value","type":"bytes","field-id":127}]}}],
      |   "default":null,"field-id":125},
      |  {"name":"upper_bounds","type":["null",{"type":"array","items":
      |    {"type":"record","name":"k129_v130","fields":[
      |      {"name":"key","type":"int","field-id":129},
      |      {"name":"value","type":"bytes","field-id":130}]}}],
      |   "default":null,"field-id":128}
      |]},"field-id":2}
      |]}""".stripMargin)

  /** Spec single-value serialization for bounds: little-endian numerics,
    * UTF-8 strings. Unsupported types → None (bound omitted).
    */
  private def encodeBound(v: Any): Option[Array[Byte]] = v match {
    case null => None
    case i: Int => Some(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array())
    case l: Long => Some(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(l).array())
    case d: Double => Some(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(d).array())
    case s: String => Some(s.getBytes(UTF_8))
    case _ => None
  }

  /** Per-file (field-id → bytes) bounds, computed by reading the written
    * parquet back (the accurate source of each file's min/max).
    */
  private def fileBounds(spark: org.apache.spark.sql.SparkSession, file: java.io.File,
                         schema: org.apache.spark.sql.types.StructType)
      : (Map[Int, Array[Byte]], Map[Int, Array[Byte]]) = {
    import org.apache.spark.sql.functions.{min, max}
    val sdf = spark.read.parquet(file.getAbsolutePath)
    val aggs = schema.fields.flatMap(f =>
      Seq(min(org.apache.spark.sql.functions.col(f.name)).as(s"lo_${f.name}"),
        max(org.apache.spark.sql.functions.col(f.name)).as(s"hi_${f.name}")))
    val row = sdf.agg(aggs.head, aggs.tail: _*).collect()(0)
    val lo = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    val hi = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      encodeBound(row.get(row.fieldIndex(s"lo_${f.name}"))).foreach(lo(i + 1) = _)
      encodeBound(row.get(row.fieldIndex(s"hi_${f.name}"))).foreach(hi(i + 1) = _)
    }
    (lo.toMap, hi.toMap)
  }

  private def boundsArray(kvSchema: Schema, bounds: Map[Int, Array[Byte]]): AnyRef = {
    val arr = new java.util.ArrayList[GenericRecord]()
    bounds.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(kvSchema)
      r.put("key", k)
      r.put("value", java.nio.ByteBuffer.wrap(v))
      arr.add(r)
    }
    arr
  }

  private def writeAvro(schema: Schema, records: Seq[GenericRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    records.foreach(w.append)
    w.close()
    out.toByteArray
  }

  /** Spark type → Iceberg schema-JSON type string/object. */
  def icebergType(dt: DataType): String = dt match {
    case BooleanType         => "\"boolean\""
    case IntegerType | ShortType | ByteType => "\"int\""
    case LongType            => "\"long\""
    case FloatType           => "\"float\""
    case DoubleType          => "\"double\""
    case DateType            => "\"date\""
    case TimestampNTZType    => "\"timestamp\""
    case TimestampType       => "\"timestamptz\""
    case StringType          => "\"string\""
    case BinaryType          => "\"binary\""
    case d: DecimalType      => s""""decimal(${d.precision}, ${d.scale})""""
    case a: ArrayType =>
      s"""{"type":"list","element-id":0,"element":${icebergType(a.elementType)},"element-required":${!a.containsNull}}"""
    case s: StructType       => icebergStruct(s, 1000)
    case other => throw new IllegalArgumentException(s"fixture: unsupported $other")
  }

  private def icebergStruct(st: StructType, idBase: Int, schemaId: Int = 0): String = {
    val fields = st.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id":${idBase + i},"name":"${f.name}","required":${!f.nullable},"type":${icebergType(f.dataType)}}"""
    }
    s"""{"type":"struct","schema-id":$schemaId,"fields":[${fields.mkString(",")}]}"""
  }

  /** Attach `parquet.field.id` metadata (1-based positional, matching
    * [[icebergStruct]]'s id assignment) so the written parquet embeds
    * Iceberg field ids — required of every compliant writer; the read
    * path resolves columns by these ids.
    */
  private def withFieldIds(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.sparkSession.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
      col(f.name).as(f.name,
        new MetadataBuilder().putLong("parquet.field.id", i + 1L).build())
    }.toSeq: _*)
  }

  /** Publish each DataFrame as one copy-on-write snapshot of table
    * `ns.tbl` (each snapshot lists its full live file set; current =
    * the last). Returns the metadata location.
    */
  def publishSnapshots(stub: Stub, ns: String, tbl: String,
                       dfs: Seq[DataFrame],
                       rangeFiles: Option[(String, Int)] = None,
                       withBounds: Boolean = false): String = {
    val prefix = s"iceberg/$ns/$tbl"

    final case class Written(path: String, size: Long, rows: Long,
        lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]])

    def writeData(df0: DataFrame, snapId: Long): Seq[Written] = {
      val df = withFieldIds(df0)
      val tmp = java.nio.file.Files.createTempDirectory("icefix").toFile
      val out = rangeFiles match {
        case Some((col, n)) =>
          df.repartitionByRange(n, org.apache.spark.sql.functions.col(col))
        case None => df.coalesce(1)
      }
      out.write.mode("overwrite").parquet(tmp.getAbsolutePath + "/d")
      new java.io.File(tmp, "d").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
        .sortBy(_.getName).zipWithIndex
        .map { case (f, i) =>
          val key = s"$prefix/data/part-s$snapId-$i.parquet"
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          stub.objects.put(key, bytes)
          val rows = df.sparkSession.read.parquet(f.getAbsolutePath).count()
          val (lo, hi) =
            if (withBounds) fileBounds(df.sparkSession, f, df.schema)
            else (Map.empty[Int, Array[Byte]], Map.empty[Int, Array[Byte]])
          Written(s"r2://r2-lake/$key", bytes.length.toLong, rows, lo, hi)
        }.toSeq
    }

    def snapshot(df: DataFrame, snapId: Long): (String, Long) = {
      val kvLower = manifestEntrySchema.getField("data_file").schema()
        .getField("lower_bounds").schema().getTypes.get(1).getElementType
      val kvUpper = manifestEntrySchema.getField("data_file").schema()
        .getField("upper_bounds").schema().getTypes.get(1).getElementType
      val entries = writeData(df, snapId).map { w =>
        val dfRec = new GenericData.Record(
          manifestEntrySchema.getField("data_file").schema())
        dfRec.put("content", 0)
        dfRec.put("file_path", w.path)
        dfRec.put("file_format", "PARQUET")
        dfRec.put("record_count", w.rows)
        dfRec.put("file_size_in_bytes", w.size)
        if (w.lower.nonEmpty) dfRec.put("lower_bounds", boundsArray(kvLower, w.lower))
        if (w.upper.nonEmpty) dfRec.put("upper_bounds", boundsArray(kvUpper, w.upper))
        val rec = new GenericData.Record(manifestEntrySchema)
        rec.put("status", 1) // ADDED
        rec.put("snapshot_id", snapId)
        rec.put("data_file", dfRec)
        rec
      }
      val manifestKey = s"$prefix/metadata/manifest-$snapId-0.avro"
      val manifestBytes = writeAvro(manifestEntrySchema, entries)
      stub.objects.put(manifestKey, manifestBytes)
      val mlRec = new GenericData.Record(manifestListSchema)
      mlRec.put("manifest_path", s"r2://r2-lake/$manifestKey")
      mlRec.put("manifest_length", manifestBytes.length.toLong)
      mlRec.put("partition_spec_id", 0)
      mlRec.put("content", 0)
      mlRec.put("added_snapshot_id", snapId)
      val mlKey = s"$prefix/metadata/snap-$snapId.avro"
      stub.objects.put(mlKey, writeAvro(manifestListSchema, Seq(mlRec)))
      (s"r2://r2-lake/$mlKey", snapId)
    }

    val snaps = dfs.zipWithIndex.map { case (df, i) => snapshot(df, i + 1L) }
    val current = snaps.last._2
    val snapsJson = snaps.map { case (ml, id) =>
      s"""{"snapshot-id":$id,"timestamp-ms":0,"manifest-list":"$ml","summary":{"operation":"append"}}"""
    }.mkString(",")
    val metaJson =
      s"""{"format-version":2,"table-uuid":"00000000-0000-0000-0000-00000000000$current",
         |"location":"r2://r2-lake/$prefix",
         |"last-sequence-number":$current,"last-updated-ms":0,"last-column-id":${dfs.head.schema.length},
         |"current-schema-id":0,"schemas":[${icebergStruct(dfs.head.schema, 1)}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":$current,"snapshots":[$snapsJson]}""".stripMargin
    val metaKey = s"$prefix/metadata/v$current.metadata.json"
    stub.objects.put(metaKey, metaJson.getBytes(UTF_8))
    val metaLoc = s"r2://r2-lake/$metaKey"
    tables.put((ns, tbl), metaLoc)
    metaLoc
  }

  /** Publish `df` as Iceberg table `ns.tbl` in `stub`'s bucket; returns
    * the metadata location.
    */
  def publish(stub: Stub, ns: String, tbl: String, df: DataFrame,
              extraSnapshotOfSameData: Boolean = false): String =
    publishSnapshots(stub, ns, tbl, if (extraSnapshotOfSameData) Seq(df, df) else Seq(df))

  /** Publish a SCHEMA-EVOLVED table: `df1`'s file is written under
    * schema 0 (ids 1..k, `df1`'s names), `df2`'s under the current
    * schema 1 (ids 1..n, `df2`'s names — positional, so a column of
    * `df2` sharing a position with `df1` is that column RENAMED, and
    * columns beyond `df1`'s width are ADDED). The current snapshot's
    * manifest list carries both files, which is exactly what a real
    * table looks like after `ALTER TABLE ... RENAME/ADD COLUMN` + a
    * second append: old data files still carry old column names, and
    * only field-id resolution reads them correctly.
    */
  def publishEvolved(stub: Stub, ns: String, tbl: String,
                     df1: DataFrame, df2: DataFrame): String = {
    require(df2.schema.length >= df1.schema.length,
      "publishEvolved: df2 must not drop columns of df1")
    val prefix = s"iceberg/$ns/$tbl"

    def writeOne(df0: DataFrame, snapId: Long): (String, Long, Long) = {
      val df = withFieldIds(df0)
      val tmp = java.nio.file.Files.createTempDirectory("icefix").toFile
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath + "/d")
      val f = new java.io.File(tmp, "d").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && f.length() > 0).head
      val key = s"$prefix/data/part-s$snapId-0.parquet"
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      stub.objects.put(key, bytes)
      (s"r2://r2-lake/$key", bytes.length.toLong, df0.count())
    }

    def manifestFor(file: (String, Long, Long), snapId: Long): String = {
      val dfRec = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      dfRec.put("content", 0)
      dfRec.put("file_path", file._1)
      dfRec.put("file_format", "PARQUET")
      dfRec.put("record_count", file._3)
      dfRec.put("file_size_in_bytes", file._2)
      val rec = new GenericData.Record(manifestEntrySchema)
      rec.put("status", 1)
      rec.put("snapshot_id", snapId)
      rec.put("data_file", dfRec)
      val key = s"$prefix/metadata/manifest-$snapId-0.avro"
      stub.objects.put(key, writeAvro(manifestEntrySchema, Seq(rec)))
      s"r2://r2-lake/$key"
    }

    def manifestList(snapId: Long, manifests: Seq[String]): String = {
      val recs = manifests.map { m =>
        val r = new GenericData.Record(manifestListSchema)
        r.put("manifest_path", m)
        r.put("manifest_length", stub.objects(
          m.stripPrefix("r2://r2-lake/")).length.toLong)
        r.put("partition_spec_id", 0)
        r.put("content", 0)
        r.put("added_snapshot_id", snapId)
        r
      }
      val key = s"$prefix/metadata/snap-$snapId.avro"
      stub.objects.put(key, writeAvro(manifestListSchema, recs))
      s"r2://r2-lake/$key"
    }

    val m1 = manifestFor(writeOne(df1, 1L), 1L)
    val m2 = manifestFor(writeOne(df2, 2L), 2L)
    val ml1 = manifestList(1L, Seq(m1))
    val ml2 = manifestList(2L, Seq(m1, m2)) // live set after the evolution
    val metaJson =
      s"""{"format-version":2,"table-uuid":"00000000-0000-0000-0000-000000000042",
         |"location":"r2://r2-lake/$prefix",
         |"last-sequence-number":2,"last-updated-ms":0,"last-column-id":${df2.schema.length},
         |"current-schema-id":1,
         |"schemas":[${icebergStruct(df1.schema, 1, schemaId = 0)},
         |${icebergStruct(df2.schema, 1, schemaId = 1)}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":2,"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":0,"manifest-list":"$ml1","summary":{"operation":"append"}},
         |{"snapshot-id":2,"timestamp-ms":0,"manifest-list":"$ml2","summary":{"operation":"append"}}]}""".stripMargin
    val metaKey = s"$prefix/metadata/v2.metadata.json"
    stub.objects.put(metaKey, metaJson.getBytes(UTF_8))
    val metaLoc = s"r2://r2-lake/$metaKey"
    tables.put((ns, tbl), metaLoc)
    metaLoc
  }

  /** Publish a table whose manifest list declares a DELETE manifest —
    * the reader must reject it (merge-on-read unsupported).
    */
  def publishWithDeletes(stub: Stub, ns: String, tbl: String, df: DataFrame): String = {
    val loc = publish(stub, ns, tbl, df)
    val prefix = s"iceberg/$ns/$tbl"
    val mlRecData = new GenericData.Record(manifestListSchema)
    mlRecData.put("manifest_path", s"r2://r2-lake/$prefix/metadata/manifest-1-0.avro")
    mlRecData.put("manifest_length", 1L)
    mlRecData.put("partition_spec_id", 0)
    mlRecData.put("content", 0)
    mlRecData.put("added_snapshot_id", 1L)
    val mlRecDel = new GenericData.Record(manifestListSchema)
    mlRecDel.put("manifest_path", s"r2://r2-lake/$prefix/metadata/manifest-del.avro")
    mlRecDel.put("manifest_length", 1L)
    mlRecDel.put("partition_spec_id", 0)
    mlRecDel.put("content", 1) // DELETES
    mlRecDel.put("added_snapshot_id", 1L)
    stub.objects.put(s"$prefix/metadata/snap-1.avro",
      writeAvro(manifestListSchema, Seq(mlRecData, mlRecDel)))
    loc
  }

  /** Publish a merge-on-read table: a data snapshot plus one delete
    * manifest whose delete file holds `deleteDf` (spec-shaped parquet).
    * `content` 1 = position deletes ((file_path, pos) rows), 2 =
    * equality deletes (columns = equality fields).
    */
  private def publishWithDeleteFile(stub: Stub, ns: String, tbl: String,
                                    df: DataFrame, deleteDf: DataFrame,
                                    content: Int): String = {
    val loc = publish(stub, ns, tbl, df)
    val prefix = s"iceberg/$ns/$tbl"
    val tmp = java.nio.file.Files.createTempDirectory("icedel").toFile
    deleteDf.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath + "/d")
    val delFile = new java.io.File(tmp, "d").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val delKey = s"$prefix/data/delete-0.parquet"
    stub.objects.put(delKey, java.nio.file.Files.readAllBytes(delFile.toPath))

    val delEntry = new GenericData.Record(manifestEntrySchema)
    val delDataFile = new GenericData.Record(
      manifestEntrySchema.getField("data_file").schema())
    delDataFile.put("content", content) // 1=POSITION, 2=EQUALITY
    delDataFile.put("file_path", s"r2://r2-lake/$delKey")
    delDataFile.put("file_format", "PARQUET")
    delDataFile.put("record_count", deleteDf.count())
    delDataFile.put("file_size_in_bytes", stub.objects(delKey).length.toLong)
    delEntry.put("status", 1)
    delEntry.put("snapshot_id", 1L)
    delEntry.put("data_file", delDataFile)
    val delManifestKey = s"$prefix/metadata/manifest-del-0.avro"
    val delManifestBytes = writeAvro(manifestEntrySchema, Seq(delEntry))
    stub.objects.put(delManifestKey, delManifestBytes)

    // manifest list: the existing data manifest + the delete manifest
    val mlData = new GenericData.Record(manifestListSchema)
    mlData.put("manifest_path", s"r2://r2-lake/$prefix/metadata/manifest-1-0.avro")
    mlData.put("manifest_length", 1L)
    mlData.put("partition_spec_id", 0)
    mlData.put("content", 0)
    mlData.put("added_snapshot_id", 1L)
    val mlDel = new GenericData.Record(manifestListSchema)
    mlDel.put("manifest_path", s"r2://r2-lake/$delManifestKey")
    mlDel.put("manifest_length", delManifestBytes.length.toLong)
    mlDel.put("partition_spec_id", 0)
    mlDel.put("content", 1)
    mlDel.put("added_snapshot_id", 1L)
    stub.objects.put(s"$prefix/metadata/snap-1.avro",
      writeAvro(manifestListSchema, Seq(mlData, mlDel)))
    loc
  }

  /** Position-delete MOR table: masks `deletePositions` (0-based row
    * indexes of the single data file).
    */
  def publishWithPositionDeletes(stub: Stub, ns: String, tbl: String, df: DataFrame,
                                 deletePositions: Seq[Long]): String = {
    val dataPath = s"r2://r2-lake/iceberg/$ns/$tbl/data/part-s1-0.parquet"
    val spark = df.sparkSession
    import spark.implicits._
    publishWithDeleteFile(stub, ns, tbl, df,
      deletePositions.map(p => (dataPath, p)).toDF("file_path", "pos"), content = 1)
  }

  /** Equality-delete MOR table: masks rows matching `deleteRows` on its
    * columns (the equality fields).
    */
  def publishWithEqualityDeletes(stub: Stub, ns: String, tbl: String, df: DataFrame,
                                 deleteRows: DataFrame): String =
    publishWithDeleteFile(stub, ns, tbl, df, deleteRows, content = 2)

  /** Delete-then-reinsert MOR history, exercising the v2 sequence-number
    * scoping rule: `df1` lands at data sequence 1, an equality delete
    * on `deleteRows`' columns at sequence 2, and `df2` (rows matching
    * the delete, re-inserted) at sequence 3. A spec-correct reader
    * masks only `df1` rows (seq 1 < 2) and keeps every `df2` row
    * (seq 3 > 2); a reader that applies deletes globally silently drops
    * the re-inserts. Sequence numbers are carried on the manifest-list
    * entries — entry-level `sequence_number` stays null, so this also
    * exercises the inheritance rule.
    */
  def publishDeleteThenReinsert(stub: Stub, ns: String, tbl: String,
                                df1: DataFrame, deleteRows: DataFrame,
                                df2: DataFrame): String = {
    val prefix = s"iceberg/$ns/$tbl"

    def writeParquet(df: DataFrame, key: String): (Long, Long) = {
      val tmp = java.nio.file.Files.createTempDirectory("iceseq").toFile
      withFieldIds(df).coalesce(1).write.mode("overwrite")
        .parquet(tmp.getAbsolutePath + "/d")
      val f = new java.io.File(tmp, "d").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      stub.objects.put(key, bytes)
      (bytes.length.toLong, df.count())
    }

    def manifest(key: String, filePath: String, content: Int,
                 size: Long, rows: Long): Array[Byte] = {
      val dfRec = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      dfRec.put("content", content)
      dfRec.put("file_path", filePath)
      dfRec.put("file_format", "PARQUET")
      dfRec.put("record_count", rows)
      dfRec.put("file_size_in_bytes", size)
      val rec = new GenericData.Record(manifestEntrySchema)
      rec.put("status", 1)
      rec.put("snapshot_id", 3L)
      rec.put("data_file", dfRec) // sequence_number left null -> inherited
      val bytes = writeAvro(manifestEntrySchema, Seq(rec))
      stub.objects.put(key, bytes)
      bytes
    }

    val (sz1, n1) = writeParquet(df1, s"$prefix/data/part-s1-0.parquet")
    val (szD, nD) = writeParquet(deleteRows, s"$prefix/data/delete-0.parquet")
    val (sz2, n2) = writeParquet(df2, s"$prefix/data/part-s3-0.parquet")
    val m1 = manifest(s"$prefix/metadata/manifest-1-0.avro",
      s"r2://r2-lake/$prefix/data/part-s1-0.parquet", 0, sz1, n1)
    val mD = manifest(s"$prefix/metadata/manifest-del-0.avro",
      s"r2://r2-lake/$prefix/data/delete-0.parquet", 2, szD, nD)
    val m2 = manifest(s"$prefix/metadata/manifest-3-0.avro",
      s"r2://r2-lake/$prefix/data/part-s3-0.parquet", 0, sz2, n2)

    def mlRec(path: String, len: Long, content: Int, seq: Long): GenericRecord = {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", path)
      r.put("manifest_length", len)
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("added_snapshot_id", 3L)
      r.put("sequence_number", seq)
      r
    }
    stub.objects.put(s"$prefix/metadata/snap-3.avro", writeAvro(manifestListSchema, Seq(
      mlRec(s"r2://r2-lake/$prefix/metadata/manifest-1-0.avro", m1.length.toLong, 0, 1L),
      mlRec(s"r2://r2-lake/$prefix/metadata/manifest-del-0.avro", mD.length.toLong, 1, 2L),
      mlRec(s"r2://r2-lake/$prefix/metadata/manifest-3-0.avro", m2.length.toLong, 0, 3L))))

    val metaJson =
      s"""{"format-version":2,"table-uuid":"00000000-0000-0000-0000-000000000077",
         |"location":"r2://r2-lake/$prefix",
         |"last-sequence-number":3,"last-updated-ms":0,"last-column-id":${df1.schema.length},
         |"current-schema-id":0,"schemas":[${icebergStruct(df1.schema, 1)}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":3,"snapshots":[
         |{"snapshot-id":3,"timestamp-ms":0,"manifest-list":"r2://r2-lake/$prefix/metadata/snap-3.avro",
         |"summary":{"operation":"overwrite"}}]}""".stripMargin
    val metaKey = s"$prefix/metadata/v3.metadata.json"
    stub.objects.put(metaKey, metaJson.getBytes(UTF_8))
    val metaLoc = s"r2://r2-lake/$metaKey"
    tables.put((ns, tbl), metaLoc)
    metaLoc
  }

  /** Install the REST catalog protocol routes on `stub` under
    * `/iceberg` (catalog uri = `<stub.base>/iceberg`).
    */
  def installRest(stub: Stub): Stub = {
    stub.route("/iceberg/v1/") { ex =>
      val path = ex.getRequestURI.getPath.stripPrefix("/iceberg/v1/")
      val segs = path.split("/").filter(_.nonEmpty).toList
      def json(s: String) = (200, s.getBytes(UTF_8))
      segs match {
        case "config" :: Nil =>
          json("""{"defaults":{},"overrides":{}}""")
        case "namespaces" :: Nil =>
          val nss = tables.keys.map(_._1).toSeq.distinct.sorted
            .map(ns => s"""["$ns"]""").mkString(",")
          json(s"""{"namespaces":[$nss]}""")
        case "namespaces" :: ns :: "tables" :: Nil =>
          val ids = tables.keys.filter(_._1 == ns).map(_._2).toSeq.sorted
            .map(t => s"""{"namespace":["$ns"],"name":"$t"}""").mkString(",")
          json(s"""{"identifiers":[$ids]}""")
        case "namespaces" :: ns :: "tables" :: t :: Nil =>
          tables.get((ns, t)) match {
            case Some(loc) =>
              json(s"""{"metadata-location":"$loc","config":{}}""")
            case None =>
              (404, s"""{"error":{"message":"Table does not exist: $ns.$t","type":"NoSuchTableException","code":404}}""".getBytes(UTF_8))
          }
        case _ => (404, "not found".getBytes(UTF_8))
      }
    }
    stub
  }
}
