package graft.sources.iceberg

import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Manifest resolution: snapshot → manifest-list (Avro) → manifests
  * (Avro) → data-file paths. Reads the spec'd field names with the
  * file-embedded writer schema (GenericDatumReader), so any compliant
  * writer's files resolve regardless of which optional fields it wrote.
  *
  * Read-path support is copy-on-write tables only: a delete manifest
  * (manifest-list `content` = 1) or a delete data-file entry
  * (`data_file.content` != 0) fails the read in-band rather than
  * silently returning rows that merge-on-read would have masked.
  */
object IcebergManifests {

  /** All live data-file paths for one snapshot's manifest list —
    * copy-on-write reads only: any delete manifest fails in-band.
    * Merge-on-read callers use [[snapshotManifests]] +
    * [[deleteFilesOfManifest]] instead.
    */
  def dataFiles(conf: Configuration, manifestListPath: String): Seq[DataFileEntry] = {
    val (data, deletes) = snapshotManifests(conf, manifestListPath)
    if (deletes.nonEmpty)
      throw new UnsupportedOperationException(
        s"Iceberg table has delete manifests (merge-on-read); " +
          s"only copy-on-write tables are readable: $manifestListPath")
    data.flatMap(m => dataFilesOfManifest(conf, m))
  }

  final case class DataFileEntry(path: String, format: String, recordCount: Long)

  /** Manifest-list → (data manifests, delete manifests), classified by
    * the spec's `content` field without reading the manifests themselves.
    */
  def snapshotManifests(conf: Configuration,
                        manifestListPath: String): (Seq[String], Seq[String]) = {
    val all = readAvro(conf, manifestListPath).map { rec =>
      (rec.get("manifest_path").toString, longField(rec, "content").getOrElse(0L))
    }
    (all.filter(_._2 == 0L).map(_._1), all.filter(_._2 == 1L).map(_._1))
  }

  /** One manifest → its live data files. Entry `status` 2 = DELETED
    * (dropped); `data_file.content` != 0 = position/equality deletes
    * (rejected).
    */
  def dataFilesOfManifest(conf: Configuration, manifestPath: String): Seq[DataFileEntry] =
    readAvro(conf, manifestPath).flatMap { rec =>
      val status = longField(rec, "status").getOrElse(1L)
      if (status == 2L) None
      else {
        val df = rec.get("data_file").asInstanceOf[GenericRecord]
        val content = longField(df, "content").getOrElse(0L)
        if (content != 0L)
          throw new UnsupportedOperationException(
            s"Iceberg manifest contains delete files (content=$content); " +
              s"only copy-on-write tables are readable: $manifestPath")
        val fmt = Option(df.get("file_format")).map(_.toString).getOrElse("PARQUET")
        if (!fmt.equalsIgnoreCase("parquet"))
          throw new UnsupportedOperationException(
            s"unsupported Iceberg data-file format $fmt (parquet only)")
        Some(DataFileEntry(df.get("file_path").toString, fmt,
          longField(df, "record_count").getOrElse(0L)))
      }
    }

  final case class DeleteFileEntry(path: String, content: Long) {
    def isPosition: Boolean = content == 1L
    def isEquality: Boolean = content == 2L
  }

  /** A delete manifest's live delete files: `content` = 1 position
    * deletes (parquet of (file_path, pos)), `content` = 2 equality
    * deletes (parquet whose columns are the equality fields).
    */
  def deleteFilesOfManifest(conf: Configuration, manifestPath: String): Seq[DeleteFileEntry] =
    readAvro(conf, manifestPath).flatMap { rec =>
      val status = longField(rec, "status").getOrElse(1L)
      if (status == 2L) None
      else {
        val df = rec.get("data_file").asInstanceOf[GenericRecord]
        longField(df, "content").getOrElse(0L) match {
          case c @ (1L | 2L) => Some(DeleteFileEntry(df.get("file_path").toString, c))
          case other =>
            throw new IllegalArgumentException(
              s"unexpected content=$other in delete manifest $manifestPath")
        }
      }
    }

  private def longField(rec: GenericRecord, name: String): Option[Long] =
    if (rec.getSchema.getField(name) == null) None
    else Option(rec.get(name)).map {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long    => l.longValue
      case other                => other.toString.toLong
    }

  /** Read a whole Avro object file from the table's filesystem (r2://,
    * file://, …). Manifests are small (KBs–MBs of metadata about TBs of
    * data), so a full in-memory read is the right call — the data files
    * themselves stay on the FS and are byte-range-scanned by Spark's
    * parquet source.
    */
  private def readAvro(conf: Configuration, pathStr: String): Seq[GenericRecord] = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(path)
    try in.readFully(0, bytes) finally in.close()
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (reader.hasNext) buf += reader.next()
      buf.toSeq
    } finally reader.close()
  }
}
