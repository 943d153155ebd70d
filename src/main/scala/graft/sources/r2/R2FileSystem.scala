package graft.sources.r2

import java.net.{URI, URLEncoder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import graft.core.Http

/** Read-only Hadoop `FileSystem` over R2's S3-compatible object API —
  * the NATIVE R2 table path beyond the reference's 1-row JSON
  * passthrough (r2_functions.cpp:35-37): register it and
  * `spark.read.parquet("r2://<bucket>/<prefix>")` goes through Spark's
  * own parquet source, so predicate pushdown, column pruning, row-group
  * skipping, and split planning all work against R2-hosted objects with
  * byte-ranged GETs (footer + projected column chunks only — never whole
  * objects).
  *
  * Wiring (hadoopConfiguration):
  *  - `fs.r2.impl`      = graft.sources.r2.R2FileSystem
  *  - `fs.r2.endpoint`  = https://<account_id>.r2.cloudflarestorage.com
  *                        (or an in-process stub for tests — zero egress)
  *  - `fs.r2.token`     = bearer token (optional; falls back to the
  *                        `r2_sql` secret surface)
  *
  * Listing uses ListObjectsV2 (`?list-type=2&prefix=&delimiter=/`) and
  * follows `NextContinuationToken` across the server's 1,000-key page
  * cap, so a prefix holding millions of objects lists completely; status
  * calls are two `max-keys=1` probes (the s3a pattern). Object length
  * comes from the listing, so reads never fetch un-asked-for bytes.
  * All mutation entry points throw: the reference exposes no R2 write
  * surface, and a read-only FS can never corrupt a lake.
  */
class R2FileSystem extends FileSystem {

  private var fsUri: URI = _
  private var endpoint: String = _
  private var token: String = _
  private var blockSize: Long = _

  override def getScheme: String = "r2"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"r2://${name.getAuthority}")
    endpoint = conf.getTrimmed("fs.r2.endpoint", "")
    if (endpoint.isEmpty)
      throw new java.io.IOException(
        "fs.r2.endpoint must be set (https://<account_id>.r2.cloudflarestorage.com)")
    token = conf.getTrimmed("fs.r2.token", "")
    blockSize = conf.getLong("fs.r2.block.size", 32L * 1024 * 1024)
  }

  override def getUri: URI = fsUri
  private def bucket: String = fsUri.getAuthority
  private def keyOf(p: Path): String =
    p.toUri.getPath.stripPrefix("/").stripSuffix("/")
  private def auth: Map[String, String] =
    if (token.isEmpty) Map.empty else Map("Authorization" -> s"Bearer $token")

  private case class Obj(key: String, size: Long)
  private case class ListPage(objs: Seq[Obj], prefixes: Seq[String],
                              truncated: Boolean, next: Option[String])

  /** One ListObjectsV2 request (a single page — the server caps responses
    * at 1,000 keys no matter what `max-keys` asks for).
    */
  private def listPage(prefix: String, delimited: Boolean, maxKeys: Int,
                       token: Option[String]): ListPage = {
    val enc = URLEncoder.encode(prefix, "UTF-8")
    val delim = if (delimited) "&delimiter=%2F" else ""
    val tok = token.map(t => s"&continuation-token=${URLEncoder.encode(t, "UTF-8")}")
      .getOrElse("")
    val resp = Http.get(
      s"$endpoint/$bucket?list-type=2&prefix=$enc&max-keys=$maxKeys$delim$tok", auth)
    if (resp.status >= 400)
      throw new java.io.IOException(s"R2 list failed: HTTP ${resp.status}")
    val xml = resp.bodyString
    val objs = "<Contents>.*?</Contents>".r.findAllIn(xml).toSeq.flatMap { c =>
      for {
        k <- "<Key>(.*?)</Key>".r.findFirstMatchIn(c).map(_.group(1))
        s <- "<Size>(\\d+)</Size>".r.findFirstMatchIn(c).map(_.group(1).toLong)
      } yield Obj(k, s)
    }
    val prefixes = "<CommonPrefixes><Prefix>(.*?)</Prefix>".r.findAllMatchIn(xml)
      .map(_.group(1)).toSeq.filter(_ != prefix)
    val truncated = xml.contains("<IsTruncated>true</IsTruncated>")
    val next = "<NextContinuationToken>(.*?)</NextContinuationToken>".r
      .findFirstMatchIn(xml).map(_.group(1))
    ListPage(objs, prefixes, truncated, next)
  }

  /** Full ListObjectsV2 listing: loops on `NextContinuationToken` until
    * `IsTruncated=false`. A single-page read silently drops everything
    * past the server's 1,000-key cap — Spark would then plan an
    * incomplete scan, which is data loss, not an error. `delimited=true`
    * rolls keys below one level into CommonPrefixes (directory listing);
    * false returns the whole subtree.
    */
  private def listObjects(prefix: String, delimited: Boolean): (Seq[Obj], Seq[String]) = {
    val objs = Seq.newBuilder[Obj]
    val pfx = Seq.newBuilder[String]
    var token: Option[String] = None
    var done = false
    while (!done) {
      val page = listPage(prefix, delimited, maxKeys = 1000, token)
      objs ++= page.objs
      pfx ++= page.prefixes
      if (page.truncated) {
        if (page.next.isEmpty)
          throw new java.io.IOException(
            s"R2 list of '$prefix' truncated without NextContinuationToken")
        token = page.next
      } else done = true
    }
    (objs.result(), pfx.result().distinct)
  }

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return dirStatus(f) // bucket root
    // Two bounded probes (the s3a pattern), never an O(subtree) listing:
    // keys sort lexicographically, so with prefix=key the exact key — if
    // it exists — is always the first result.
    val exact = listPage(key, delimited = false, maxKeys = 1, token = None)
    exact.objs.headOption match {
      case Some(o) if o.key == key =>
        new FileStatus(o.size, false, 1, blockSize, 0L, f)
      case _ =>
        val sub = listPage(key + "/", delimited = false, maxKeys = 1, token = None)
        if (sub.objs.nonEmpty || sub.prefixes.nonEmpty) dirStatus(f)
        else throw new java.io.FileNotFoundException(s"r2://$bucket/$key")
    }
  }

  private def dirStatus(f: Path): FileStatus =
    new FileStatus(0, true, 1, blockSize, 0L, f)

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    // Hadoop FS contract: listStatus(file) returns that file's status,
    // not the (empty) listing under "key/" — Spark's InMemoryFileIndex
    // relies on this when given explicit file paths (e.g. an Iceberg
    // manifest's data files) rather than directories.
    if (key.nonEmpty) {
      val st = getFileStatus(f)
      if (!st.isDirectory) return Array(st)
    }
    val prefix = if (key.isEmpty) "" else key + "/"
    val (objs, prefixes) = listObjects(prefix, delimited = true)
    val files = objs.filter(_.key != prefix).map(o =>
      new FileStatus(o.size, false, 1, blockSize, 0L,
        new Path(s"r2://$bucket/${o.key}")))
    val dirs = prefixes.map(p => dirStatus(new Path(s"r2://$bucket/${p.stripSuffix("/")}")))
    (files ++ dirs).toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val st = getFileStatus(f)
    if (st.isDirectory) throw new java.io.IOException(s"$f is a directory")
    new FSDataInputStream(new R2InputStream(
      s"$endpoint/$bucket/${keyOf(f)}", st.getLen, auth))
  }

  override def exists(f: Path): Boolean =
    try { getFileStatus(f); true } catch { case _: java.io.FileNotFoundException => false }

  // ---- read-only: the reference exposes no R2 write surface ----------
  private def ro = new UnsupportedOperationException("R2 filesystem is read-only")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSz: Long,
                      progress: Progressable): FSDataOutputStream = throw ro
  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream = throw ro
  override def rename(src: Path, dst: Path): Boolean = throw ro
  override def delete(f: Path, recursive: Boolean): Boolean = throw ro
  override def mkdirs(f: Path, permission: FsPermission): Boolean = throw ro

  private var wd = new Path("/")
  override def setWorkingDirectory(dir: Path): Unit = { wd = dir }
  override def getWorkingDirectory: Path = wd
}

/** Seekable byte-ranged reader: sequential reads come from a bounded
  * read-ahead buffer (one ranged GET per `chunk` bytes); positioned
  * reads (parquet footer, column chunks) seek first. No state beyond the
  * buffer — safe for Hadoop's per-split readers.
  */
private[r2] class R2InputStream(url: String, length: Long,
                                auth: Map[String, String],
                                chunk: Int = 256 * 1024)
    extends FSInputStream {

  private var pos = 0L
  private var bufStart = 0L
  private var buf: Array[Byte] = Array.emptyByteArray

  override def seek(p: Long): Unit = {
    if (p < 0 || p > length) throw new java.io.EOFException(s"seek($p) len=$length")
    pos = p
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  private def fill(at: Long, want: Int): Unit = {
    val end = math.min(length, at + math.max(want, chunk)) - 1
    val resp = Http.get(url, auth + ("Range" -> s"bytes=$at-$end"))
    if (resp.status != 206 && resp.status != 200)
      throw new java.io.IOException(s"R2 ranged GET failed: HTTP ${resp.status}")
    buf = resp.body
    bufStart = at
  }

  override def read(): Int = {
    val one = new Array[Byte](1)
    if (read(one, 0, 1) == -1) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= length) return -1
    if (pos < bufStart || pos >= bufStart + buf.length) fill(pos, len)
    val avail = (bufStart + buf.length - pos).toInt
    val n = math.min(len, avail)
    System.arraycopy(buf, (pos - bufStart).toInt, b, off, n)
    pos += n
    n
  }

  override def close(): Unit = { buf = Array.emptyByteArray }
}
