package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) reader — the container format of web-crawl
  * corpora (Common Crawl ships WARC/WAT/WET; an LLM curation pipeline's
  * text usually STARTS here). The reference's curator reads per-domain
  * scientific containers (the `domains/mesh/sources` readers); WARC is
  * the equivalent for web text, so the engine reads it natively.
  *
  * Codec, per the public spec: a WARC file is a concatenation of records —
  * a `WARC/1.0` (or 1.1) version line, CRLF-terminated named headers
  * (`WARC-Type`, `WARC-Target-URI`, `WARC-Date`, `Content-Type`,
  * `Content-Length`), an empty line, `Content-Length` bytes of block, and
  * a CRLF CRLF record trailer. `.warc.gz` files gzip each record as its
  * own member (the Common Crawl convention for record-level random
  * access); `java.util.zip.GZIPInputStream` reads concatenated members
  * transparently, so the same inflate path covers per-record and
  * whole-file compression. For `response`/`request` records the block is
  * an HTTP/1.1 message (`application/http`); the status line and message
  * headers are split off and the entity body is surfaced as the payload.
  *
  * Scale design: one task per WARC file (`binaryFile` scan — crawl files
  * are sized ~1 GB for exactly this), records parsed inside the task.
  * Paths shuffle, bytes don't — the same contract as
  * [[graft.sources.TarSource]].
  */
object WarcSource {

  final case class WarcRecord(
      recIdx: Long,
      warcType: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      contentLength: Long,
      httpStatus: Option[Int],
      httpMime: Option[String],
      body: Array[Byte])

  private val Crlf = "\r\n"

  /** Read one CRLF-terminated ASCII line starting at `off`; returns
    * (line-without-terminator, offset-after-terminator). Header lines are
    * ASCII per spec (field values may be UTF-8 — decoded as such).
    */
  private def line(b: Array[Byte], off: Int): (String, Int) = {
    var i = off
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    require(i + 1 < b.length, s"unterminated header line at offset $off")
    (new String(b, off, i - off, "UTF-8"), i + 2)
  }

  /** Parse `Name: value` headers until the empty line; names are
    * case-insensitive per the spec, folded to lower for lookup.
    */
  private def headers(b: Array[Byte], off0: Int): (Map[String, String], Int) = {
    var off = off0
    val m = Map.newBuilder[String, String]
    var done = false
    while (!done) {
      val (l, next) = line(b, off)
      off = next
      if (l.isEmpty) done = true
      else {
        val c = l.indexOf(':')
        require(c > 0, s"malformed header line '$l'")
        m += (l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
      }
    }
    (m.result(), off)
  }

  /** Split an `application/http` block into (status, mime, body). Tolerant
    * of header-only messages (no CRLFCRLF → empty body).
    */
  private def splitHttp(block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    val (statusLine, afterStatus) = line(block, 0)
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2 && parts(0).startsWith("HTTP/"),
      s"not an HTTP status line: '$statusLine'")
    val status = parts(1).toInt
    val (hs, bodyOff) = headers(block, afterStatus)
    (Some(status), hs.get("content-type"),
      java.util.Arrays.copyOfRange(block, bodyOff, block.length))
  }

  /** Walk a (possibly gzipped) WARC file into records. */
  def parse(raw: Array[Byte]): Seq[WarcRecord] = {
    val b = TarSource.ungzipIfNeeded(raw)
    val out = Seq.newBuilder[WarcRecord]
    var off = 0
    var idx = 0L
    while (off < b.length) {
      val (version, afterVersion) = line(b, off)
      require(version.startsWith("WARC/"), s"expected WARC version line at $off, got '$version'")
      val (hs, blockOff) = headers(b, afterVersion)
      val len = hs.getOrElse("content-length",
        sys.error(s"record at $off lacks Content-Length")).toLong
      require(blockOff + len <= b.length,
        s"record block truncated at $blockOff: needs $len of ${b.length - blockOff}")
      val block = java.util.Arrays.copyOfRange(b, blockOff, (blockOff + len).toInt)
      val ctype = hs.getOrElse("content-type", "")
      val (status, mime, body) =
        if (ctype.startsWith("application/http")) splitHttp(block)
        else (None, None, block)
      out += WarcRecord(idx, hs.getOrElse("warc-type", ""),
        hs.getOrElse("warc-target-uri", ""), hs.getOrElse("warc-date", ""),
        ctype, len, status, mime, body)
      idx += 1
      // record trailer: two CRLFs (tolerate EOF right after the block)
      var t = blockOff + len.toInt
      var crlfs = 0
      while (crlfs < 2 && t + 1 < b.length && b(t) == '\r' && b(t + 1) == '\n') {
        t += 2; crlfs += 1
      }
      off = t
    }
    out.result()
  }

  /** One row per record: (file, rec_idx, warc_type, target_uri, warc_date,
    * content_type, content_length, http_status, http_mime, body). The
    * `body` is the HTTP entity body for `application/http` records and the
    * raw block otherwise (so `conversion`/WET text records surface their
    * text directly).
    */
  def readRecords(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        parse(bytes).map(r => (file, r.recIdx, r.warcType, r.targetUri,
          r.warcDate, r.contentType, r.contentLength,
          r.httpStatus, r.httpMime, r.body))
      }
      .toDF("file", "rec_idx", "warc_type", "target_uri", "warc_date",
        "content_type", "content_length", "http_status", "http_mime", "body")
  }
}
