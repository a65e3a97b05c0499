package graft.sinks

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) writer — counterpart of [[graft.sources.WarcSource]].
  * Rows arrive as (file, seq, warc_type, uri, status, mime, payload); each
  * file's records are assembled ON AN EXECUTOR (groupByKey per file — a
  * crawl file is sized to fit a task by construction) and written via the
  * Hadoop filesystem, the same shape as [[TarSink.writeShards]].
  *
  * Record forms emitted:
  *  - `response`: block is an `HTTP/1.1 <status>` message wrapping the
  *    payload as entity body with the given mime — the crawl-capture form;
  *  - anything else (`resource`, `conversion`, …): block IS the payload
  *    with Content-Type = mime — `conversion` + `text/plain` is exactly a
  *    WET extracted-text record.
  * A `warcinfo` record leads each file, as the spec recommends.
  *
  * Determinism: WARC-Record-IDs are `urn:uuid:` values derived from the
  * md5 of (file, seq, uri) — not random — and the date is caller-fixed, so
  * two runs produce byte-identical files (`.gz` included: per-record gzip
  * members, fixed headers), which is what lets a round-trip query
  * hash-match an oracle.
  */
object WarcSink {

  private val Crlf = "\r\n"

  private def statusText(code: Int): String = code match {
    case 200 => "OK"
    case 301 => "Moved Permanently"
    case 302 => "Found"
    case 304 => "Not Modified"
    case 403 => "Forbidden"
    case 404 => "Not Found"
    case 500 => "Internal Server Error"
    case _   => "Status"
  }

  /** Deterministic urn:uuid from the record's identity (md5 → 8-4-4-4-12). */
  private[graft] def recordId(file: String, seq: Long, uri: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$file|$seq|$uri".getBytes("UTF-8"))
    val h = d.map(b => f"${b & 0xff}%02x").mkString
    s"urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20, 32)}"
  }

  /** Render one record: version line, headers, empty line, block, CRLF CRLF. */
  private[graft] def renderRecord(file: String, seq: Long, warcType: String,
                                  uri: String, date: String, status: Int,
                                  mime: String, payload: Array[Byte]): Array[Byte] = {
    val block: Array[Byte] =
      if (warcType == "response") {
        val http = new ByteArrayOutputStream(payload.length + 128)
        http.write((s"HTTP/1.1 $status ${statusText(status)}$Crlf" +
          s"Content-Type: $mime$Crlf" +
          s"Content-Length: ${payload.length}$Crlf$Crlf").getBytes("US-ASCII"))
        http.write(payload)
        http.toByteArray
      } else payload
    val ctype =
      if (warcType == "response") "application/http; msgtype=response" else mime
    val hdr = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: ").append(warcType).append(Crlf)
      .append("WARC-Record-ID: <").append(recordId(file, seq, uri)).append(">").append(Crlf)
      .append("WARC-Date: ").append(date).append(Crlf)
    if (uri.nonEmpty) hdr.append("WARC-Target-URI: ").append(uri).append(Crlf)
    hdr.append("Content-Type: ").append(ctype).append(Crlf)
      .append("Content-Length: ").append(block.length).append(Crlf).append(Crlf)
    val out = new ByteArrayOutputStream(block.length + hdr.length + 8)
    out.write(hdr.toString.getBytes("UTF-8"))
    out.write(block)
    out.write((Crlf + Crlf).getBytes("US-ASCII"))
    out.toByteArray
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  /** df(fileCol, seqCol, typeCol, uriCol, statusCol, mimeCol, payloadCol) →
    * one WARC file per `fileCol` under `dir`, records in ascending seq
    * order behind a leading warcinfo. Files named `*.gz` compress each
    * record as its own gzip member (the Common Crawl layout). Returns
    * (file, n_records, n_bytes) written-file facts.
    */
  def writeFiles(df: DataFrame, dir: String, date: String,
                 fileCol: String = "file", seqCol: String = "seq",
                 typeCol: String = "warc_type", uriCol: String = "uri",
                 statusCol: String = "status", mimeCol: String = "mime",
                 payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(col(fileCol).cast("string"), col(seqCol).cast("long"),
        col(typeCol).cast("string"), col(uriCol).cast("string"),
        col(statusCol).cast("int"), col(mimeCol).cast("string"), col(payloadCol))
      .as[(String, Long, String, String, Int, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        val gz = file.endsWith(".gz")
        val rows = it.toArray.sortBy(_._2)
        val info = renderRecord(file, -1L, "warcinfo", "", date, 0,
          "application/warc-fields",
          s"software: graft$Crlf".getBytes("US-ASCII"))
        val records = info +: rows.map { case (_, seq, t, uri, st, mime, pay) =>
          renderRecord(file, seq, t, uri, date, st, mime, pay)
        }
        val out = new ByteArrayOutputStream()
        records.foreach(r => out.write(if (gz) gzipMember(r) else r))
        val bytes = out.toByteArray
        val p = new Path(dir, file)
        val fs = p.getFileSystem(conf.value)
        val os = fs.create(p, true)
        os.write(bytes)
        os.close()
        (file, records.length.toLong, bytes.length.toLong)
      }
      .toDF("file", "n_records", "n_bytes")
  }
}
