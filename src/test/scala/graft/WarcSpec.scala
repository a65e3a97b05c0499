package graft

import org.apache.spark.sql.functions._

import graft.sinks.WarcSink
import graft.sources.WarcSource

class WarcSpec extends SparkSpec {

  private val date = "2026-01-01T00:00:00Z"

  private def record(seq: Long, body: String, status: Int = 200): Array[Byte] =
    WarcSink.renderRecord("f.warc", seq, "response",
      s"https://ex.com/doc/$seq", date, status, "text/html",
      body.getBytes("UTF-8"))

  test("response record: render -> parse recovers headers, status, body") {
    val bytes = record(7, "<html>seven</html>", status = 404)
    val rs = WarcSource.parse(bytes)
    assert(rs.length === 1)
    val r = rs.head
    assert(r.warcType === "response")
    assert(r.targetUri === "https://ex.com/doc/7")
    assert(r.warcDate === date)
    assert(r.contentType.startsWith("application/http"))
    assert(r.httpStatus === Some(404))
    assert(r.httpMime === Some("text/html"))
    assert(new String(r.body, "UTF-8") === "<html>seven</html>")
    // content_length covers the whole HTTP message: status line (15 + text)
    // + Content-Type (25) + Content-Length (18 + digits) + blank (2) + body
    val bodyLen = "<html>seven</html>".length
    assert(r.contentLength ===
      bodyLen + 60 + "Not Found".length + bodyLen.toString.length)
  }

  test("non-http record types carry the raw block (WET conversion shape)") {
    val bytes = WarcSink.renderRecord("f.warc", 1, "conversion",
      "https://ex.com/a", date, 0, "text/plain", "extracted text".getBytes("UTF-8"))
    val r = WarcSource.parse(bytes).head
    assert(r.warcType === "conversion")
    assert(r.httpStatus === None)
    assert(r.contentType === "text/plain")
    assert(new String(r.body, "UTF-8") === "extracted text")
    assert(r.contentLength === "extracted text".length)
  }

  test("concatenated records parse in order; per-record gzip members too") {
    val plain = record(1, "one") ++ record(2, "two") ++ record(3, "three")
    assert(WarcSource.parse(plain).map(_.recIdx) === Seq(0L, 1L, 2L))
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.close(); out.toByteArray
    }
    // the Common Crawl layout: each record its own gzip member
    val members = gz(record(1, "one")) ++ gz(record(2, "two")) ++ gz(record(3, "three"))
    val rs = WarcSource.parse(members)
    assert(rs.map(r => new String(r.body, "UTF-8")) === Seq("one", "two", "three"))
  }

  test("record ids are deterministic and render is byte-stable") {
    assert(WarcSink.recordId("f", 1, "u") === WarcSink.recordId("f", 1, "u"))
    assert(WarcSink.recordId("f", 1, "u") !== WarcSink.recordId("f", 2, "u"))
    assert(WarcSink.recordId("f", 1, "u").matches(
      "urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(java.util.Arrays.equals(record(5, "same"), record(5, "same")))
  }

  test("malformed input rejects loudly") {
    intercept[IllegalArgumentException] {
      WarcSource.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII"))
    }
    val truncated = record(1, "full body").dropRight(15)
    intercept[IllegalArgumentException](WarcSource.parse(truncated))
  }

  test("writeFiles -> readRecords end to end, plain and gzip, warcinfo led") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_spec").toString
    val rows = Seq(
      ("a.warc", 1L, "response", "https://x.com/1", 200, "text/html", "b1"),
      ("a.warc", 2L, "response", "https://x.com/2", 404, "text/html", "b22"),
      ("b.warc.gz", 3L, "response", "https://y.com/3", 200, "text/plain", "b333"))
      .toDF("file", "seq", "warc_type", "uri", "status", "mime", "body")
      .withColumn("payload", encode(col("body"), "UTF-8"))
    val facts = WarcSink.writeFiles(rows, dir, date).collect()
    assert(facts.map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a.warc", 3L), ("b.warc.gz", 2L))) // warcinfo + responses
    val back = WarcSource.readRecords(s, s"$dir/*")
    assert(back.count() === 5)
    val resp = back.filter(col("warc_type") === "response")
      .select(col("target_uri"), col("http_status"),
        decode(col("body"), "UTF-8").as("b"))
      .as[(String, Int, String)].collect().toSet
    assert(resp === Set(("https://x.com/1", 200, "b1"),
      ("https://x.com/2", 404, "b22"), ("https://y.com/3", 200, "b333")))
    val info = back.filter(col("warc_type") === "warcinfo")
    assert(info.count() === 2)
  }
}
