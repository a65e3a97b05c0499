package graft

import org.apache.spark.sql.functions._

import graft.sinks.TfRecordSink
import graft.sources.TfRecordSource

class TfRecordSpec extends SparkSpec {

  test("varint matches the protobuf wire spec") {
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    assert(hex(TfRecordSink.varint(0)) === "00")
    assert(hex(TfRecordSink.varint(1)) === "01")
    assert(hex(TfRecordSink.varint(127)) === "7f")
    assert(hex(TfRecordSink.varint(128)) === "8001")
    assert(hex(TfRecordSink.varint(300)) === "ac02") // the spec's example
    assert(hex(TfRecordSink.varint(-1L)) === "ffffffffffffffffff01")
  }

  test("masked CRC32C framing round trips and detects corruption") {
    val payload = "hello tfrecord".getBytes("UTF-8")
    val rec = TfRecordSink.renderRecord(payload)
    assert(rec.length === payload.length + 16)
    val back = TfRecordSource.parse(rec)
    assert(back.length === 1)
    assert(java.util.Arrays.equals(back.head, payload))
    // flip one payload byte: the data crc must catch it
    val bad = rec.clone(); bad(13) = (bad(13) ^ 0x01).toByte
    intercept[IllegalArgumentException](TfRecordSource.parse(bad))
  }

  test("example encode -> generic decode recovers features") {
    val ex = TfRecordSink.example(Seq(
      "text" -> TfRecordSink.bytesFeature("abc".getBytes("UTF-8")),
      "ids" -> TfRecordSink.int64Feature(Seq(1L, 300L, 0L, 127L)),
      "n" -> TfRecordSink.int64Feature(Seq(42L))))
    val dec = TfRecordSource.decodeExample(ex)
    assert(new String(dec.bytesFeatures("text"), "UTF-8") === "abc")
    assert(dec.int64Features("ids") === Seq(1L, 300L, 0L, 127L))
    assert(dec.int64Features("n") === Seq(42L))
  }

  test("writeExamples -> readExamples end to end over shards") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec_spec").toString
    val rows = Seq(
      ("s0.tfrecord", 1L, "one", Seq(1L, 11L)),
      ("s0.tfrecord", 2L, "two", Seq(2L)),
      ("s1.tfrecord", 3L, "three", Seq(3L, 33L, 333L)))
      .toDF("shard", "seq", "txt", "ids")
      .withColumn("text", encode(col("txt"), "UTF-8"))
    val facts = TfRecordSink.writeExamples(rows, dir,
      bytesFeatures = Seq("text"), int64Features = Seq("ids"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(facts === Map("s0.tfrecord" -> 2L, "s1.tfrecord" -> 1L))
    val back = TfRecordSource.readExamples(s, s"$dir/*",
      bytesFeatures = Seq("text"), int64Features = Seq("ids"))
    val got = back.select(col("shard"), decode(col("text"), "UTF-8").as("t"),
        col("ids"))
      .as[(String, String, Seq[Long])].collect().toSet
    assert(got === Set(
      ("s0.tfrecord", "one", Seq(1L, 11L)),
      ("s0.tfrecord", "two", Seq(2L)),
      ("s1.tfrecord", "three", Seq(3L, 33L, 333L))))
  }
}
