package graft

import org.apache.spark.sql.functions._

import graft.sinks.AvroSink
import graft.sources.AvroSource

class AvroSpec extends SparkSpec {

  test("zigzag matches the avro wire spec") {
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    assert(hex(AvroSink.zigzag(0)) === "00")
    assert(hex(AvroSink.zigzag(-1)) === "01")
    assert(hex(AvroSink.zigzag(1)) === "02")
    assert(hex(AvroSink.zigzag(-2)) === "03")
    assert(hex(AvroSink.zigzag(-64)) === "7f")
    assert(hex(AvroSink.zigzag(64)) === "8001")
  }

  test("schema json derives unions for nullable fields and parses back") {
    import org.apache.spark.sql.types._
    val fields = Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("x", DoubleType, nullable = false),
      StructField("b", BooleanType, nullable = true))
    val json = AvroSink.schemaJson(fields, "t")
    val st = AvroSource.schemaOf(json)
    assert(st.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ===
      fields.map(f => (f.name, f.dataType, f.nullable)))
  }

  test("write -> read round trip: null and deflate codecs, null unions") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro_spec").toString
    val rows = Seq(
      ("a.avro", 1L, 10L, Option("hi"), 1.5, true),
      ("a.avro", 2L, -3L, None, -0.25, false),
      ("b.deflate.avro", 3L, 99L, Option("yo"), 2.0, true))
      .toDF("file", "seq", "k", "s", "x", "flag")
    val facts = AvroSink.writeFiles(rows, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(facts === Map("a.avro" -> 2L, "b.deflate.avro" -> 1L))
    val back = AvroSource.readFiles(s, s"$dir/*.avro")
      .select("file", "k", "s", "x", "flag")
      .as[(String, Long, Option[String], Double, Boolean)]
      .collect().toSet
    assert(back === Set(
      ("a.avro", 10L, Some("hi"), 1.5, true),
      ("a.avro", -3L, None, -0.25, false),
      ("b.deflate.avro", 99L, Some("yo"), 2.0, true)))
  }

  test("torn blocks reject: sync marker mismatch is loud") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro_spec2").toString
    Seq(("c.avro", 1L, 5L)).toDF("file", "seq", "k")
      .pipe(df => AvroSink.writeFiles(df, dir)).count()
    val p = java.nio.file.Paths.get(dir, "c.avro")
    val bytes = java.nio.file.Files.readAllBytes(p)
    bytes(bytes.length - 3) = (bytes(bytes.length - 3) ^ 0x01).toByte // sync byte
    java.nio.file.Files.write(p, bytes)
    // the Hadoop local FS checksum sidecar may reject first — also loud;
    // remove it to drive the failure through OUR sync verification
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, ".c.avro.crc"))
    val ex = intercept[Throwable] {
      AvroSource.readFiles(s, s"$dir/*.avro").count()
    }
    def mentionsSync(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("sync")) ||
        mentionsSync(t.getCause))
    assert(mentionsSync(ex) || ex.isInstanceOf[org.apache.hadoop.fs.ChecksumException],
      s"unexpected failure: $ex")
  }

  private implicit class Piper[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
