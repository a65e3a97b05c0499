package graft.sinks

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Avro Object Container File writer — the interchange format half the
  * data-engineering world feeds pipelines with; implemented from the
  * public spec. Layout: `Obj\x01` magic, a file-metadata map
  * (`avro.schema` JSON + `avro.codec`), a 16-byte sync marker, then data
  * blocks of (record count, byte size, records[, deflated], sync).
  * Record fields encode in schema order: zigzag varints for int/long,
  * little-endian 8 bytes for double, length-prefixed UTF-8 for
  * string/bytes, one byte for boolean, and a zigzag branch index for the
  * nullable `["null", T]` union.
  *
  * Schema is DERIVED from the DataFrame's own column types (long, double,
  * string, boolean, binary; nullable → union). Shard assembly mirrors the
  * tar/WARC/TFRecord sinks: one `groupByKey(file).mapGroups`, bytes
  * written executor-side. Determinism: the sync marker is the md5 of the
  * file name, blocks cut every `blockRecords` rows, single-pass deflate —
  * byte-identical across runs.
  */
object AvroSink {

  private[graft] def zigzag(v: Long): Array[Byte] = {
    var z = (v << 1) ^ (v >> 63)
    val out = new ByteArrayOutputStream(10)
    do {
      val b = (z & 0x7f).toInt
      z = z >>> 7
      out.write(if (z != 0) b | 0x80 else b)
    } while (z != 0)
    out.toByteArray
  }

  private def utf8(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    zigzag(b.length.toLong) ++ b
  }

  /** Avro type name for a Spark field (nullable → `["null", t]` union). */
  private def avroType(f: StructField): String = {
    val base = f.dataType match {
      case LongType | IntegerType => "\"long\""
      case DoubleType | FloatType => "\"double\""
      case StringType => "\"string\""
      case BooleanType => "\"boolean\""
      case BinaryType => "\"bytes\""
      case t => sys.error(s"unsupported avro field type $t for ${f.name}")
    }
    if (f.nullable) s"""["null", $base]""" else base
  }

  private[graft] def schemaJson(fields: Seq[StructField], name: String): String =
    s"""{"type": "record", "name": "$name", "fields": [""" +
      fields.map(f => s"""{"name": "${f.name}", "type": ${avroType(f)}}""")
        .mkString(", ") + "]}"

  private def encodeValue(dt: DataType, v: Any, out: ByteArrayOutputStream): Unit =
    dt match {
      case LongType => out.write(zigzag(v.asInstanceOf[Long]))
      case IntegerType => out.write(zigzag(v.asInstanceOf[Int].toLong))
      case DoubleType =>
        val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
        (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt))
      case FloatType => encodeValue(DoubleType, v.asInstanceOf[Float].toDouble, out)
      case StringType => out.write(utf8(v.asInstanceOf[String]))
      case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        out.write(zigzag(b.length.toLong)); out.write(b)
      case t => sys.error(s"unsupported avro encode type $t")
    }

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    // avro deflate codec = RAW deflate stream (no zlib wrapper)
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(bytes); d.finish()
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val buf = new Array[Byte](1 << 16)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private[graft] def syncMarker(file: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(file.getBytes("UTF-8"))

  /** df(fileCol, seqCol, <record fields>*) → one Avro container per file
    * under `dir`, records in seq order; files named `*.deflate.avro` use
    * the deflate codec, others the null codec. Returns (file, n_records,
    * n_bytes).
    */
  def writeFiles(df: DataFrame, dir: String, fileCol: String = "file",
                 seqCol: String = "seq", blockRecords: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fields = df.schema.fields.toSeq
      .filterNot(f => f.name == fileCol || f.name == seqCol)
    val schema = schemaJson(fields, "graft_record")
    val idx = df.schema.fieldNames.toSeq
    val fileIdx = idx.indexOf(fileCol)
    val seqIdx = idx.indexOf(seqCol)
    val fieldIdx = fields.map(f => idx.indexOf(f.name))
    df.groupByKey(r => r.getString(fileIdx))(org.apache.spark.sql.Encoders.STRING)
      .mapGroups { (file, it) =>
        val gz = file.endsWith(".deflate.avro")
        val sync = syncMarker(file)
        val out = new ByteArrayOutputStream()
        out.write(Array[Byte]('O', 'b', 'j', 1))
        // metadata map: one block of 2 entries, then the 0 terminator
        out.write(zigzag(2L))
        out.write(utf8("avro.codec"))
        out.write(utf8(if (gz) "deflate" else "null"))
        out.write(utf8("avro.schema"))
        out.write(utf8(schema))
        out.write(zigzag(0L))
        out.write(sync)
        var n = 0L
        it.toArray.sortBy(_.getLong(seqIdx)).grouped(blockRecords).foreach { rows =>
          val block = new ByteArrayOutputStream()
          rows.foreach { r =>
            fields.zip(fieldIdx).foreach { case (f, i) =>
              if (f.nullable) {
                if (r.isNullAt(i)) block.write(zigzag(0L)) // branch 0 = null
                else { block.write(zigzag(1L)); encodeValue(f.dataType, r.get(i), block) }
              } else encodeValue(f.dataType, r.get(i), block)
            }
            n += 1
          }
          val payload = if (gz) deflate(block.toByteArray) else block.toByteArray
          out.write(zigzag(rows.length.toLong))
          out.write(zigzag(payload.length.toLong))
          out.write(payload)
          out.write(sync)
        }
        val bytes = out.toByteArray
        val p = new Path(dir, file)
        val fs = p.getFileSystem(conf.value)
        val os = fs.create(p, true)
        os.write(bytes)
        os.close()
        (file, n, bytes.length.toLong)
      }(org.apache.spark.sql.Encoders.product[(String, Long, Long)])
      .toDF("file", "n_records", "n_bytes")
  }
}
