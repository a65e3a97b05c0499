package graft.sources

import java.util.zip.Inflater

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File reader — counterpart of
  * [[graft.sinks.AvroSink]], implemented from the public spec: header
  * magic + metadata map (`avro.schema` JSON, `avro.codec`), sync-marker-
  * framed data blocks (null and deflate codecs), zigzag/length-prefixed
  * primitive decoding, nullable `["null", T]` unions by branch index.
  *
  * The record schema is read from the FIRST matching file's header
  * driver-side (schema JSON → StructType via the Jackson parser already
  * on the Spark classpath); files then decode executor-side into Rows of
  * that schema — the dynamic-schema shape `Encoders.row` exists for.
  * Sync markers are verified between blocks; a mismatch rejects loudly
  * (a torn or mis-spliced container must not decode silently).
  */
object AvroSource {

  private final class R(val b: Array[Byte], var off: Int) {
    def u8(): Int = { val v = b(off) & 0xff; off += 1; v }
    def zigzag(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        val x = u8(); v |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      (v >>> 1) ^ -(v & 1L)
    }
    def bytes(n: Int): Array[Byte] = {
      require(off + n <= b.length, s"avro read overruns: $n at $off")
      val out = java.util.Arrays.copyOfRange(b, off, off + n); off += n; out
    }
    def utf8(): String = new String(bytes(zigzag().toInt), "UTF-8")
    def hasMore: Boolean = off < b.length
  }

  /** Parse the header: (metadata map, sync marker, offset after header). */
  private def header(r: R): (Map[String, Array[Byte]], Array[Byte]) = {
    require(r.u8() == 'O' && r.u8() == 'b' && r.u8() == 'j' && r.u8() == 1,
      "not an Avro object container (bad magic)")
    val meta = Map.newBuilder[String, Array[Byte]]
    var count = r.zigzag()
    while (count != 0) {
      val n = if (count < 0) { r.zigzag(); -count } else count // block size form
      (0L until n).foreach { _ =>
        val k = r.utf8()
        meta += k -> r.bytes(r.zigzag().toInt)
      }
      count = r.zigzag()
    }
    (meta.result(), r.bytes(16))
  }

  /** Minimal schema mapping for the supported subset. */
  private[graft] def schemaOf(json: String): StructType = {
    val root = new ObjectMapper().readTree(json)
    require(root.path("type").asText() == "record", "top-level must be a record")
    val fields = root.path("fields")
    StructType((0 until fields.size()).map { i =>
      val f = fields.get(i)
      val name = f.path("name").asText()
      val t = f.path("type")
      val (tn, nullable) =
        if (t.isArray) {
          require(t.size() == 2 && t.get(0).asText() == "null",
            s"only [null, T] unions supported for $name")
          (t.get(1).asText(), true)
        } else (t.asText(), false)
      val dt = tn match {
        case "long" | "int" => LongType
        case "double" | "float" => DoubleType
        case "string" => StringType
        case "boolean" => BooleanType
        case "bytes" => BinaryType
        case other => sys.error(s"unsupported avro type $other for $name")
      }
      StructField(name, dt, nullable)
    })
  }

  private def decodeValue(dt: DataType, tn: String, r: R): Any = dt match {
    case LongType => if (tn == "int") r.zigzag() else r.zigzag()
    case DoubleType =>
      if (tn == "float") {
        val bits = (0 until 4).map(i => (r.u8().toLong & 0xff) << (8 * i)).reduce(_ | _)
        java.lang.Float.intBitsToFloat(bits.toInt).toDouble
      } else {
        val bits = (0 until 8).map(i => (r.u8().toLong & 0xff) << (8 * i)).reduce(_ | _)
        java.lang.Double.longBitsToDouble(bits)
      }
    case StringType => r.utf8()
    case BooleanType => r.u8() == 1
    case BinaryType => r.bytes(r.zigzag().toInt)
    case t => sys.error(s"unsupported avro decode type $t")
  }

  private def inflateRaw(bytes: Array[Byte]): Array[Byte] = {
    val inf = new Inflater(true)
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](1 << 16)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished(), "truncated deflate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Decode one container file into rows of `schema` (with the raw
    * per-field avro type names for int/float widening).
    */
  private[graft] def parse(bytes: Array[Byte], schema: StructType,
                           typeNames: Seq[String]): Seq[Row] = {
    val r = new R(bytes, 0)
    val (meta, sync) = header(r)
    val codec = new String(meta.getOrElse("avro.codec", "null".getBytes), "UTF-8")
    val out = Seq.newBuilder[Row]
    while (r.hasMore) {
      val count = r.zigzag()
      val size = r.zigzag().toInt
      val payload = r.bytes(size)
      val blockSync = r.bytes(16)
      require(java.util.Arrays.equals(blockSync, sync),
        "sync marker mismatch — torn avro block")
      val br = new R(if (codec == "deflate") inflateRaw(payload) else payload, 0)
      (0L until count).foreach { _ =>
        out += Row.fromSeq(schema.fields.toSeq.zip(typeNames).map {
          case (f, tn) =>
            if (f.nullable) {
              if (br.zigzag() == 0L) null else decodeValue(f.dataType, tn, br)
            } else decodeValue(f.dataType, tn, br)
        })
      }
    }
    out.result()
  }

  /** Raw avro type name per field (for int/float width handling). */
  private def typeNamesOf(json: String): Seq[String] = {
    val fields = new ObjectMapper().readTree(json).path("fields")
    (0 until fields.size()).map { i =>
      val t = fields.get(i).path("type")
      if (t.isArray) t.get(1).asText() else t.asText()
    }
  }

  /** One row per record across all files matching the glob, with a
    * leading `file` column. Schema comes from the first file's header
    * (one driver-side header read); all files must share it.
    */
  def readFiles(spark: SparkSession, pathGlob: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val glob = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = glob.getFileSystem(hconf)
    val paths = Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath)
    require(paths.nonEmpty, s"no avro files match $pathGlob")
    val head = {
      val in = fs.open(paths.head)
      try {
        val buf = new Array[Byte](math.min(1 << 20,
          fs.getFileStatus(paths.head).getLen).toInt)
        in.readFully(0, buf)
        val (meta, _) = header(new R(buf, 0))
        new String(meta("avro.schema"), "UTF-8")
      } finally in.close()
    }
    val schema = schemaOf(head)
    val typeNames = typeNamesOf(head)
    val conf = new org.apache.spark.util.SerializableConfiguration(hconf)
    val full = StructType(StructField("file", StringType, nullable = false) +:
      schema.fields.toSeq)
    import org.apache.spark.sql.Encoders
    import spark.implicits._
    spark.createDataset(paths.map(_.toString).toSeq)
      .flatMap { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val pfs = path.getFileSystem(conf.value)
        val len = pfs.getFileStatus(path).getLen.toInt
        val bytes = new Array[Byte](len)
        val in = pfs.open(path)
        try in.readFully(0, bytes) finally in.close()
        parse(bytes, schema, typeNames)
          .map(r => Row.fromSeq(path.getName +: r.toSeq))
      }(Encoders.row(full))
  }
}
