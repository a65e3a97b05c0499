package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord reader — counterpart of [[graft.sinks.TfRecordSink]]. Walks
  * the public framing (length · masked-crc · payload · masked-crc, both
  * CRC32C checksums ENFORCED) and decodes each `tf.train.Example` payload
  * with a generic protobuf wire walk (varint / 64-bit / length-delimited /
  * 32-bit), surfacing BytesList and Int64List features by name. Packed
  * and unpacked int64 encodings both parse (the spec allows either on the
  * wire). One task per shard file; bytes never shuffle.
  */
object TfRecordSource {

  final case class Example(bytesFeatures: Map[String, Array[Byte]],
                           int64Features: Map[String, Seq[Long]])

  private final class Reader(val b: Array[Byte], var off: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        require(off < end, "varint overruns buffer")
        val x = b(off) & 0xff
        off += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    def bytes(n: Int): Array[Byte] = {
      require(off + n <= end, s"field overruns buffer: $n at $off of $end")
      val out = java.util.Arrays.copyOfRange(b, off, off + n)
      off += n
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => off += 8
      case 2 => off += varint().toInt
      case 5 => off += 4
      case t => sys.error(s"unsupported wire type $t")
    }
    def hasMore: Boolean = off < end
  }

  /** Walk a message's fields, calling `f(fieldNo, wireType, reader)`;
    * `f` returns true if it consumed the field, else it is skipped.
    */
  private def walk(r: Reader)(f: (Int, Int, Reader) => Boolean): Unit =
    while (r.hasMore) {
      val key = r.varint()
      val fieldNo = (key >>> 3).toInt
      val wt = (key & 7).toInt
      if (!f(fieldNo, wt, r)) r.skip(wt)
    }

  private def subReader(r: Reader): Reader = {
    val len = r.varint().toInt
    require(r.off + len <= r.end, s"submessage overruns: $len at ${r.off}")
    val sub = new Reader(r.b, r.off, r.off + len)
    r.off += len
    sub
  }

  /** Decode one Example payload. */
  def decodeExample(payload: Array[Byte]): Example = {
    var bytesF = Map.empty[String, Array[Byte]]
    var int64F = Map.empty[String, Seq[Long]]
    val root = new Reader(payload, 0, payload.length)
    walk(root) { (no, wt, r) =>
      if (no == 1 && wt == 2) { // Example.features
        val features = subReader(r)
        walk(features) { (fno, fwt, fr) =>
          if (fno == 1 && fwt == 2) { // map entry
            val entry = subReader(fr)
            var key = ""
            walk(entry) { (eno, ewt, er) =>
              if (eno == 1 && ewt == 2) {
                key = new String(er.bytes(er.varint().toInt), "UTF-8"); true
              } else if (eno == 2 && ewt == 2) { // Feature
                val feat = subReader(er)
                walk(feat) { (kno, kwt, kr) =>
                  if (kno == 1 && kwt == 2) { // BytesList
                    val bl = subReader(kr)
                    walk(bl) { (bno, bwt, br) =>
                      if (bno == 1 && bwt == 2) {
                        bytesF += key -> br.bytes(br.varint().toInt); true
                      } else false
                    }
                    true
                  } else if (kno == 3 && kwt == 2) { // Int64List
                    val il = subReader(kr)
                    val vs = Seq.newBuilder[Long]
                    walk(il) { (ino, iwt, ir) =>
                      if (ino == 1 && iwt == 2) { // packed
                        val packed = subReader(ir)
                        while (packed.hasMore) vs += packed.varint()
                        true
                      } else if (ino == 1 && iwt == 0) { // unpacked
                        vs += ir.varint(); true
                      } else false
                    }
                    int64F += key -> vs.result()
                    true
                  } else false
                }
                true
              } else false
            }
            true
          } else false
        }
        true
      } else false
    }
    Example(bytesF, int64F)
  }

  /** Split a shard file into verified Example payloads. */
  def parse(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off < bytes.length) {
      require(off + 12 <= bytes.length, s"truncated record header at $off")
      val lenBytes = java.util.Arrays.copyOfRange(bytes, off, off + 8)
      val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong.toInt
      val lenCrc = ByteBuffer.wrap(bytes, off + 8, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      require(lenCrc == graft.sinks.TfRecordSink.maskedCrc(lenBytes),
        s"length crc mismatch at $off")
      require(off + 16 + len <= bytes.length, s"truncated record body at $off")
      val payload = java.util.Arrays.copyOfRange(bytes, off + 12, off + 12 + len)
      val dataCrc = ByteBuffer.wrap(bytes, off + 12 + len, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      require(dataCrc == graft.sinks.TfRecordSink.maskedCrc(payload),
        s"data crc mismatch at $off")
      out += payload
      off += 16 + len
    }
    out.result()
  }

  /** One row per Example: (shard, rec_idx, <bytesFeatures as binary>,
    * <int64Features as array<long>>), feature columns in the given order
    * (null when absent from a record).
    */
  def readExamples(spark: SparkSession, pathGlob: String,
                   bytesFeatures: Seq[String],
                   int64Features: Seq[String]): DataFrame = {
    import spark.implicits._
    val bf = bytesFeatures
    val inf = int64Features
    val rows = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        parse(bytes).zipWithIndex.map { case (payload, i) =>
          val ex = decodeExample(payload)
          (shard, i.toLong, bf.map(ex.bytesFeatures.get(_).orNull),
            inf.map(n => ex.int64Features.get(n).orNull))
        }
      }
      .toDF("shard", "rec_idx", "_bytes", "_ints")
    val withB = bf.zipWithIndex.foldLeft(rows) { case (d, (name, i)) =>
      d.withColumn(name, col("_bytes").getItem(i))
    }
    inf.zipWithIndex.foldLeft(withB) { case (d, (name, i)) =>
      d.withColumn(name, col("_ints").getItem(i))
    }.drop("_bytes", "_ints")
  }
}
