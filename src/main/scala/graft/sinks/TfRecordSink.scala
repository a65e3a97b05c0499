package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TFRecord writer — the training-data export container the packing /
  * shard-planning operators feed at the END of a curation pipeline. Both
  * layers are public formats implemented from their specs:
  *
  *  - framing: per record `uint64 length (LE) · uint32 masked-crc(length)
  *    · payload · uint32 masked-crc(payload)`, where the mask is the
  *    rotate-17-plus-0xa282ead8 CRC32C (Castagnoli — `java.util.zip.CRC32C`)
  *    transform from the TensorFlow spec;
  *  - payload: a hand-encoded `tf.train.Example` protobuf — Example.features
  *    (field 1) → Features.feature map entries (key field 1, value field 2)
  *    → Feature oneof: BytesList (field 1) or packed Int64List (field 3),
  *    standard varint/length-delimited wire encoding throughout.
  *
  * Shard assembly mirrors [[TarSink.writeShards]]: one
  * `groupByKey(shard).mapGroups`, records in seq order, bytes written
  * executor-side via the Hadoop filesystem. Deterministic: no timestamps,
  * no randomness — byte-identical across runs.
  */
object TfRecordSink {

  // ------------------------------------------------------------ protobuf

  private[graft] def varint(v0: Long): Array[Byte] = {
    var v = v0
    val out = new ByteArrayOutputStream(10)
    do {
      val b = (v & 0x7f).toInt
      v = v >>> 7
      out.write(if (v != 0) b | 0x80 else b)
    } while (v != 0)
    out.toByteArray
  }

  private def keyLenDelim(fieldNo: Int, body: Array[Byte]): Array[Byte] =
    varint((fieldNo << 3) | 2) ++ varint(body.length.toLong) ++ body

  /** Feature { bytes_list { value: [b] } } */
  private[graft] def bytesFeature(b: Array[Byte]): Array[Byte] =
    keyLenDelim(1, keyLenDelim(1, b)) // BytesList.value=1, Feature.bytes_list=1

  /** Feature { int64_list { value: [vs] (packed) } } */
  private[graft] def int64Feature(vs: scala.collection.Seq[Long]): Array[Byte] = {
    val packed = vs.flatMap(varint(_)).toArray
    keyLenDelim(3, keyLenDelim(1, packed)) // Feature.int64_list=3
  }

  /** Example { features { feature { key, value } ... } } — entries in the
    * caller's order (deterministic bytes).
    */
  private[graft] def example(features: Seq[(String, Array[Byte])]): Array[Byte] = {
    val entries = features.map { case (k, featBytes) =>
      keyLenDelim(1, // Features.feature map entry
        keyLenDelim(1, k.getBytes("UTF-8")) ++ keyLenDelim(2, featBytes))
    }
    keyLenDelim(1, entries.flatten.toArray) // Example.features = 1
  }

  // ------------------------------------------------------------- framing

  private[graft] def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C()
    c.update(bytes)
    val crc = c.getValue.toInt // CRC32C is 32-bit
    (Integer.rotateRight(crc, 15)) + 0xa282ead8
  }

  private[graft] def renderRecord(payload: Array[Byte]): Array[Byte] = {
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(payload.length.toLong).array()
    val out = ByteBuffer.allocate(payload.length + 16).order(ByteOrder.LITTLE_ENDIAN)
    out.put(lenBytes).putInt(maskedCrc(lenBytes))
      .put(payload).putInt(maskedCrc(payload))
    out.array()
  }

  // --------------------------------------------------------------- write

  /** df(shardCol, seqCol, bytesFeatures*, int64Features*) → one TFRecord
    * file per shard under `dir`, one Example per row with the named
    * columns as features (binary/string columns → BytesList, array<long>
    * → packed Int64List), in ascending seq order. Returns
    * (shard, n_records, n_bytes) written-file facts.
    */
  def writeExamples(df: DataFrame, dir: String,
                    bytesFeatures: Seq[String], int64Features: Seq[String],
                    shardCol: String = "shard", seqCol: String = "seq"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // Row-based group assembly: arbitrary feature arity needs Row access
    val cols = Seq(col(shardCol).cast("string"), col(seqCol).cast("long")) ++
      bytesFeatures.map(c => col(c).cast("binary")) ++
      int64Features.map(c => col(c).cast("array<long>"))
    val bf = bytesFeatures
    val inf = int64Features
    val seqIdx = 1
    df.select(cols: _*)
      .groupByKey(r => r.getString(0))(org.apache.spark.sql.Encoders.STRING)
      .mapGroups { (shard, it) =>
        val sorted = it.toArray.sortBy(_.getLong(seqIdx))
        val out = new ByteArrayOutputStream()
        sorted.foreach { r =>
          val feats =
            bf.zipWithIndex.map { case (name, i) =>
              name -> bytesFeature(r.getAs[Array[Byte]](2 + i))
            } ++
            inf.zipWithIndex.map { case (name, i) =>
              name -> int64Feature(r.getSeq[Long](2 + bf.length + i))
            }
          out.write(renderRecord(example(feats)))
        }
        val bytes = out.toByteArray
        val p = new Path(dir, shard)
        val fs = p.getFileSystem(conf.value)
        val os = fs.create(p, true)
        os.write(bytes)
        os.close()
        (shard, sorted.length.toLong, bytes.length.toLong)
      }(org.apache.spark.sql.Encoders.product[(String, Long, Long)])
      .toDF("shard", "n_records", "n_bytes")
  }
}
