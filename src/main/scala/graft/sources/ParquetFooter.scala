package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet FOOTER metadata source — corpus auditing without scanning
  * data: schema, row groups, and per-column-chunk facts (type, codec,
  * value counts, compressed/uncompressed sizes, min/max/null-count
  * statistics) parsed straight from the file tail. This is what a
  * 100 TB curation run consults to plan pruning, spot bloated row
  * groups, or census a lake — reading ONLY `footer_len + 8` bytes per
  * file via a positioned read, never the data pages.
  *
  * Both layers are public formats implemented from their specs:
  *  - container: `…[footer][4-byte LE footer length]["PAR1"]`;
  *  - footer: Thrift COMPACT protocol (field-delta headers, zigzag
  *    varints, varint-length binaries, size|type list headers) over the
  *    parquet.thrift `FileMetaData` tree. The reader parses the full
  *    generic value tree (unknown/new fields included) and then
  *    navigates the documented field ids — the same generic-walk
  *    strategy as the TFRecord protobuf decoder.
  *
  * Statistics render like DuckDB's `parquet_metadata` (the oracle):
  * INT32/INT64 little-endian payloads as decimal strings, BYTE_ARRAY as
  * UTF-8; `min_value`/`max_value` preferred over the deprecated
  * `min`/`max` fields.
  */
object ParquetFooter {

  // ------------------------------------------------- compact thrift

  sealed trait TV
  final case class TI(v: Long) extends TV
  final case class TD(v: Double) extends TV
  final case class TB(v: Array[Byte]) extends TV
  final case class TL(v: Vector[TV]) extends TV
  final case class TS(v: Map[Int, TV]) extends TV

  private final class CReader(b: Array[Byte], var off: Int, end: Int) {
    def u8(): Int = {
      require(off < end, s"thrift read past end at $off")
      val v = b(off) & 0xff; off += 1; v
    }
    def varint(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        val x = u8()
        v |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      v
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1L) }
    def bytes(n: Int): Array[Byte] = {
      require(off + n <= end, s"thrift binary overruns: $n at $off")
      val out = java.util.Arrays.copyOfRange(b, off, off + n); off += n; out
    }
  }

  private def readValue(tpe: Int, r: CReader): TV = tpe match {
    case 1 => TI(1L) // BOOL true, encoded in the type nibble
    case 2 => TI(0L) // BOOL false
    case 3 => TI(r.u8().toByte.toLong) // i8: one signed byte
    case 4 | 5 | 6 => TI(r.zigzag())   // i16/i32/i64: zigzag varint
    case 7 => // double: 8 bytes little-endian
      TD(java.lang.Double.longBitsToDouble(
        (0 until 8).map(i => (r.u8().toLong & 0xff) << (8 * i)).reduce(_ | _)))
    case 8 => TB(r.bytes(r.varint().toInt)) // binary/string
    case 9 | 10 => // list/set: (size<<4|elemType), size 15 -> varint
      val head = r.u8()
      val elemT = head & 0xf
      val size = if ((head >>> 4) == 0xf) r.varint().toInt else head >>> 4
      TL(Vector.fill(size)(readValue(elemT, r)))
    case 11 => // map: varint size, then (kt<<4|vt) byte if non-empty
      val size = r.varint().toInt
      if (size == 0) TL(Vector.empty)
      else {
        val kv = r.u8()
        TL(Vector.fill(size)(TL(Vector(
          readValue(kv >>> 4, r), readValue(kv & 0xf, r)))))
      }
    case 12 => readStruct(r)
    case t => sys.error(s"unsupported thrift compact type $t")
  }

  private def readStruct(r: CReader): TS = {
    var lastId = 0
    val m = Map.newBuilder[Int, TV]
    var done = false
    while (!done) {
      val head = r.u8()
      if (head == 0) done = true
      else {
        val delta = (head >>> 4) & 0xf
        val tpe = head & 0xf
        val id = if (delta == 0) r.zigzag().toInt else lastId + delta
        lastId = id
        m += id -> readValue(tpe, r)
      }
    }
    TS(m.result())
  }

  // ------------------------------------------------------ navigation

  final case class ChunkMeta(rowGroup: Int, column: String, tpe: String,
                             numValues: Long, codec: String,
                             compressed: Long, uncompressed: Long,
                             nullCount: Option[Long],
                             minV: Option[String], maxV: Option[String])

  private val TypeNames = Array("BOOLEAN", "INT32", "INT64", "INT96",
    "FLOAT", "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")
  private val CodecNames = Array("UNCOMPRESSED", "SNAPPY", "GZIP", "LZO",
    "BROTLI", "LZ4", "ZSTD", "LZ4_RAW")

  private def renderStat(tpe: Int, b: Array[Byte]): String = tpe match {
    case 1 => // INT32 LE
      (0 until 4).map(i => (b(i).toLong & 0xff) << (8 * i)).reduce(_ | _)
        .toInt.toString
    case 2 => // INT64 LE
      (0 until 8).map(i => (b(i).toLong & 0xff) << (8 * i)).reduce(_ | _)
        .toString
    case 6 => new String(b, "UTF-8")
    case _ => b.map(x => f"${x & 0xff}%02x").mkString // hex for the rest
  }

  /** Parse a footer (the Thrift bytes between the data and the trailing
    * length) into per-column-chunk facts.
    */
  def parseFooter(footer: Array[Byte]): Seq[ChunkMeta] = {
    val meta = readStruct(new CReader(footer, 0, footer.length))
    val rowGroups = meta.v.get(4) match {
      case Some(TL(gs)) => gs
      case _ => Vector.empty
    }
    rowGroups.zipWithIndex.flatMap {
      case (TS(rg), rgIdx) =>
        val chunks = rg.get(1) match { case Some(TL(cs)) => cs; case _ => Vector.empty }
        chunks.flatMap {
          case TS(cc) => cc.get(3) match {
            case Some(TS(cm)) =>
              val tpe = cm.get(1).collect { case TI(v) => v.toInt }.getOrElse(-1)
              val path = cm.get(3) match {
                case Some(TL(ps)) => ps.collect { case TB(b) => new String(b, "UTF-8") }
                  .mkString(".")
                case _ => ""
              }
              val codec = cm.get(4).collect { case TI(v) => v.toInt }.getOrElse(-1)
              val stats = cm.get(12).collect { case s: TS => s.v }
                .getOrElse(Map.empty[Int, TV])
              def statBin(preferred: Int, deprecated: Int): Option[String] =
                stats.get(preferred).orElse(stats.get(deprecated))
                  .collect { case TB(b) => renderStat(tpe, b) }
              Some(ChunkMeta(rgIdx, path,
                if (tpe >= 0 && tpe < TypeNames.length) TypeNames(tpe) else s"T$tpe",
                cm.get(5).collect { case TI(v) => v }.getOrElse(0L),
                if (codec >= 0 && codec < CodecNames.length) CodecNames(codec)
                else s"C$codec",
                cm.get(7).collect { case TI(v) => v }.getOrElse(0L),
                cm.get(6).collect { case TI(v) => v }.getOrElse(0L),
                stats.get(3).collect { case TI(v) => v },
                statBin(6, 2), statBin(5, 1)))
            case _ => None
          }
          case _ => None
        }
      case _ => Vector.empty
    }
  }

  /** Positioned read of just the footer: seek to `len − 8`, read the
    * footer length + "PAR1" magic, then one more positioned read of the
    * footer bytes. Total IO per file = footer + 8 bytes.
    */
  def readFooterBytes(fs: org.apache.hadoop.fs.FileSystem,
                      path: org.apache.hadoop.fs.Path): Array[Byte] = {
    val len = fs.getFileStatus(path).getLen
    require(len >= 12, s"$path too short for a parquet file")
    val in = fs.open(path)
    try {
      val tail = new Array[Byte](8)
      in.readFully(len - 8, tail)
      require(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1',
        s"$path lacks the PAR1 magic")
      val footerLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      require(footerLen > 0 && footerLen <= len - 12,
        s"$path footer length $footerLen out of range")
      val footer = new Array[Byte](footerLen)
      in.readFully(len - 8 - footerLen, footer)
      footer
    } finally in.close()
  }

  /** One row per (file, row group, column chunk). File paths are listed
    * driver-side (names only) and footers read executor-side — per-file
    * IO is footer-sized, so a lake-wide audit moves kilobytes per file.
    */
  def readMetadata(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val glob = new org.apache.hadoop.fs.Path(pathGlob)
    val fs0 = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = Option(fs0.globStatus(glob)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).toSeq
    spark.createDataset(paths)
      .flatMap { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(conf.value)
        val name = path.getName
        parseFooter(readFooterBytes(fs, path)).map(c =>
          (name, c.rowGroup, c.column, c.tpe, c.numValues, c.codec,
            c.compressed, c.uncompressed, c.nullCount, c.minV, c.maxV))
      }
      .toDF("file", "rg", "col_name", "type", "num_values", "codec",
        "n_compressed", "n_uncompressed", "null_count", "min_v", "max_v")
  }
}
