package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** ZIP archive codec + distributed source/sink (public spec: PKWARE
  * APPNOTE.TXT) — the remaining everyday container beside tar/WARC/
  * TFRecord/WebDataset: dataset drops, scraped site exports, and office
  * documents all arrive zipped. Reads via the authoritative path — the
  * end-of-central-directory record located by backward scan, then the
  * central directory (NOT the local headers, which lie under streaming
  * writers) — supporting store (0) and deflate (8), with CRC-32
  * verification of every decompressed payload.
  *
  * Same cost model as the tar shards: archives are the unit of
  * parallelism (one task per file via `binaryFile`, bytes never
  * shuffle), entries decode executor-side; the write side assembles one
  * archive per shard key with `groupByKey.mapGroups` + executor-side
  * Hadoop FS writes, only paths returning to the driver.
  */
object ZipSource {

  final case class ZipEntry(name: String, method: Int, crc: Long,
                            compressedSize: Long, size: Long,
                            data: Array[Byte])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)

  def parse(bytes: Array[Byte]): Seq[ZipEntry] = {
    // EOCD: signature 0x06054b50, located by backward scan over the
    // (≤ 64 KiB) comment tail
    require(bytes.length >= 22, "ZIP truncated (no EOCD)")
    var eocd = -1
    var p = bytes.length - 22
    val stop = math.max(0, bytes.length - 22 - 65535)
    while (eocd < 0 && p >= stop) {
      if (bytes(p) == 0x50 && bytes(p + 1) == 0x4b &&
        bytes(p + 2) == 0x05 && bytes(p + 3) == 0x06) eocd = p
      p -= 1
    }
    require(eocd >= 0, "ZIP: no end-of-central-directory signature")
    val nEntries = u16(bytes, eocd + 10)
    val cdOff = u32(bytes, eocd + 16)
    // ZIP64 sentinel values mean the real numbers live in a ZIP64 EOCD
    // record this codec does not implement — fail loudly rather than
    // read a truncated entry count or a wrapped offset.
    require(nEntries != 0xffff && cdOff != 0xffffffffL,
      "ZIP64 archives unsupported (EOCD fields saturated)")
    val out = new ArrayBuffer[ZipEntry](nEntries)
    var cd = cdOff.toInt
    (0 until nEntries).foreach { _ =>
      require(cd + 46 <= bytes.length && u32(bytes, cd) == 0x02014b50L,
        s"bad central-directory entry at $cd")
      val method = u16(bytes, cd + 10)
      val crc = u32(bytes, cd + 16)
      val csize = u32(bytes, cd + 20)
      val usize = u32(bytes, cd + 24)
      require(csize != 0xffffffffL && usize != 0xffffffffL,
        "ZIP64 entry sizes unsupported")
      val nameLen = u16(bytes, cd + 28)
      val extraLen = u16(bytes, cd + 30)
      val commentLen = u16(bytes, cd + 32)
      val lho = u32(bytes, cd + 42).toInt
      val name = new String(bytes, cd + 46, nameLen, StandardCharsets.UTF_8)
      // local header: skip its (possibly different) name/extra lengths
      require(lho + 30 <= bytes.length && u32(bytes, lho) == 0x04034b50L,
        s"bad local header for '$name' at $lho")
      val dataOff = lho + 30 + u16(bytes, lho + 26) + u16(bytes, lho + 28)
      require(dataOff + csize <= bytes.length, s"entry '$name' overruns")
      val comp = java.util.Arrays.copyOfRange(bytes, dataOff,
        dataOff + csize.toInt)
      val data = method match {
        case 0 => comp
        case 8 =>
          val inf = new Inflater(true) // raw deflate, no zlib wrapper
          inf.setInput(comp)
          val buf = new Array[Byte](math.max(64, usize.toInt))
          var got = 0
          while (got < usize && !inf.finished()) {
            val n = inf.inflate(buf, got, buf.length - got)
            require(n > 0 || inf.finished(), s"deflate stalled in '$name'")
            got += n
          }
          inf.end()
          require(got == usize, s"entry '$name': inflated $got of $usize")
          buf.take(usize.toInt)
        case m => throw new IllegalArgumentException(
          s"ZIP method $m unsupported (store/deflate only)")
      }
      val c = new CRC32(); c.update(data)
      require(c.getValue == crc,
        f"entry '$name': CRC ${c.getValue}%08x != stored $crc%08x")
      out += ZipEntry(name, method, crc, csize, usize, data)
      cd += 46 + nameLen + extraLen + commentLen
    }
    out.toSeq
  }

  /** Serialize entries into one archive; method 8 entries whose deflate
    * does not shrink them are stored (method 0) — the convention every
    * archiver follows.
    */
  def render(entries: Seq[(String, Array[Byte])],
             deflate: Boolean = true): Array[Byte] = {
    // Classic (non-ZIP64) limits: u16 entry count, u32 sizes/offsets.
    // Beyond them the fields would silently truncate/wrap into an
    // archive parse() reads back with missing entries — refuse instead.
    // 0xffff itself is the ZIP64 sentinel parse() rejects, so the last
    // writable count is 65534.
    require(entries.length < 0xffff,
      s"ZIP: ${entries.length} entries exceeds the non-ZIP64 limit of 65534")
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16(v.toInt); w16((v >> 16).toInt) }
    val cds = new ArrayBuffer[Array[Byte]]()
    entries.foreach { case (name, data) =>
      val nameB = name.getBytes(StandardCharsets.UTF_8)
      val crc = { val c = new CRC32(); c.update(data); c.getValue }
      val (method, comp) =
        if (!deflate) (0, data)
        else {
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val buf = new ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          d.end()
          val c = buf.toByteArray
          if (c.length < data.length) (8, c) else (0, data)
        }
      // sizes/offsets here are JVM Ints (arrays and ByteArrayOutputStream
      // cap below 2 GiB), so the u32 fields and their 0xffffffff ZIP64
      // sentinels are unreachable by construction in this in-memory
      // writer — no runtime guard can fire before the JVM's own array
      // limits do. parse() still rejects sentinel values defensively for
      // archives produced elsewhere.
      val lho = out.size()
      w32(0x04034b50L); w16(20); w16(0); w16(method); w16(0); w16(0)
      w32(crc); w32(comp.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(comp)
      val cd = new ByteArrayOutputStream()
      def c16(v: Int): Unit = { cd.write(v & 0xff); cd.write((v >> 8) & 0xff) }
      def c32(v: Long): Unit = { c16(v.toInt); c16((v >> 16).toInt) }
      c32(0x02014b50L); c16(20); c16(20); c16(0); c16(method); c16(0); c16(0)
      c32(crc); c32(comp.length.toLong); c32(data.length.toLong)
      c16(nameB.length); c16(0); c16(0); c16(0); c16(0)
      c32(0L); c32(lho.toLong)
      cd.write(nameB)
      cds += cd.toByteArray
    }
    val cdOff = out.size()
    cds.foreach(out.write)
    val cdSize = out.size() - cdOff
    w32(0x06054b50L); w16(0); w16(0); w16(cds.length); w16(cds.length)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }

  /** Distributed read: one row per entry. One task per archive,
    * executor-side decode + CRC verify, bytes never shuffle.
    */
  def read(spark: SparkSession, pathGlob: String,
           globFilter: String = "*.zip"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter).load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parse(bytes).map(e =>
          (path, e.name, e.method, e.size, e.compressedSize, e.data))
      }
      .toDF("file", "name", "method", "size", "compressed_size", "data")
  }

  /** Write one archive per shard key from (shard, name, data) rows —
    * the tar/WARC assembly shape: entries group to their shard, bytes
    * are written executor-side, only paths return.
    */
  def writeArchives(df: DataFrame, shardCol: String, nameCol: String,
                    dataCol: String, out: String,
                    deflate: Boolean = true): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(col(shardCol).cast("string"), col(nameCol), col(dataCol))
      .as[(String, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val entries = it.toArray.sortBy(_._2).map(t => (t._2, t._3)).toSeq
        val path = new org.apache.hadoop.fs.Path(s"$out/$shard.zip")
        val fs = path.getFileSystem(hadoopConf.value)
        fs.setWriteChecksum(false)
        val os = fs.create(path, true)
        try os.write(render(entries, deflate)) finally os.close()
        path.toString
      }.collect().toSeq.sorted
  }
}
