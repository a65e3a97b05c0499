package graft.sources

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoTIFF raster codec + distributed source (public specs: TIFF 6.0,
  * Adobe 1992; GeoTIFF 1.1, OGC 19-008r4) — the raster wire format
  * satellite/weather products actually ship alongside NetCDF/GRIB2.
  * Covers the baseline-TIFF surface such files use:
  *
  *  - II and MM byte orders; multi-page files (chained IFDs — one page
  *    per variable/band the way GDAL writes subdatasets);
  *  - single-sample grayscale rasters, uint16 and float32;
  *  - strip organization (RowsPerStrip < height, partial last strip),
  *    Compression 1 (none), 5 (LZW, MSB-first early-change dialect via
  *    [[graft.functions.Lzw]]), 32773 (PackBits), and the horizontal
  *    differencing Predictor (tag 317) for integer LZW pages;
  *  - georeferencing: ModelPixelScale (33550) + ModelTiepoint (33922)
  *    with the GeoKeyDirectory (34735) geographic/WGS84 keys, and
  *    GDAL's nodata convention (ASCII tag 42113) mapped to NaN.
  *
  * The read side mirrors [[NetCdfSource]]/[[GribSource]]: one task per
  * file, executor-side decode, one row per cell with PixelIsArea cell
  * centers (lat = lat0 − (i+0.5)·sy, lon = lon0 + (j+0.5)·sx) — file
  * bytes never shuffle.
  */
object GeoTiffSource {

  final case class Page(variable: String, width: Int, height: Int,
                        bitsPerSample: Int, sampleFormat: Int,
                        compression: Int, rowsPerStrip: Int,
                        predictor: Int, scaleX: Double, scaleY: Double,
                        lon0: Double, lat0: Double, noData: Option[Double],
                        values: Array[Double])

  // ---- low-level byte helpers ------------------------------------------

  private final class Writer(bigEndian: Boolean) {
    val out = new ByteArrayOutputStream()
    def pos: Int = out.size()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit =
      if (bigEndian) { u8(v >> 8); u8(v) } else { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit =
      if (bigEndian) { u16((v >> 16).toInt); u16(v.toInt) }
      else { u16(v.toInt); u16((v >> 16).toInt) }
    def f64(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      if (bigEndian) { u32(bits >>> 32); u32(bits & 0xffffffffL) }
      else { u32(bits & 0xffffffffL); u32(bits >>> 32) }
    }
    def bytes(b: Array[Byte]): Unit = out.write(b)
  }

  private final class Reader(b: Array[Byte], val bigEndian: Boolean) {
    def u8(o: Int): Int = b(o) & 0xff
    def u16(o: Int): Int =
      if (bigEndian) (u8(o) << 8) | u8(o + 1) else u8(o) | (u8(o + 1) << 8)
    def u32(o: Int): Long =
      if (bigEndian) (u16(o).toLong << 16) | u16(o + 2)
      else u16(o).toLong | (u16(o + 2).toLong << 16)
    def f64(o: Int): Double = {
      val hi = u32(if (bigEndian) o else o + 4)
      val lo = u32(if (bigEndian) o + 4 else o)
      java.lang.Double.longBitsToDouble((hi << 32) | lo)
    }
    def slice(o: Int, n: Int): Array[Byte] = java.util.Arrays.copyOfRange(b, o, o + n)
    def length: Int = b.length
  }

  // ---- PackBits (TIFF 6.0 §9) ------------------------------------------

  private[sources] def packBits(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      // find run length at i
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(data(i))
        i += run
      } else {
        // literal: until the next >=3 run or 128 bytes
        var lit = run
        while (i + lit < data.length && lit < 128 && {
          var r = 1
          while (i + lit + r < data.length && r < 3 && data(i + lit + r) == data(i + lit)) r += 1
          r < 3
        }) lit += 1
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  private[sources] def unpackBits(data: Array[Byte], expect: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(expect)
    var i = 0
    while (out.size() < expect) {
      require(i < data.length, "PackBits stream truncated")
      val n = data(i); i += 1
      if (n >= 0) {
        require(i + n + 1 <= data.length, "PackBits literal overruns")
        out.write(data, i, n + 1); i += n + 1
      } else if (n != -128) {
        require(i < data.length, "PackBits repeat overruns")
        val v = data(i); i += 1
        var k = 1 - n
        while (k > 0) { out.write(v); k -= 1 }
      } // -128: noop
    }
    require(out.size() == expect, s"PackBits yielded ${out.size()} of $expect")
    out.toByteArray
  }

  // ---- render ----------------------------------------------------------

  private def sampleBytes(p: Page, rowFrom: Int, rowTo: Int,
                          bigEndian: Boolean): Array[Byte] = {
    val bytesPer = p.bitsPerSample / 8
    val out = new Array[Byte]((rowTo - rowFrom) * p.width * bytesPer)
    var o = 0
    for (y <- rowFrom until rowTo) {
      // horizontal differencing per row (predictor 2, integer samples)
      var prev = 0L
      for (x <- 0 until p.width) {
        val raw = p.values(y * p.width + x)
        if (p.sampleFormat == 3) {
          val bits = java.lang.Float.floatToIntBits(raw.toFloat)
          if (bigEndian) {
            out(o) = (bits >> 24).toByte; out(o + 1) = (bits >> 16).toByte
            out(o + 2) = (bits >> 8).toByte; out(o + 3) = bits.toByte
          } else {
            out(o) = bits.toByte; out(o + 1) = (bits >> 8).toByte
            out(o + 2) = (bits >> 16).toByte; out(o + 3) = (bits >> 24).toByte
          }
        } else {
          val v = raw.toLong
          val enc = if (p.predictor == 2) (v - prev) & 0xffff else v & 0xffff
          prev = v
          if (bytesPer == 2) {
            if (bigEndian) { out(o) = (enc >> 8).toByte; out(o + 1) = enc.toByte }
            else { out(o) = enc.toByte; out(o + 1) = (enc >> 8).toByte }
          } else out(o) = enc.toByte
        }
        o += bytesPer
      }
    }
    out
  }

  /** Serialize pages into one (possibly multi-page) TIFF byte stream. */
  def render(pages: Seq[Page], bigEndian: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "no pages")
    val w = new Writer(bigEndian)
    w.bytes(if (bigEndian) Array[Byte]('M', 'M') else Array[Byte]('I', 'I'))
    w.u16(42)
    val ifdOffsetPatch = w.pos
    w.u32(0) // patched to first IFD offset
    // 1) strip data for every page
    val stripOffsets = pages.map { p =>
      require(p.values.length == p.width * p.height, s"page ${p.variable} size")
      require(p.sampleFormat == 1 || p.sampleFormat == 3, "uint/float only")
      require(p.bitsPerSample == (if (p.sampleFormat == 3) 32 else 16),
        "u16 or f32 only")
      val strips = (0 until p.height by p.rowsPerStrip).map { r0 =>
        val r1 = math.min(r0 + p.rowsPerStrip, p.height)
        val raw = sampleBytes(p, r0, r1, bigEndian)
        val comp = p.compression match {
          case 1 => raw
          case 5 => graft.functions.Lzw.encode(raw.map(_ & 0xff), 8,
            msbFirst = true, earlyChange = true)
          case 32773 => packBits(raw)
          case c => throw new IllegalArgumentException(s"compression $c")
        }
        val off = w.pos
        w.bytes(comp)
        (off.toLong, comp.length.toLong)
      }
      strips
    }
    // 2) IFDs, chained; out-of-line values directly after each IFD
    var prevPatch = ifdOffsetPatch
    val bytes0 = w.out // patching happens on the final array
    val patches = new ArrayBuffer[(Int, Long)]() // (position, u32 value)
    pages.zipWithIndex.foreach { case (p, pi) =>
      // entries: (tag, type, count, either inline value or deferred bytes)
      final case class Entry(tag: Int, typ: Int, count: Int,
                             inline: Option[Long], extra: Option[Array[Byte]])
      def longE(tag: Int, v: Long) = Entry(tag, 4, 1, Some(v), None)
      def longsE(tag: Int, vs: Seq[Long]) =
        if (vs.length == 1) longE(tag, vs.head)
        else {
          val bw = new Writer(bigEndian); vs.foreach(bw.u32)
          Entry(tag, 4, vs.length, None, Some(bw.out.toByteArray))
        }
      def shortsE(tag: Int, vs: Seq[Int]) =
        if (vs.length <= 2) {
          // pack up to two shorts inline (left-justified per spec)
          val bw = new Writer(bigEndian); vs.foreach(bw.u16)
          while (bw.out.size() < 4) bw.u16(0)
          val b = bw.out.toByteArray
          val r = new Reader(b, bigEndian)
          Entry(tag, 3, vs.length, Some(r.u32(0)), None)
        } else {
          val bw = new Writer(bigEndian); vs.foreach(bw.u16)
          Entry(tag, 3, vs.length, None, Some(bw.out.toByteArray))
        }
      // inline values are LEFT-justified in the 4-byte field: a lone
      // SHORT must sit in the FIRST two bytes, so big-endian cannot
      // write it as a u32 — route through the short packer.
      def shortE(tag: Int, v: Int) = shortsE(tag, Seq(v))
      def asciiE(tag: Int, s: String) = {
        val b = (s + " ").getBytes("US-ASCII")
        if (b.length <= 4) {
          val padded = b.padTo(4, 0.toByte)
          val r = new Reader(padded, bigEndian)
          Entry(tag, 2, b.length, Some(r.u32(0)), None)
        } else Entry(tag, 2, b.length, None, Some(b))
      }
      def doublesE(tag: Int, vs: Seq[Double]) = {
        val bw = new Writer(bigEndian); vs.foreach(bw.f64)
        Entry(tag, 12, vs.length, None, Some(bw.out.toByteArray))
      }
      val strips = stripOffsets(pi)
      val entries = ArrayBuffer(
        longE(256, p.width.toLong),
        longE(257, p.height.toLong),
        shortE(258, p.bitsPerSample),
        shortE(259, p.compression),
        shortE(262, 1),
        asciiE(270, p.variable),
        longsE(273, strips.map(_._1)),
        shortE(277, 1),
        longE(278, p.rowsPerStrip.toLong),
        longsE(279, strips.map(_._2)))
      if (p.predictor == 2) entries += shortE(317, 2)
      entries += shortE(339, p.sampleFormat)
      entries += doublesE(33550, Seq(p.scaleX, p.scaleY, 0.0))
      entries += doublesE(33922, Seq(0.0, 0.0, 0.0, p.lon0, p.lat0, 0.0))
      // GeoKeyDirectory: v1.1.0, 3 keys — model=geographic, raster=area,
      // GCS = WGS84 (4326)
      entries += shortsE(34735, Seq(1, 1, 0, 3, 1024, 0, 1, 2,
        1025, 0, 1, 1, 2048, 0, 1, 4326))
      p.noData.foreach { nd =>
        val s = if (nd == math.floor(nd) && !nd.isInfinite) nd.toLong.toString
        else nd.toString
        entries += asciiE(42113, s)
      }
      val sorted = entries.sortBy(_.tag)
      val ifdOff = w.pos
      patches += ((prevPatch, ifdOff.toLong))
      // entry area
      w.u16(sorted.length)
      var extraOff = ifdOff + 2 + 12 * sorted.length + 4
      val extras = new ArrayBuffer[Array[Byte]]()
      sorted.foreach { e =>
        w.u16(e.tag); w.u16(e.typ); w.u32(e.count.toLong)
        e.inline match {
          case Some(v) => w.u32(v)
          case None =>
            val b = e.extra.get
            w.u32(extraOff.toLong)
            extras += b
            extraOff += b.length + (b.length & 1) // word-align
        }
      }
      prevPatch = w.pos
      w.u32(0) // next-IFD pointer (patched by the following page)
      extras.foreach { b =>
        w.bytes(b)
        if ((b.length & 1) == 1) w.u8(0)
      }
    }
    val arr = w.out.toByteArray
    patches.foreach { case (at, v) =>
      if (bigEndian) {
        arr(at) = (v >> 24).toByte; arr(at + 1) = (v >> 16).toByte
        arr(at + 2) = (v >> 8).toByte; arr(at + 3) = v.toByte
      } else {
        arr(at) = v.toByte; arr(at + 1) = (v >> 8).toByte
        arr(at + 2) = (v >> 16).toByte; arr(at + 3) = (v >> 24).toByte
      }
    }
    arr
  }

  // ---- parse -----------------------------------------------------------

  def parse(bytes: Array[Byte]): Seq[Page] = {
    require(bytes.length >= 8, "TIFF truncated")
    val bigEndian = (bytes(0), bytes(1)) match {
      case ('I', 'I') => false
      case ('M', 'M') => true
      case _ => throw new IllegalArgumentException("not a TIFF (byte order)")
    }
    val r = new Reader(bytes, bigEndian)
    require(r.u16(2) == 42, "not a TIFF (magic)")
    val pages = new ArrayBuffer[Page]()
    var ifd = r.u32(4).toInt
    var guard = 0
    while (ifd != 0) {
      require(guard < 1024, "IFD chain cycle")
      guard += 1
      val n = r.u16(ifd)
      // tag → (type, count, value offset-or-inline position)
      var tags = Map.empty[Int, (Int, Int, Int)]
      (0 until n).foreach { i =>
        val e = ifd + 2 + 12 * i
        val tag = r.u16(e); val typ = r.u16(e + 4 - 2)
        val count = r.u32(e + 4).toInt
        tags += tag -> ((typ, count, e + 8))
      }
      def typeSize(t: Int): Int = t match {
        case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
        case 5 | 10 | 12 => 8
        case o => throw new IllegalArgumentException(s"TIFF type $o")
      }
      def valueBase(tag: Int): Int = {
        val (typ, count, at) = tags(tag)
        if (typeSize(typ) * count <= 4) at else r.u32(at).toInt
      }
      def ints(tag: Int): Seq[Long] = tags.get(tag) match {
        case None => Seq.empty
        case Some((typ, count, _)) =>
          val base = valueBase(tag)
          (0 until count).map { i =>
            typ match {
              case 3 => r.u16(base + 2 * i).toLong
              case 4 => r.u32(base + 4 * i)
              case 1 => r.u8(base + i).toLong
              case o => throw new IllegalArgumentException(s"int tag $tag type $o")
            }
          }
      }
      def int1(tag: Int, default: Long): Long = ints(tag).headOption.getOrElse(default)
      def doubles(tag: Int): Seq[Double] = tags.get(tag) match {
        case None => Seq.empty
        case Some((typ, count, _)) =>
          require(typ == 12, s"tag $tag: expected DOUBLE, got $typ")
          val base = valueBase(tag)
          (0 until count).map(i => r.f64(base + 8 * i))
      }
      def ascii(tag: Int): Option[String] = tags.get(tag).map { case (_, count, _) =>
        val base = valueBase(tag)
        val b = r.slice(base, count)
        val end = b.indexOf(0.toByte)
        new String(b, 0, if (end < 0) b.length else end, "US-ASCII")
      }

      val width = int1(256, -1).toInt
      val height = int1(257, -1).toInt
      require(width > 0 && height > 0, s"bad extent ${width}x$height")
      val bits = int1(258, 1).toInt
      val compression = int1(259, 1).toInt
      val variable = ascii(270).getOrElse("")
      val offsets = ints(273)
      val samplesPer = int1(277, 1).toInt
      require(samplesPer == 1, s"SamplesPerPixel $samplesPer unsupported (1 only)")
      val rowsPerStrip = math.min(int1(278, height.toLong), height.toLong).toInt
      val counts = ints(279)
      val predictor = int1(317, 1).toInt
      val format = int1(339, 1).toInt
      require(format == 1 || format == 3, s"SampleFormat $format unsupported")
      require(bits == (if (format == 3) 32 else 16),
        s"bits $bits / format $format unsupported (u16/f32 only)")
      require(offsets.length == counts.length && offsets.nonEmpty, "strip tables")
      val scale = doubles(33550)
      val tie = doubles(33922)
      val noData = ascii(42113).map(_.trim.toDouble)

      val bytesPer = bits / 8
      val raw = new Array[Byte](width * height * bytesPer)
      var at = 0
      offsets.zip(counts).zipWithIndex.foreach { case ((off, cnt), si) =>
        val r0 = si * rowsPerStrip
        val r1 = math.min(r0 + rowsPerStrip, height)
        val expect = (r1 - r0) * width * bytesPer
        val comp = r.slice(off.toInt, cnt.toInt)
        val plain = compression match {
          case 1 => require(comp.length == expect, "strip size"); comp
          case 5 =>
            val sym = graft.functions.Lzw.decode(comp, 8,
              msbFirst = true, earlyChange = true)
            require(sym.length >= expect, s"LZW strip: ${sym.length} of $expect")
            sym.take(expect).map(_.toByte)
          case 32773 => unpackBits(comp, expect)
          case c => throw new IllegalArgumentException(s"compression $c")
        }
        System.arraycopy(plain, 0, raw, at, expect)
        at += expect
      }
      val rr = new Reader(raw, bigEndian)
      val values = new Array[Double](width * height)
      var i = 0
      if (format == 3) {
        while (i < values.length) {
          values(i) = java.lang.Float.intBitsToFloat(rr.u32(i * 4).toInt).toDouble
          i += 1
        }
      } else {
        while (i < values.length) {
          values(i) = rr.u16(i * 2).toDouble
          i += 1
        }
        if (predictor == 2) {
          for (y <- 0 until height) {
            var x = 1
            while (x < width) {
              val p = y * width + x
              values(p) = ((values(p).toLong + values(p - 1).toLong) & 0xffff).toDouble
              x += 1
            }
          }
        }
      }
      noData.foreach { nd =>
        var j = 0
        while (j < values.length) {
          if (values(j) == nd) values(j) = Double.NaN
          j += 1
        }
      }
      val (sx, sy) = (scale.lift(0).getOrElse(1.0), scale.lift(1).getOrElse(1.0))
      val (lon0, lat0) = (tie.lift(3).getOrElse(0.0), tie.lift(4).getOrElse(0.0))
      pages += Page(variable, width, height, bits, format, compression,
        rowsPerStrip, predictor, sx, sy, lon0, lat0, noData, values)
      ifd = r.u32(ifd + 2 + 12 * n).toInt
    }
    pages.toSeq
  }

  // ---- Spark surface ---------------------------------------------------

  /** Distributed read: one row per raster cell with PixelIsArea centers.
    * Per-file executor-side decode, no shuffle.
    */
  def read(spark: SparkSession, pathGlob: String,
           globFilter: String = "*.tif"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter).load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parse(bytes).zipWithIndex.flatMap { case (p, pi) =>
          (0 until p.height).iterator.flatMap { i =>
            (0 until p.width).iterator.map { j =>
              (path, pi, p.variable, p.width, p.height, p.compression,
                p.bitsPerSample, p.sampleFormat, i, j,
                p.lat0 - (i + 0.5) * p.scaleY, p.lon0 + (j + 0.5) * p.scaleX,
                p.values(i * p.width + j))
            }
          }
        }
      }
      .toDF("file", "page", "variable", "width", "height", "compression",
        "bits", "sample_format", "i", "j", "lat", "lon", "value")
  }

  /** Write one two-page GeoTIFF per variable — page 0 the quantized
    * uint16 raster (predictor-2 LZW / PackBits / none, cycling by sorted
    * variable index), page 1 the float32 decode of the same cells —
    * executor-side via the Hadoop FS API (the [[GribSource.writeGrids]]
    * shape: only paths return to the driver). Cells absent from `df`
    * become GDAL-nodata holes (65535 / −9999).
    */
  def writeRasters(df: DataFrame, out: String, shape: (Int, Int),
                   grid: (Double, Double, Double, Double)): Seq[String] = {
    import org.apache.spark.sql.Row
    val spark = df.sparkSession
    val (nLat, nLon) = shape
    val (lat0, lon0, sy, sx) = grid
    // ONE aggregation feeds both the variable census (compression
    // assignment) and the per-variable render — the upstream lattice is
    // not recomputed per driver action
    val grouped = df.groupBy(col("variable")).agg(
      collect_list(struct(col("i").cast("int").as("i"),
        col("j").cast("int").as("j"),
        col("stored").cast("long").as("v"))).as("cells"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val compOf = grouped.select("variable").collect()
      .map(_.getString(0)).sorted.zipWithIndex
      .map { case (v, i) => v -> Seq(5, 32773, 1)(i % 3) }.toMap
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    try {
      grouped.map { row =>
        val variable = row.getString(0)
        val cells = row.getSeq[Row](1)
        val u16 = Array.fill(nLat * nLon)(65535.0)
        val f32 = Array.fill(nLat * nLon)(-9999.0)
        cells.foreach { c =>
          val p = c.getInt(0) * nLon + c.getInt(1)
          val stored = c.getLong(2)
          u16(p) = stored.toDouble
          f32(p) = (stored * 0.01 - 20.0).toFloat.toDouble
        }
        val comp = compOf(variable)
        val pages = Seq(
          Page(variable, nLon, nLat, 16, 1, comp, rowsPerStrip = 3,
            predictor = if (comp == 5) 2 else 1, sx, sy, lon0, lat0,
            Some(65535.0), u16),
          Page(variable, nLon, nLat, 32, 3, 5, rowsPerStrip = 3,
            predictor = 1, sx, sy, lon0, lat0, Some(-9999.0), f32))
        val path = new org.apache.hadoop.fs.Path(s"$out/$variable.tif")
        val fs = path.getFileSystem(hadoopConf.value)
        fs.setWriteChecksum(false)
        val os = fs.create(path, true)
        try os.write(render(pages)) finally os.close()
        path.toString
      }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
    } finally grouped.unpersist()
  }
}
