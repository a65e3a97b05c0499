package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Container-free media codecs — PCM WAV (RIFF), 24-bit uncompressed BMP,
  * 8-bit RGB/RGBA PNG, and baseline JPEG — all PUBLIC byte layouts
  * decodable without any codec library (PNG is zlib, which the JVM ships,
  * plus the five spec filters; JPEG is canonical Huffman + 8×8 DCT, both
  * fully specified in ITU-T T.81). They turn the multimodal decode
  * boundary REAL for these formats: payloads travel as opaque binary
  * columns and decode per-partition on executors
  * (`operators/MultimodalOps`); only video containers (MP4/H.264) remain
  * behind the labeled stub.
  */
object Media {

  // --------------------------------------------------------------- WAV

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Int])

  /** Render 16-bit PCM: RIFF → fmt (PCM) → data, samples interleaved. */
  def renderWav(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad WAV geometry")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    samples.foreach(s => require(s >= Short.MinValue && s <= Short.MaxValue,
      s"sample $s outside 16-bit PCM range"))
    val dataLen = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1.toShort).putShort(channels.toShort)
    b.putInt(sampleRate).putInt(sampleRate * channels * 2)
    b.putShort((channels * 2).toShort).putShort(16.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => b.putShort(s.toShort))
    b.array()
  }

  /** Decode 16-bit PCM WAV; chunk-walks the RIFF body so extra chunks
    * (LIST, fact, …) are skipped; fails loudly on non-PCM / non-16-bit.
    */
  def decodeWav(bytes: Array[Byte]): Wav = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE file")
    var p = 12
    var rate = -1
    var channels = -1
    var samples: Array[Int] = null
    while (p + 8 <= bytes.length) {
      val id = tag(p)
      val len = b.getInt(p + 4)
      require(len >= 0 && p + 8 + len <= bytes.length,
        s"WAV chunk '$id' at $p overruns the file")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk of $len bytes")
          val fmt = b.getShort(p + 8) & 0xffff
          require(fmt == 1, s"audio format $fmt unsupported (PCM only)")
          channels = b.getShort(p + 10) & 0xffff
          rate = b.getInt(p + 12)
          require(channels > 0 && rate > 0,
            s"bad fmt geometry: channels=$channels rate=$rate")
          val bits = b.getShort(p + 22) & 0xffff
          require(bits == 16, s"$bits-bit PCM unsupported (16 only)")
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          require(len % 2 == 0, s"odd PCM data length $len")
          samples = Array.tabulate(len / 2)(i => b.getShort(p + 8 + i * 2).toInt)
        case _ => () // LIST/fact/cue … skipped
      }
      p += 8 + len + (len & 1) // RIFF chunks are 2-aligned
    }
    require(samples != null, "no data chunk")
    require(samples.length % channels == 0, "PCM data not channel-aligned")
    Wav(rate, channels, samples)
  }

  // --------------------------------------------------------------- BMP

  /** `pixels` are (r, g, b) triples, row-major TOP-DOWN. */
  final case class Bmp(width: Int, height: Int, pixels: Array[(Int, Int, Int)])

  /** Render 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows,
    * 4-byte row padding, BGR byte order).
    */
  def renderBmp(width: Int, height: Int, pixels: Array[(Int, Int, Int)]): Array[Byte] = {
    require(width > 0 && height > 0, "bad BMP geometry")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    pixels.foreach { case (r, g, bl) =>
      require(Seq(r, g, bl).forall(c => c >= 0 && c <= 255), s"bad channel in ($r,$g,$bl)")
    }
    val rowBytes = (width * 3 + 3) & ~3
    val dataLen = rowBytes * height
    val b = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
    b.putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height)
    b.putShort(1.toShort).putShort(24.toShort)
    b.putInt(0).putInt(dataLen)
    b.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, default palette
    (height - 1 to 0 by -1).foreach { y => // bottom-up
      (0 until width).foreach { x =>
        val (r, g, bl) = pixels(y * width + x)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
      }
      (width * 3 until rowBytes).foreach(_ => b.put(0.toByte))
    }
    b.array()
  }

  // --------------------------------------------------------------- PNG

  /** 8-bit image, row-major interleaved samples in 0..255; `channels` = 3
    * (RGB, color type 2) or 4 (RGBA, color type 6).
    */
  final case class Png(width: Int, height: Int, channels: Int, samples: Array[Int]) {
    def channelMean(c: Int): Double = {
      require(c >= 0 && c < channels, s"channel $c of $channels")
      var s = 0L; var i = c
      while (i < samples.length) { s += samples(i); i += channels }
      s.toDouble / (width.toLong * height)
    }
  }

  private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** a = left, b = above, c = upper-left (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Render 8-bit RGB/RGBA PNG: IHDR → one IDAT (zlib) → IEND, CRC32 per
    * chunk. Each scanline uses filter type `row % 5`, so a round trip
    * exercises every unfilter path (any per-row filter choice is valid —
    * decoders must handle all five).
    */
  def renderPng(width: Int, height: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && (channels == 3 || channels == 4),
      s"bad PNG geometry ${width}x$height x$channels")
    require(samples.length == width * height * channels,
      s"${samples.length} samples for ${width}x${height}x$channels")
    samples.foreach(v => require(v >= 0 && v <= 255, s"sample $v outside 8-bit"))
    val bpp = channels
    val stride = width * bpp
    val rawRows = Array.tabulate(height, stride)((y, i) => samples(y * stride + i))
    val filtered = new java.io.ByteArrayOutputStream()
    (0 until height).foreach { y =>
      val ft = y % 5
      filtered.write(ft)
      val row = rawRows(y)
      val prior = if (y == 0) new Array[Int](stride) else rawRows(y - 1)
      (0 until stride).foreach { i =>
        val left = if (i >= bpp) row(i - bpp) else 0
        val upLeft = if (i >= bpp) prior(i - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => prior(i)
          case 3 => (left + prior(i)) / 2
          case 4 => paeth(left, prior(i), upLeft)
        }
        filtered.write((row(i) - pred) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered.toByteArray); defl.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zBuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length) // PNG is big-endian
      b.putInt(body.length).put(tag.getBytes("US-ASCII")).put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(body)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put((if (channels == 3) 2 else 6).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zBuf.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Decode 8-bit RGB/RGBA PNG (color types 2 and 6, no interlace): chunk
    * walk with CRC verification, IDAT concatenation, zlib inflate, and the
    * five spec unfilters. Palette/16-bit/interlaced files fail loudly.
    */
  def decodePng(bytes: Array[Byte]): Png = {
    require(bytes.length > 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "not a PNG file (signature mismatch)")
    val b = ByteBuffer.wrap(bytes) // big-endian by default
    var p = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      require(p + 8 <= bytes.length, "PNG truncated mid-chunk-header")
      val len = b.getInt(p)
      require(len >= 0 && p + 12 + len <= bytes.length, s"PNG chunk at $p overruns")
      val tag = new String(bytes, p + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, p + 4, 4 + len)
      require(crc.getValue.toInt == b.getInt(p + 8 + len),
        s"PNG chunk '$tag' CRC mismatch")
      tag match {
        case "IHDR" =>
          require(len == 13, s"IHDR of $len bytes")
          width = b.getInt(p + 8); height = b.getInt(p + 12)
          require(width > 0 && height > 0, s"bad PNG extent ${width}x$height")
          val depth = bytes(p + 16) & 0xff
          val colorType = bytes(p + 17) & 0xff
          require(depth == 8, s"bit depth $depth unsupported (8 only)")
          require(colorType == 2 || colorType == 6,
            s"color type $colorType unsupported (truecolor 2/6 only)")
          require(bytes(p + 18) == 0 && bytes(p + 19) == 0 && bytes(p + 20) == 0,
            "nonzero compression/filter/interlace method")
          channels = if (colorType == 2) 3 else 4
        case "IDAT" =>
          require(width > 0, "IDAT before IHDR")
          idat.write(bytes, p + 8, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) skipped
      }
      p += 12 + len
    }
    require(width > 0, "no IHDR chunk")
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val bpp = channels
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    var got = 0
    while (got < raw.length && !infl.finished()) {
      val n = infl.inflate(raw, got, raw.length - got)
      require(n > 0 || infl.finished(), "PNG zlib stream stalled")
      got += n
    }
    infl.end()
    require(got == raw.length, s"PNG pixel data: inflated $got of ${raw.length} bytes")
    val out = new Array[Int](height * stride)
    (0 until height).foreach { y =>
      val base = y * (1 + stride)
      val ft = raw(base) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $y")
      (0 until stride).foreach { i =>
        val x = raw(base + 1 + i) & 0xff
        val left = if (i >= bpp) out(y * stride + i - bpp) else 0
        val up = if (y > 0) out((y - 1) * stride + i) else 0
        val upLeft = if (y > 0 && i >= bpp) out((y - 1) * stride + i - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        out(y * stride + i) = (x + pred) & 0xff
      }
    }
    Png(width, height, channels, out)
  }

  /** Decode 24-bit uncompressed BMP (positive height = bottom-up rows). */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP file")
    val dataOff = b.getInt(10)
    val hdrSize = b.getInt(14)
    require(hdrSize >= 40, s"BMP header size $hdrSize unsupported")
    val width = b.getInt(18)
    val height0 = b.getInt(22)
    val bpp = b.getShort(28) & 0xffff
    val compression = b.getInt(30)
    require(bpp == 24 && compression == 0,
      s"only 24-bit uncompressed supported (bpp=$bpp, compression=$compression)")
    require(width > 0 && height0 != 0 && height0 != Int.MinValue,
      s"bad BMP extent ${width}x$height0")
    val bottomUp = height0 > 0
    val height = math.abs(height0)
    val rowBytes = (width * 3 + 3) & ~3
    require(dataOff >= 54 && dataOff + rowBytes.toLong * height <= bytes.length,
      "BMP pixel data overruns the file")
    val px = new Array[(Int, Int, Int)](width * height)
    (0 until height).foreach { row =>
      val srcRow = if (bottomUp) height - 1 - row else row
      val base = dataOff + srcRow * rowBytes
      (0 until width).foreach { x =>
        val p = base + x * 3
        px(row * width + x) =
          ((bytes(p + 2) & 0xff), (bytes(p + 1) & 0xff), (bytes(p) & 0xff))
      }
    }
    Bmp(width, height, px)
  }

  // --------------------------------------------------------------- JPEG

  /** Baseline JFIF image in its native component space: `channels` = 1
    * (grayscale, component Y) or 3 (YCbCr 4:4:4), row-major interleaved
    * samples 0..255. Color-space conversion to RGB is a separate concern
    * (the DCT/Huffman layer below is what "decoding a JPEG" means;
    * conversion is three fixed linear maps).
    */
  final case class Jpeg(width: Int, height: Int, channels: Int, samples: Array[Int]) {
    def channelMean(c: Int): Double = {
      require(c >= 0 && c < channels, s"channel $c of $channels")
      var s = 0L; var i = c
      while (i < samples.length) { s += samples(i); i += channels }
      s.toDouble / (width.toLong * height)
    }
  }

  /** Zigzag scan order (T.81 Figure A.6): index-in-scan → raster index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Quant tables, raster order. DC step 8 divides the flat-block DC
    * (= 8·(c−128)) exactly for every 8-bit c, so images built from
    * constant 8×8 blocks round-trip bit-exactly — the property the oracle
    * query leans on. AC steps are ordinary lossy values.
    */
  private val QLuma: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)
  private val QChroma: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 24)

  /** DC Huffman layouts from T.81 Annex K.3 (the de-facto standard set). */
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** AC layout covering every baseline symbol — EOB at length 2,
    * (0,1)/(0,2) at length 3, the remaining 159 run/size pairs + ZRL at
    * length 9 (Kraft sum 0.81 < 1, a legal incomplete canonical code).
    * Multi-length, so decoders must do real canonical-code walking.
    */
  private val AcLayout: (Array[Int], Array[Int]) = {
    val head = Array(0x00, 0x01, 0x02) // EOB, (0,1), (0,2)
    val rest = (for { run <- 0 to 15; size <- 1 to 10
                      sym = (run << 4) | size if !head.contains(sym) } yield sym) :+ 0xF0
    val bits = new Array[Int](16)
    bits(1) = 1; bits(2) = 2; bits(8) = rest.length
    (bits, head ++ rest)
  }

  /** Canonical codes for encoding: symbol → (code, length). T.81 C.2. */
  private def huffCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = Map.newBuilder[Int, (Int, Int)]
    var code = 0; var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) { m += (vals(k) -> ((code, l))); code += 1; k += 1 }
      code <<= 1
    }
    m.result()
  }

  /** Canonical decode via mincode/maxcode/valptr (T.81 F.2.2.3). */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val minC = new Array[Int](17)
    private val maxC = Array.fill(17)(-1)
    private val vptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        if (bits(l - 1) > 0) {
          vptr(l) = k; minC(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxC(l) = code - 1
        }
        code <<= 1
      }
    }
    def decode(nextBit: () => Int): Int = {
      var l = 1; var code = nextBit()
      while (maxC(l) < 0 || code > maxC(l)) {
        l += 1
        require(l <= 16, "corrupt JPEG entropy stream (no Huffman code matches)")
        code = (code << 1) | nextBit()
      }
      vals(vptr(l) + code - minC(l))
    }
  }

  private val CosT = Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private def cC(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Bit category of a DC diff / AC value (T.81 Table F.1). */
  private def cat(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a > 0) { a >>= 1; n += 1 }
    n
  }

  /** Sign-extend `v` received in `t` bits (T.81 F.2.2.1 EXTEND). */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** MSB-first bit sink with 0xFF→0xFF00 stuffing; flush pads with 1s. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L; private var nb = 0
    def put(v: Int, n: Int): Unit = {
      require(n >= 0 && n <= 24, s"bad bit count $n")
      acc = (acc << n) | (v & ((1L << n) - 1)); nb += n
      while (nb >= 8) {
        val b = ((acc >>> (nb - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        nb -= 8
      }
    }
    def flush(): Unit = if (nb > 0) { put((1 << (8 - nb)) - 1, 8 - nb) }
  }

  /** MSB-first bit source over entropy-coded data; consumes stuffed
    * 0xFF00 pairs, refuses to read through a real marker.
    */
  private final class BitReader(bytes: Array[Byte], var p: Int) {
    private var cur = 0; private var nb = 0
    def nextBit(): Int = {
      if (nb == 0) {
        require(p < bytes.length, "JPEG entropy stream truncated")
        cur = bytes(p) & 0xff; p += 1
        if (cur == 0xff) {
          require(p < bytes.length && bytes(p) == 0,
            "marker inside entropy-coded segment")
          p += 1 // stuffed zero
        }
        nb = 8
      }
      nb -= 1
      (cur >>> nb) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def align(): Unit = nb = 0
  }

  /** Forward DCT + quantize one level-shifted block → zigzag-ordered
    * quantized coefficients (T.81 A.3.3).
    */
  private def fdctQuant(block: Array[Int], q: Array[Int]): Array[Int] = {
    val coef = new Array[Double](64)
    for (u <- 0 until 8; v <- 0 until 8) {
      var s = 0.0
      for (x <- 0 until 8; y <- 0 until 8)
        s += (block(x * 8 + y) - 128) * CosT(x)(u) * CosT(y)(v)
      coef(u * 8 + v) = 0.25 * cC(u) * cC(v) * s
    }
    Array.tabulate(64)(i => math.round(coef(Zigzag(i)) / q(Zigzag(i))).toInt)
  }

  /** Render baseline JFIF: SOI → APP0 → DQT → SOF0 → DHT → [DRI] → SOS →
    * entropy-coded interleaved MCUs → EOI. `subsample420 = true` encodes
    * YCbCr 4:2:0 (the sampling most real-world JPEGs use: 2×2 luma blocks
    * + one box-filtered block per chroma component per 16×16 MCU);
    * otherwise one block per component (4:4:4 / grayscale). With
    * `restartInterval` > 0, RST0..7 markers cycle every that-many MCUs and
    * DC predictors reset — the parallel-decode seam real encoders emit.
    */
  def renderJpeg(width: Int, height: Int, channels: Int, samples: Array[Int],
                 restartInterval: Int = 0,
                 subsample420: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff &&
      (channels == 1 || channels == 3),
      s"bad JPEG geometry ${width}x$height x$channels")
    require(samples.length == width * height * channels,
      s"${samples.length} samples for ${width}x${height}x$channels")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"restart interval $restartInterval outside the 16-bit DRI field")
    require(!subsample420 || channels == 3, "4:2:0 needs 3 components")
    samples.foreach(v => require(v >= 0 && v <= 255, s"sample $v outside 8-bit"))
    val factors: Seq[(Int, Int)] = // (h, v) sampling per component
      if (subsample420) Seq((2, 2), (1, 1), (1, 1))
      else Seq.fill(channels)((1, 1))
    val hmax = factors.map(_._1).max
    val vmax = factors.map(_._2).max
    // component planes at their own resolution; subsampled chroma is the
    // rounded box filter of each hmax/hc × vmax/vc pixel group
    val planes = (0 until channels).map { c =>
      val (hc, vc) = factors(c)
      val cw = (width * hc + hmax - 1) / hmax
      val chh = (height * vc + vmax - 1) / vmax
      val p = Array.tabulate(chh * cw) { i =>
        val py = i / cw; val px = i % cw
        val y0 = py * vmax / vc; val x0 = px * hmax / hc
        var sum = 0; var n = 0
        for (dy <- 0 until vmax / vc; dx <- 0 until hmax / hc) {
          val y = math.min(height - 1, y0 + dy); val x = math.min(width - 1, x0 + dx)
          sum += samples((y * width + x) * channels + c); n += 1
        }
        math.round(sum.toDouble / n).toInt
      }
      (p, cw, chh)
    }
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    def dqt(id: Int, q: Array[Int]): Array[Int] = id +: Array.tabulate(64)(i => q(Zigzag(i)))
    seg(0xdb, if (channels == 1) dqt(0, QLuma) else dqt(0, QLuma) ++ dqt(1, QChroma))
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff, channels) ++
      (0 until channels).flatMap { c =>
        val (hc, vc) = factors(c)
        Seq(c + 1, (hc << 4) | vc, if (c == 0) 0 else 1)
      })
    val (acBits, acVals) = AcLayout
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Array[Int] =
      tcTh +: (bits ++ vals)
    val tables =
      dht(0x00, DcLumaBits, DcVals) ++ dht(0x10, acBits, acVals) ++
        (if (channels == 3) dht(0x01, DcChromaBits, DcVals) ++ dht(0x11, acBits, acVals)
         else Array.empty[Int])
    seg(0xc4, tables)
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    seg(0xda, channels +: ((0 until channels).toArray.flatMap(c =>
      Array(c + 1, if (c == 0) 0x00 else 0x11)) ++ Array(0, 63, 0)))
    val dcCodes = Array(huffCodes(DcLumaBits, DcVals), huffCodes(DcChromaBits, DcVals))
    val acCodes = huffCodes(acBits, acVals) // same layout registered in both slots
    val bw = new BitWriter(out)
    val mbx = (width + 8 * hmax - 1) / (8 * hmax)
    val mby = (height + 8 * vmax - 1) / (8 * vmax)
    val pred = new Array[Int](channels)
    var rst = 0
    for (mi <- 0 until mbx * mby) {
      if (restartInterval > 0 && mi > 0 && mi % restartInterval == 0) {
        bw.flush(); out.write(0xff); out.write(0xd0 + rst % 8); rst += 1
        java.util.Arrays.fill(pred, 0)
      }
      val my = mi / mbx; val mx = mi % mbx
      for (c <- 0 until channels; by2 <- 0 until factors(c)._2;
           bx2 <- 0 until factors(c)._1) {
        val (plane, cw, chh) = planes(c)
        val y0 = (my * factors(c)._2 + by2) * 8
        val x0 = (mx * factors(c)._1 + bx2) * 8
        val block = Array.tabulate(64) { i => // edge-replicate partial blocks
          val y = math.min(chh - 1, y0 + i / 8)
          val x = math.min(cw - 1, x0 + i % 8)
          plane(y * cw + x)
        }
        val zz = fdctQuant(block, if (c == 0) QLuma else QChroma)
        val diff = zz(0) - pred(c); pred(c) = zz(0)
        val t = cat(diff)
        val (dc, dl) = dcCodes(if (c == 0) 0 else 1)(t)
        bw.put(dc, dl)
        if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        var k = 1; var run = 0
        while (k < 64) {
          if (zz(k) == 0) run += 1
          else {
            while (run >= 16) { val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16 }
            val s = cat(zz(k))
            val (ac, al) = acCodes((run << 4) | s)
            bw.put(ac, al)
            bw.put(if (zz(k) >= 0) zz(k) else zz(k) + (1 << s) - 1, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) }
      }
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** AC Huffman layout for the progressive scans: every (run, size) pair
    * for sizes 0..10 — which includes the EOBn symbols (size 0, run = log2
    * of the EOB run length) and ZRL (0xF0) — as a flat 8-bit canonical
    * code (176 symbols ≤ 255, no all-ones codeword). The baseline table
    * can't serve: it lacks EOBn for runs > 1.
    */
  private val AcProgLayout: (Array[Int], Array[Int]) = {
    val vals = (for { r <- 0 to 15; s <- 0 to 10 } yield (r << 4) | s).toArray
    val bits = new Array[Int](16)
    bits(7) = vals.length
    (bits, vals)
  }

  /** Render progressive JFIF (SOF2, grayscale or YCbCr 4:4:4) with the
    * standard four-stage scan script exercising every progressive scan
    * type of T.81 G.2: interleaved DC at Al=1 → DC refinement → per
    * component AC 1..63 first pass at Al=1 (EOB-run coded) → per component
    * AC refinement to Al=0 (correction bits). Quantized coefficients are
    * identical to [[renderJpeg]]'s, so baseline and progressive renders of
    * the same samples decode to identical pixels.
    */
  def renderJpegProgressive(width: Int, height: Int, channels: Int,
                            samples: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff &&
      (channels == 1 || channels == 3),
      s"bad JPEG geometry ${width}x$height x$channels")
    require(samples.length == width * height * channels,
      s"${samples.length} samples for ${width}x${height}x$channels")
    samples.foreach(v => require(v >= 0 && v <= 255, s"sample $v outside 8-bit"))
    val mbx = (width + 7) / 8; val mby = (height + 7) / 8
    // quantized zigzag blocks per component (edge-replicated partials),
    // same fdctQuant as the baseline encoder
    val blocks: IndexedSeq[Array[Array[Int]]] = (0 until channels).map { c =>
      val q = if (c == 0) QLuma else QChroma
      Array.tabulate(mbx * mby) { mi =>
        val my = mi / mbx; val mx = mi % mbx
        val block = Array.tabulate(64) { i =>
          val y = math.min(height - 1, my * 8 + i / 8)
          val x = math.min(width - 1, mx * 8 + i % 8)
          samples((y * width + x) * channels + c)
        }
        fdctQuant(block, q)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(id: Int, q: Array[Int]): Array[Int] = id +: Array.tabulate(64)(i => q(Zigzag(i)))
    seg(0xdb, if (channels == 1) dqt(0, QLuma) else dqt(0, QLuma) ++ dqt(1, QChroma))
    seg(0xc2, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff, channels) ++
      (0 until channels).flatMap(c => Seq(c + 1, 0x11, if (c == 0) 0 else 1)))
    val (apBits, apVals) = AcProgLayout
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Array[Int] =
      tcTh +: (bits ++ vals)
    seg(0xc4, dht(0x00, DcLumaBits, DcVals) ++ dht(0x10, apBits, apVals) ++
      (if (channels == 3) dht(0x01, DcChromaBits, DcVals) else Array.empty[Int]))
    val dcCodes = Array(huffCodes(DcLumaBits, DcVals), huffCodes(DcChromaBits, DcVals))
    val acCodes = huffCodes(apBits, apVals)
    def floorLog2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

    // ---- scan 1: DC first pass, interleaved, point transform Al = 1
    seg(0xda, channels +: ((0 until channels).toArray.flatMap(c =>
      Array(c + 1, (if (c == 0) 0 else 1) << 4)) ++ Array(0, 0, 0x01)))
    locally {
      val bw = new BitWriter(out)
      val pred = new Array[Int](channels)
      for (mi <- 0 until mbx * mby; c <- 0 until channels) {
        val dc = blocks(c)(mi)(0) >> 1 // DC point transform: arithmetic shift
        val diff = dc - pred(c); pred(c) = dc
        val t = cat(diff)
        val (code, l) = dcCodes(if (c == 0) 0 else 1)(t)
        bw.put(code, l)
        if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      }
      bw.flush()
    }

    // ---- scan 2: DC refinement, one raw bit per block
    seg(0xda, channels +: ((0 until channels).toArray.flatMap(c =>
      Array(c + 1, 0)) ++ Array(0, 0, 0x10)))
    locally {
      val bw = new BitWriter(out)
      for (mi <- 0 until mbx * mby; c <- 0 until channels)
        bw.put(blocks(c)(mi)(0) & 1, 1)
      bw.flush()
    }

    // ---- scans 3..: per component, AC 1..63 first pass at Al = 1
    for (c <- 0 until channels) {
      seg(0xda, Array(1, c + 1, 0x00, 1, 63, 0x01))
      val bw = new BitWriter(out)
      var eobrun = 0
      def emitEobrun(): Unit = if (eobrun > 0) {
        val nb = floorLog2(eobrun)
        val (code, l) = acCodes(nb << 4); bw.put(code, l)
        if (nb > 0) bw.put(eobrun & ((1 << nb) - 1), nb)
        eobrun = 0
      }
      for (b <- blocks(c)) {
        var r = 0
        for (k <- 1 to 63) {
          val t = math.abs(b(k)) >> 1 // AC point transform: magnitude shift
          if (t == 0) r += 1
          else {
            emitEobrun()
            while (r > 15) { val (z, zl) = acCodes(0xf0); bw.put(z, zl); r -= 16 }
            val s = cat(t)
            val (code, l) = acCodes((r << 4) | s); bw.put(code, l)
            val x = if (b(k) >= 0) t else -t
            bw.put(if (x >= 0) x else x + (1 << s) - 1, s)
            r = 0
          }
        }
        if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) emitEobrun() }
      }
      emitEobrun()
      bw.flush()
    }

    // ---- scans: per component, AC refinement Ah=1 → Al=0 (T.81 G.1.2.3:
    // newly-significant (r,1) symbols + buffered correction bits riding
    // the EOB runs)
    for (c <- 0 until channels) {
      seg(0xda, Array(1, c + 1, 0x00, 1, 63, 0x10))
      val bw = new BitWriter(out)
      var eobrun = 0
      val runBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      val blockBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      def emitEobrun(): Unit = if (eobrun > 0) {
        val nb = floorLog2(eobrun)
        val (code, l) = acCodes(nb << 4); bw.put(code, l)
        if (nb > 0) bw.put(eobrun & ((1 << nb) - 1), nb)
        eobrun = 0
        runBits.foreach(bit => bw.put(bit, 1)); runBits.clear()
      }
      def flushBlockBits(): Unit = {
        blockBits.foreach(bit => bw.put(bit, 1)); blockBits.clear()
      }
      for (b <- blocks(c)) {
        var eobPos = 0 // last newly-significant position (|coef| == 1)
        for (k <- 1 to 63) if (math.abs(b(k)) == 1) eobPos = k
        var r = 0
        blockBits.clear()
        for (k <- 1 to 63) {
          val t = math.abs(b(k))
          if (t == 0) r += 1
          else {
            while (r > 15 && k <= eobPos) {
              emitEobrun()
              val (z, zl) = acCodes(0xf0); bw.put(z, zl); r -= 16
              flushBlockBits()
            }
            if (t > 1) blockBits += (t & 1) // already significant: LSB only
            else {
              emitEobrun()
              val (code, l) = acCodes((r << 4) | 1); bw.put(code, l)
              bw.put(if (b(k) < 0) 0 else 1, 1)
              flushBlockBits()
              r = 0
            }
          }
        }
        if (r > 0 || blockBits.nonEmpty) {
          eobrun += 1; runBits ++= blockBits
          if (eobrun == 0x7fff) emitEobrun()
        }
      }
      emitEobrun()
      bw.flush()
    }

    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Decode JPEG — baseline sequential (SOF0) AND progressive (SOF2),
    * 8-bit; grayscale, 4:4:4, and subsampled 4:2:0/4:2:2 with sampling
    * factors up to 2×2: marker walk (APPn/COM skipped), DQT/DHT as
    * declared in the file, entropy decode into per-component coefficient
    * stores (baseline: one interleaved scan with DC prediction and restart
    * intervals; progressive: any number of spectral-selection /
    * successive-approximation scans per T.81 G.2 — DC first+refine,
    * AC first with EOB runs, AC refinement with correction bits), then one
    * deferred dequant + zigzag + IDCT pass at EOI and nearest-neighbor
    * chroma upsampling. Arithmetic-coded and 12-bit files fail loudly.
    */
  def decodeJpeg(bytes: Array[Byte]): Jpeg = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG file (no SOI)")
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    val qts = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var width = -1; var height = -1; var nc = -1
    var progressive = false
    var compId: Array[Int] = null
    var compQ: Array[Int] = null
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var hmax = 1; var vmax = 1; var mbx = 0; var mby = 0
    var bW: Array[Int] = null; var bH: Array[Int] = null
    var nbW: Array[Int] = null; var nbH: Array[Int] = null
    // per-component zigzag-order coefficient store, MCU-padded block grid;
    // scans accumulate here and the IDCT runs once at EOI
    var coefs: Array[Array[Int]] = null
    var sawScan = false
    var dri = 0
    var p = 2
    var done = false
    while (!done) {
      require(p + 2 <= bytes.length, "JPEG truncated before marker")
      require((bytes(p) & 0xff) == 0xff, f"expected marker at offset $p")
      var marker = bytes(p + 1) & 0xff
      while (marker == 0xff && p + 2 < bytes.length) { p += 1; marker = bytes(p + 1) & 0xff }
      p += 2
      if (marker != 0xd9) { // every other marker we accept carries a length
        require(p + 2 <= bytes.length, "JPEG truncated before segment length")
        require(p + u16(p) <= bytes.length, "JPEG segment overruns the file")
      }
      marker match {
        case 0xd9 => done = true // EOI
        case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe => p += u16(p) // APPn / COM
        case 0xdb =>
          val end = p + u16(p); var q = p + 2
          while (q < end) {
            val pq = (bytes(q) & 0xff) >> 4; val tq = bytes(q) & 0x0f
            require(pq == 0, "16-bit quantization tables unsupported (8-bit only)")
            require(q + 65 <= end, "DQT table overruns its segment")
            val t = new Array[Int](64)
            for (i <- 0 until 64) t(Zigzag(i)) = bytes(q + 1 + i) & 0xff
            qts(tq) = t; q += 65
          }
          p = end
        case 0xc4 =>
          val end = p + u16(p); var q = p + 2
          while (q < end) {
            val tc = (bytes(q) & 0xff) >> 4; val th = bytes(q) & 0x0f
            require(tc <= 1 && th <= 3, s"bad DHT class/id $tc/$th")
            require(q + 17 <= end, "DHT header overruns its segment")
            val bits = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
            val n = bits.sum
            require(q + 17 + n <= end, "DHT values overrun their segment")
            val vals = Array.tabulate(n)(i => bytes(q + 17 + i) & 0xff)
            val d = new HuffDecoder(bits, vals)
            if (tc == 0) dcTabs(th) = d else acTabs(th) = d
            q += 17 + n
          }
          p = end
        case sof @ (0xc0 | 0xc2) =>
          require(nc < 0, "multiple SOF frames")
          progressive = sof == 0xc2
          require((bytes(p + 2) & 0xff) == 8, "12-bit precision unsupported")
          height = u16(p + 3); width = u16(p + 5); nc = bytes(p + 7) & 0xff
          require(width > 0 && height > 0, s"bad JPEG extent ${width}x$height")
          require(nc == 1 || nc == 3, s"$nc components unsupported (1 or 3)")
          compId = new Array[Int](nc); compQ = new Array[Int](nc)
          compH = new Array[Int](nc); compV = new Array[Int](nc)
          for (c <- 0 until nc) {
            val o = p + 8 + c * 3
            compId(c) = bytes(o) & 0xff
            compH(c) = (bytes(o + 1) & 0xff) >> 4
            compV(c) = bytes(o + 1) & 0x0f
            require(compH(c) >= 1 && compH(c) <= 2 && compV(c) >= 1 && compV(c) <= 2,
              s"sampling factors ${compH(c)}x${compV(c)} unsupported (1..2)")
            compQ(c) = bytes(o + 2) & 0x0f
          }
          hmax = compH.max; vmax = compV.max
          mbx = (width + 8 * hmax - 1) / (8 * hmax)
          mby = (height + 8 * vmax - 1) / (8 * vmax)
          bW = Array.tabulate(nc)(c => mbx * compH(c))
          bH = Array.tabulate(nc)(c => mby * compV(c))
          // non-interleaved scan grid: blocks covering the component's own
          // sample extent, NOT the MCU-padded grid (T.81 A.2.2)
          nbW = Array.tabulate(nc)(c => ((width * compH(c) + hmax - 1) / hmax + 7) / 8)
          nbH = Array.tabulate(nc)(c => ((height * compV(c) + vmax - 1) / vmax + 7) / 8)
          coefs = Array.tabulate(nc)(c => new Array[Int](bW(c) * bH(c) * 64))
          p += u16(p)
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc8 =>
          throw new IllegalArgumentException(
            f"SOF marker 0xff$m%02x unsupported (SOF0 baseline / SOF2 progressive only)")
        case 0xdd => dri = u16(p + 2); p += u16(p)
        case 0xda =>
          require(nc > 0, "SOS before SOF")
          val ns = bytes(p + 2) & 0xff
          val scanComp = new Array[Int](ns)
          val scanDc = new Array[Int](ns); val scanAc = new Array[Int](ns)
          for (i <- 0 until ns) {
            val cid = bytes(p + 3 + i * 2) & 0xff
            scanComp(i) = compId.indexOf(cid)
            require(scanComp(i) >= 0, s"scan references unknown component id $cid")
            val sel = bytes(p + 3 + i * 2 + 1) & 0xff
            scanDc(i) = sel >> 4; scanAc(i) = sel & 0x0f
          }
          val so = p + 3 + ns * 2
          val ss = bytes(so) & 0xff; val se = bytes(so + 1) & 0xff
          val ah = (bytes(so + 2) & 0xff) >> 4; val al = bytes(so + 2) & 0x0f
          p += u16(p)
          val br = new BitReader(bytes, p)
          sawScan = true

          def expectRst(rst: Int, what: String): Unit = {
            br.align()
            require(br.p + 2 <= bytes.length, "JPEG truncated at restart boundary")
            require((bytes(br.p) & 0xff) == 0xff &&
              (bytes(br.p + 1) & 0xff) == 0xd0 + rst % 8,
              s"missing RST${rst % 8} marker at $what")
            br.p += 2
          }

          if (!progressive) {
            require(ns == nc, "partial-scan baseline JPEG unsupported")
            val pred = new Array[Int](nc)
            var rst = 0
            for (mi <- 0 until mbx * mby) {
              if (dri > 0 && mi > 0 && mi % dri == 0) {
                expectRst(rst, s"MCU $mi"); rst += 1
                java.util.Arrays.fill(pred, 0)
              }
              val my = mi / mbx; val mx = mi % mbx
              for (c <- 0 until nc; by2 <- 0 until compV(c); bx2 <- 0 until compH(c)) {
                val dcT = dcTabs(scanDc(c)); val acT = acTabs(scanAc(c))
                require(dcT != null && acT != null, s"scan uses undeclared DHT for comp $c")
                val base = ((my * compV(c) + by2) * bW(c) + mx * compH(c) + bx2) * 64
                val zz = coefs(c)
                val t = dcT.decode(br.nextBit _)
                require(t <= 11, s"DC category $t out of range")
                pred(c) += extend(br.receive(t), t)
                zz(base) = pred(c)
                var k = 1; var eob = false
                while (k < 64 && !eob) {
                  val rs = acT.decode(br.nextBit _)
                  val r = rs >> 4; val s = rs & 0x0f
                  if (s == 0) { if (r == 15) k += 16 else eob = true }
                  else {
                    k += r
                    require(k < 64, "AC coefficient index overruns the block")
                    zz(base + k) = extend(br.receive(s), s); k += 1
                  }
                }
              }
            }
          } else if (ss == 0) {
            // ---- progressive DC scan (interleaved over the scan's comps)
            require(se == 0, "DC scan must have Se = 0")
            require(ns == nc, "subset DC scans unsupported (all components)")
            val pred = new Array[Int](ns)
            var rst = 0
            for (mi <- 0 until mbx * mby) {
              if (dri > 0 && mi > 0 && mi % dri == 0) {
                expectRst(rst, s"MCU $mi"); rst += 1
                java.util.Arrays.fill(pred, 0)
              }
              val my = mi / mbx; val mx = mi % mbx
              for (i <- 0 until ns) {
                val c = scanComp(i)
                for (by2 <- 0 until compV(c); bx2 <- 0 until compH(c)) {
                  val base = ((my * compV(c) + by2) * bW(c) + mx * compH(c) + bx2) * 64
                  if (ah == 0) {
                    val dcT = dcTabs(scanDc(i))
                    require(dcT != null, s"DC scan uses undeclared DHT for comp $c")
                    val t = dcT.decode(br.nextBit _)
                    require(t <= 11, s"DC category $t out of range")
                    pred(i) += extend(br.receive(t), t)
                    coefs(c)(base) = pred(i) << al
                  } else {
                    // refinement: one raw bit per block (T.81 G.2: |=, which
                    // is exact on the two's-complement accumulated value)
                    if (br.nextBit() == 1) coefs(c)(base) |= (1 << al)
                  }
                }
              }
            }
          } else {
            // ---- progressive AC scan (single component, non-interleaved)
            require(ns == 1, "progressive AC scans are single-component")
            require(ss <= se && se <= 63, s"bad spectral band $ss..$se")
            val c = scanComp(0)
            val acT = acTabs(scanAc(0))
            require(acT != null, s"AC scan uses undeclared DHT for comp $c")
            val zz = coefs(c)
            val p1 = 1 << al; val m1 = -(1 << al)
            var eobrun = 0
            var rst = 0
            val nBlocks = nbW(c) * nbH(c)
            for (bi <- 0 until nBlocks) {
              if (dri > 0 && bi > 0 && bi % dri == 0) {
                expectRst(rst, s"block $bi"); rst += 1
                eobrun = 0
              }
              val base = ((bi / nbW(c)) * bW(c) + bi % nbW(c)) * 64
              if (ah == 0) {
                // first scan of the band: EOB-run coding (T.81 G.1.2.2)
                if (eobrun > 0) eobrun -= 1
                else {
                  var k = ss; var stop = false
                  while (k <= se && !stop) {
                    val rs = acT.decode(br.nextBit _)
                    val r = rs >> 4; val s = rs & 0x0f
                    if (s == 0) {
                      if (r != 15) {
                        eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
                        stop = true
                      } else k += 16
                    } else {
                      k += r
                      require(k <= se, "AC coefficient overruns the band")
                      zz(base + k) = extend(br.receive(s), s) << al
                      k += 1
                    }
                  }
                }
              } else {
                // refinement scan: correction bits while advancing over
                // zero-history runs (T.81 G.1.2.3)
                def correctRest(from: Int): Unit = {
                  var k = from
                  while (k <= se) {
                    val cur = zz(base + k)
                    if (cur != 0 && br.nextBit() == 1 && (cur & p1) == 0)
                      zz(base + k) = cur + (if (cur >= 0) p1 else m1)
                    k += 1
                  }
                }
                if (eobrun > 0) { correctRest(ss); eobrun -= 1 }
                else {
                  var k = ss; var stop = false
                  while (k <= se && !stop) {
                    val rs = acT.decode(br.nextBit _)
                    var r = rs >> 4; val s = rs & 0x0f
                    var newVal = 0
                    if (s == 0) {
                      if (r != 15) {
                        eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                        stop = true
                      } // r == 15: ZRL — skip 16 zero-history coefficients
                    } else {
                      require(s == 1, "refinement magnitude must be 1")
                      newVal = if (br.nextBit() == 1) p1 else m1
                    }
                    if (stop) { correctRest(k); eobrun -= 1 }
                    else {
                      var placed = false
                      while (k <= se && !placed) {
                        val cur = zz(base + k)
                        if (cur != 0) {
                          if (br.nextBit() == 1 && (cur & p1) == 0)
                            zz(base + k) = cur + (if (cur >= 0) p1 else m1)
                        } else if (r == 0) {
                          if (newVal != 0) zz(base + k) = newVal
                          placed = true
                        } else r -= 1
                        k += 1
                      }
                    }
                  }
                }
              }
            }
          }
          br.align()
          p = br.p
        case m =>
          throw new IllegalArgumentException(f"unsupported JPEG marker 0xff$m%02x")
      }
    }
    require(sawScan, "no scan data (SOS) before EOI")
    // ---- deferred dequant + IDCT + nearest-neighbor upsample (exact for
    // the flat-block fixtures the oracle leans on)
    val out = new Array[Int](width * height * nc)
    val planes = (0 until nc).map(c => new Array[Int](bH(c) * 8 * bW(c) * 8))
    for (c <- 0 until nc) {
      val q = qts(compQ(c))
      require(q != null, s"component $c references undeclared DQT ${compQ(c)}")
      val planeW = bW(c) * 8
      for (by <- 0 until bH(c); bx <- 0 until bW(c)) {
        val base = (by * bW(c) + bx) * 64
        val coef = new Array[Double](64)
        for (i <- 0 until 64) coef(Zigzag(i)) = coefs(c)(base + i).toDouble * q(Zigzag(i))
        val y0 = by * 8; val x0 = bx * 8
        for (x <- 0 until 8; y <- 0 until 8) {
          var s2 = 0.0
          for (u <- 0 until 8; v <- 0 until 8)
            s2 += cC(u) * cC(v) * coef(u * 8 + v) * CosT(x)(u) * CosT(y)(v)
          val v0 = math.round(0.25 * s2 + 128.0).toInt
          planes(c)((y0 + x) * planeW + x0 + y) = math.max(0, math.min(255, v0))
        }
      }
    }
    for (y <- 0 until height; x <- 0 until width; c <- 0 until nc)
      out((y * width + x) * nc + c) =
        planes(c)((y * compV(c) / vmax) * bW(c) * 8 + x * compH(c) / hmax)
    Jpeg(width, height, nc, out)
  }
}
