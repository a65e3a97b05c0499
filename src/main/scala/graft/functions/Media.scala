package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Container-free media codecs — PCM WAV (RIFF), 24-bit uncompressed BMP,
  * and 8-bit RGB/RGBA PNG — all PUBLIC byte layouts decodable without any
  * codec library (PNG is zlib, which the JVM ships, plus the five spec
  * filters). They turn the multimodal decode boundary REAL for these
  * formats: payloads travel as opaque binary columns and decode
  * per-partition on executors (`operators/MultimodalOps`); only genuinely
  * codec-bound formats (JPEG/MP4) remain behind the labeled stub.
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
}
