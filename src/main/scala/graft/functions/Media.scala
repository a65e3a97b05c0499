package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Container-free media codecs — PCM WAV (RIFF) and 24-bit uncompressed
  * BMP, both PUBLIC byte layouts decodable without any codec library. They
  * turn the multimodal decode boundary REAL for these formats: payloads
  * travel as opaque binary columns and decode per-partition on executors
  * (`operators/MultimodalOps`); only compression-bound formats (JPEG/MP4)
  * remain behind the labeled stub, since their codecs aren't in this
  * container.
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
    require(width > 0 && height0 != 0, s"bad BMP extent ${width}x$height0")
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
