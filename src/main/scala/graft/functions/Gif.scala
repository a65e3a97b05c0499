package graft.functions

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

/** GIF87a/GIF89a codec (public spec: GIF89a, CompuServe 1990) — the
  * third real still-image wire format in the multimodal family (BMP,
  * PNG, JPEG already decode). Covers what corpus GIFs actually use:
  * global AND local color tables, interlaced images (the four-pass row
  * shuffle), multi-frame animations with Graphic Control Extension
  * delays, and the variable-width LSB-first LZW dialect ([[Lzw]]).
  *
  * Decode returns frames in NATURAL row order (deinterlaced) as RGB
  * triples resolved through the active color table, so downstream
  * feature extraction is palette-free.
  */
object Gif {

  final case class Frame(left: Int, top: Int, width: Int, height: Int,
                         interlaced: Boolean, delayCs: Int,
                         rgb: Array[Int]) // 3 ints per pixel, row-major

  final case class Image(width: Int, height: Int, globalColors: Int,
                         frames: Seq[Frame])

  /** The GIF interlace row schedule: pass offsets/strides per spec. */
  private val Passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))

  /** Encode frames of palette indices over a shared palette. Fixture and
    * sink path: GIF89a header, global color table padded to a power of
    * two, per-frame Graphic Control Extension (delay in centiseconds),
    * optional interlacing (rows are PERMUTED on the wire), LZW-compressed
    * index stream in ≤255-byte sub-blocks.
    */
  def render(width: Int, height: Int, palette: Array[(Int, Int, Int)],
             frames: Seq[Array[Int]], interlaced: Seq[Boolean] = Nil,
             delaysCs: Seq[Int] = Nil,
             localPalettes: Map[Int, Array[(Int, Int, Int)]] = Map.empty)
  : Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, s"palette ${palette.length}")
    require(frames.nonEmpty, "no frames")
    frames.foreach(f => require(f.length == width * height,
      s"frame of ${f.length} pixels for ${width}x$height"))
    def bitsFor(p: Array[(Int, Int, Int)]): Int = {
      var bits = 1
      while ((1 << bits) < p.length) bits += 1
      bits
    }
    val bits = bitsFor(palette)
    val tableN = 1 << bits
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0x80 | ((bits - 1) << 4) | (bits - 1)) // GCT present, sizes
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    (0 until tableN).foreach { i =>
      val (r, g, b) = if (i < palette.length) palette(i) else (0, 0, 0)
      out.write(r); out.write(g); out.write(b)
    }
    frames.zipWithIndex.foreach { case (px, fi) =>
      val delay = if (fi < delaysCs.length) delaysCs(fi) else 0
      val ilace = fi < interlaced.length && interlaced(fi)
      // Graphic Control Extension (GIF89a): delay, no transparency
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); u16(delay); out.write(0); out.write(0)
      // Image descriptor: full-frame
      out.write(0x2c); u16(0); u16(0); u16(width); u16(height)
      val lct = localPalettes.get(fi)
      val lctBits = lct.map(bitsFor)
      out.write((if (ilace) 0x40 else 0x00) |
        lctBits.map(b => 0x80 | (b - 1)).getOrElse(0))
      lct.foreach { p =>
        (0 until (1 << lctBits.get)).foreach { i =>
          val (r, g, b) = if (i < p.length) p(i) else (0, 0, 0)
          out.write(r); out.write(g); out.write(b)
        }
      }
      val wire =
        if (!ilace) px
        else { // permute rows into the four-pass schedule
          val rows = Passes.flatMap { case (off, step) =>
            off until height by step
          }
          val o = new Array[Int](px.length)
          rows.zipWithIndex.foreach { case (srcRow, wireRow) =>
            System.arraycopy(px, srcRow * width, o, wireRow * width, width)
          }
          o
        }
      val minCode = math.max(2, lctBits.getOrElse(bits))
      out.write(minCode)
      val lzw = Lzw.encode(wire, minCode, msbFirst = false, earlyChange = false)
      var p = 0
      while (p < lzw.length) {
        val n = math.min(255, lzw.length - p)
        out.write(n); out.write(lzw, p, n); p += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length > 13, "GIF truncated")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: '$sig'")
    var p = 6
    def u8(): Int = {
      require(p + 1 <= bytes.length, s"GIF truncated at $p")
      val v = bytes(p) & 0xff; p += 1; v
    }
    def u16(): Int = {
      require(p + 2 <= bytes.length, s"GIF truncated at $p")
      val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v
    }
    val width = u16(); val height = u16()
    val flags = u8()
    u8(); u8() // background index, aspect ratio
    val gctN = if ((flags & 0x80) != 0) 1 << ((flags & 7) + 1) else 0
    val gct = readColorTable(bytes, p, gctN); p += 3 * gctN
    val frames = new ArrayBuffer[Frame]()
    var pendingDelay = 0
    var done = false
    while (!done) {
      require(p < bytes.length, "GIF truncated before trailer")
      u8() match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          val label = u8()
          if (label == 0xf9) { // Graphic Control Extension
            val sz = u8(); require(sz == 4, s"GCE of size $sz")
            u8(); pendingDelay = u16(); u8()
            require(u8() == 0, "GCE missing terminator")
          } else { // comment / application / plain-text: skip sub-blocks
            var n = u8()
            while (n != 0) {
              require(p + n <= bytes.length, "GIF sub-block overruns")
              p += n; n = u8()
            }
          }
        case 0x2c => // image descriptor
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          val f = u8()
          require(w > 0 && h > 0 && left + w <= width && top + h <= height,
            s"frame ${w}x$h at ($left,$top) outside ${width}x$height")
          val lctN = if ((f & 0x80) != 0) 1 << ((f & 7) + 1) else 0
          val lct = readColorTable(bytes, p, lctN); p += 3 * lctN
          val table = if (lctN > 0) lct else gct
          require(table.nonEmpty, "frame with no active color table")
          val interlaced = (f & 0x40) != 0
          val minCode = u8()
          val data = new ByteArrayOutputStream()
          var n = u8()
          while (n != 0) {
            require(p + n <= bytes.length, "GIF sub-block overruns")
            data.write(bytes, p, n); p += n; n = u8()
          }
          val idx = Lzw.decode(data.toByteArray, minCode,
            msbFirst = false, earlyChange = false)
          require(idx.length >= w * h,
            s"LZW yielded ${idx.length} of ${w * h} pixels")
          val natural =
            if (!interlaced) idx
            else {
              val o = new Array[Int](w * h)
              val rows = Passes.flatMap { case (off, step) => off until h by step }
              rows.zipWithIndex.foreach { case (dstRow, wireRow) =>
                System.arraycopy(idx, wireRow * w, o, dstRow * w, w)
              }
              o
            }
          val rgb = new Array[Int](w * h * 3)
          var i = 0
          while (i < w * h) {
            val c = natural(i)
            require(c < table.length, s"palette index $c of ${table.length}")
            rgb(i * 3) = table(c)._1; rgb(i * 3 + 1) = table(c)._2
            rgb(i * 3 + 2) = table(c)._3
            i += 1
          }
          frames += Frame(left, top, w, h, interlaced, pendingDelay, rgb)
          pendingDelay = 0
        case other => throw new IllegalArgumentException(
          f"unknown GIF block 0x$other%02x at ${p - 1}")
      }
    }
    require(frames.nonEmpty, "GIF with no image data")
    Image(width, height, gctN, frames.toSeq)
  }

  private def readColorTable(bytes: Array[Byte], off: Int,
                             n: Int): Array[(Int, Int, Int)] = {
    require(off + 3 * n <= bytes.length, "color table overruns")
    Array.tabulate(n)(i => ((bytes(off + 3 * i) & 0xff),
      (bytes(off + 3 * i + 1) & 0xff), (bytes(off + 3 * i + 2) & 0xff)))
  }
}
