package graft.functions

import scala.collection.mutable.ArrayBuffer

/** LZW codec, parameterized over the two wire dialects that actually
  * occur in corpus data (both public formats):
  *
  *  - GIF (GIF89a spec appendix F): codes packed LSB-first, root width =
  *    `minCodeSize`, clear = 2^min, EOI = clear+1, table capped at 4096,
  *    code width grows AFTER the table fills the current width.
  *  - TIFF (TIFF 6.0 §13): codes packed MSB-first, 8-bit roots,
  *    clear = 256, EOI = 257, and the "early change": width grows one
  *    code EARLIER than the table arithmetic alone would require.
  *
  * The dictionary is the standard prefix/suffix pair table — decode
  * reconstructs strings by walking prefix links into a reversed stack,
  * O(output) total, no per-code string allocation.
  */
object Lzw {

  /** Decode `data` under the given dialect. `minCodeSize` is the GIF
    * root-code bit width (ignored meaning-wise for TIFF, which fixes 8).
    * Returns the symbol stream (0 .. 2^min − 1).
    */
  def decode(data: Array[Byte], minCodeSize: Int, msbFirst: Boolean,
             earlyChange: Boolean): Array[Int] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"bad LZW root size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val maxCode = 4096
    val prefix = new Array[Int](maxCode)
    val suffix = new Array[Int](maxCode)
    val out = new ArrayBuffer[Int]()

    var bitPos = 0
    val nBits = data.length * 8
    def read(width: Int): Int = {
      require(bitPos + width <= nBits, "LZW stream truncated mid-code")
      var v = 0
      var i = 0
      while (i < width) {
        val byteI = (bitPos + i) >> 3
        val bitI = (bitPos + i) & 7
        val bit =
          if (msbFirst) (data(byteI) >> (7 - bitI)) & 1
          else (data(byteI) >> bitI) & 1
        v |= bit << (if (msbFirst) width - 1 - i else i)
        i += 1
      }
      bitPos += width
      v
    }

    var width = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    // emit the string for `code` (root chains via prefix links)
    val stack = new ArrayBuffer[Int]()
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    def emit(code: Int): Unit = {
      stack.clear()
      var c = code
      while (c >= clear) { stack += suffix(c); c = prefix(c) }
      stack += c
      var i = stack.length - 1
      while (i >= 0) { out += stack(i); i -= 1 }
    }

    var done = false
    while (!done) {
      val code = read(width)
      if (code == clear) {
        width = minCodeSize + 1
        next = eoi + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, s"first code $code after clear is not a root")
        emit(code); prev = code
      } else {
        require(code <= next, s"LZW code $code beyond table ($next)")
        if (code == next) { // KwKwK
          require(next < maxCode, "LZW table overflow")
          prefix(next) = prev; suffix(next) = firstOf(prev); next += 1
          emit(code)
        } else {
          if (next < maxCode) {
            prefix(next) = prev; suffix(next) = firstOf(code); next += 1
          }
          emit(code)
        }
        prev = code
        val limit = if (earlyChange) (1 << width) - 1 else 1 << width
        if (next >= limit && width < 12) width += 1
      }
    }
    out.toArray
  }

  /** Encode `symbols` (each in 0 .. 2^min − 1) under the given dialect.
    * Emits clear up front, re-clears when the table fills, EOI at the
    * end — the canonical stream every decoder accepts.
    */
  def encode(symbols: Array[Int], minCodeSize: Int, msbFirst: Boolean,
             earlyChange: Boolean): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"bad LZW root size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val maxCode = 4096
    val out = new ArrayBuffer[Byte]()
    var cur = 0; var nb = 0
    var width = minCodeSize + 1

    def put(code: Int): Unit = {
      if (msbFirst) {
        var i = width - 1
        while (i >= 0) {
          cur = (cur << 1) | ((code >> i) & 1); nb += 1
          if (nb == 8) { out += cur.toByte; cur = 0; nb = 0 }
          i -= 1
        }
      } else {
        var i = 0
        while (i < width) {
          cur |= ((code >> i) & 1) << nb; nb += 1
          if (nb == 8) { out += cur.toByte; cur = 0; nb = 0 }
          i += 1
        }
      }
    }

    // dictionary: (prefix code, symbol) → code
    val dict = new java.util.HashMap[Int, Int]()
    def key(p: Int, s: Int): Int = (p << 8) | s
    var next = eoi + 1
    put(clear)
    var prev = -1
    symbols.foreach { s =>
      require(s >= 0 && s < clear, s"symbol $s outside root range")
      if (prev < 0) prev = s
      else {
        val k = key(prev, s)
        val hit = dict.getOrDefault(k, -1)
        if (hit >= 0) prev = hit
        else {
          put(prev)
          if (next < maxCode) {
            dict.put(k, next); next += 1
            val limit = if (earlyChange) (1 << width) - 1 else 1 << width
            if (next > limit && width < 12) width += 1
          } else { // table full: clear and restart
            put(clear)
            dict.clear(); next = eoi + 1; width = minCodeSize + 1
          }
          prev = s
        }
      }
    }
    if (prev >= 0) put(prev)
    // the DECODER registers an entry for the final code and re-checks
    // growth before reading EOI; mirror that check (the registration-time
    // `>` check above cannot see it) so EOI lands at the width the
    // decoder expects — the classic end-of-stream off-by-one.
    if (prev >= 0) {
      val limit = if (earlyChange) (1 << width) - 1 else 1 << width
      if (next >= limit && width < 12) width += 1
    }
    put(eoi)
    if (nb > 0) {
      if (msbFirst) out += (cur << (8 - nb)).toByte else out += cur.toByte
    }
    out.toArray
  }
}
