package graft.functions

/** Compressed-audio METADATA codecs (public specs): FLAC STREAMINFO
  * (xiph.org FLAC format §METADATA_BLOCK_STREAMINFO — the fixed 34-byte
  * bit-packed block after the `fLaC` magic) and the MPEG-1 Layer III
  * frame header (ISO/IEC 11172-3 §2.4.1.3 — 32-bit sync header with
  * bitrate/samplerate table indices). Audio corpora ship as FLAC/MP3;
  * the curator-level contract is geometry and rate metadata, which these
  * parse from the real bitstreams — the audio DSP layer stays on decoded
  * PCM ([[Media.decodeWav]] / `MultimodalOps.audioSpectral`).
  */
object AudioMeta {

  // ------------------------------------------------------------- FLAC

  final case class FlacInfo(minBlock: Int, maxBlock: Int, sampleRate: Int,
                            channels: Int, bitsPerSample: Int,
                            totalSamples: Long) {
    def durationSec: Double =
      if (sampleRate == 0) 0.0 else totalSamples.toDouble / sampleRate
  }

  /** Render `fLaC` + a last-flagged STREAMINFO block (frame-size fields
    * and signature zeroed — unknown, as encoders legitimately write).
    */
  def renderFlacStreamInfo(info: FlacInfo): Array[Byte] = {
    require(info.sampleRate > 0 && info.sampleRate < (1 << 20), s"rate ${info.sampleRate}")
    require(info.channels >= 1 && info.channels <= 8, s"channels ${info.channels}")
    require(info.bitsPerSample >= 4 && info.bitsPerSample <= 32, s"bits ${info.bitsPerSample}")
    require(info.totalSamples >= 0 && info.totalSamples < (1L << 36), s"samples ${info.totalSamples}")
    val out = new java.io.ByteArrayOutputStream(42)
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80)                 // last-metadata-block | type 0
    out.write(0); out.write(0); out.write(34)
    var acc = 0L
    var nb = 0
    val body = new java.io.ByteArrayOutputStream(34)
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nb += 1
        if (nb == 8) { body.write(acc.toInt & 0xff); acc = 0; nb = 0 }
        i -= 1
      }
    }
    put(info.minBlock.toLong, 16)
    put(info.maxBlock.toLong, 16)
    put(0L, 24); put(0L, 24)        // min/max frame size unknown
    put(info.sampleRate.toLong, 20)
    put((info.channels - 1).toLong, 3)
    put((info.bitsPerSample - 1).toLong, 5)
    put(info.totalSamples, 36)
    (0 until 16).foreach(_ => put(0L, 8)) // zeroed MD5 signature
    out.write(body.toByteArray)
    out.toByteArray
  }

  /** Parse `fLaC` + STREAMINFO (skipping any other metadata blocks that
    * precede it — spec requires STREAMINFO first, but tolerate reorder).
    */
  def parseFlacStreamInfo(bytes: Array[Byte]): FlacInfo = {
    require(bytes.length >= 8 &&
      new String(bytes, 0, 4, "US-ASCII") == "fLaC", "not a FLAC stream")
    var p = 4
    while (p + 4 <= bytes.length) {
      val hdr = bytes(p) & 0xff
      val typ = hdr & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      require(p + 4 + len <= bytes.length, s"metadata block overruns at $p")
      if (typ == 0) {
        require(len >= 34, s"STREAMINFO of $len bytes")
        val b = bytes.slice(p + 4, p + 4 + 34)
        def bits(off: Int, n: Int): Long = {
          var v = 0L
          var i = 0
          while (i < n) {
            val bitIx = off + i
            v = (v << 1) | ((b(bitIx >> 3) >> (7 - (bitIx & 7))) & 1)
            i += 1
          }
          v
        }
        return FlacInfo(
          minBlock = bits(0, 16).toInt, maxBlock = bits(16, 16).toInt,
          sampleRate = bits(80, 20).toInt,
          channels = bits(100, 3).toInt + 1,
          bitsPerSample = bits(103, 5).toInt + 1,
          totalSamples = bits(108, 36))
      }
      if ((hdr & 0x80) != 0) p = bytes.length // was the last block: stop
      else p += 4 + len
    }
    throw new IllegalArgumentException("no STREAMINFO block found")
  }

  // ------------------------------------------------------------- MP3

  /** MPEG-1 Layer III tables (ISO/IEC 11172-3 Table B.2 / §2.4.2.3). */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  final case class Mp3Frame(bitrateKbps: Int, sampleRate: Int,
                            padding: Boolean, channels: Int) {
    /** Layer III frame length: ⌊144·bitrate/samplerate⌋ + padding. */
    def frameBytes: Int =
      144 * bitrateKbps * 1000 / sampleRate + (if (padding) 1 else 0)
  }

  /** Render one MPEG-1 Layer III frame header + zero payload to length. */
  def renderMp3Frame(f: Mp3Frame): Array[Byte] = {
    val bi = Mp3Bitrates.indexOf(f.bitrateKbps)
    val si = Mp3Rates.indexOf(f.sampleRate)
    require(bi >= 1, s"bitrate ${f.bitrateKbps} not a V1L3 table entry")
    require(si >= 0, s"sample rate ${f.sampleRate} not an MPEG-1 rate")
    require(f.channels == 1 || f.channels == 2, s"channels ${f.channels}")
    val out = new Array[Byte](f.frameBytes)
    out(0) = 0xff.toByte
    out(1) = 0xfb.toByte // sync | MPEG-1 | Layer III | no CRC
    out(2) = ((bi << 4) | (si << 2) | (if (f.padding) 2 else 0)).toByte
    out(3) = (((if (f.channels == 1) 3 else 0) << 6)).toByte
    out
  }

  /** Parse the first frame header at `off`. */
  def parseMp3Frame(bytes: Array[Byte], off: Int = 0): Mp3Frame = {
    require(off + 4 <= bytes.length, "truncated MP3 frame header")
    require((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xe0) == 0xe0,
      "no MP3 sync word")
    val version = (bytes(off + 1) >> 3) & 3
    val layer = (bytes(off + 1) >> 1) & 3
    require(version == 3 && layer == 1, s"not MPEG-1 Layer III (v=$version l=$layer)")
    val bi = (bytes(off + 2) >> 4) & 0xf
    val si = (bytes(off + 2) >> 2) & 3
    require(bi >= 1 && bi <= 14, s"bitrate index $bi")
    require(si <= 2, s"sample-rate index $si")
    val mode = (bytes(off + 3) >> 6) & 3
    Mp3Frame(Mp3Bitrates(bi), Mp3Rates(si),
      padding = ((bytes(off + 2) >> 1) & 1) == 1,
      channels = if (mode == 3) 1 else 2)
  }
}
