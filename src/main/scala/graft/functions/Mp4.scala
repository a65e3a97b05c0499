package graft.functions

import java.io.ByteArrayOutputStream

/** MP4 / ISO-BMFF *container* codec (ISO/IEC 14496-12, public spec): a box
  * writer for synthesizing fixtures and a parser extracting the real
  * track-level metadata a video curation pipeline filters on — codec
  * fourcc, dimensions, duration, sample geometry, keyframe census, chunk
  * layout. The *codec payloads* are decoded separately — CAVLC baseline
  * intra H.264 by [[graft.functions.H264]], surfaced through
  * `MultimodalOps.videoFrames` — while everything container-level (`ftyp`/`moov`/`mvhd`/`trak`/`tkhd`/`mdia`/`mdhd`/
  * `hdlr`/`stbl`/`stsd`/`stts`/`stsc`/`stsz`/`stco`+`co64`/`stss`) parses
  * for real, both 32-bit (version 0) and 64-bit (version 1) header
  * variants. Reference behavior: the curator treats video as opaque
  * payload + metadata the same way (`physicsnemo-curator` streams binary
  * frames; see `d3plot.py:334` for the binary-timestep analogue).
  *
  * Pure JVM byte twiddling — runs per row on executors, no shuffle.
  */
object Mp4 {

  // ------------------------------------------------------------ primitives

  private def u8(v: Int): Array[Byte] = Array(v.toByte)
  private def u16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def u24(v: Int): Array[Byte] =
    Array((v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def u32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)
  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc '$s' must be 4 chars")
    s.getBytes("ISO-8859-1")
  }

  private def cat(parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** A plain box: 32-bit size + fourcc + payload. */
  def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = cat(parts)
    cat(Seq(u32(payload.length + 8L), fourcc(typ), payload))
  }

  /** A full box: box + version byte + 24-bit flags. */
  private def full(typ: String, version: Int, flags: Int,
                   parts: Array[Byte]*): Array[Byte] =
    box(typ, (u8(version) ++ u24(flags)) +: parts: _*)

  // ------------------------------------------------------------ writer

  /** Per-track fixture spec. `sampleSizes`: Left((constSize, count)) emits
    * the stsz constant-size form, Right(sizes) the per-sample table.
    * `syncEvery = Some(k)` emits an stss marking samples 1, 1+k, … as sync
    * (absent stss ⇒ every sample is sync, per spec). `v1` selects the
    * 64-bit (version 1) tkhd/mdhd encodings and co64 chunk offsets.
    */
  case class TrackSpec(
      trackId: Long, kind: String, codec: String,
      width: Int, height: Int,
      channels: Int, sampleRate: Int,
      timescale: Long, sampleDelta: Long,
      sampleSizes: Either[(Long, Long), Array[Long]],
      syncEvery: Option[Int],
      samplesPerChunk: Int,
      firstChunkOffset: Long, chunkStride: Long,
      v1: Boolean) {
    def nSamples: Long = sampleSizes.fold(_._2, _.length.toLong)
    def duration: Long = nSamples * sampleDelta
    def nChunks: Long = (nSamples + samplesPerChunk - 1) / samplesPerChunk
  }

  private val UnityMatrix: Array[Byte] = cat(Seq(
    u32(0x00010000L), u32(0), u32(0),
    u32(0), u32(0x00010000L), u32(0),
    u32(0), u32(0), u32(0x40000000L)))

  private def timeFields(v1: Boolean, vs: Long*): Array[Byte] =
    cat(vs.map(v => if (v1) u64(v) else u32(v)))

  private def mvhd(v1: Boolean, timescale: Long, duration: Long,
                   nextTrack: Long): Array[Byte] =
    full("mvhd", if (v1) 1 else 0, 0,
      timeFields(v1, 0L, 0L), u32(timescale), timeFields(v1, duration),
      u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0),
      UnityMatrix, cat((0 until 6).map(_ => u32(0))), u32(nextTrack))

  private def tkhd(t: TrackSpec): Array[Byte] =
    full("tkhd", if (t.v1) 1 else 0, 7,
      timeFields(t.v1, 0L, 0L), u32(t.trackId), u32(0),
      timeFields(t.v1, t.duration),
      u32(0), u32(0), u16(0), u16(0),
      u16(if (t.kind == "soun") 0x0100 else 0), u16(0), UnityMatrix,
      u32(t.width.toLong << 16), u32(t.height.toLong << 16))

  private def mdhd(t: TrackSpec): Array[Byte] =
    full("mdhd", if (t.v1) 1 else 0, 0,
      timeFields(t.v1, 0L, 0L), u32(t.timescale), timeFields(t.v1, t.duration),
      u16(0x55c4) /* 'und' packed */, u16(0))

  private def hdlr(t: TrackSpec): Array[Byte] =
    full("hdlr", 0, 0, u32(0), fourcc(t.kind), u32(0), u32(0), u32(0),
      (if (t.kind == "vide") "VideoHandler" else "SoundHandler").getBytes("US-ASCII"),
      u8(0))

  private def sampleEntry(t: TrackSpec): Array[Byte] = {
    val common = cat(Seq(cat((0 until 6).map(_ => u8(0))), u16(1)))
    if (t.kind == "vide")
      box(t.codec, common,
        u16(0), u16(0), u32(0), u32(0), u32(0),
        u16(t.width), u16(t.height),
        u32(0x00480000L), u32(0x00480000L), u32(0), u16(1),
        new Array[Byte](32) /* compressorname */, u16(0x0018), u16(0xffff),
        // minimal codec-config child: the parser must skip unknown children
        box("avcC", Array[Byte](1, 0x64, 0, 40)))
    else
      box(t.codec, common,
        u32(0), u32(0), u16(t.channels), u16(16), u16(0), u16(0),
        u32(t.sampleRate.toLong << 16))
  }

  private def stbl(t: TrackSpec): Array[Byte] = {
    val stsd = full("stsd", 0, 0, u32(1), sampleEntry(t))
    val stts = full("stts", 0, 0, u32(1), u32(t.nSamples), u32(t.sampleDelta))
    val stsc = {
      val rem = t.nSamples % t.samplesPerChunk
      val entries =
        if (rem == 0 || t.nChunks == 1)
          Seq((1L, math.min(t.nSamples, t.samplesPerChunk.toLong)))
        else Seq((1L, t.samplesPerChunk.toLong), (t.nChunks, rem))
      full("stsc", 0, 0, u32(entries.length),
        cat(entries.map { case (fc, spc) => cat(Seq(u32(fc), u32(spc), u32(1))) }))
    }
    val stsz = t.sampleSizes match {
      case Left((const, n)) => full("stsz", 0, 0, u32(const), u32(n))
      case Right(sizes) =>
        full("stsz", 0, 0, u32(0), u32(sizes.length), cat(sizes.toSeq.map(u32)))
    }
    val offs = (0L until t.nChunks)
      .map(i => t.firstChunkOffset + i * t.chunkStride)
    val stco =
      if (t.v1) full("co64", 0, 0, u32(offs.length), cat(offs.map(u64)))
      else full("stco", 0, 0, u32(offs.length), cat(offs.map(u32)))
    val stss = t.syncEvery.map { k =>
      val syncs = (1L to t.nSamples by k.toLong).toArray
      full("stss", 0, 0, u32(syncs.length), cat(syncs.toSeq.map(u32)))
    }
    box("stbl", Seq(stsd, stts, stsc, stsz, stco) ++ stss.toSeq: _*)
  }

  private def minf(t: TrackSpec): Array[Byte] = {
    val header =
      if (t.kind == "vide") full("vmhd", 0, 1, u16(0), u16(0), u16(0), u16(0))
      else full("smhd", 0, 0, u16(0), u16(0))
    val dinf = box("dinf", full("dref", 0, 0, u32(1), full("url ", 0, 1)))
    box("minf", header, dinf, stbl(t))
  }

  private def trak(t: TrackSpec): Array[Byte] =
    box("trak", tkhd(t), box("mdia", mdhd(t), hdlr(t), minf(t)))

  /** Render a complete (metadata-only) MP4: ftyp + moov; no mdat — chunk
    * offsets in the fixture are synthetic, which the container layer
    * neither requires nor checks (a real muxer's offsets point into mdat).
    */
  def render(brand: String, mvTimescale: Long, mvDuration: Long,
             tracks: Seq[TrackSpec], v1: Boolean): Array[Byte] = {
    val ftyp = box("ftyp", fourcc(brand), u32(512),
      fourcc(brand), fourcc("mp41"))
    val moov = box("moov",
      mvhd(v1, mvTimescale, mvDuration, tracks.map(_.trackId).max + 1) +:
        tracks.map(trak): _*)
    cat(Seq(ftyp, moov))
  }

  // ------------------------------------------------------------ parser

  /** Track-level metadata: audio fields are 0 for video tracks and vice
    * versa; `nSync` falls back to `nSamples` when stss is absent (spec:
    * no stss ⇒ every sample is a sync sample).
    */
  case class Track(
      trackId: Long, handler: String, codec: String,
      width: Int, height: Int, channels: Int, sampleRate: Int,
      timescale: Long, duration: Long,
      nSamples: Long, totalBytes: Long, nSync: Long,
      nChunks: Long, firstChunkOffset: Long)

  case class Meta(brand: String, timescale: Long, duration: Long,
                  tracks: Seq[Track])

  private final class Reader(b: Array[Byte]) {
    def len: Int = b.length
    def u8At(o: Int): Int = b(o) & 0xff
    def u16At(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32At(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def u64At(o: Int): Long = (u32At(o) << 32) | u32At(o + 4)
    def fourccAt(o: Int): String =
      new String(b, o, 4, "ISO-8859-1")
  }

  /** Walk the sibling boxes in [from, to); call f(type, payloadStart,
    * payloadEnd) for each. Handles 64-bit largesize (size==1) and
    * to-end-of-enclosure (size==0).
    */
  private def walk(r: Reader, from: Int, to: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var off = from
    while (off + 8 <= to) {
      val size32 = r.u32At(off)
      val typ = r.fourccAt(off + 4)
      val (payloadStart, boxEnd) =
        if (size32 == 1L) (off + 16, off + r.u64At(off + 8).toInt)
        else if (size32 == 0L) (off + 8, to)
        else (off + 8, off + size32.toInt)
      require(boxEnd <= to && boxEnd > off, s"corrupt box '$typ' at $off")
      f(typ, payloadStart, boxEnd)
      off = boxEnd
    }
  }

  /** FullBox header at payload start: (version, first field offset). */
  private def fullHeader(r: Reader, o: Int): (Int, Int) = (r.u8At(o), o + 4)

  private def parseTrak(r: Reader, from: Int, to: Int): Track = {
    var trackId = 0L
    var handler = ""
    var codec = ""
    var width = 0; var height = 0; var channels = 0; var sampleRate = 0
    var timescale = 0L; var duration = 0L
    var nSamples = 0L; var totalBytes = 0L
    var nSync = -1L; var nChunks = 0L; var firstOff = 0L

    def parseStbl(from: Int, to: Int): Unit = walk(r, from, to) {
      case ("stsd", s, _) =>
        val (_, o) = fullHeader(r, s)
        // first sample entry: size + codec fourcc, then the fixed fields
        if (r.u32At(o) > 0) {
          val e = o + 4 // entry box start
          codec = r.fourccAt(e + 4)
          val body = e + 8 + 6 + 2 // skip reserved[6] + data_reference_index
          if (handler == "vide") {
            width = r.u16At(body + 16)
            height = r.u16At(body + 18)
          } else if (handler == "soun") {
            channels = r.u16At(body + 8)
            sampleRate = (r.u32At(body + 16) >>> 16).toInt
          }
        }
      case ("stsz", s, _) =>
        val (_, o) = fullHeader(r, s)
        val const = r.u32At(o)
        nSamples = r.u32At(o + 4)
        totalBytes =
          if (const != 0) const * nSamples
          else (0 until nSamples.toInt).map(i => r.u32At(o + 8 + 4 * i)).sum
      case ("stss", s, _) =>
        val (_, o) = fullHeader(r, s)
        nSync = r.u32At(o)
      case ("stco", s, _) =>
        val (_, o) = fullHeader(r, s)
        nChunks = r.u32At(o)
        if (nChunks > 0) firstOff = r.u32At(o + 4)
      case ("co64", s, _) =>
        val (_, o) = fullHeader(r, s)
        nChunks = r.u32At(o)
        if (nChunks > 0) firstOff = r.u64At(o + 4)
      case _ => // stts/stsc/ctts/…: durations come from mdhd; layout not needed
    }

    def parseMdia(from: Int, to: Int): Unit = walk(r, from, to) {
      case ("mdhd", s, _) =>
        val (v, o) = fullHeader(r, s)
        if (v == 1) { timescale = r.u32At(o + 16); duration = r.u64At(o + 20) }
        else { timescale = r.u32At(o + 8); duration = r.u32At(o + 12) }
      case ("hdlr", s, _) =>
        handler = r.fourccAt(s + 8) // version/flags + pre_defined
      case ("minf", s, e) =>
        walk(r, s, e) { case ("stbl", ss, se) => parseStbl(ss, se); case _ => }
      case _ =>
    }

    walk(r, from, to) {
      case ("tkhd", s, _) =>
        val (v, o) = fullHeader(r, s)
        trackId = if (v == 1) r.u32At(o + 16) else r.u32At(o + 8)
      case ("mdia", s, e) => parseMdia(s, e)
      case _ =>
    }
    Track(trackId, handler, codec, width, height, channels, sampleRate,
      timescale, duration, nSamples, totalBytes,
      if (nSync < 0) nSamples else nSync, nChunks, firstOff)
  }

  /** Parse the container metadata of an ISO-BMFF file. Unknown/irrelevant
    * boxes (free, mdat, udta, codec-config children…) are skipped by size,
    * per the spec's forward-compatibility rule.
    */
  def parse(bytes: Array[Byte]): Meta = {
    val r = new Reader(bytes)
    var brand = ""
    var timescale = 0L; var duration = 0L
    val tracks = Seq.newBuilder[Track]
    walk(r, 0, r.len) {
      case ("ftyp", s, _) => brand = r.fourccAt(s)
      case ("moov", s, e) =>
        walk(r, s, e) {
          case ("mvhd", ms, _) =>
            val (v, o) = fullHeader(r, ms)
            if (v == 1) { timescale = r.u32At(o + 16); duration = r.u64At(o + 20) }
            else { timescale = r.u32At(o + 8); duration = r.u32At(o + 12) }
          case ("trak", ts, te) => tracks += parseTrak(r, ts, te)
          case _ =>
        }
      case _ =>
    }
    Meta(brand, timescale, duration, tracks.result())
  }
}
