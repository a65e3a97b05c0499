package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp4
import graft.operators.MultimodalOps

/** ISO-BMFF container codec: writer/parser round-trips across header
  * variants, spec fallbacks, and the distributed track-table operator.
  */
class Mp4Spec extends SparkSpec {

  private def video(v1: Boolean) = Mp4.TrackSpec(
    trackId = 1L, kind = "vide", codec = "avc1",
    width = 640, height = 360, channels = 0, sampleRate = 0,
    timescale = 600L, sampleDelta = 120L,
    sampleSizes = Right(Array(1000L, 2000L, 1500L, 800L, 900L)),
    syncEvery = Some(2), samplesPerChunk = 2,
    firstChunkOffset = 4096L, chunkStride = 512L, v1 = v1)

  private def audio = Mp4.TrackSpec(
    trackId = 2L, kind = "soun", codec = "mp4a",
    width = 0, height = 0, channels = 2, sampleRate = 48000,
    timescale = 48000L, sampleDelta = 1024L,
    sampleSizes = Left((384L, 100L)),
    syncEvery = None, samplesPerChunk = 7,
    firstChunkOffset = 8192L, chunkStride = 512L, v1 = false)

  test("round-trip: two-track file, version-0 headers") {
    val m = Mp4.parse(Mp4.render("isom", 1000L, 6000L, Seq(video(v1 = false), audio), v1 = false))
    assert(m.brand == "isom" && m.timescale == 1000L && m.duration == 6000L)
    assert(m.tracks.length == 2)
    val v = m.tracks.head
    assert(v.trackId == 1L && v.handler == "vide" && v.codec == "avc1")
    assert(v.width == 640 && v.height == 360)
    assert(v.timescale == 600L && v.duration == 600L) // 5 samples × 120
    assert(v.nSamples == 5L && v.totalBytes == 6200L)
    assert(v.nSync == 3L)      // samples 1, 3, 5
    assert(v.nChunks == 3L)    // ceil(5 / 2)
    assert(v.firstChunkOffset == 4096L)
    val a = m.tracks(1)
    assert(a.handler == "soun" && a.codec == "mp4a")
    assert(a.channels == 2 && a.sampleRate == 48000)
    assert(a.nSamples == 100L && a.totalBytes == 38400L)
    assert(a.nSync == 100L)    // no stss ⇒ every sample sync (spec default)
    assert(a.nChunks == 15L)   // ceil(100 / 7)
    assert(a.firstChunkOffset == 8192L)
  }

  test("round-trip: version-1 (64-bit) headers and co64 offsets") {
    val m = Mp4.parse(Mp4.render("isom", 1000L, 6000L, Seq(video(v1 = true)), v1 = true))
    assert(m.timescale == 1000L && m.duration == 6000L)
    val v = m.tracks.head
    assert(v.trackId == 1L && v.width == 640 && v.height == 360)
    assert(v.duration == 600L && v.nSamples == 5L && v.totalBytes == 6200L)
    assert(v.firstChunkOffset == 4096L && v.nChunks == 3L)
  }

  test("unknown top-level and nested boxes are skipped by size") {
    val base = Mp4.render("isom", 1000L, 6000L, Seq(audio), v1 = false)
    val withJunk = Mp4.box("free", new Array[Byte](17)) ++ base ++
      Mp4.box("skip", Array[Byte](1, 2, 3))
    val m = Mp4.parse(withJunk)
    assert(m.brand == "isom" && m.tracks.length == 1)
    assert(m.tracks.head.codec == "mp4a")
  }

  test("mp4Meta operator: distributed parse emits one row per track") {
    val s = spark
    import s.implicits._
    val payloads = Seq(
      (10L, Mp4.render("isom", 1000L, 111L, Seq(video(v1 = false), audio), v1 = false)),
      (11L, Mp4.render("mp42", 90000L, 222L, Seq(video(v1 = true)), v1 = true)))
      .toDF("doc_id", "payload")
    val rows = MultimodalOps.mp4Meta(payloads, "doc_id")
      .orderBy("doc_id", "track_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("codec") == "avc1")
    assert(rows(1).getAs[String]("codec") == "mp4a")
    assert(rows(1).getAs[Int]("sample_rate") == 48000)
    assert(rows(2).getAs[String]("brand") == "mp42")
    assert(rows(2).getAs[Long]("mv_timescale") == 90000L)
    assert(rows(2).getAs[Long]("total_bytes") == 6200L)
  }

  test("AVC SPS: render -> parse identity over the geometry grid") {
    import graft.functions.Avc
    for {
      wmbs <- Seq(1, 2, 45, 120)          // up to 1920-wide
      hmu <- Seq(1, 34, 68)
      fmof <- Seq(true, false)
      (cl, cr, ct, cb) <- Seq((0, 0, 0, 0), (1, 3, 1, 1), (0, 4, 0, 2))
    } {
      val sps = Avc.Sps(66, 31, wmbs, hmu, fmof, cl, cr, ct, cb)
      val back = Avc.parseSps(Avc.renderSps(sps))
      assert(back == sps, s"$sps -> $back")
      assert(back.width == wmbs * 16 - 2 * (cl + cr))
      val expectH =
        if (fmof) hmu * 16 - 2 * (ct + cb) else 2 * hmu * 16 - 4 * (ct + cb)
      assert(back.height == expectH, s"height of $sps")
    }
    // 1080p as encoders actually signal it: 120×68 mbs, 8 bottom crop rows
    val hd = Avc.parseSps(Avc.renderSps(Avc.Sps(66, 40, 120, 68, true, 0, 0, 0, 4)))
    assert(hd.width == 1920 && hd.height == 1080)
  }

  test("AVC emulation prevention: escape/unescape identity on zero-run payloads") {
    import graft.functions.Avc
    val cases = Seq[Array[Byte]](
      Array(0, 0, 0),                 // bare zero run -> needs an EPB
      Array(0, 0, 1),                 // would fake a start code
      Array(0, 0, 3, 0, 0, 2),        // data 03 after zeros must survive
      Array(1, 0, 0, 0, 0, 0, 1),     // long run -> multiple EPBs
      Array.fill(64)(0.toByte),
      Array.tabulate(257)(i => (i % 5 - 2).toByte))
    cases.foreach { c =>
      val esc = Avc.escape(c)
      // no escaped stream may contain 00 00 0x with x <= 2 (start-code ban)
      esc.sliding(3).foreach { w =>
        assert(!(w.length == 3 && w(0) == 0 && w(1) == 0 && (w(2) & 0xff) <= 2),
          s"start-code emulation survived: ${esc.mkString(",")}")
      }
      assert(Avc.unescape(esc).toSeq == c.toSeq, s"case ${c.mkString(",")}")
    }
  }
}
