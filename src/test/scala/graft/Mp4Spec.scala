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
}
