package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Binary payload plumbing: schema, metadata, frame slicing, real codec
  * decodes (incl. the H.264 intra pixel path via `videoFrames`).
  */
class MultimodalSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a" * 64),
      (2L, "abcdefgh" * 16)   // 128 bytes
    ).toDF("doc_id", "text")
  }

  test("withPayload: binary column + typed metadata struct") {
    val p = MultimodalOps.withPayload(docs, "doc_id", "text")
    assert(p.schema("payload").dataType.typeName == "binary")
    val r = p.select(col("doc_id"), col("meta.n_bytes"), col("meta.mime")).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getString(2)))).toMap
    assert(r(1L) == ((64, "text/plain")))
    assert(r(2L) == ((128, "text/plain")))
  }

  test("frameSample: evenly spaced offsets, stable fingerprints") {
    val f = MultimodalOps.frameSample(
      MultimodalOps.withPayload(docs, "doc_id", "text"), "doc_id", 4, 32)
    val rows = f.filter(col("doc_id") === 2L).orderBy("frame").collect()
    // n=128, frameBytes=32 → offsets 1 + floor(i*96/3) = 1, 33, 65, 97
    assert(rows.map(_.getAs[Long]("off")).toSeq == Seq(1L, 33L, 65L, 97L))
    // doc 2 is "abcdefgh"*16: every offset ≡ 1 (mod 8) starts the same 32-byte
    // window, so all four frame hashes must be identical
    assert(rows.map(_.getAs[String]("frame_md5")).distinct.length == 1)
    // doc 1 ("a"*64): all-equal bytes → identical windows too, but different
    // from doc 2's
    val d1 = f.filter(col("doc_id") === 1L).collect().map(_.getAs[String]("frame_md5"))
    assert(d1.distinct.length == 1 && d1(0) != rows(0).getAs[String]("frame_md5"))
  }

  test("Media: WAV render -> decode identity, chunk skipping, loud rejects") {
    import graft.functions.Media
    val samples = Array(0, 1000, -32768, 32767, -1, 7)
    val wav = Media.renderWav(44100, 2, samples)
    val d = Media.decodeWav(wav)
    assert(d.sampleRate == 44100 && d.channels == 2)
    assert(d.samples.toSeq == samples.toSeq)
    // extra chunk between fmt and data is skipped (spliced LIST chunk)
    val list = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // patch RIFF size
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(Media.decodeWav(spliced).samples.toSeq == samples.toSeq)
    intercept[IllegalArgumentException] { Media.decodeWav("RIFFxxxx".getBytes) }
    intercept[IllegalArgumentException] { Media.renderWav(8000, 2, Array(1, 2, 3)) }
    intercept[IllegalArgumentException] { Media.renderWav(8000, 1, Array(40000)) }
  }

  test("Media: BMP render -> decode identity incl. row padding and order") {
    import graft.functions.Media
    // 3x2: width*3 = 9 → rows pad to 12; distinct corners pin orientation
    val px = Array((255, 0, 0), (0, 255, 0), (0, 0, 255),
      (10, 20, 30), (40, 50, 60), (70, 80, 90))
    val bmp = Media.renderBmp(3, 2, px)
    val d = Media.decodeBmp(bmp)
    assert(d.width == 3 && d.height == 2)
    assert(d.pixels.toSeq == px.toSeq) // top-down order restored
    intercept[IllegalArgumentException] { Media.decodeBmp(Array[Byte](1, 2, 3)) }
    intercept[IllegalArgumentException] { Media.renderBmp(2, 2, px) }
  }

  test("Media: PNG render -> decode identity across all five filters; rejects") {
    import graft.functions.Media
    // 3 wide × 7 tall RGB: rows 0..6 use filter types 0,1,2,3,4,0,1 — every
    // unfilter path runs; values chosen to wrap the byte arithmetic
    val rgb = Array.tabulate(3 * 7 * 3)(i => (i * 37 + 11) % 256)
    val png = Media.renderPng(3, 7, 3, rgb)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val d = Media.decodePng(png)
    assert(d.width == 3 && d.height == 7 && d.channels == 3)
    assert(d.samples.toSeq == rgb.toSeq)
    // RGBA (color type 6) round trip + channel means
    val rgba = Array.tabulate(2 * 2 * 4)(i => (i * 29) % 256)
    val d4 = Media.decodePng(Media.renderPng(2, 2, 4, rgba))
    assert(d4.channels == 4 && d4.samples.toSeq == rgba.toSeq)
    assert(d4.channelMean(0) == (rgba(0) + rgba(4) + rgba(8) + rgba(12)) / 4.0)
    assert(d4.channelMean(3) == (rgba(3) + rgba(7) + rgba(11) + rgba(15)) / 4.0)
    // loud rejects: bad signature, corrupted CRC
    intercept[IllegalArgumentException] { Media.decodePng(Array[Byte](1, 2, 3)) }
    val corrupt = png.clone(); corrupt(40) = (corrupt(40) ^ 0x7f).toByte
    intercept[IllegalArgumentException] { Media.decodePng(corrupt) }
  }

  test("Media: JPEG flat-block round trip is bit-exact; restarts; grayscale") {
    import graft.functions.Media
    // 16×16 YCbCr 4:4:4, 2×2 grid of flat 8×8 blocks, restart every row of
    // MCUs. Flat blocks are DC-only and the DC quant step divides the block
    // DC exactly, so the full Huffman/DCT path must reproduce every sample.
    val blocks = Array(17, 200, 91, 255)
    val img = new Array[Int](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = blocks((y / 8) * 2 + x / 8)
      val o = (y * 16 + x) * 3
      img(o) = v; img(o + 1) = (v * 3) % 256; img(o + 2) = (v * 7) % 256
    }
    val jpg = Media.renderJpeg(16, 16, 3, img, restartInterval = 2)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    assert(jpg.sliding(2).exists(p => // RST0 emitted between MCU rows
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd0))
    val d = Media.decodeJpeg(jpg)
    assert(d.width == 16 && d.height == 16 && d.channels == 3)
    assert(d.samples.toSeq == img.toSeq)
    // grayscale with a non-multiple-of-8 extent: partial blocks are
    // edge-replicated by the encoder and cropped by the decoder
    val g = Array.fill(9 * 10)(77)
    val dg = Media.decodeJpeg(Media.renderJpeg(9, 10, 1, g))
    assert(dg.width == 9 && dg.height == 10 && dg.channels == 1)
    assert(dg.samples.toSeq == g.toSeq)
  }

  test("Media: JPEG 4:2:0 subsampled round trip; chroma box filter") {
    import graft.functions.Media
    // 32×16 = 2×1 MCUs of 16×16; per-MCU constant chroma and per-8×8-block
    // constant luma make both the box filter and the DCT exact
    val img = new Array[Int](32 * 16 * 3)
    val lumaB = Array(10, 60, 110, 160, 210, 250, 30, 90) // 4×2 luma blocks
    val chroma = Array((40, 200), (170, 80))              // per MCU (cb, cr)
    for (y <- 0 until 16; x <- 0 until 32) {
      val o = (y * 32 + x) * 3
      img(o) = lumaB((y / 8) * 4 + x / 8)
      val (cb, cr) = chroma(x / 16)
      img(o + 1) = cb; img(o + 2) = cr
    }
    val jpg = Media.renderJpeg(32, 16, 3, img, subsample420 = true)
    val d = Media.decodeJpeg(jpg)
    assert(d.width == 32 && d.height == 16 && d.channels == 3)
    assert(d.samples.toSeq == img.toSeq) // bit-exact through 4:2:0
    // the file really is subsampled: smaller than its 4:4:4 encoding
    assert(jpg.length < Media.renderJpeg(32, 16, 3, img).length)
    // varying chroma within a MCU survives within box-filter error
    val img2 = Array.tabulate(16 * 16 * 3) { i =>
      val c = i % 3; val px = i / 3
      if (c == 0) 128 else (px / 2 + c * 40) % 256
    }
    val d2 = Media.decodeJpeg(Media.renderJpeg(16, 16, 3, img2, subsample420 = true))
    val maxErr = img2.indices.filter(_ % 3 == 0)
      .map(i => math.abs(d2.samples(i) - img2(i))).max
    assert(maxErr <= 2, s"luma must stay near-exact under 4:2:0, got $maxErr")
  }

  test("Media: JPEG lossy content bounded by quant error; loud rejects") {
    import graft.functions.Media
    // Horizontal ramp: few AC coefficients carry it, so per-pixel error is
    // bounded by a handful of half-quant-step contributions
    val img = Array.tabulate(24 * 16)(i => math.min(255, (i % 24) * 11))
    val d = Media.decodeJpeg(Media.renderJpeg(24, 16, 1, img))
    val maxErr = img.indices.map(i => math.abs(d.samples(i) - img(i))).max
    assert(maxErr <= 12, s"ramp max quantization error $maxErr")
    intercept[IllegalArgumentException] { Media.decodeJpeg(Array[Byte](1, 2, 3)) }
    val jpg = Media.renderJpeg(8, 8, 1, Array.fill(64)(42))
    intercept[IllegalArgumentException] { Media.decodeJpeg(jpg.dropRight(30)) }
    // flip SOF0 to SOF2: the baseline scan script is malformed AS
    // progressive (a full-band interleaved scan is not a legal progressive
    // scan), so it must still fail loudly, not garble
    val sof = jpg.indices.dropRight(1).find(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0).get
    val prog = jpg.clone(); prog(sof + 1) = 0xc2.toByte
    intercept[IllegalArgumentException] { Media.decodeJpeg(prog) }
    // progressive arithmetic-coded SOF (0xc6 = SOF6) still rejects
    val ar = jpg.clone(); ar(sof + 1) = 0xc6.toByte
    val e = intercept[IllegalArgumentException] { Media.decodeJpeg(ar) }
    assert(e.getMessage.contains("SOF"))
  }

  test("Media: progressive JPEG — flat blocks bit-exact, DC+AC refinement") {
    import graft.functions.Media
    // flat 8×8 blocks: DC-only, so the DC-first + DC-refine scans carry
    // everything and the decode must be bit-exact like baseline
    val blocks = Array(17, 200, 91, 255)
    val img = new Array[Int](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = blocks((y / 8) * 2 + x / 8)
      val o = (y * 16 + x) * 3
      img(o) = v; img(o + 1) = (v * 3) % 256; img(o + 2) = (v * 7) % 256
    }
    val prog = Media.renderJpegProgressive(16, 16, 3, img)
    // really progressive: SOF2 marker present, multiple SOS scans
    assert(prog.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    val nScans = prog.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
    assert(nScans == 8, s"expected 8 scans (DC, DCr, 3×AC, 3×ACr), got $nScans")
    val d = Media.decodeJpeg(prog)
    assert(d.width == 16 && d.height == 16 && d.channels == 3)
    assert(d.samples.toSeq == img.toSeq)
  }

  test("Media: progressive decode == baseline decode on arbitrary content") {
    import graft.functions.Media
    // both encoders quantize identically, so after all progressive scans
    // the accumulated coefficients must equal the baseline ones exactly —
    // pixel-identical decodes on ANY image, including non-multiple-of-8
    // extents and content dense enough to exercise runs, ZRL, EOB runs,
    // and AC refinement correction bits
    val rnd = new scala.util.Random(20260813)
    val noisy = Array.fill(21 * 13 * 3)(rnd.nextInt(256))
    val b1 = Media.decodeJpeg(Media.renderJpeg(21, 13, 3, noisy))
    val p1 = Media.decodeJpeg(Media.renderJpegProgressive(21, 13, 3, noisy))
    assert(p1.samples.toSeq == b1.samples.toSeq, "color noise diverged")
    // mostly-flat image with one busy block → long EOB runs across blocks
    val sparse = Array.tabulate(48 * 16)(i =>
      if (i % 48 < 8 && i / 48 < 8) (i * 37) % 256 else 128)
    val b2 = Media.decodeJpeg(Media.renderJpeg(48, 16, 1, sparse))
    val p2 = Media.decodeJpeg(Media.renderJpegProgressive(48, 16, 1, sparse))
    assert(p2.samples.toSeq == b2.samples.toSeq, "gray sparse diverged")
    // smooth gradient: small ACs that first appear in the refinement scan
    val grad = Array.tabulate(17 * 11)(i => (i % 17) * 3 + (i / 17) * 2 + 60)
    val b3 = Media.decodeJpeg(Media.renderJpeg(17, 11, 1, grad))
    val p3 = Media.decodeJpeg(Media.renderJpegProgressive(17, 11, 1, grad))
    assert(p3.samples.toSeq == b3.samples.toSeq, "gradient diverged")
  }

  test("jpegFeatures: per-row decode on executors") {
    import graft.functions.Media
    val s = spark
    import s.implicits._
    val flat = Array.fill(8 * 8 * 3)(0)
    for (i <- 0 until 64) { flat(i * 3) = 100; flat(i * 3 + 1) = 30; flat(i * 3 + 2) = 220 }
    val rows = Seq(
      (1L, Media.renderJpeg(8, 8, 3, flat)),
      (2L, Media.renderJpeg(8, 8, 1, Array.fill(64)(9)))).toDF("id", "jpg")
    val f = MultimodalOps.jpegFeatures(rows, "id", "jpg").orderBy("id").collect()
    assert(f(0).getInt(1) == 8 && f(0).getInt(2) == 8 && f(0).getInt(3) == 3)
    assert(f(0).getDouble(4) == 100.0 && f(0).getDouble(5) == 30.0 &&
      f(0).getDouble(6) == 220.0)
    assert(f(1).getInt(3) == 1 && f(1).getDouble(4) == 9.0)
    assert(f(1).getDouble(5).isNaN && f(1).getDouble(6).isNaN)
  }

  test("pngFeatures: per-row decode on executors") {
    import graft.functions.Media
    val s = spark
    import s.implicits._
    val rgba = Array(10, 20, 30, 40, 50, 60, 70, 80) // 2×1 RGBA
    val rows = Seq(
      (1L, Media.renderPng(2, 1, 4, rgba)),
      (2L, Media.renderPng(1, 1, 3, Array(5, 7, 9)))).toDF("id", "png")
    val f = MultimodalOps.pngFeatures(rows, "id", "png").orderBy("id").collect()
    assert(f(0).getInt(1) == 2 && f(0).getInt(2) == 1 && f(0).getInt(3) == 4)
    assert(f(0).getDouble(4) == 30.0 && f(0).getDouble(7) == 60.0)
    assert(f(1).getInt(3) == 3 && f(1).getDouble(5) == 7.0)
    assert(f(1).getDouble(7).isNaN) // RGB has no alpha
  }

  test("wavFeatures/bmpFeatures: per-row decode on executors") {
    import graft.functions.Media
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Media.renderWav(8000, 1, Array(3, -4)),
        Media.renderBmp(2, 1, Array((10, 20, 30), (50, 60, 70)))),
      (2L, Media.renderWav(16000, 2, Array(0, 0, 5, -5)),
        Media.renderBmp(1, 2, Array((0, 0, 0), (255, 255, 255)))))
      .toDF("id", "wav", "bmp")
    val w = MultimodalOps.wavFeatures(rows, "id", "wav").orderBy("id").collect()
    assert(w(0).getInt(1) == 8000 && w(0).getInt(2) == 1 && w(0).getLong(3) == 2)
    assert(w(0).getDouble(4) == math.sqrt((9.0 + 16.0) / 2) && w(0).getInt(5) == 4)
    assert(w(1).getInt(2) == 2 && w(1).getLong(3) == 2 && w(1).getInt(5) == 5)
    val b = MultimodalOps.bmpFeatures(rows, "id", "bmp").orderBy("id").collect()
    assert(b(0).getInt(1) == 2 && b(0).getInt(2) == 1)
    assert(b(0).getDouble(3) == 30.0 && b(0).getDouble(4) == 40.0 && b(0).getDouble(5) == 50.0)
    assert(b(1).getDouble(3) == 127.5)
  }

  test("videoFrames: real H.264 intra decode over binary payload columns") {
    import graft.functions.H264
    val s = spark
    import s.implicits._
    // two docs, each a 2-frame 16x16 stream: one PCM frame (lossless) and
    // one flat I16 DC frame whose reconstruction the codec spec pins
    val payloads = Seq(101L -> 37, 102L -> 200).map { case (id, v) =>
      val f = H264.Yuv(16, 16, Array.fill(256)(v), Array.fill(64)(255 - v), Array.fill(64)(v / 2))
      val (bytes, recons) = H264.encodeStream(Seq(f, f), 30,
        (i, _, _) => if (i == 0) H264.MbPcm else H264.MbI16(2, 0))
      (id, bytes, recons(1).y(0).toLong, recons(1).cb(0).toLong, recons(1).cr(0).toLong)
    }
    val df = payloads.map(p => (p._1, p._2)).toDF("doc_id", "payload")
    val out = MultimodalOps.videoFrames(df, "doc_id").orderBy("doc_id", "frame_idx").collect()
    assert(out.length == 4)
    for ((row, i) <- out.zipWithIndex) {
      assert(row.getInt(2) == 16 && row.getInt(3) == 16, s"row $i geometry")
    }
    // PCM frames: exact plane sums of the source
    assert(out(0).getLong(4) == 256L * 37 && out(0).getLong(5) == 64L * (255 - 37))
    assert(out(2).getLong(4) == 256L * 200 && out(2).getLong(6) == 64L * 100)
    // I16 frames: exact plane sums of the closed-loop reconstruction
    assert(out(1).getLong(4) == 256L * payloads(0)._3 && out(1).getLong(5) == 64L * payloads(0)._4)
    assert(out(3).getLong(4) == 256L * payloads(1)._3 && out(3).getLong(6) == 64L * payloads(1)._5)
  }

  test("AudioMeta: FLAC STREAMINFO and MP3 frame-header round trips; rejects") {
    import graft.functions.AudioMeta
    for {
      rate <- Seq(8000, 44100, 96000)
      ch <- Seq(1, 2, 8)
      bits <- Seq(16, 24)
      n <- Seq(0L, 44100L, (1L << 35))
    } {
      val info = AudioMeta.FlacInfo(4096, 4096, rate, ch, bits, n)
      assert(AudioMeta.parseFlacStreamInfo(
        AudioMeta.renderFlacStreamInfo(info)) == info, info.toString)
    }
    intercept[IllegalArgumentException](
      AudioMeta.parseFlacStreamInfo("noope".getBytes))
    for {
      k <- Seq(32, 128, 320)
      r <- Seq(44100, 48000, 32000)
      pad <- Seq(false, true)
      ch <- Seq(1, 2)
    } {
      val f = AudioMeta.Mp3Frame(k, r, pad, ch)
      val bytes = AudioMeta.renderMp3Frame(f)
      assert(bytes.length == 144 * k * 1000 / r + (if (pad) 1 else 0))
      assert(AudioMeta.parseMp3Frame(bytes) == f, f.toString)
    }
    intercept[IllegalArgumentException](
      AudioMeta.parseMp3Frame(Array[Byte](0x12, 0x34, 0x56, 0x78)))
  }

  test("audioSpectral: analytic DFT pins — Nyquist tone, DC tone, impulse, energy") {
    val s = spark
    import s.implicits._
    val n = 64
    // id 1: Nyquist square tone (-1)^i·1000 → all energy in bin 32
    // id 2: DC tone 700 → all energy in bin 0
    // id 3: unit impulse ×640 → flat spectrum, peak ties to bin 0,
    //        centroid = mean of 0..32 = 16
    val fixtures = Seq(
      1L -> Array.tabulate(n)(i => if (i % 2 == 0) 1000 else -1000),
      2L -> Array.fill(n)(700),
      3L -> (640 +: Array.fill(n - 1)(0)))
    val rows = fixtures.map { case (id, sm) =>
      (id, graft.functions.Media.renderWav(8000, 1, sm))
    }.toDF("id", "wav")
    val got = MultimodalOps.audioSpectral(rows, "id", "wav", frameLen = n,
      nFrames = 2) // only one full frame staged → exactly one row per id
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4), r.getDouble(5))))
      .toMap
    assert(got.size == 3 && got.values.forall(_._1 == 0))
    val (_, e1, c1, p1, m1) = got(1L)
    assert(e1 == 1000.0 * 1000.0) // Σ s²/N exact in doubles
    assert(p1 == 32 && math.abs(m1 - 1000.0) < 1e-9)
    assert(math.abs(c1 - 32.0) < 1e-9)
    val (_, e2, c2, p2, m2) = got(2L)
    assert(e2 == 700.0 * 700.0 && p2 == 0 && math.abs(m2 - 700.0) < 1e-9)
    assert(math.abs(c2 - 0.0) < 1e-9)
    val (_, e3, c3, p3, m3) = got(3L)
    assert(e3 == 640.0 * 640.0 / n && p3 == 0)
    assert(math.abs(m3 - 10.0) < 1e-12) // 640/64 per bin
    assert(math.abs(c3 - 16.0) < 1e-9)  // flat spectrum centroid
  }

  test("imageHashes: analytic aHash/dHash on a half-dark 16x16 image") {
    val s = spark
    import s.implicits._
    // left 8 columns black, right 8 columns white: aHash sets exactly the
    // right 4 cell columns of every row; dHash sets only the cx=3 boundary
    val px = Array.tabulate(256) { i =>
      if (i % 16 < 8) (0, 0, 0) else (255, 255, 255)
    }
    val bmp = graft.functions.Media.renderBmp(16, 16, px)
    // a noisy variant: one pixel flipped — hashes must be UNCHANGED (the
    // point of perceptual hashing) because one pixel cannot move a cell
    // sum across the mean or reorder two half-extreme neighbors
    val px2 = px.clone(); px2(0) = (40, 40, 40)
    val bmp2 = graft.functions.Media.renderBmp(16, 16, px2)
    // an inverted image: aHash flips to the left columns
    val px3 = px.map { case (r, g, b) => (255 - r, 255 - g, 255 - b) }
    val bmp3 = graft.functions.Media.renderBmp(16, 16, px3)
    val got = graft.operators.MultimodalOps.imageHashes(
      Seq((1L, bmp), (2L, bmp2), (3L, bmp3)).toDF("id", "p"), "id", "p")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("ahash"), r.getAs[Long]("dhash"))).toMap
    val rightCols = (for (cy <- 0 until 8; cx <- 4 until 8)
      yield 1L << (cy * 8 + cx)).sum
    val leftCols = (for (cy <- 0 until 8; cx <- 0 until 4)
      yield 1L << (cy * 8 + cx)).sum
    val boundary = (0 until 8).map(cy => 1L << (cy * 7 + 3)).sum
    assert(got(1L)._1 === rightCols)
    assert(got(1L)._2 === boundary)
    assert(got(2L) === got(1L)) // robust to a single-pixel change
    assert(got(3L)._1 === leftCols) // inversion flips the bright side
  }

  test("resizeBox: exact integer block means, re-encoded payload decodes") {
    val s = spark
    import s.implicits._
    // 4x4 → factor 2 → 2x2; block means are exact integer floors
    val px = Array(
      (10, 0, 0), (20, 0, 0), (7, 255, 1), (9, 255, 1),
      (30, 0, 0), (41, 0, 0), (9, 255, 1), (9, 255, 1),
      (0, 8, 100), (0, 8, 100), (200, 0, 0), (0, 0, 0),
      (0, 9, 100), (0, 9, 100), (0, 0, 0), (0, 0, 0))
    val bmp = graft.functions.Media.renderBmp(4, 4, px)
    val r = graft.operators.MultimodalOps.resizeBox(
      Seq((1L, bmp)).toDF("id", "p"), "id", 2, "p").collect()(0)
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) == ((4, 4, 2, 2)))
    val out = graft.functions.Media.decodeBmp(r.getAs[Array[Byte]]("resized"))
    // blocks: (10+20+30+41)/4=25 | (7+9+9+9)/4=8,255,1 | (8+8+9+9)/4=8 | 200/4=50
    assert(out.pixels.toSeq == Seq((25, 0, 0), (8, 255, 1),
      (0, 8, 100), (50, 0, 0)))
    // non-divisible extents refuse loudly
    intercept[org.apache.spark.SparkException] {
      graft.operators.MultimodalOps.resizeBox(
        Seq((1L, bmp)).toDF("id", "p"), "id", 3, "p").collect()
    }
  }

  test("orientImage: exact permutations incl. non-square rot90") {
    val s = spark
    import s.implicits._
    // 4×2: values 0..7 as red channel
    val px = Array.tabulate(8)(i => (i * 10, 0, 0))
    val bmp = graft.functions.Media.renderBmp(4, 2, px)
    def run(op: String): (Int, Int, Seq[Int]) = {
      val r = graft.operators.MultimodalOps.orientImage(
        Seq((1L, bmp)).toDF("id", "p"), "id", op, "p").collect()(0)
      val m = graft.functions.Media.decodeBmp(r.getAs[Array[Byte]]("oriented"))
      (r.getInt(1), r.getInt(2), m.pixels.map(_._1).toSeq)
    }
    assert(run("flip_h") == ((4, 2, Seq(30, 20, 10, 0, 70, 60, 50, 40))))
    assert(run("flip_v") == ((4, 2, Seq(40, 50, 60, 70, 0, 10, 20, 30))))
    // cw: first input row becomes the RIGHT column of the 2×4 output
    assert(run("rot90") == ((2, 4, Seq(40, 0, 50, 10, 60, 20, 70, 30))))
  }

  test("resampleAudioBox: floor-division block means incl. negative PCM; stereo") {
    val s = spark
    import s.implicits._
    // mono: blocks (10,20) → 15; (-3,-4) → floor(-7/2) = -4 (NOT -3)
    val mono = graft.functions.Media.renderWav(8000, 1, Array(10, 20, -3, -4))
    // stereo interleaved L/R: L blocks (1,3)→2, R blocks (-1,-2)→-2
    val st = graft.functions.Media.renderWav(4000, 2, Array(1, -1, 3, -2))
    val rows = graft.operators.MultimodalOps.resampleAudioBox(
      Seq((1L, mono), (2L, st)).toDF("id", "p"), "id", 2, "p")
      .collect().map { r =>
        r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          graft.functions.Media.decodeWav(
            r.getAs[Array[Byte]]("resampled")).samples.toSeq))
      }.toMap
    assert(rows(1L) == ((8000, 4000, 4, 2, Seq(15, -4))), rows.toString)
    assert(rows(2L) == ((4000, 2000, 2, 1, Seq(2, -2))), rows.toString)
  }

  test("Lzw: GIF dialect round trip across widths, dict growth, table-full clear") {
    import graft.functions.Lzw
    def rt(sym: Array[Int], min: Int): Unit = {
      val enc = Lzw.encode(sym, min, msbFirst = false, earlyChange = false)
      val dec = Lzw.decode(enc, min, msbFirst = false, earlyChange = false)
      assert(dec.toSeq == sym.toSeq, s"round trip failed (min=$min, n=${sym.length})")
    }
    rt(Array(0, 1, 0, 1, 0, 1, 0), 2) // tiny, KwKwK-prone
    rt(Array.fill(5000)(3), 2) // max run-length growth through widths
    // deterministic pseudo-random: forces growth past 9..12-bit codes
    var x = 12345
    def nxt(m: Int): Int = { x = x * 1103515245 + 12345; math.abs(x / 65536) % m }
    rt(Array.fill(8000)(nxt(16)), 4)
    // 256-symbol alphabet, 40k symbols: fills the 4096 table, forces clears
    rt(Array.fill(40000)(nxt(256)), 8)
  }

  test("Lzw: TIFF dialect (MSB-first, early change) round trip") {
    import graft.functions.Lzw
    var x = 777
    def nxt(m: Int): Int = { x = x * 1103515245 + 12345; math.abs(x / 65536) % m }
    for (n <- Seq(7, 300, 5000, 20000)) {
      val sym = Array.fill(n)(nxt(256))
      val enc = Lzw.encode(sym, 8, msbFirst = true, earlyChange = true)
      val dec = Lzw.decode(enc, 8, msbFirst = true, earlyChange = true)
      assert(dec.toSeq == sym.toSeq, s"TIFF dialect round trip failed at n=$n")
    }
  }

  test("Gif: render -> decode identity incl. interlace, LCT, delays") {
    import graft.functions.Gif
    val pal = Array.tabulate(16)(i => (i * 16, 255 - i * 16, i * 7))
    var x = 9
    def nxt(m: Int): Int = { x = x * 1103515245 + 12345; math.abs(x / 65536) % m }
    val f0 = Array.fill(20 * 13)(nxt(16))
    val f1 = Array.fill(20 * 13)(nxt(16))
    val lct = Array.tabulate(8)(i => (i * 31, i * 3, 200 - i * 20))
    val f2 = Array.fill(20 * 13)(nxt(8))
    val bytes = Gif.render(20, 13, pal, Seq(f0, f1, f2),
      interlaced = Seq(false, true, false), delaysCs = Seq(10, 0, 3),
      localPalettes = Map(2 -> lct))
    val img = Gif.decode(bytes)
    assert(img.width == 20 && img.height == 13 && img.globalColors == 16)
    assert(img.frames.length == 3)
    def rgbOf(idx: Array[Int], p: Array[(Int, Int, Int)]): Seq[Int] =
      idx.flatMap(i => Seq(p(i)._1, p(i)._2, p(i)._3)).toSeq
    assert(img.frames(0).rgb.toSeq == rgbOf(f0, pal))
    assert(img.frames(1).rgb.toSeq == rgbOf(f1, pal), "interlaced frame")
    assert(img.frames(1).interlaced && !img.frames(0).interlaced)
    assert(img.frames(2).rgb.toSeq == rgbOf(f2, lct), "local color table frame")
    assert(img.frames.map(_.delayCs) == Seq(10, 0, 3))
    // reject garbage
    intercept[IllegalArgumentException](Gif.decode("NOTAGIF".getBytes))
    // every truncation point fails with the codec's descriptive error,
    // never a raw ArrayIndexOutOfBoundsException from an unchecked read
    (14 until bytes.length by 7).foreach { n =>
      try { Gif.decode(bytes.take(n)); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: ArrayIndexOutOfBoundsException =>
          fail(s"truncation at $n escaped as AIOOBE", e)
      }
    }
  }

  test("gifFeatures: per-frame rows, deinterlace-sensitive weighted checksum") {
    val s = spark
    import s.implicits._
    import graft.functions.Gif
    val pal = Array.tabulate(4)(i => (i * 60, i * 2, i * 3))
    // 8x8: row y filled with index y%4 — interlace permutes rows, so a
    // naive non-deinterlaced read would get a different Σ pos·r
    val px = Array.tabulate(64)(i => (i / 8) % 4)
    val plain = Gif.render(8, 8, pal, Seq(px))
    val inter = Gif.render(8, 8, pal, Seq(px), interlaced = Seq(true))
    val rows = graft.operators.MultimodalOps.gifFeatures(
      Seq((1L, plain), (2L, inter)).toDF("id", "p"), "id", "p")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("mean_r"), r.getAs[Long]("wsum_r"),
          r.getAs[Boolean]("interlaced")))).toMap
    val expMean = px.map(i => i * 60).sum / 64.0
    val expW = px.zipWithIndex.map { case (i, p) => p.toLong * (i * 60) }.sum
    assert(rows(1L) == ((expMean, expW, false)))
    assert(rows(2L) == ((expMean, expW, true)), "deinterlace must restore row order")
  }

  test("audioFingerprint: analytic gradient bits on exact-integer tones; pairs") {
    val s = spark
    import s.implicits._
    // bin-16 tone (cos(πj/2) ∈ {1,0,-1} — exact integer samples) lands in
    // band (16-1)/4 = 3; 6-dp rounding kills float leakage in other bands
    def tone(frames: Set[Int]): Array[Int] = Array.tabulate(256) { i =>
      val f = i / 64
      if (!frames(f)) 0
      else ((i % 4) match { case 0 => 1000; case 2 => -1000; case _ => 0 })
    }
    val w1 = graft.functions.Media.renderWav(8000, 1, tone(Set(0)))
    val w3 = graft.functions.Media.renderWav(8000, 1, tone(Set(0, 1)))
    val fp = graft.operators.MultimodalOps.audioFingerprint(
      Seq((1L, w1), (2L, w1), (3L, w3)).toDF("id", "p"), "id", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // w1: band 3 falls across f0→f1 only → bit 0·8+3; w3: across f1→f2
    assert(fp(1L) == (1L << 3), s"fp1=${fp(1L)}")
    assert(fp(2L) == (1L << 3))
    assert(fp(3L) == (1L << 11), s"fp3=${fp(3L)}")
    val pairs = graft.operators.MultimodalOps.audioNearDupPairs(
      Seq((1L, w1), (2L, w1), (3L, w3)).toDF("id", "p"), "id",
      maxHamming = 6, payloadCol = "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 2), (2L, 3L, 2)))
  }

  test("imageNearDupPairs: exact + perceptual dups pair up, distinct images don't") {
    val s = spark
    import s.implicits._
    // half-dark base (same construction as the imageHashes spec), a
    // one-pixel noisy copy (hashes identical → Hamming 0), an exact
    // copy, and the inverted image (aHash complement → Hamming 64)
    val px = Array.tabulate(256) { i =>
      if (i % 16 < 8) (0, 0, 0) else (255, 255, 255)
    }
    val bmp = graft.functions.Media.renderBmp(16, 16, px)
    val px2 = px.clone(); px2(0) = (40, 40, 40)
    val bmp2 = graft.functions.Media.renderBmp(16, 16, px2)
    val px3 = px.map { case (r, g, b) => (255 - r, 255 - g, 255 - b) }
    val bmp3 = graft.functions.Media.renderBmp(16, 16, px3)
    val got = graft.operators.MultimodalOps.imageNearDupPairs(
      Seq((1L, bmp), (2L, bmp2), (3L, bmp3), (4L, bmp)).toDF("id", "p"),
      "id", maxHamming = 8, payloadCol = "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)),
      s"got $got")
  }
}
