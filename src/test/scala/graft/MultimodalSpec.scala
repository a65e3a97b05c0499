package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Binary payload plumbing: schema, metadata, frame slicing, stub decode. */
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

  test("decodeStub: deterministic fake features with real partition plumbing") {
    val d = MultimodalOps.decodeStub(MultimodalOps.withPayload(docs, "doc_id", "text"))
    val r = d.collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((4, 16, 'a'.toDouble)))     // 64 bytes of 'a' → mean 97
    assert(r(2L)._1 == 8 && r(2L)._2 == 16)
    val meanAbc = "abcdefgh".map(_.toDouble).sum / 8
    assert(math.abs(r(2L)._3 - meanAbc) < 1e-12)
  }
}
