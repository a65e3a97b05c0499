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

  test("decodeStub: deterministic fake features with real partition plumbing") {
    val d = MultimodalOps.decodeStub(MultimodalOps.withPayload(docs, "doc_id", "text"))
    val r = d.collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((4, 16, 'a'.toDouble)))     // 64 bytes of 'a' → mean 97
    assert(r(2L)._1 == 8 && r(2L)._2 == 16)
    val meanAbc = "abcdefgh".map(_.toDouble).sum / 8
    assert(math.abs(r(2L)._3 - meanAbc) < 1e-12)
  }
}
