package graft

import org.apache.spark.sql.functions._

import graft.sources.ZipSource

/** ZIP codec: central-directory read path, store/deflate, CRC gates,
  * and the distributed shard round trip.
  */
class ZipSpec extends SparkSpec {

  test("render -> parse identity: deflate, store, incompressible fallback") {
    val entries = Seq(
      ("a.txt", ("hello world " * 50).getBytes("UTF-8")), // compressible
      ("b.bin", Array.tabulate[Byte](997)(i => ((i * 131 + 17) % 251).toByte)),
      ("empty", Array.empty[Byte]))
    for (deflate <- Seq(true, false)) {
      val got = ZipSource.parse(ZipSource.render(entries, deflate))
      assert(got.map(_.name) == entries.map(_._1))
      got.zip(entries).foreach { case (g, (_, data)) =>
        assert(g.data.toSeq == data.toSeq, s"${g.name} payload")
        assert(g.size == data.length)
      }
      if (deflate) {
        assert(got.head.method == 8, "text should deflate")
        assert(got(1).compressedSize <= got(1).size + 64)
      } else assert(got.forall(_.method == 0))
    }
  }

  test("parse survives an EOCD comment tail; rejects corruption") {
    val z = ZipSource.render(Seq(("x", "payload".getBytes)))
    // append a ZIP comment: EOCD must still be found by backward scan
    val commented = z.dropRight(2) ++ Array[Byte](7, 0) ++
      "COMMENT".getBytes("US-ASCII")
    assert(ZipSource.parse(commented).head.data.toSeq == "payload".getBytes.toSeq)
    // flip a payload byte: CRC gate must fire
    val corrupt = z.clone()
    val off = new String(z.map(_.toChar)).indexOf("payload")
    assert(off > 0)
    corrupt(off) = 'X'.toByte
    intercept[IllegalArgumentException](ZipSource.parse(corrupt))
    intercept[IllegalArgumentException](ZipSource.parse("nope".getBytes))
  }

  test("non-ZIP64 limits are enforced, not silently wrapped") {
    // render refuses >= 65535 entries (0xffff is the ZIP64 sentinel the
    // parser rejects, so the u16 EOCD count must stay below it — a
    // 65535-entry archive would round-trip into a parse failure)
    intercept[IllegalArgumentException] {
      ZipSource.render((0 until 0xffff).map(i => (s"e$i", Array.empty[Byte])),
        deflate = false)
    }
    // parse refuses ZIP64 sentinel values in the EOCD
    val z = ZipSource.render(Seq(("a.txt", "x".getBytes)), deflate = false)
    val eocd = z.length - 22
    val z64count = z.clone()
    z64count(eocd + 10) = 0xff.toByte; z64count(eocd + 11) = 0xff.toByte
    intercept[IllegalArgumentException](ZipSource.parse(z64count))
    val z64off = z.clone()
    (16 until 20).foreach(i => z64off(eocd + i) = 0xff.toByte)
    intercept[IllegalArgumentException](ZipSource.parse(z64off))
  }

  test("distributed write -> read round trip with per-shard archives") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zip_spec").toString
    val rows = (0 until 20).map(i =>
      (s"s${i % 3}", f"e$i%03d.txt", s"content-$i".getBytes("UTF-8")))
    val paths = ZipSource.writeArchives(
      rows.toDF("shard", "name", "data"), "shard", "name", "data", dir)
    assert(paths.length == 3)
    val back = ZipSource.read(s, dir)
    assert(back.count() == 20)
    val byName = back.select("name", "data").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap
    rows.foreach { case (_, n, d) => assert(byName(n) == new String(d, "UTF-8")) }
  }
}
