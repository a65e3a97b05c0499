package graft

import graft.sources.GribSource
import graft.sources.GribSource.Spec

/** GRIB2 codec: round-trips across packing widths, bitmaps,
  * sign-magnitude fields, multi-message files, and loud rejects.
  */
class GribSpec extends SparkSpec {

  private def spec(stored: Array[Option[Long]], ni: Int, nj: Int,
                   nbits: Int = 12, refV: Float = -2000.0f,
                   binE: Int = 0, decD: Int = 2,
                   lat1: Long = 90000000L, di: Long = 250000L) = Spec(
    discipline = 0, category = 2, number = 5,
    refYear = 2026, refMonth = 8, refDay = 13, refHour = 6,
    forecastHours = 12L,
    ni = ni.toLong, nj = nj.toLong,
    lat1Micro = lat1, lon1Micro = 0L, diMicro = di, djMicro = 250000L,
    refValue = refV, binScale = binE, decScale = decD, nbits = nbits,
    stored = stored)

  test("round-trip: 12-bit simple packing, full grid") {
    val xs = Array.tabulate[Option[Long]](4 * 6)(i => Some(((i * 731) % 4096).toLong))
    val m = GribSource.parse(GribSource.render(Seq(spec(xs, ni = 6, nj = 4)))).head
    assert(m.discipline == 0 && m.category == 2 && m.number == 5)
    assert(m.refYear == 2026 && m.refMonth == 8 && m.refDay == 13 && m.refHour == 6)
    assert(m.forecastHours == 12L && m.ni == 6 && m.nj == 4)
    assert(m.lat1 == 90.0 && m.lon1 == 0.0 && m.di == 0.25 && m.dj == 0.25)
    val scale = math.pow(2.0, 0) / math.pow(10.0, 2)
    val base = -2000.0 / math.pow(10.0, 2)
    xs.zipWithIndex.foreach { case (x, i) =>
      assert(m.values(i) == base + x.get * scale, s"point $i")
    }
  }

  test("round-trip: bitmap holes decode NaN; packed stream skips them") {
    val xs = Array.tabulate(3 * 5)(i =>
      if (i % 4 == 0) None else Some((i * 100L) % 4096))
    val m = GribSource.parse(GribSource.render(Seq(spec(xs, ni = 5, nj = 3)))).head
    xs.zipWithIndex.foreach { case (x, i) =>
      x match {
        case None => assert(m.values(i).isNaN, s"hole $i must be NaN")
        case Some(v) => assert(m.values(i) == -20.0 + v * 0.01, s"point $i")
      }
    }
  }

  test("sign-magnitude fields: negative lat/increments and scale factors") {
    // southern-hemisphere origin + negative binary scale (value halving)
    val xs = Array.tabulate[Option[Long]](4)(i => Some(i.toLong * 3))
    val m = GribSource.parse(GribSource.render(Seq(
      spec(xs, ni = 2, nj = 2, nbits = 7, refV = 100.0f,
        binE = -1, decD = 1, lat1 = -45500000L)))).head
    assert(m.lat1 == -45.5)
    val scale = math.pow(2.0, -1) / math.pow(10.0, 1)
    val base = 100.0 / math.pow(10.0, 1)
    xs.zipWithIndex.foreach { case (x, i) =>
      assert(m.values(i) == base + x.get * scale, s"point $i")
    }
  }

  test("odd widths pack without byte alignment: 1, 3, 11, 17 bits") {
    for (nbits <- Seq(1, 3, 11, 17)) {
      val max = (1L << nbits) - 1
      val xs = Array.tabulate[Option[Long]](9)(i => Some((i.toLong * 2654435761L) % (max + 1)))
      val m = GribSource.parse(GribSource.render(Seq(
        spec(xs, ni = 3, nj = 3, nbits = nbits, refV = 0.0f, decD = 0)))).head
      xs.zipWithIndex.foreach { case (x, i) =>
        assert(m.values(i) == x.get.toDouble, s"nbits=$nbits point $i")
      }
    }
  }

  test("multi-message files parse in order; rejects are loud") {
    val a = spec(Array.tabulate[Option[Long]](4)(i => Some(i.toLong)), ni = 2, nj = 2)
    val b = spec(Array.tabulate[Option[Long]](4)(i => Some(i.toLong + 9)), ni = 2, nj = 2)
      .copy(number = 6, forecastHours = 18L)
    val ms = GribSource.parse(GribSource.render(Seq(a, b)))
    assert(ms.length == 2)
    assert(ms(0).number == 5 && ms(1).number == 6)
    assert(ms(1).forecastHours == 18L)
    intercept[IllegalArgumentException] {
      GribSource.parse("NOTGRIB:definitely not a grib file".getBytes("US-ASCII"))
    }
    // flip the data-representation template to 5.3 (complex packing)
    val bytes = GribSource.render(Seq(a))
    val s5 = {
      // find section 5: walk sections from offset 16
      var p = 16; var found = -1
      while (found < 0) {
        val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        if ((bytes(p + 4) & 0xff) == 5) found = p else p += len
      }
      found
    }
    val bad = bytes.clone(); bad(s5 + 10) = 3 // template 5.3
    val e = intercept[IllegalArgumentException] { GribSource.parse(bad) }
    assert(e.getMessage.contains("5.3"))
  }

  test("read: distributed decode emits metadata per point") {
    val s = spark
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_grib_spec"
    val f = new java.io.File(dir); f.mkdirs()
    val a = spec(Array.tabulate[Option[Long]](4)(i => Some(i.toLong * 7)), ni = 2, nj = 2)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/t.grib2"),
      GribSource.render(Seq(a)))
    val rows = GribSource.read(s, dir).orderBy("pos").collect()
    assert(rows.length == 4)
    val scale = math.pow(2.0, 0) / math.pow(10.0, 2)
    val base = -2000.0 / math.pow(10.0, 2)
    assert(rows.map(_.getAs[Double]("value")).toSeq ==
      Seq(0L, 7L, 14L, 21L).map(x => base + x * scale))
    assert(rows.head.getAs[Long]("ni") == 2L)
    assert(rows.head.getAs[Int]("ref_year") == 2026)
  }
}
