package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoTiffSource
import graft.sources.GeoTiffSource.Page

/** GeoTIFF codec: byte orders, compressions, predictor, strip layout,
  * multi-page chains, nodata, and the georeferenced distributed read.
  */
class GeoTiffSpec extends SparkSpec {

  private def mkPage(variable: String, w: Int, h: Int, comp: Int,
                     format: Int, predictor: Int = 1,
                     noData: Option[Double] = None): Page = {
    var x = variable.hashCode | 1
    def nxt(m: Int): Int = { x = x * 1103515245 + 12345; math.abs(x / 65536) % m }
    val vals = Array.tabulate(w * h) { i =>
      if (format == 3) (nxt(4000).toDouble / 8.0 - 200.0).toFloat.toDouble
      else nxt(65000).toDouble
    }
    Page(variable, w, h, if (format == 3) 32 else 16, format, comp,
      rowsPerStrip = 3, predictor, 0.25, 0.25, 10.0, 50.0, noData, vals)
  }

  test("render -> parse identity: all compressions, both byte orders, u16 + f32") {
    for (be <- Seq(false, true); comp <- Seq(1, 5, 32773)) {
      val p16 = mkPage(s"u16_${comp}_$be", 13, 7, comp, format = 1,
        predictor = if (comp == 5) 2 else 1)
      val p32 = mkPage(s"f32_${comp}_$be", 13, 7, comp, format = 3)
      val got = GeoTiffSource.parse(GeoTiffSource.render(Seq(p16, p32), be))
      assert(got.length == 2)
      got.zip(Seq(p16, p32)).foreach { case (g, e) =>
        assert(g.variable == e.variable && g.width == 13 && g.height == 7)
        assert(g.compression == e.compression && g.sampleFormat == e.sampleFormat)
        assert(g.values.toSeq == e.values.toSeq,
          s"pixels differ for ${e.variable} (be=$be)")
        assert(g.scaleX == 0.25 && g.lat0 == 50.0 && g.lon0 == 10.0)
      }
    }
  }

  test("predictor-2 horizontal differencing survives 16-bit wraparound") {
    // adjacent deltas exceeding 32767 force the mod-65536 arithmetic
    val vals = Array.tabulate(4 * 6)(i => if (i % 2 == 0) 65000.0 else 3.0)
    val p = Page("wrap", 6, 4, 16, 1, 5, rowsPerStrip = 2, predictor = 2,
      0.25, 0.25, 0.0, 0.0, None, vals)
    val g = GeoTiffSource.parse(GeoTiffSource.render(Seq(p))).head
    assert(g.values.toSeq == vals.toSeq)
  }

  test("nodata values map to NaN; partial last strip; single-strip inline table") {
    val vals = Array.tabulate(5 * 5)(i => if (i % 7 == 0) 999.0 else i.toDouble)
    val p = Page("nd", 5, 5, 16, 1, 32773, rowsPerStrip = 2, predictor = 1,
      1.0, 1.0, 0.0, 0.0, Some(999.0), vals)
    val g = GeoTiffSource.parse(GeoTiffSource.render(Seq(p))).head
    (0 until 25).foreach { i =>
      if (i % 7 == 0) assert(g.values(i).isNaN, s"cell $i should be nodata")
      else assert(g.values(i) == i.toDouble)
    }
    // rowsPerStrip >= height → one strip, offsets/counts inline
    val one = Page("one", 4, 3, 16, 1, 1, rowsPerStrip = 8, predictor = 1,
      1.0, 1.0, 0.0, 0.0, None, Array.tabulate(12)(_.toDouble))
    val g2 = GeoTiffSource.parse(GeoTiffSource.render(Seq(one))).head
    assert(g2.values.toSeq == one.values.toSeq)
  }

  test("parse rejects non-TIFF bytes") {
    intercept[IllegalArgumentException](GeoTiffSource.parse("JUNKJUNK".getBytes))
  }

  test("distributed read: per-cell rows with PixelIsArea centers") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("geotiff_spec").toString
    val cells = Seq(("t2m", 0, 0, 100L), ("t2m", 1, 2, 200L),
      ("rh", 0, 1, 50L)).toDF("variable", "i", "j", "stored")
    val paths = GeoTiffSource.writeRasters(cells, dir, shape = (2, 3),
      grid = (50.0, 10.0, 0.25, 0.25))
    assert(paths.length == 2)
    val df = GeoTiffSource.read(s, dir).filter(!isnan(col("value")))
    // page 0 u16: stored values back verbatim
    val u16 = df.filter(col("page") === 0 && col("variable") === "t2m")
      .select("i", "j", "value", "lat", "lon")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(u16 == Set((0, 0, 100.0, 49.875, 10.125),
      (1, 2, 200.0, 49.625, 10.625)))
    // page 1 f32: the quantized decode
    val f32 = df.filter(col("page") === 1 && col("variable") === "rh")
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(f32 == Seq((50L * 0.01 - 20.0).toFloat.toDouble))
  }
}
