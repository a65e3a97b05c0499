package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sinks.ZarrStore

/** Zarr v2 store: chunk layout, fill values, edge clipping, round trip. */
class ZarrSpec extends SparkSpec {

  test("writeArray2D: chunk grid, .zarray metadata, fill chunks") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("zarr").toString + "/arr"
    // 5×7 array, 2×3 chunks → 3×3 chunk grid with edge clipping
    val df = Seq((0L, 0L, 1.5), (4L, 6L, -2.25), (2L, 3L, 8.0))
      .toDF("i", "j", "value")
    ZarrStore.writeArray2D(df, dir, shape = (5L, 7L), chunks = (2, 3))

    val meta = Files.readString(Paths.get(dir, ".zarray"))
    assert(meta.contains("\"shape\":[5,7]") && meta.contains("\"chunks\":[2,3]"))
    assert(meta.contains("\"<f8\"") && meta.contains("\"zlib\""))
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files == Set(".zarray", "0.0", "0.1", "0.2", "1.0", "1.1", "1.2",
      "2.0", "2.1", "2.2"))
  }

  test("writeArray2D rejects out-of-shape cells instead of silently dropping") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("zarr").toString + "/oob"
    val df = Seq((0L, 0L, 1.0), (10L, 3L, 2.0)) // i=10 outside 5×7
      .toDF("i", "j", "value")
    val e = intercept[Exception] {
      ZarrStore.writeArray2D(df, dir, shape = (5L, 7L), chunks = (2, 3))
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("outside array shape"))
  }

  test("gridSidecar: one zarr array per field + .zgroup marker") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("sidecar").toString + "/grids"
    val df = Seq(("t2m", 0L, 0L, 1.0), ("t2m", 1L, 1L, 2.0), ("u10", 0L, 1L, 9.0))
      .toDF("field", "i", "j", "value")
    val paths = graft.sinks.Sinks.gridSidecar(df, out, shape = (2L, 2L), chunks = (2, 2))
    assert(paths.length == 2)
    assert(Files.exists(Paths.get(out, ".zgroup")))
    val t2m = ZarrStore.readArray2D(spark, s"$out/t2m")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(t2m == Map((0L, 0L) -> 1.0, (0L, 1L) -> 0.0, (1L, 0L) -> 0.0, (1L, 1L) -> 2.0))
  }

  test("write → read round trip with fills and edge chunks") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("zarr-rt").toString + "/arr"
    val cells = for (i <- 0L until 5L; j <- 0L until 7L if (i + j) % 3 == 0)
      yield (i, j, i * 10.0 + j)
    ZarrStore.writeArray2D(cells.toDF("i", "j", "value"), dir, (5L, 7L), (2, 3),
      fillValue = -1.0)
    val back = ZarrStore.readArray2D(spark, dir)
    assert(back.count() == 35) // full lattice, edge chunks clipped
    val m = back.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    cells.foreach { case (i, j, v) => assert(m((i, j)) == v) }
    assert(m((0L, 1L)) == -1.0) // fill value where no row existed
    assert(m.keySet == (for (i <- 0L until 5L; j <- 0L until 7L) yield (i, j)).toSet)
  }
}
