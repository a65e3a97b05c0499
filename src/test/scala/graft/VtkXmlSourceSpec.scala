package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.mesh.MeshOps
import graft.sources.VtkXmlSource

/** ASCII VTU parsing: structure, reader-level pruning, mesh-ops composition. */
class VtkXmlSourceSpec extends SparkSpec {

  // unit right triangle + one extra point; two triangles; two point fields
  private val vtu =
    """<?xml version="1.0"?>
      |<VTKFile type="UnstructuredGrid" version="0.1">
      | <UnstructuredGrid>
      |  <Piece NumberOfPoints="4" NumberOfCells="2">
      |   <Points>
      |    <DataArray type="Float64" NumberOfComponents="3" format="ascii">
      |      0 0 0  1 0 0  0 1 0  1 1 0
      |    </DataArray>
      |   </Points>
      |   <Cells>
      |    <DataArray type="Int64" Name="connectivity" format="ascii">0 1 2 1 3 2</DataArray>
      |    <DataArray type="Int64" Name="offsets" format="ascii">3 6</DataArray>
      |    <DataArray type="UInt8" Name="types" format="ascii">5 5</DataArray>
      |   </Cells>
      |   <PointData>
      |    <DataArray type="Float64" Name="u" format="ascii">1 2 3 4</DataArray>
      |    <DataArray type="Float64" Name="p" format="ascii">10 20 30 40</DataArray>
      |   </PointData>
      |  </Piece>
      | </UnstructuredGrid>
      |</VTKFile>""".stripMargin

  test("parseVtu: points, ragged cells, point data") {
    val p = VtkXmlSource.parseVtu(vtu.getBytes("UTF-8"))
    assert(p.points.length == 4 && p.points(3).toSeq == Seq(1.0, 1.0, 0.0))
    assert(p.cells.map(_.toSeq).toSeq == Seq(Seq(0L, 1L, 2L), Seq(1L, 3L, 2L)))
    assert(p.pointData.keySet == Set("u", "p"))
    assert(p.pointData("u").toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("reader-level include/exclude prunes arrays during parse") {
    val inc = VtkXmlSource.parseVtu(vtu.getBytes("UTF-8"), include = Set("u"))
    assert(inc.pointData.keySet == Set("u"))
    val exc = VtkXmlSource.parseVtu(vtu.getBytes("UTF-8"), exclude = Set("u"))
    assert(exc.pointData.keySet == Set("p"))
  }

  test("inline base64 binary DataArrays decode identically to ascii") {
    val b64 = {
      def enc(doubles: Array[Double]): String = {
        val bb = java.nio.ByteBuffer.allocate(4 + doubles.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(doubles.length * 8)
        doubles.foreach(bb.putDouble)
        java.util.Base64.getEncoder.encodeToString(bb.array())
      }
      def encL(longs: Array[Long]): String = {
        val bb = java.nio.ByteBuffer.allocate(4 + longs.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(longs.length * 8)
        longs.foreach(bb.putLong)
        java.util.Base64.getEncoder.encodeToString(bb.array())
      }
      s"""<?xml version="1.0"?>
         |<VTKFile type="UnstructuredGrid" header_type="UInt32">
         | <UnstructuredGrid><Piece NumberOfPoints="3" NumberOfCells="1">
         |  <Points><DataArray type="Float64" NumberOfComponents="3" format="binary">${enc(Array(0, 0, 0, 1, 0, 0, 0, 1, 0))}</DataArray></Points>
         |  <Cells>
         |   <DataArray type="Int64" Name="connectivity" format="binary">${encL(Array(0L, 1L, 2L))}</DataArray>
         |   <DataArray type="Int64" Name="offsets" format="binary">${encL(Array(3L))}</DataArray>
         |  </Cells>
         |  <PointData><DataArray type="Float64" Name="u" format="binary">${enc(Array(1.5, 2.5, 3.5))}</DataArray></PointData>
         | </Piece></UnstructuredGrid>
         |</VTKFile>""".stripMargin
    }
    val p = VtkXmlSource.parseVtu(b64.getBytes("UTF-8"))
    assert(p.points.length == 3 && p.points(2).toSeq == Seq(0.0, 1.0, 0.0))
    assert(p.cells.map(_.toSeq).toSeq == Seq(Seq(0L, 1L, 2L)))
    assert(p.pointData("u").toSeq == Seq(1.5, 2.5, 3.5))
  }

  test("VtuSink write → VtkXmlSource read round trip") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("vtu-rt").toString
    val pts = Seq(
      (7L, 0L, 0.0, 0.0, 0.0), (7L, 1L, 2.0, 0.0, 0.0), (7L, 2L, 0.0, 3.0, 0.0)
    ).toDF("mesh_id", "point_id", "x", "y", "z")
    val cls = Seq((7L, 0L, Seq(0L, 1L, 2L))).toDF("mesh_id", "cell_id", "vertices")
    val pd = Seq((7L, 0L, "u", 1.0), (7L, 1L, "u", 2.0), (7L, 2L, "u", 4.0))
      .toDF("mesh_id", "point_id", "field", "value")

    val paths = graft.sinks.VtuSink.write(pts, cls, pd, dir)
    assert(paths.length == 1 && paths(0).endsWith("mesh_7.vtu"))

    val (rp, rc, rpd) = VtkXmlSource.read(spark, dir)
    assert(rp.count() == 3 && rc.count() == 1 && rpd.count() == 3)
    val coords = rp.orderBy("point_id").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(coords == Seq((0.0, 0.0, 0.0), (2.0, 0.0, 0.0), (0.0, 3.0, 0.0)))
    val u = rpd.orderBy("point_id").collect().map(_.getDouble(3)).toSeq
    assert(u == Seq(1.0, 2.0, 4.0))
    assert(rc.collect()(0).getSeq[Long](2) == Seq(0L, 1L, 2L))
  }

  test("VtuSink remaps non-contiguous point ids to positional connectivity") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("vtu-gap").toString
    // ids 10/20/30 (post-merge shape): positional connectivity must be 0 1 2
    val pts = Seq(
      (1L, 10L, 0.0, 0.0, 0.0), (1L, 20L, 1.0, 0.0, 0.0), (1L, 30L, 0.0, 1.0, 0.0)
    ).toDF("mesh_id", "point_id", "x", "y", "z")
    val cls = Seq((1L, 0L, Seq(10L, 20L, 30L))).toDF("mesh_id", "cell_id", "vertices")
    val pd = Seq((1L, 10L, "u", 1.0), (1L, 20L, "u", 2.0), (1L, 30L, "u", 3.0))
      .toDF("mesh_id", "point_id", "field", "value")
    graft.sinks.VtuSink.write(pts, cls, pd, dir)
    val xml = Files.readString(Paths.get(dir, "mesh_1.vtu"))
    assert(xml.contains(""">0 1 2</DataArray>""") || xml.contains("""format="ascii">0 1 2<"""))
    val (rp, rc, _) = VtkXmlSource.read(spark, dir)
    assert(rp.count() == 3)
    assert(rc.collect()(0).getSeq[Long](2) == Seq(0L, 1L, 2L))
  }

  test("VtuSink honors explicit cell_type and rejects uninferable counts") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("vtu-ct").toString
    val pts = (0L to 3L).map(i => (1L, i, i.toDouble, 0.0, 0.0))
      .toDF("mesh_id", "point_id", "x", "y", "z")
    val pd = Seq.empty[(Long, Long, String, Double)]
      .toDF("mesh_id", "point_id", "field", "value")
    // explicit quad (VTK type 9) — would otherwise be mis-inferred as a tet
    val quad = Seq((1L, 0L, Seq(0L, 1L, 2L, 3L), 9)).toDF("mesh_id", "cell_id", "vertices", "cell_type")
    graft.sinks.VtuSink.write(pts, quad, pd, dir)
    val xml = Files.readString(Paths.get(dir, "mesh_1.vtu"))
    assert(xml.contains("""Name="types" format="ascii">9<"""))
    // a 2-vertex cell with no explicit type must fail loudly
    val bad = Seq((1L, 0L, Seq(0L, 1L))).toDF("mesh_id", "cell_id", "vertices")
    intercept[org.apache.spark.SparkException] {
      graft.sinks.VtuSink.write(pts, bad, pd, dir)
    }
  }

  test("read glob → long tables → mesh quality + point-to-cell compose") {
    val dir = Files.createTempDirectory("vtu").toString
    Files.writeString(Paths.get(dir, "a.vtu"), vtu)
    Files.writeString(Paths.get(dir, "b.vtu"), vtu)
    val (points, cells, pointData) = VtkXmlSource.read(spark, dir)
    assert(points.count() == 8 && cells.count() == 4 && pointData.count() == 16)

    val report = MeshOps.triangleQualityReport(points, cells)
    assert(report.count() == 2)
    val r = report.collect()(0)
    // unit right triangles: aspect √2, area 1/2, no degenerates
    assert(math.abs(r.getAs[Double]("geom_max_aspect_ratio") - math.sqrt(2)) < 1e-9)
    assert(math.abs(r.getAs[Double]("vol_mean") - 0.5) < 1e-9)
    assert(r.getAs[Long]("geom_n_degenerate_cells") == 0)

    val cellMeans = MeshOps.pointDataToCellData(cells, pointData)
      .filter(col("field") === "u")
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(3)).toMap
    // cell 0 = mean(u[0,1,2]) = 2 ; cell 1 = mean(u[1,3,2]) = 3
    assert(cellMeans.values.toSet == Set(2.0, 3.0))
  }
}
