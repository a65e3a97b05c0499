package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{AnsysResults, VtkXmlSource}

/** VTI ImageData parsing (extent/origin/spacing lattice, point + cell
  * arrays) and the Ansys result-routing contract.
  */
class VtiAnsysSpec extends SparkSpec {

  // 3×2×1 point lattice (x fastest) → 2×1 cell lattice; one binary array
  private val vti = {
    def enc(doubles: Array[Double]): String = {
      val bb = java.nio.ByteBuffer.allocate(4 + doubles.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(doubles.length * 8)
      doubles.foreach(bb.putDouble)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
    s"""<?xml version="1.0"?>
       |<VTKFile type="ImageData" header_type="UInt32">
       | <ImageData WholeExtent="0 2 0 1 0 0" Origin="10 20 30" Spacing="0.5 2 1">
       |  <Piece Extent="0 2 0 1 0 0">
       |   <PointData>
       |    <DataArray type="Float64" Name="t" format="ascii">1 2 3 4 5 6</DataArray>
       |    <DataArray type="Float64" Name="p" format="binary">${enc(Array(9, 8, 7, 6, 5, 4))}</DataArray>
       |   </PointData>
       |   <CellData>
       |    <DataArray type="Float64" Name="q" format="ascii">100 200</DataArray>
       |   </CellData>
       |  </Piece>
       | </ImageData>
       |</VTKFile>""".stripMargin
  }

  test("parseVti: extent/origin/spacing + point and cell arrays") {
    val g = VtkXmlSource.parseVti(vti.getBytes("UTF-8"))
    assert(g.extent.toSeq == Seq(0, 2, 0, 1, 0, 0))
    assert(g.origin.toSeq == Seq(10.0, 20.0, 30.0))
    assert(g.spacing.toSeq == Seq(0.5, 2.0, 1.0))
    assert(g.pointData("t").toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    assert(g.pointData("p").toSeq == Seq(9.0, 8.0, 7.0, 6.0, 5.0, 4.0))
    assert(g.cellData("q").toSeq == Seq(100.0, 200.0))
    // include/exclude prunes during parse
    assert(VtkXmlSource.parseVti(vti.getBytes("UTF-8"), include = Set("t"))
      .pointData.keySet == Set("t"))
  }

  test("readVti: long lattice rows with computed coordinates") {
    val dir = Files.createTempDirectory("vti").toString
    Files.writeString(Paths.get(dir, "g.vti"), vti)
    val (pd, cd) = VtkXmlSource.readVti(spark, dir)
    assert(pd.count() == 12 && cd.count() == 2) // 2 fields × 6 pts; 1 × 2 cells
    // point (i=2, j=1, k=0): x = 10 + 2·0.5, y = 20 + 1·2, value = t[5] = 6
    val r = pd.filter(col("field") === "t" && col("i") === 2 && col("j") === 1)
      .collect()(0)
    assert(r.getAs[Double]("x") == 11.0 && r.getAs[Double]("y") == 22.0
      && r.getAs[Double]("z") == 30.0 && r.getAs[Double]("value") == 6.0)
    // cell centers: x = 10 + (i+0.5)·0.5
    val c = cd.orderBy("i").collect()
    assert(c.map(_.getAs[Double]("x")).toSeq == Seq(10.25, 10.75))
    assert(c.map(_.getAs[Double]("value")).toSeq == Seq(100.0, 200.0))
  }

  test("Ansys routing: discovery, subset, nodal/elemental split, globals") {
    val s = spark
    import s.implicits._
    val results = Seq(
      ("m1", "temperature", 0L, null.asInstanceOf[String], 300.0),
      ("m1", "temperature", 1L, null.asInstanceOf[String], 310.0),
      ("m1", "displacement", 0L, "0", 0.1),
      ("m1", "displacement", 0L, "1", 0.2),
      ("m1", "stress", 0L, null.asInstanceOf[String], 5.0),
      ("m1", "mystery_result", 0L, null.asInstanceOf[String], 1.0)
    ).toDF("mesh_id", "result", "idx", "component", "value")

    val disc = AnsysResults.discover(results).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(disc == Map("temperature" -> "nodal", "displacement" -> "nodal",
      "stress" -> "elemental", "mystery_result" -> "nodal")) // unknown → nodal

    val (pd, cd) = AnsysResults.route(results)
    assert(cd.collect().map(_.getAs[String]("field")).toSeq == Seq("stress"))
    val fields = pd.select("field").distinct().collect().map(_.getString(0)).toSet
    assert(fields == Set("temperature", "displacement_0", "displacement_1", "mystery_result"))

    val (pdSub, _) = AnsysResults.route(results, subset = Seq("temperature"))
    assert(pdSub.count() == 2)

    val points = Seq(("m1", 0L), ("m1", 1L), ("m2", 0L)).toDF("mesh_id", "point_id")
    val cells = Seq(("m1", 0L)).toDF("mesh_id", "cell_id")
    val g = AnsysResults.globalData(points, cells).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g == Map("m1" -> (2L, 1L), "m2" -> (1L, 0L)))
  }
}
