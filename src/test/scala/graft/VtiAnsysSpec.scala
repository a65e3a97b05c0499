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

  test("RST codec: thermal and structural fixtures render -> decode") {
    import graft.sources.AnsysRst
    // thermal: 3 nodes, 2 elements, two result sets
    val th = AnsysRst.render(AnsysRst.AnalysisThermal, 3, 2, Seq(
      AnsysRst.RstSet(1, 1, Array(Array(300.0), Array(310.0), Array(305.5)),
        Array(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))),
      AnsysRst.RstSet(2, 1, Array(Array(320.0), Array(330.0), Array(315.0)),
        Array.empty)))
    val f = AnsysRst.decode(th)
    assert(f.analysis == AnsysRst.AnalysisThermal && f.nnod == 3 && f.nelm == 2)
    val t1 = f.rows.filter(r => r.ldstep == 1 && r.result == "temperature")
    assert(t1.map(_.value) == Seq(300.0, 310.0, 305.5))
    assert(t1.forall(_.component == null))
    val hf = f.rows.filter(r => r.ldstep == 1 && r.result == "heat_flux")
    assert(hf.length == 6 && hf.find(r => r.idx == 1 && r.component == "2").get.value == 6.0)
    assert(f.rows.count(_.ldstep == 2) == 3) // second set: NSL only
    // structural names + vector components
    val st = AnsysRst.render(AnsysRst.AnalysisStructural, 2, 1, Seq(
      AnsysRst.RstSet(1, 1, Array(Array(0.1, 0.2, 0.3), Array(0.4, 0.5, 0.6)),
        Array(Array(9.0, 8.0, 7.0, 6.0, 5.0, 4.0)))))
    val g2 = AnsysRst.decode(st)
    assert(g2.rows.filter(_.result == "displacement").map(_.component).toSet ==
      Set("0", "1", "2"))
    assert(g2.rows.count(_.result == "stress") == 6)
    // corrupted framing fails loudly, not with garbage rows
    val bad = th.clone(); bad(4) = (bad(4) + 1).toByte
    val e = intercept[IllegalArgumentException](AnsysRst.decode(bad))
    assert(e.getMessage.contains("framing") || e.getMessage.contains("file id"))
  }

  test("RST geometry records: node/element tables render -> decode -> join") {
    import graft.sources.AnsysRst
    val nodes = Array(Array(0.0, 0.0, 0.0), Array(1.0, 0.0, 0.5),
      Array(0.0, 1.0, 0.25), Array(1.0, 1.0, 0.75))
    val elems = Array(Array(0, 1, 2), Array(1, 3, 2, 0)) // tri + quad
    val bytes = AnsysRst.render(AnsysRst.AnalysisThermal, 4, 2, Seq(
      AnsysRst.RstSet(1, 1, Array.tabulate(4)(i => Array(i * 10.0)),
        Array(Array(1.0), Array(2.0)))), nodes, elems)
    val f = AnsysRst.decode(bytes)
    assert(f.nodes.map(_.toSeq).toSeq == nodes.map(_.toSeq).toSeq)
    assert(f.elems.map(_.toSeq).toSeq == Seq(Seq(0, 1, 2), Seq(1, 3, 2, 0)))
    // results still decode alongside
    assert(f.rows.count(_.result == "temperature") == 4)
    // legacy geometry-free files keep decoding with empty tables
    val legacy = AnsysRst.decode(AnsysRst.render(AnsysRst.AnalysisThermal, 2, 0,
      Seq(AnsysRst.RstSet(1, 1, Array(Array(1.0), Array(2.0)), Array.empty))))
    assert(legacy.nodes.isEmpty && legacy.elems.isEmpty)
    // out-of-range connectivity rejected at render
    intercept[IllegalArgumentException] {
      AnsysRst.render(AnsysRst.AnalysisThermal, 4, 1, Seq(
        AnsysRst.RstSet(1, 1, Array.tabulate(4)(i => Array(i * 10.0)),
          Array(Array(1.0)))), nodes, Array(Array(0, 9)))
    }
    // distributed geometry read: mesh + results joinable on (mesh_id, idx)
    val dir = java.nio.file.Files.createTempDirectory("rstgeo").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "m.rst"), bytes)
    val (pts, cells) = graft.sources.AnsysRstSource.readGeometry(spark, dir)
    assert(pts.count() == 4)
    assert(pts.orderBy("node_id").collect().map(_.getDouble(4)).toSeq ==
      Seq(0.0, 0.5, 0.25, 0.75))
    assert(cells.orderBy("elem_id").collect()
      .map(_.getAs[scala.collection.Seq[Long]]("vertices")).toSeq ==
      Seq(Seq(0L, 1L, 2L), Seq(1L, 3L, 2L, 0L)))
    val results = graft.sources.AnsysRstSource.read(spark, dir)
      .filter(col("result") === "temperature")
      .select(col("mesh_id"), col("idx").as("node_id"), col("value"))
    val joined = pts.join(results, Seq("mesh_id", "node_id"))
    assert(joined.count() == 4)
    spark.catalog.clearCache()
  }

  test("RST source: distributed read over a fixture directory") {
    import graft.sources.AnsysRst
    val dir = java.nio.file.Files.createTempDirectory("rst").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.rst"),
      AnsysRst.render(AnsysRst.AnalysisThermal, 2, 0, Seq(
        AnsysRst.RstSet(1, 1, Array(Array(1.5), Array(2.5)), Array.empty))))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.rst"),
      AnsysRst.render(AnsysRst.AnalysisStructural, 1, 0, Seq(
        AnsysRst.RstSet(1, 1, Array(Array(7.0, 8.0, 9.0)), Array.empty))))
    val df = graft.sources.AnsysRstSource.read(spark, dir)
    assert(df.count() == 5)
    val a = df.filter(col("mesh_id") === "a" && col("result") === "temperature")
    assert(a.orderBy("idx").collect().map(_.getDouble(6)).toSeq == Seq(1.5, 2.5))
    val b = df.filter(col("mesh_id") === "b")
    assert(b.collect().map(_.getString(5)).toSet == Set("0", "1", "2"))
  }
}
