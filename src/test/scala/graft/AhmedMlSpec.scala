package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.AhmedMlSource

/** AhmedML source modes over a local fixture in the dataset's exact layout
  * (`ahmedml.py:56-75`): run_<i>/boundary_<i>.vtp, volume_<i>.vtu,
  * ahmed_<i>.stl, slices VTPs, and the three CSV metadata files.
  */
class AhmedMlSpec extends SparkSpec {

  /** Two runs (ids 1 and 5 — non-contiguous like the real dataset).
    * Volume: 4 points, 2 tris with cell data "p"; boundary: 3 points,
    * 1 tri with point data "cp"; stl: 1 facet; slices: x/y planes.
    */
  private lazy val root: String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ahmedml").toString

    val volPts = Seq(
      (1L, 0L, 0.0, 0.0, 0.0), (1L, 1L, 2.0, 0.0, 0.0),
      (1L, 2L, 0.0, 2.0, 0.0), (1L, 3L, 2.0, 2.0, 2.0),
      (5L, 0L, 1.0, 1.0, 1.0), (5L, 1L, 3.0, 1.0, 1.0),
      (5L, 2L, 1.0, 4.0, 1.0), (5L, 3L, 3.0, 4.0, 7.0)
    ).toDF("mesh_id", "point_id", "x", "y", "z")
    val volCells = Seq(
      (1L, 0L, Seq(0L, 1L, 2L)), (1L, 1L, Seq(1L, 2L, 3L)),
      (5L, 0L, Seq(0L, 1L, 2L)), (5L, 1L, Seq(1L, 2L, 3L))
    ).toDF("mesh_id", "cell_id", "vertices")
    val volCd = Seq(
      (1L, 0L, "p", 0.5), (1L, 1L, "p", 1.5),
      (5L, 0L, "p", -2.0), (5L, 1L, "p", 4.0)
    ).toDF("mesh_id", "cell_id", "field", "value")
    val emptyPd = Seq.empty[(Long, Long, String, Double)]
      .toDF("mesh_id", "point_id", "field", "value")
    graft.sinks.VtuSink.write(volPts, volCells, emptyPd, dir,
      format = "appended-zlib", cellData = Some(volCd),
      nameTemplate = "run_{id}/volume_{id}.vtu")

    val bndPts = Seq(
      (1L, 0L, 0.0, 0.0, 0.0), (1L, 1L, 1.0, 0.0, 0.0), (1L, 2L, 0.0, 1.0, 0.0),
      (5L, 0L, 0.5, 0.5, 0.0), (5L, 1L, 1.5, 0.5, 0.0), (5L, 2L, 0.5, 1.5, 0.0)
    ).toDF("mesh_id", "point_id", "x", "y", "z")
    val bndCells = Seq((1L, 0L, Seq(0L, 1L, 2L)), (5L, 0L, Seq(0L, 1L, 2L)))
      .toDF("mesh_id", "cell_id", "vertices")
    val bndPd = Seq(
      (1L, 0L, "cp", 0.25), (1L, 1L, "cp", 0.5), (1L, 2L, "cp", 0.75),
      (5L, 0L, "cp", -1.0), (5L, 1L, "cp", -2.0), (5L, 2L, "cp", -3.0)
    ).toDF("mesh_id", "point_id", "field", "value")
    graft.sinks.VtuSink.write(bndPts, bndCells, bndPd, dir,
      nameTemplate = "run_{id}/boundary_{id}.vtp", polyData = true)

    graft.sinks.StlSink.write(bndPts, bndCells, dir,
      nameTemplate = "run_{id}/ahmed_{id}.stl")

    Seq("xNormal", "yNormal").foreach { axis =>
      graft.sinks.VtuSink.write(bndPts, bndCells, bndPd, dir,
        nameTemplate = s"run_{id}/slices/$axis-autocfd-{id}.vtp",
        polyData = true)
    }

    // CSV metadata: run 5 has no geo_parameters file (missing → skipped)
    AhmedMlSource.writeCsv(spark, s"$dir/run_1/force_mom_1.csv",
      Seq("cd" -> 0.25, "cl" -> -0.125))
    AhmedMlSource.writeCsv(spark, s"$dir/run_1/force_mom_varref_1.csv",
      Seq("cd" -> 0.5, "cl" -> 0.75))
    AhmedMlSource.writeCsv(spark, s"$dir/run_1/geo_parameters_1.csv",
      Seq("slant-angle" -> 25.0, "length" -> 1044.0))
    AhmedMlSource.writeCsv(spark, s"$dir/run_5/force_mom_5.csv",
      Seq("cd" -> 0.375, "cl" -> 0.0625))
    AhmedMlSource.writeCsv(spark, s"$dir/run_5/force_mom_varref_5.csv",
      Seq("cd" -> 1.5, "cl" -> -0.25))
    dir
  }

  test("discoverRuns finds sorted run ids") {
    assert(AhmedMlSource.discoverRuns(spark, root) == Seq(1, 5))
  }

  test("global data: -→_ normalization, varref_ prefix, missing file skipped") {
    val g = AhmedMlSource.readGlobalData(spark, root)
    val rows = g.collect().map(r => (r.getLong(0), r.getString(1), r.getFloat(2))).toSet
    assert(rows == Set(
      (1L, "cd", 0.25f), (1L, "cl", -0.125f),
      (1L, "varref_cd", 0.5f), (1L, "varref_cl", 0.75f),
      (1L, "slant_angle", 25.0f), (1L, "length", 1044.0f),
      (5L, "cd", 0.375f), (5L, "cl", 0.0625f),
      (5L, "varref_cd", 1.5f), (5L, "varref_cl", -0.25f)))
  }

  test("boundary mode reads surface VTPs keyed by run") {
    val (p, c, pd) = AhmedMlSource.readBoundary(spark, root)
    assert(p.count() == 6 && c.count() == 2 && pd.count() == 6)
    assert(p.select("run_id").distinct().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
    val cp5 = pd.filter(col("run_id") === 5 && col("field") === "cp")
      .agg(sum("value")).collect()(0).getDouble(0)
    assert(cp5 == -6.0)
  }

  test("volume mode: fields arrive as cell data") {
    val (p, c, pd, cd) = AhmedMlSource.readVolume(spark, root)
    assert(p.count() == 8 && c.count() == 4 && pd.count() == 0 && cd.count() == 4)
    val p1 = cd.filter(col("run_id") === 1).agg(sum("value")).collect()(0).getDouble(0)
    assert(p1 == 2.0)
  }

  test("slices mode: one mesh per plane file with slice_name") {
    val (p, _, _) = AhmedMlSource.readSlices(spark, root)
    val names = p.select("run_id", "slice_name").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(names == Set(
      (1L, "xNormal-autocfd-1"), (1L, "yNormal-autocfd-1"),
      (5L, "xNormal-autocfd-5"), (5L, "yNormal-autocfd-5")))
  }

  test("multi/domain: centroids as interior points, cell data as point data, fp32") {
    val d = AhmedMlSource.readDomain(spark, root)
    // run 1 cell 0 = tri (0,0,0)(2,0,0)(0,2,0) → centroid (2/3, 2/3, 0)
    val c0 = d.interiorPoints.filter(col("run_id") === 1 && col("point_id") === 0)
      .collect()(0)
    assert(math.abs(c0.getFloat(2) - 2.0f / 3.0f) < 1e-7)
    assert(math.abs(c0.getFloat(3) - 2.0f / 3.0f) < 1e-7)
    assert(c0.getFloat(4) == 0.0f)
    assert(d.interiorPoints.count() == 4) // one point per volume cell
    // interior point data = the volume's cell data at the centroid ids
    val id5 = d.interiorPointData.filter(col("run_id") === 5)
      .orderBy("point_id").collect().map(_.getFloat(3)).toSeq
    assert(id5 == Seq(-2.0f, 4.0f))
    // surface keeps full connectivity; fp32 schema
    assert(d.surfaceCells.count() == 2)
    assert(d.surfacePoints.schema("x").dataType.typeName == "float")
    assert(d.interiorPoints.schema("x").dataType.typeName == "float")
    // global data rides along
    assert(d.globalData.filter(col("key") === "cd").count() == 2)
  }

  test("multi/stl: geometry with facet normals keyed by run") {
    val (p, c, cd) = AhmedMlSource.readStl(spark, root)
    assert(p.count() == 6 && c.count() == 2)
    // normal of the (0,0,0)(1,0,0)(0,1,0) facet is +z
    val nz = cd.filter(col("run_id") === 1 && col("field") === "normal_z")
      .collect()(0).getDouble(3)
    assert(nz == 1.0)
  }
}
