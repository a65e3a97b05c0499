package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.StlSource

/** STL decode: ascii and binary fixtures (including a binary file whose
  * header starts with "solid") into the long mesh model, welding via
  * mergeDuplicatePoints downstream.
  */
class StlSpec extends SparkSpec {

  private val asciiStl =
    """solid unit
      | facet normal 0 0 1
      |  outer loop
      |   vertex 0 0 0
      |   vertex 1 0 0
      |   vertex 0 1 0
      |  endloop
      | endfacet
      | facet normal 0 0 1
      |  outer loop
      |   vertex 1 0 0
      |   vertex 1 1 0
      |   vertex 0 1 0
      |  endloop
      | endfacet
      |endsolid unit""".stripMargin

  // same two triangles, binary, with a deliberately misleading header
  private def binaryStl: Array[Byte] = {
    val tris = Seq(
      (Array(0f, 0f, 1f), Array(Array(0f, 0f, 0f), Array(1f, 0f, 0f), Array(0f, 1f, 0f))),
      (Array(0f, 0f, 1f), Array(Array(1f, 0f, 0f), Array(1f, 1f, 0f), Array(0f, 1f, 0f))))
    val bb = ByteBuffer.allocate(84 + 50 * tris.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("solid-looking binary header".getBytes("US-ASCII"))
    bb.position(80); bb.putInt(tris.length)
    tris.foreach { case (n, vs) =>
      n.foreach(bb.putFloat); vs.foreach(_.foreach(bb.putFloat))
      bb.putShort(0.toShort)
    }
    bb.array()
  }

  test("ascii and binary parse to identical meshes; binary detected by structure") {
    val a = StlSource.parse(asciiStl.getBytes("US-ASCII"))
    val b = StlSource.parse(binaryStl)
    assert(a.normals.length == 2 && b.normals.length == 2)
    assert(a.vertices.map(_.toSeq).toSeq == b.vertices.map(_.toSeq).toSeq)
    assert(a.vertices(3).toSeq == Seq(1.0, 0.0, 0.0))
    assert(b.normals(0).toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("binary with trailing padding still parses; junk bytes fail loudly") {
    val padded = binaryStl ++ "\n\n".getBytes
    assert(StlSource.parse(padded).normals.length == 2)
    intercept[IllegalArgumentException] {
      StlSource.parse(Array.fill[Byte](200)(9)) // neither binary nor ascii
    }
  }

  test("read → long tables → weld + quality compose") {
    val dir = Files.createTempDirectory("stl").toString
    Files.writeString(Paths.get(dir, "a.stl"), asciiStl)
    Files.write(Paths.get(dir, "b.stl"), binaryStl)
    val (points, cells, cellData) = StlSource.read(spark, dir)
    assert(points.count() == 12 && cells.count() == 4)
    assert(cellData.filter(col("field") === "normal_z").count() == 4)

    // 12 repeated corners weld down to 4 distinct points per mesh
    val merged = graft.mesh.MeshOps.mergeDuplicatePoints(points, 1e-9)
    assert(merged.select("mesh_id", "new_point_id").distinct().count() == 8)

    // unit right triangles: quality report composes on the raw (unwelded) model
    val report = graft.mesh.MeshOps.triangleQualityReport(points, cells)
    assert(report.count() == 2)
    report.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("vol_mean") - 0.5) < 1e-9)
    }
  }
}
