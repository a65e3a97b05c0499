package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STL triangle-mesh reader (the remaining VTKSource extension,
  * `domains/mesh/sources/vtk.py:74-131` accepts `.stl` alongside the XML
  * types), both encodings of the public format:
  *
  *  - binary: 80-byte header, u32 triangle count, then 50-byte records
  *    (normal 3×f32, vertices 3×3×f32, u16 attribute);
  *  - ascii: `solid` / `facet normal …` / `vertex x y z` blocks.
  *
  * Encoding detection is by structure (declared record length), not the
  * `solid` prefix alone — binary files whose header happens to start with
  * "solid" are common in the wild.
  *
  * STL repeats vertices per facet, so points are emitted per-corner
  * (point_id = 3·facet + corner) with one triangle cell per facet;
  * `MeshOps.mergeDuplicatePoints` is the downstream welding step, same as
  * the reference's clean filter.
  */
object StlSource {

  final case class StlMesh(
      normals: Array[Array[Double]],   // (F, 3)
      vertices: Array[Array[Double]])  // (3F, 3)

  def parse(bytes: Array[Byte]): StlMesh = {
    if (isBinary(bytes)) parseBinary(bytes) else parseAscii(bytes)
  }

  private def isBinary(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 84) return false
    val n = ByteBuffer.wrap(bytes, 80, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    // tolerate trailing padding/newlines after the declared records (common
    // in the wild); an ascii file can't satisfy the length relation AND
    // lack "facet" in its head
    val head = new String(bytes, 0, math.min(512, bytes.length), "ISO-8859-1")
    n > 0 && bytes.length >= 84L + 50L * n && !head.contains("facet")
  }

  private def parseBinary(bytes: Array[Byte]): StlMesh = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(80)
    val normals = Array.ofDim[Array[Double]](n)
    val vertices = Array.ofDim[Array[Double]](3 * n)
    var f = 0
    while (f < n) {
      val base = 84 + 50 * f
      normals(f) = Array(buf.getFloat(base).toDouble,
        buf.getFloat(base + 4).toDouble, buf.getFloat(base + 8).toDouble)
      var c = 0
      while (c < 3) {
        val vb = base + 12 + 12 * c
        vertices(3 * f + c) = Array(buf.getFloat(vb).toDouble,
          buf.getFloat(vb + 4).toDouble, buf.getFloat(vb + 8).toDouble)
        c += 1
      }
      f += 1
    }
    StlMesh(normals, vertices)
  }

  private def parseAscii(bytes: Array[Byte]): StlMesh = {
    val text = new String(bytes, "US-ASCII")
    require(text.contains("solid"),
      "not an STL file: no binary record structure and no ascii 'solid' keyword")
    val normals = Array.newBuilder[Array[Double]]
    val vertices = Array.newBuilder[Array[Double]]
    var nVerts = 0
    text.linesIterator.map(_.trim).foreach { line =>
      if (line.startsWith("facet normal")) {
        val t = line.split("\\s+")
        require(t.length >= 5, s"malformed facet line: $line")
        normals += Array(t(2).toDouble, t(3).toDouble, t(4).toDouble)
      } else if (line.startsWith("vertex")) {
        val t = line.split("\\s+")
        require(t.length >= 4, s"malformed vertex line: $line")
        vertices += Array(t(1).toDouble, t(2).toDouble, t(3).toDouble)
        nVerts += 1
      }
    }
    val m = StlMesh(normals.result(), vertices.result())
    require(m.vertices.length == 3 * m.normals.length,
      s"ascii STL: ${m.vertices.length} vertices for ${m.normals.length} facets")
    m
  }

  /** Long-model tables from a glob of `.stl` files: (points, cells,
    * cell_data with the facet normal components), mesh keyed by path.
    */
  def read(spark: SparkSession, pathGlob: String,
           globFilter: String = "*.stl"): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter).load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val meshes = raw.map { case (path, bytes) =>
      val m = parse(bytes)
      (path, m.normals.map(a => (a(0), a(1), a(2))),
        m.vertices.map(a => (a(0), a(1), a(2))))
    }.persist()

    val points = meshes.flatMap { case (path, _, vs) =>
      vs.iterator.zipWithIndex.map { case ((x, y, z), i) =>
        (path, i.toLong, x, y, z)
      }.toSeq
    }.toDF("mesh_id", "point_id", "x", "y", "z")
    val cells = meshes.flatMap { case (path, ns, _) =>
      ns.indices.map(f =>
        (path, f.toLong, Seq(3L * f, 3L * f + 1, 3L * f + 2), 5)) // VTK_TRIANGLE
    }.toDF("mesh_id", "cell_id", "vertices", "cell_type")
    val cellData = meshes.flatMap { case (path, ns, _) =>
      ns.iterator.zipWithIndex.flatMap { case ((nx, ny, nz), f) =>
        Seq((path, f.toLong, "normal_x", nx), (path, f.toLong, "normal_y", ny),
          (path, f.toLong, "normal_z", nz))
      }.toSeq
    }.toDF("mesh_id", "cell_id", "field", "value")
    (points, cells, cellData)
  }
}
