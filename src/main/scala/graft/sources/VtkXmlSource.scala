package graft.sources

import java.io.ByteArrayInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VTK XML UnstructuredGrid (`.vtu`, ASCII) reader (reference
  * `domains/mesh/sources/vtk.py:74` + Rust `vtk/parser.rs:303`), Spark-first:
  *
  *  - file distribution via `binaryFile` (one row per file, content as bytes
  *    — Spark distributes listing and assigns files to tasks);
  *  - StAX streaming parse per file inside `flatMap` (iterator-in/out, no
  *    DOM materialization);
  *  - reader-level array include/exclude (`_key_filter.py:45-110`): excluded
  *    DataArrays are skipped DURING parsing, never materialized — column
  *    pruning at the reader, like the reference's key_filters;
  *  - output is the long mesh model (`mesh/MeshOps`): points / cells /
  *    point_data tables keyed by file path, ready for the mesh filter family.
  *
  * Scope: ASCII and inline base64 `format="binary"` DataArrays (little-endian,
  * UInt32/UInt64 byte-count header — the VTK default layout); the appended-
  * data section and zlib compression remain deferred.
  */
object VtkXmlSource {

  /** Decode one inline-binary DataArray payload: base64(header ++ data). */
  private def decodeBinary(b64: String, vtkType: String,
                           headerType: String): Array[Double] = {
    val bytes = java.util.Base64.getDecoder.decode(b64.replaceAll("\\s", ""))
    val headerLen = if (headerType == "UInt64") 8 else 4
    val buf = java.nio.ByteBuffer.wrap(bytes, headerLen, bytes.length - headerLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vtkType match {
      case "Float64" =>
        Array.fill((bytes.length - headerLen) / 8)(buf.getDouble)
      case "Float32" =>
        Array.fill((bytes.length - headerLen) / 4)(buf.getFloat.toDouble)
      case "Int64" =>
        Array.fill((bytes.length - headerLen) / 8)(buf.getLong.toDouble)
      case "Int32" =>
        Array.fill((bytes.length - headerLen) / 4)(buf.getInt.toDouble)
      case "UInt8" =>
        Array.fill(bytes.length - headerLen)((buf.get() & 0xff).toDouble)
      case other => throw new IllegalArgumentException(s"unsupported binary type $other")
    }
  }

  final case class VtuPiece(
      points: Array[Array[Double]],              // (n, 3)
      cells: Array[Array[Long]],                 // ragged connectivity
      pointData: Map[String, Array[Double]])

  /** Parse one ASCII .vtu byte payload. `include`/`exclude` act on PointData
    * array names (include wins if both; empty include = all).
    */
  def parseVtu(bytes: Array[Byte], include: Set[String] = Set.empty,
               exclude: Set[String] = Set.empty): VtuPiece = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(bytes))

    var section = ""                              // Points | Cells | PointData
    var arrayName = ""
    var arrayFormat = "ascii"
    var arrayType = "Float64"
    var headerType = "UInt32"
    var keepArray = false
    val text = new StringBuilder
    var pointsFlat: Array[Double] = Array.empty
    var connectivity: Array[Long] = Array.empty
    var offsets: Array[Long] = Array.empty
    val pointData = mutable.LinkedHashMap.empty[String, Array[Double]]

    def wanted(name: String): Boolean =
      (include.isEmpty || include.contains(name)) && !exclude.contains(name)

    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "VTKFile" =>
                headerType = Option(r.getAttributeValue(null, "header_type"))
                  .getOrElse("UInt32")
              case "Points" | "Cells" | "PointData" => section = r.getLocalName
              case "DataArray" =>
                arrayName = Option(r.getAttributeValue(null, "Name")).getOrElse("")
                arrayFormat = Option(r.getAttributeValue(null, "format")).getOrElse("ascii")
                arrayType = Option(r.getAttributeValue(null, "type")).getOrElse("Float64")
                keepArray = section match {
                  case "Points" => true
                  case "Cells" => arrayName == "connectivity" || arrayName == "offsets"
                  case "PointData" => wanted(arrayName)
                  case _ => false
                }
                text.clear()
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (keepArray) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "DataArray" if keepArray =>
                val nums: Array[Double] =
                  if (arrayFormat == "binary")
                    decodeBinary(text.toString, arrayType, headerType)
                  else text.toString.trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
                section match {
                  case "Points" => pointsFlat = nums
                  case "Cells" if arrayName == "connectivity" => connectivity = nums.map(_.toLong)
                  case "Cells" if arrayName == "offsets" => offsets = nums.map(_.toLong)
                  case "PointData" => pointData(arrayName) = nums
                  case _ =>
                }
                keepArray = false
              case "Points" | "Cells" | "PointData" => section = ""
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()

    val pts = pointsFlat.grouped(3).toArray
    val cells = {
      val out = Array.newBuilder[Array[Long]]
      var start = 0L
      offsets.foreach { off =>
        out += connectivity.slice(start.toInt, off.toInt)
        start = off
      }
      out.result()
    }
    VtuPiece(pts, cells, pointData.toMap)
  }

  /** Long-model tables from a glob of ASCII .vtu files:
    * (points, cells, point_data), mesh keyed by file path.
    */
  def read(spark: SparkSession, pathGlob: String,
           include: Set[String] = Set.empty,
           exclude: Set[String] = Set.empty): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.vtu").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]

    val pieces = raw.map { case (path, bytes) =>
      val p = parseVtu(bytes, include, exclude)
      (path, p.points.map(a => (a(0), a(1), a(2))), p.cells,
        p.pointData.toSeq.map { case (k, v) => (k, v) })
    }.persist()

    val points = pieces.flatMap { case (path, pts, _, _) =>
      pts.zipWithIndex.map { case ((x, y, z), i) => (path, i.toLong, x, y, z) }
    }.toDF("mesh_id", "point_id", "x", "y", "z")
    val cells = pieces.flatMap { case (path, _, cs, _) =>
      cs.zipWithIndex.map { case (vs, i) => (path, i.toLong, vs.toSeq) }
    }.toDF("mesh_id", "cell_id", "vertices")
    val pointData = pieces.flatMap { case (path, _, _, pd) =>
      pd.flatMap { case (field, vals) =>
        vals.zipWithIndex.map { case (v, i) => (path, i.toLong, field, v) }
      }
    }.toDF("mesh_id", "point_id", "field", "value")
    (points, cells, pointData)
  }
}
