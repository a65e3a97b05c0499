package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** VTK ImageData (`.vti`) writer — the lattice counterpart of [[VtuSink]]
  * (reference `sources/vti.py:100-143` reads the same layout): one file per
  * grid, a dense x-fastest Float64 PointData array per field on the
  * WholeExtent point lattice, appended raw encoding (UInt64 headers,
  * optional vtkZLibDataCompressor blocks). Cells of an ImageData are
  * implicit in the extent, so only PointData arrays are serialized.
  *
  * Input is the long lattice model `(grid_id, field, i, j, k, value)`;
  * lattice positions absent from the input write `fill` (dense VTK lattices
  * have a value at every point). Assembly is per (grid, field) on
  * executors — one grid's one field fits in memory, the same working
  * assumption as [[VtuSink]]'s per-mesh collect.
  */
object VtiSink {

  /** Write `<out>/grid_<id>.vti` per grid. `extent` is the POINT extent
    * `(x0, x1, y0, y1, z0, z1)` (inclusive); a 2-D lattice uses z0 = z1.
    * Returns written paths.
    */
  def write(grid: DataFrame, out: String, extent: (Int, Int, Int, Int, Int, Int),
            origin: (Double, Double, Double) = (0.0, 0.0, 0.0),
            spacing: (Double, Double, Double) = (1.0, 1.0, 1.0),
            zlib: Boolean = false, fill: Double = 0.0,
            nameTemplate: String = "grid_{id}.vti"): Seq[String] = {
    require(nameTemplate.contains("{id}"), "nameTemplate must contain {id}")
    val (x0, x1, y0, y1, z0, z1) = extent
    val nx = x1 - x0 + 1; val ny = y1 - y0 + 1; val nz = z1 - z0 + 1
    require(nx > 0 && ny > 0 && nz > 0, s"empty extent $extent")
    val spark = grid.sparkSession
    val assembled = grid
      .groupBy(col("grid_id"), col("field"))
      .agg(collect_list(struct(col("i").cast("int"), col("j").cast("int"),
        col("k").cast("int"), col("value").cast("double"))).as("vals"))
      .groupBy(col("grid_id"))
      .agg(sort_array(collect_list(struct(col("field"), col("vals")))).as("fields"))

    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val template = nameTemplate
    val (ox, oy, oz) = origin
    val (sx, sy, sz) = spacing
    val doZlib = zlib
    val fillV = fill
    assembled.map { row =>
      val gridId = row.get(row.fieldIndex("grid_id"))
      val fields = row.getSeq[Row](row.fieldIndex("fields")).map { f =>
        val dense = Array.fill(nx * ny * nz)(fillV)
        f.getSeq[Row](1).foreach { v =>
          val i = v.getInt(0) - x0; val j = v.getInt(1) - y0; val k = v.getInt(2) - z0
          require(i >= 0 && i < nx && j >= 0 && j < ny && k >= 0 && k < nz,
            s"lattice point (${v.getInt(0)},${v.getInt(1)},${v.getInt(2)}) outside extent")
          dense(i + nx * (j + ny * k)) = v.getDouble(3)
        }
        (f.getString(0), dense)
      }
      val bytes = render(fields, (x0, x1, y0, y1, z0, z1),
        (ox, oy, oz), (sx, sy, sz), doZlib)
      val path = new org.apache.hadoop.fs.Path(
        s"$out/${template.replace("{id}", String.valueOf(gridId))}")
      val fs = path.getFileSystem(hadoopConf.value)
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      path.toString
    }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
  }

  private def render(fields: Seq[(String, Array[Double])],
                     extent: (Int, Int, Int, Int, Int, Int),
                     origin: (Double, Double, Double),
                     spacing: (Double, Double, Double),
                     zlib: Boolean): Array[Byte] = {
    val payloads = fields.map { case (_, vals) =>
      VtuSink.payload(VtuSink.doubleBytes(vals), zlib)
    }
    val offsets = payloads.scanLeft(0L)(_ + _.length)
    val tags = fields.zip(offsets).map { case ((name, _), off) =>
      s"""    <DataArray type="Float64" Name="$name" format="appended" offset="$off"/>"""
    }.mkString("\n")
    val (x0, x1, y0, y1, z0, z1) = extent
    val ext = s"$x0 $x1 $y0 $y1 $z0 $z1"
    val compAttr = if (zlib) """ compressor="vtkZLibDataCompressor"""" else ""
    val head =
      s"""<?xml version="1.0"?>
         |<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" header_type="UInt64"$compAttr>
         | <ImageData WholeExtent="$ext" Origin="${origin._1} ${origin._2} ${origin._3}" Spacing="${spacing._1} ${spacing._2} ${spacing._3}">
         |  <Piece Extent="$ext">
         |   <PointData>
         |$tags
         |   </PointData>
         |   <CellData>
         |   </CellData>
         |  </Piece>
         | </ImageData>
         | <AppendedData encoding="raw">
         |  _""".stripMargin
    val tail = "\n </AppendedData>\n</VTKFile>\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.getBytes("UTF-8"))
    payloads.foreach(out.write)
    out.write(tail.getBytes("UTF-8"))
    out.toByteArray
  }
}
