package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** ASCII VTU writer (reference `domains/mesh/sinks/mesh_vtu.py:49`): one
  * `.vtu` file per mesh, assembled per-mesh ON EXECUTORS (collect_list per
  * mesh — one index fits in memory, the reference's own working assumption)
  * and written through the Hadoop FS API so any scheme (file/hdfs/s3a)
  * works. Round-trips with `VtkXmlSource.read`.
  */
object VtuSink {

  /** Write `<out>/mesh_<id>.vtu` for each mesh. Returns written paths.
    *
    * Connectivity in a VTU file is POSITIONAL (an index into the Points array
    * as written), so `vertices` point ids are remapped to the position of each
    * point in the point_id-sorted Points array — non-contiguous ids (after
    * `dropUnusedPoints` / `mergeDuplicatePoints`+remap) stay correct. A vertex
    * referencing a point absent from `points` fails loudly.
    *
    * Cell type comes from an optional `cell_type` column in `cells` (any VTK
    * type code); without it only 3-vertex (triangle, 5) and 4-vertex
    * (tetrahedron, 10) cells are inferable — anything else throws rather than
    * silently writing a wrong type.
    */
  def write(points: DataFrame, cells: DataFrame, pointData: DataFrame,
            out: String): Seq[String] = {
    val spark = points.sparkSession
    val pts = points.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("point_id"), col("x"), col("y"), col("z"))))
        .as("pts"))
    // coalesce: a null cell_type falls through to vertex-count inference (or
    // its descriptive error) instead of an opaque executor-side NPE
    val typeCol =
      if (cells.columns.contains("cell_type"))
        coalesce(col("cell_type").cast("int"), lit(-1))
      else lit(-1)
    val cls = cells.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("cell_id"), col("vertices"), typeCol.as("cell_type"))))
        .as("cls"))
    val pd = pointData
      .groupBy(col("mesh_id"), col("field"))
      .agg(sort_array(collect_list(struct(col("point_id"), col("value")))).as("vals"))
      .groupBy(col("mesh_id"))
      .agg(sort_array(collect_list(struct(col("field"), col("vals")))).as("fields"))
    val assembled = pts.join(cls, Seq("mesh_id"))
      .join(pd, Seq("mesh_id"), "left")

    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    assembled.map { row =>
      val meshId = row.get(row.fieldIndex("mesh_id"))
      val xml = renderXml(row)
      val path = new org.apache.hadoop.fs.Path(s"$out/mesh_$meshId.vtu")
      val fs = path.getFileSystem(hadoopConf.value)
      val os = fs.create(path, true)
      try os.write(xml.getBytes("UTF-8")) finally os.close()
      path.toString
    }(Encoders.STRING).collect().toSeq.sorted
  }

  private val Encoders = org.apache.spark.sql.Encoders

  private def renderXml(row: Row): String = {
    val pts = row.getSeq[Row](row.fieldIndex("pts"))
    val cls = row.getSeq[Row](row.fieldIndex("cls"))
    val fields: Seq[Row] =
      if (row.isNullAt(row.fieldIndex("fields"))) Seq.empty
      else row.getSeq[Row](row.fieldIndex("fields"))

    val coords = pts.map(p => s"${p.getDouble(1)} ${p.getDouble(2)} ${p.getDouble(3)}")
      .mkString(" ")
    // point_id -> positional index in the Points array as written
    val posOf: Map[Long, Int] =
      pts.iterator.zipWithIndex.map { case (p, i) => p.getLong(0) -> i }.toMap
    val conn = cls.flatMap(_.getSeq[Long](1)).map { pid =>
      posOf.getOrElse(pid, throw new IllegalArgumentException(
        s"cell vertex references point_id $pid absent from points"))
    }.mkString(" ")
    val offsets = cls.scanLeft(0L)((acc, c) => acc + c.getSeq[Long](1).length)
      .drop(1).mkString(" ")
    val types = cls.map { c =>
      val explicit = c.getInt(2)
      if (explicit >= 0) explicit
      else c.getSeq[Long](1).length match {
        case 3 => 5   // VTK_TRIANGLE
        case 4 => 10  // VTK_TETRA
        case n => throw new IllegalArgumentException(
          s"cannot infer VTK cell type for $n-vertex cell ${c.get(0)}; pass a cell_type column")
      }
    }.mkString(" ")
    val pdArrays = fields.map { f =>
      val name = f.getString(0)
      val vals = f.getSeq[Row](1).map(_.getDouble(1)).mkString(" ")
      s"""    <DataArray type="Float64" Name="$name" format="ascii">$vals</DataArray>"""
    }.mkString("\n")

    s"""<?xml version="1.0"?>
       |<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
       | <UnstructuredGrid>
       |  <Piece NumberOfPoints="${pts.length}" NumberOfCells="${cls.length}">
       |   <Points>
       |    <DataArray type="Float64" NumberOfComponents="3" format="ascii">$coords</DataArray>
       |   </Points>
       |   <Cells>
       |    <DataArray type="Int64" Name="connectivity" format="ascii">$conn</DataArray>
       |    <DataArray type="Int64" Name="offsets" format="ascii">$offsets</DataArray>
       |    <DataArray type="UInt8" Name="types" format="ascii">$types</DataArray>
       |   </Cells>
       |   <PointData>
       |$pdArrays
       |   </PointData>
       |  </Piece>
       | </UnstructuredGrid>
       |</VTKFile>""".stripMargin
  }
}
