package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Binary STL writer — inverse of `sources/StlSource.parse` (80-byte
  * header, u32 count, 50-byte facet records). Facet normals are computed
  * from the right-handed vertex order ((v1−v0)×(v2−v0), normalized; zero
  * for degenerate facets), matching what mesh tools expect. One
  * `<out>/mesh_<id>.stl` per mesh, assembled on executors.
  */
object StlSink {

  /** points (mesh_id, point_id, x, y, z); cells (mesh_id, cell_id,
    * vertices[3]). Returns written paths.
    */
  def write(points: DataFrame, cells: DataFrame, out: String,
            nameTemplate: String = "mesh_{id}.stl"): Seq[String] = {
    require(nameTemplate.contains("{id}"), "nameTemplate must contain {id}")
    val spark = points.sparkSession
    val pts = points.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("point_id"), col("x"), col("y"), col("z"))))
        .as("pts"))
    val cls = cells.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("cell_id"), col("vertices")))).as("cls"))
    val assembled = pts.join(cls, Seq("mesh_id"))
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val template = nameTemplate
    assembled.map { row =>
      val meshId = row.get(row.fieldIndex("mesh_id"))
      val bytes = render(row)
      val path = new org.apache.hadoop.fs.Path(
        s"$out/${template.replace("{id}", String.valueOf(meshId))}")
      val fs = path.getFileSystem(hadoopConf.value)
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      path.toString
    }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
  }

  private def render(row: Row): Array[Byte] = {
    val pts = row.getSeq[Row](row.fieldIndex("pts"))
    val cls = row.getSeq[Row](row.fieldIndex("cls"))
    val coord: Map[Long, (Float, Float, Float)] = pts.iterator.map(p =>
      p.getLong(0) -> (p.getDouble(1).toFloat, p.getDouble(2).toFloat,
        p.getDouble(3).toFloat)).toMap
    val bb = ByteBuffer.allocate(84 + 50 * cls.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("graft binary stl".padTo(80, ' ').getBytes("US-ASCII"), 0, 80)
    bb.putInt(cls.length)
    cls.foreach { c =>
      val vs = c.getSeq[Long](1)
      require(vs.length == 3, s"STL facets are triangles; cell ${c.get(0)} has ${vs.length}")
      val Seq(a, b, d) = vs.map(v => coord.getOrElse(v,
        throw new IllegalArgumentException(s"facet references point_id $v absent from points")))
      val u = (b._1 - a._1, b._2 - a._2, b._3 - a._3)
      val v = (d._1 - a._1, d._2 - a._2, d._3 - a._3)
      val n = (u._2 * v._3 - u._3 * v._2, u._3 * v._1 - u._1 * v._3,
        u._1 * v._2 - u._2 * v._1)
      val len = math.sqrt((n._1.toDouble * n._1 + n._2.toDouble * n._2 +
        n._3.toDouble * n._3))
      val (nx, ny, nz) =
        if (len > 0) ((n._1 / len).toFloat, (n._2 / len).toFloat, (n._3 / len).toFloat)
        else (0f, 0f, 0f)
      bb.putFloat(nx).putFloat(ny).putFloat(nz)
      Seq(a, b, d).foreach { p => bb.putFloat(p._1).putFloat(p._2).putFloat(p._3) }
      bb.putShort(0.toShort)
    }
    bb.array()
  }
}
