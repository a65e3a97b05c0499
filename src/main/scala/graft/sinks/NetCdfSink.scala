package graft.sinks

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** NetCDF classic (CDF-1) writer — the byte-level inverse of
  * `sources/NetCdfSource` for the da-domain sink path (reference
  * `domains/da/sinks/netcdf_writer.py` writes NetCDF via xarray; this
  * emits the classic container directly). One `<out>/<variable>.nc` per
  * variable, assembled per-variable on executors: a `time` record
  * dimension over a fixed (lat, lon) grid, one `<f8` record variable
  * named after the group, cells absent from the input filled with 0.
  */
object NetCdfSink {

  /** df: (variable, t, i, j, value); `shape` = (nLat, nLon); `nRecs`
    * bounds t (0-based). Returns written paths.
    */
  def writeRecordGrids(df: DataFrame, out: String, shape: (Int, Int),
                       nRecs: Int): Seq[String] = {
    val spark = df.sparkSession
    val grouped = df.groupBy(col("variable")).agg(
      collect_list(struct(col("t").cast("int").as("t"),
        col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        col("value").cast("double").as("v"))).as("cells"))
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val (nLat, nLon) = shape
    grouped.map { row =>
      val variable = row.getString(0)
      val bytes = render(variable, row.getSeq[Row](1), nLat, nLon, nRecs)
      val path = new org.apache.hadoop.fs.Path(s"$out/$variable.nc")
      val fs = path.getFileSystem(hadoopConf.value)
      fs.setWriteChecksum(false)
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      path.toString
    }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
  }

  private def render(name: String, cells: Seq[Row],
                     nLat: Int, nLon: Int, nRecs: Int): Array[Byte] = {
    require(!name.contains("/"),
      s"variable name '$name' contains '/' — would write outside the store")
    val perRec = nLat * nLon
    val data = Array.fill(nRecs * perRec)(0.0)
    cells.foreach { c =>
      val (t, i, j) = (c.getInt(0), c.getInt(1), c.getInt(2))
      require(t >= 0 && t < nRecs && i >= 0 && i < nLat && j >= 0 && j < nLon,
        s"cell ($t,$i,$j) outside (${nRecs}×$nLat×$nLon)")
      data(t * perRec + i * nLon + j) = c.getDouble(3)
    }
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    def nm(s: String): Unit = {
      // length and padding are over the UTF-8 BYTES, not Java chars
      val b = s.getBytes("UTF-8")
      o.writeInt(b.length); o.write(b)
      val r = b.length % 4; if (r != 0) o.write(new Array[Byte](4 - r))
    }
    def header(begin: Int): Unit = {
      o.write("CDF".getBytes); o.write(1)
      o.writeInt(nRecs)
      o.writeInt(0x0A); o.writeInt(3)              // dims
      nm("time"); o.writeInt(0)
      nm("lat"); o.writeInt(nLat)
      nm("lon"); o.writeInt(nLon)
      o.writeInt(0); o.writeInt(0)                 // no global attrs
      o.writeInt(0x0B); o.writeInt(1)              // one record variable
      nm(name); o.writeInt(3)
      o.writeInt(0); o.writeInt(1); o.writeInt(2)  // (time, lat, lon)
      o.writeInt(0); o.writeInt(0)                 // no var attrs
      o.writeInt(6)                                // double
      o.writeInt(perRec * 8)                       // vsize per record
      o.writeInt(begin)
    }
    header(0)                                      // sizing pass
    val headerLen = bos.size()
    bos.reset()
    header(headerLen)
    data.foreach(o.writeDouble)
    o.flush()
    bos.toByteArray
  }
}
