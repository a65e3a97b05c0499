package graft.sinks

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** NetCDF classic (CDF-1 or CDF-5) writer — the byte-level inverse of
  * `sources/NetCdfSource` for the da-domain sink path (reference
  * `domains/da/sinks/netcdf_writer.py` writes NetCDF via xarray; this
  * emits the classic container directly). One `<out>/<variable>.nc` per
  * variable, assembled per-variable on executors: a `time` record
  * dimension over a fixed (lat, lon) grid, one `<f8` record variable
  * named after the group, cells absent from the input filled with 0.
  * `version = 5` writes the 64-bit-classic container (every NON_NEG field
  * widened to INT64) — the step toward the reference's NETCDF4 output that
  * stays inside the public classic spec.
  */
object NetCdfSink {

  /** df: (variable, t, i, j, value); `shape` = (nLat, nLon); `nRecs`
    * bounds t (0-based). Returns written paths.
    */
  def writeRecordGrids(df: DataFrame, out: String, shape: (Int, Int),
                       nRecs: Int, version: Int = 1): Seq[String] = {
    require(version == 1 || version == 5, s"unsupported CDF version $version")
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
      val bytes = render(variable, row.getSeq[Row](1), nLat, nLon, nRecs, version)
      val path = new org.apache.hadoop.fs.Path(s"$out/$variable.nc")
      val fs = path.getFileSystem(hadoopConf.value)
      fs.setWriteChecksum(false)
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      path.toString
    }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
  }

  /** CF short-packed variant — the container real ERA5/GFS downloads use:
    * one int16 record variable per `<out>/<variable>.nc` carrying
    * `scale_factor`/`add_offset` (f64) and `_FillValue` (int16)
    * attributes. df: (variable, t, i, j, stored) with `stored` the ALREADY
    * quantized int16 code (quantization is the caller's SQL so the oracle
    * can mirror it); grid cells absent from the input are written as
    * `fill`. The inverse of `NetCdfSource.read(decodeCf = true)`.
    */
  def writePackedGrids(df: DataFrame, out: String, shape: (Int, Int),
                       nRecs: Int, scale: Double, offset: Double,
                       fill: Short = Short.MinValue,
                       timeUnits: Option[String] = None,
                       timeStep: Int = 1): Seq[String] = {
    val spark = df.sparkSession
    val grouped = df.groupBy(col("variable")).agg(
      collect_list(struct(col("t").cast("int").as("t"),
        col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        col("stored").cast("int").as("v"))).as("cells"))
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val (nLat, nLon) = shape
    grouped.map { row =>
      val variable = row.getString(0)
      val bytes = renderPacked(variable, row.getSeq[Row](1), nLat, nLon, nRecs,
        scale, offset, fill, timeUnits, timeStep)
      val path = new org.apache.hadoop.fs.Path(s"$out/$variable.nc")
      val fs = path.getFileSystem(hadoopConf.value)
      fs.setWriteChecksum(false)
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      path.toString
    }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
  }

  /** `timeUnits` adds a CF time COORDINATE: a second record variable
    * `time` (NC_INT, one value per record, `value = t · timeStep`) whose
    * `units` attribute carries the "<unit> since <epoch>" string — the
    * layout a real subset download has, and what
    * `NetCdfSource.read(decodeTimes = true)` converts to epoch seconds.
    * With two record variables the spec's sole-record-variable special
    * case no longer applies, so per-record slots pad to 4 bytes.
    */
  private def renderPacked(name: String, cells: Seq[Row], nLat: Int, nLon: Int,
                           nRecs: Int, scale: Double, offset: Double,
                           fill: Short, timeUnits: Option[String],
                           timeStep: Int): Array[Byte] = {
    require(!name.contains("/"),
      s"variable name '$name' contains '/' — would write outside the store")
    val perRec = nLat * nLon
    val data = Array.fill(nRecs * perRec)(fill)
    cells.foreach { c =>
      val (t, i, j, v) = (c.getInt(0), c.getInt(1), c.getInt(2), c.getInt(3))
      require(t >= 0 && t < nRecs && i >= 0 && i < nLat && j >= 0 && j < nLon,
        s"cell ($t,$i,$j) outside (${nRecs}×$nLat×$nLon)")
      require(v >= Short.MinValue && v <= Short.MaxValue && v != fill,
        s"stored code $v outside int16 or equal to the fill value $fill")
      data(t * perRec + i * nLon + j) = v.toShort
    }
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    def nm(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      o.writeInt(b.length); o.write(b)
      val r = b.length % 4; if (r != 0) o.write(new Array[Byte](4 - r))
    }
    val dataVsize = if (timeUnits.isDefined) (perRec * 2 + 3) / 4 * 4 else perRec * 2
    def header(beginTime: Long, beginData: Long): Unit = {
      o.write("CDF".getBytes); o.write(1)           // CDF-1 is what packed
      o.writeInt(nRecs)                             // subset downloads use
      o.writeInt(0x0A); o.writeInt(3)               // dims
      nm("time"); o.writeInt(0)
      nm("lat"); o.writeInt(nLat)
      nm("lon"); o.writeInt(nLon)
      o.writeInt(0); o.writeInt(0)                  // no global attrs
      o.writeInt(0x0B)
      o.writeInt(if (timeUnits.isDefined) 2 else 1) // record variables
      timeUnits.foreach { u =>                      // CF time coordinate
        val ub = u.getBytes("UTF-8")
        nm("time"); o.writeInt(1); o.writeInt(0)    // dims: (time)
        o.writeInt(0x0C); o.writeInt(1)             // one attr: units
        nm("units"); o.writeInt(2); o.writeInt(ub.length) // NC_CHAR
        o.write(ub)
        val r = ub.length % 4; if (r != 0) o.write(new Array[Byte](4 - r))
        o.writeInt(4)                               // nc_type int
        o.writeInt(4)                               // vsize per record
        o.writeInt(beginTime.toInt)
      }
      nm(name); o.writeInt(3)
      o.writeInt(0); o.writeInt(1); o.writeInt(2)   // (time, lat, lon)
      o.writeInt(0x0C); o.writeInt(3)               // CF packing attrs
      nm("scale_factor"); o.writeInt(6); o.writeInt(1); o.writeDouble(scale)
      nm("add_offset"); o.writeInt(6); o.writeInt(1); o.writeDouble(offset)
      nm("_FillValue"); o.writeInt(3); o.writeInt(1)
      o.writeShort(fill.toInt); o.write(new Array[Byte](2)) // pad to 4
      o.writeInt(3)                                 // nc_type short
      o.writeInt(dataVsize)                         // vsize per record
      o.writeInt(beginData.toInt)
    }
    header(0L, 0L)                                  // sizing pass
    val headerLen = bos.size()
    bos.reset()
    if (timeUnits.isDefined) {
      // two record variables → per-record slots pad to 4; slots interleave
      // in definition order: [time int][data shorts (padded)] per record
      header(headerLen.toLong, headerLen + 4L)
      val dataPad = dataVsize - perRec * 2
      (0 until nRecs).foreach { r =>
        o.writeInt(r * timeStep)
        (0 until perRec).foreach(i => o.writeShort(data(r * perRec + i).toInt))
        if (dataPad > 0) o.write(new Array[Byte](dataPad))
      }
    } else {
      header(0L, headerLen.toLong)
      // sole record variable → records are NOT 4-byte padded (spec special case)
      data.foreach(v => o.writeShort(v.toInt))
    }
    o.flush()
    bos.toByteArray
  }

  private def render(name: String, cells: Seq[Row],
                     nLat: Int, nLon: Int, nRecs: Int, version: Int): Array[Byte] = {
    require(!name.contains("/"),
      s"variable name '$name' contains '/' — would write outside the store")
    val wide = version == 5
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
    // NON_NEG: INT in CDF-1, INT64 in CDF-5 (section tags stay INT)
    def nn(v: Long): Unit = if (wide) o.writeLong(v) else o.writeInt(v.toInt)
    def nm(s: String): Unit = {
      // length and padding are over the UTF-8 BYTES, not Java chars
      val b = s.getBytes("UTF-8")
      nn(b.length.toLong); o.write(b)
      val r = b.length % 4; if (r != 0) o.write(new Array[Byte](4 - r))
    }
    def header(begin: Long): Unit = {
      o.write("CDF".getBytes); o.write(version)
      nn(nRecs.toLong)
      o.writeInt(0x0A); nn(3L)                     // dims
      nm("time"); nn(0L)
      nm("lat"); nn(nLat.toLong)
      nm("lon"); nn(nLon.toLong)
      o.writeInt(0); nn(0L)                        // no global attrs
      o.writeInt(0x0B); nn(1L)                     // one record variable
      nm(name); nn(3L)
      nn(0L); nn(1L); nn(2L)                       // (time, lat, lon)
      o.writeInt(0); nn(0L)                        // no var attrs
      o.writeInt(6)                                // double
      nn(perRec * 8L)                              // vsize per record
      if (wide) o.writeLong(begin) else o.writeInt(begin.toInt)
    }
    header(0L)                                     // sizing pass
    val headerLen = bos.size()
    bos.reset()
    header(headerLen.toLong)
    data.foreach(o.writeDouble)
    o.flush()
    bos.toByteArray
  }
}
