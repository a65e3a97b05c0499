package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** NetCDF-4 flavored sink: the same record-grid contract as `NetCdfSink`
  * (df: (variable, t, i, j, value) → one file per variable, dense
  * (time, lat, lon) grid, absent cells 0), but emitting the HDF5
  * CONTAINER via `Hdf5Store` — the storage layer the reference's
  * `netcdf_writer.py:75` produces through the netCDF4 lib. One dataset
  * per file, named after the variable, dims (nRecs, nLat, nLon).
  */
object NetCdf4Sink {

  def writeRecordGrids(df: DataFrame, out: String, shape: (Int, Int),
                       nRecs: Int): Seq[String] = {
    val spark = df.sparkSession
    // honor a float16/float32 precision request on the value column
    // (FieldOps.precisionCast tag / FloatType) with the genuinely narrower
    // HDF5 dataset dtype — the reference's f16 artifact width
    // (precision.py:40-45); bfloat16 has no HDF5 standard type → f32
    val dtype = {
      val f = df.schema("value")
      val tag =
        if (f.metadata.contains(graft.operators.FieldOps.PrecisionKey))
          Some(f.metadata.getString(graft.operators.FieldOps.PrecisionKey))
        else None
      tag match {
        case Some("float16") => "f16"
        case Some("bfloat16") => "f32"
        case _ => f.dataType match {
          case org.apache.spark.sql.types.FloatType => "f32"
          case _ => "f64"
        }
      }
    }
    val grouped = df.groupBy(col("variable")).agg(
      collect_list(struct(col("t").cast("int").as("t"),
        col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        col("value").cast("double").as("v"))).as("cells"))
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val (nLat, nLon) = shape
    grouped.map { row =>
      val variable = row.getString(0)
      require(!variable.contains("/"),
        s"variable name '$variable' contains '/' — would write outside the store")
      require(!Set("time", "lat", "lon").contains(variable),
        s"variable name '$variable' collides with a coordinate dimension")
      val perRec = nLat * nLon
      val data = Array.fill(nRecs * perRec)(0.0)
      row.getSeq[Row](1).foreach { c =>
        val (t, i, j) = (c.getInt(0), c.getInt(1), c.getInt(2))
        require(t >= 0 && t < nRecs && i >= 0 && i < nLat && j >= 0 && j < nLon,
          s"cell ($t,$i,$j) outside (${nRecs}×$nLat×$nLon)")
        data(t * perRec + i * nLon + j) = c.getDouble(3)
      }
      // chunked (one record per chunk) + deflate — the layout the netCDF4
      // lib emits by default for record variables — plus the three
      // coordinate variables as netCDF-4 dimension scales (index-valued;
      // this sink's record-grid contract has no physical coordinates) and
      // a DIMENSION_LIST binding the record variable to them
      def scale(name: String, n: Int, id: Int) = Hdf5Store.H5Dataset(
        name, Seq(n.toLong), Array.tabulate(n)(_.toDouble),
        scaleName = Some(name), dimId = id)
      val bytes = Hdf5Store.renderDatasets(Seq(
        Hdf5Store.H5Dataset(
          variable, Seq(nRecs.toLong, nLat.toLong, nLon.toLong), data,
          chunkDims = Some(Seq(1L, nLat.toLong, nLon.toLong)), deflate = true,
          dimNames = Seq("time", "lat", "lon"), dtype = dtype),
        scale("time", nRecs, 0), scale("lat", nLat, 1), scale("lon", nLon, 2)))
      val path = new org.apache.hadoop.fs.Path(s"$out/$variable.nc4")
      val fs = path.getFileSystem(hadoopConf.value)
      fs.setWriteChecksum(false)
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      path.toString
    }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
  }
}
