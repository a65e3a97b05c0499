package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.PSink

/** Sink family (SURVEY §2.4): the reference's naming-template file layouts
  * become `partitionBy` directory layouts — Spark's write path guarantees one
  * committed file set per partition (the `partition_indices` collision
  * avoidance of `zarr_writer.py:471-512` for free).
  */
object Sinks {

  private def listPartitionDirs(out: String): Seq[String] = {
    val root = new java.io.File(out)
    if (!root.exists()) Nil
    else root.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .map(_.getPath).sorted.toSeq
  }

  /** MeshSink layout (`mesh_writer.py:71,113-146`): `{index}/...` naming
    * template → `partitionBy(index)` directories. Append mode keeps per-run
    * isolation (each task commits its own files).
    */
  def partitionedParquet(df: DataFrame, out: String,
                         partitionCols: Seq[String],
                         maxRecordsPerFile: Long = 0): Seq[String] = {
    // maxRecordsPerFile is the MeshZarrSink chunk-size budget
    // (`mesh_zarr.py:141-160`): bounds each committed file like the
    // reference bounds each zarr chunk's MB target.
    val w = df.write.mode(SaveMode.Append)
    val w2 = if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile) else w
    w2.partitionBy(partitionCols: _*).parquet(out)
    listPartitionDirs(out)
  }

  /** NetCDF4Sink year-split layout (`netcdf_writer.py:55-74`):
    * `<out>/<variable>/<year>` from the timestamp column.
    */
  def byVariableYear(df: DataFrame, out: String, varCol: String,
                     tsCol: String): Seq[String] = {
    df.withColumn("year", year(col(tsCol)))
      .write.mode(SaveMode.Append).partitionBy(varCol, "year").parquet(out)
    listPartitionDirs(out)
  }

  /** GridSidecarSink (`vti.py` memmap sidecars → zarr arrays): one zarr v2
    * array per field of a long (field, i, j, value) grid, stored beside
    * the mesh outputs as `<out>/<field>/`. A `.zgroup` marks the store
    * root so zarr tooling opens it as a group.
    */
  def gridSidecar(df: DataFrame, out: String, shape: (Long, Long),
                  chunks: (Int, Int)): Seq[String] = {
    val spark = df.sparkSession
    // one distinct pass + one write per field would otherwise recompute
    // the (possibly expensive) upstream plan N+1 times
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fields = cached.select("field").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val paths =
      try fields.map { f =>
        ZarrStore.writeArray2D(cached.filter(col("field") === f).select("i", "j", "value"),
          s"$out/$f", shape, chunks)
      } finally cached.unpersist()
    val zg = new org.apache.hadoop.fs.Path(s"$out/.zgroup")
    val fs = zg.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setWriteChecksum(false)
    val os = fs.create(zg, true)
    try os.write("""{"zarr_format":2}""".getBytes("UTF-8")) finally os.close()
    paths
  }

  /** PSink factory for the pipeline/registry layer. */
  def parquetSink(out: String, partitionCols: Seq[String]): PSink =
    PSink("parquet", Map("path" -> out, "partition_by" -> partitionCols.mkString(",")),
      df => partitionedParquet(df, out, partitionCols))
}
