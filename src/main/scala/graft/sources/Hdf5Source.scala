package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HDF5 (NetCDF-4 container) ingestion — the read side of
  * `sinks/NetCdf4Sink`/`Hdf5Store`, emitting the same long grid model as
  * `NetCdfSource`: a `vars` table (file, variable, dims) and a `data`
  * table (file, variable, row-major pos, value). File distribution via
  * `binaryFile`, per-file decode in `flatMap` on executors.
  */
object Hdf5Source {

  def read(spark: SparkSession, pathGlob: String,
           globFilter: String = "*.nc4"): (DataFrame, DataFrame) = {
    import spark.implicits._
    // parse ONCE per file; the persisted dataset (shared by both returned
    // frames) holds decoded values, not raw file bytes — same lifecycle as
    // the other binary sources: released by unpersist/clearCache when the
    // caller is done with both frames
    val parsed = spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter).load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        graft.sinks.Hdf5Store.parse(bytes).map { case (name, dims, vals) =>
          (path, name, dims, vals)
        }
      }.persist()
    val vars = parsed.map { case (path, name, dims, _) => (path, name, dims) }
      .toDF("file", "variable", "dims")
    val data = parsed.flatMap { case (path, name, _, vals) =>
      vals.iterator.zipWithIndex.map { case (v, i) => (path, name, i.toLong, v) }
    }.toDF("file", "variable", "pos", "value")
    (vars, data)
  }
}
