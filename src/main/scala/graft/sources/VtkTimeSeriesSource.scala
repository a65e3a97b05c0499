package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VTK timestep-series reader — the OpenRadioss ingestion shape (reference
  * `domains/mesh/sources/openradioss.py:295-360`: a run directory holds one
  * converted VTK file per animation state, read in name-sorted order). One
  * run = one task (the reference's own unit of work); each task parses its
  * run's files in sequence through `VtkXmlSource.parseVtu`, so every
  * DataArray layout and grid type the VTK layer supports works here too.
  *
  * Tables:
  *  - points:    (run_id, point_id, x, y, z) — reference configuration (t0)
  *  - cells:     (run_id, cell_id, vertices) — topology from t0
  *  - states:    (run_id, t, point_id, px, py, pz, dx, dy, dz) — absolute
  *    positions per timestep plus displacement relative to t0 (the
  *    reference's `displacement_t{idx}` fields)
  *  - point_data:(run_id, t, point_id, field, value) — nodal fields per
  *    timestep (stress/temperature/velocity arrive here when present)
  */
object VtkTimeSeriesSource {

  def read(spark: SparkSession, rootGlob: String,
           vtkGlob: String = "*.vt[up]",
           include: Set[String] = Set.empty,
           exclude: Set[String] = Set.empty): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", vtkGlob)
      .option("recursiveFileLookup", "true").load(rootGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]

    val runs = raw
      .groupByKey { case (path, _) => path.replaceAll("/[^/]*$", "") }
      .mapGroups { (run, it) =>
        val series = it.toSeq.sortBy(_._1)
          .map { case (_, bytes) => VtkXmlSource.parseVtu(bytes, include, exclude) }
        require(series.nonEmpty, s"no VTK files in run $run")
        val n0 = series.head.points.length
        series.zipWithIndex.foreach { case (p, t) =>
          require(p.points.length == n0,
            s"run $run timestep $t has ${p.points.length} points, t0 has $n0")
        }
        (run,
          series.head.points.map(a => (a(0), a(1), a(2))),
          series.head.cells,
          series.map(p => p.points.map(a => (a(0), a(1), a(2)))),
          series.map(_.pointData.toSeq.map { case (k, v) => (k, v) }))
      }.persist()

    val points = runs.flatMap { case (run, pts, _, _, _) =>
      pts.iterator.zipWithIndex.map { case ((x, y, z), i) =>
        (run, i.toLong, x, y, z)
      }.toSeq
    }.toDF("run_id", "point_id", "x", "y", "z")
    val cells = runs.flatMap { case (run, _, cs, _, _) =>
      cs.iterator.zipWithIndex.map { case (vs, i) => (run, i.toLong, vs.toSeq) }.toSeq
    }.toDF("run_id", "cell_id", "vertices")
    // iterators, not .toSeq: the timesteps × points expansion streams out
    // of the task instead of materializing next to the held series
    val states = runs.flatMap { case (run, p0, _, series, _) =>
      series.iterator.zipWithIndex.flatMap { case (pts, t) =>
        pts.iterator.zipWithIndex.map { case ((x, y, z), i) =>
          val (x0, y0, z0) = p0(i)
          (run, t, i.toLong, x, y, z, x - x0, y - y0, z - z0)
        }
      }
    }.toDF("run_id", "t", "point_id", "px", "py", "pz", "dx", "dy", "dz")
    val pointData = runs.flatMap { case (run, p0, _, _, fieldsPerT) =>
      val nPts = p0.length
      fieldsPerT.iterator.zipWithIndex.flatMap { case (fields, t) =>
        fields.iterator.flatMap { case (field, vals) =>
          // multi-component arrays (velocity etc.): values interleave per
          // point; emit one row per (point, component) with a suffixed name
          val comps =
            if (nPts == 0 || vals.length % nPts != 0) 1
            else vals.length / nPts
          require(vals.length == nPts * comps,
            s"field $field has ${vals.length} values for $nPts points")
          vals.iterator.zipWithIndex.map { case (v, flat) =>
            val name = if (comps == 1) field else s"${field}_${flat % comps}"
            (run, t, (flat / comps).toLong, name, v)
          }
        }
      }
    }.toDF("run_id", "t", "point_id", "field", "value")
    (points, cells, states, pointData)
  }
}
