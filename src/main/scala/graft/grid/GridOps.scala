package graft.grid

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Structured-grid (VTI / da domain) operators over the long layout
  * `(… grid indices …, field, value)` (SURVEY §1.2: `VTISource` dense N-D
  * TensorDict → long DataFrame; `domains/mesh/sources/vti.py:17-41`).
  * Everything is a grouped aggregation or a predicate — one shuffle each,
  * partial agg first.
  */
object GridOps {

  /** Block-mean coarsening by integer factor per axis (the standard
    * multigrid restriction): groupBy(i÷f, j÷f) mean — matches xarray's
    * `coarsen(...).mean()` semantics on aligned blocks.
    */
  def coarsen(df: DataFrame, axes: Seq[String], factor: Int,
              valueCol: String = "value"): DataFrame = {
    val keys = axes.map(a => (col(a) / factor).cast("long").as(a))
    val others = df.columns.filterNot(c => axes.contains(c) || c == valueCol).map(col)
    df.groupBy(others.toIndexedSeq ++ keys: _*)
      .agg(count(lit(1)).as("n_cells"), avg(col(valueCol)).as(valueCol))
  }

  /** Axis-aligned slice: fix one grid index (the reference's slice meshes,
    * `ahmedml.py` slice mode) — pure predicate, pushes to the scan.
    */
  def slicePlane(df: DataFrame, axis: String, index: Long): DataFrame =
    df.filter(col(axis) === index).drop(axis)

  /** Window/crop by inclusive index ranges per axis. */
  def crop(df: DataFrame, ranges: Map[String, (Long, Long)]): DataFrame =
    ranges.foldLeft(df) { case (d, (axis, (lo, hi))) =>
      d.filter(col(axis) >= lo && col(axis) <= hi)
    }

  /** Physical coordinates from grid indices + origin/spacing (the VTI `grid`
    * sub-dict: origin, spacing, dimensions — `vti.py:17-41`).
    */
  def withPhysicalCoords(df: DataFrame, axes: Seq[String],
                         origin: Seq[Double], spacing: Seq[Double]): DataFrame =
    axes.zipWithIndex.foldLeft(df) { case (d, (a, ix)) =>
      d.withColumn(s"${a}_phys", lit(origin(ix)) + col(a) * spacing(ix))
    }
}
