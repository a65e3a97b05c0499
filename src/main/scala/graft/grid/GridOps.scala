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

  /** Bilinear regrid of a 2-D lattice to a new resolution — the
    * weather-data resolution change (ERA5 0.25° → 1°-style regridding)
    * beside [[coarsen]]'s integer block means: endpoint-aligned mapping
    * x = i'·(srcNi−1)/(dstNi−1), each target node gathering its four
    * surrounding source nodes with the standard (1−fx)(1−fy)… weights.
    * Non-axis/value columns (field names, grid ids) key the lattice per
    * group. Shape: one bounded lattice generator (dst cells × groups),
    * one 4-way corner explode, one equi-join on the grid keys, one sum —
    * never a window, never a cartesian. Missing source cells contribute
    * nothing; `w_cover` (the summed weight actually matched, 1.0 on a
    * dense interior) is the coverage diagnostic a sparse grid reports.
    * Corner keys outside the lattice only arise with weight 0 and drop
    * harmlessly at the join.
    */
  def regridBilinear(df: DataFrame, iCol: String, jCol: String,
                     srcNi: Int, srcNj: Int, dstNi: Int, dstNj: Int,
                     valueCol: String = "value"): DataFrame = {
    require(srcNi > 1 && srcNj > 1 && dstNi > 1 && dstNj > 1,
      s"regrid needs >1 node per axis: $srcNi x $srcNj -> $dstNi x $dstNj")
    val spark = df.sparkSession
    val others = df.columns
      .filterNot(c => c == iCol || c == jCol || c == valueCol).toSeq
    val rx = (srcNi - 1).toDouble / (dstNi - 1)
    val ry = (srcNj - 1).toDouble / (dstNj - 1)
    val lattice = spark.range(dstNi).select(col("id").as("_ti"))
      .crossJoin(spark.range(dstNj).select(col("id").as("_tj")))
    val tgt = (if (others.isEmpty) lattice
               else df.select(others.map(col): _*).distinct().crossJoin(lattice))
      .withColumn("_x", col("_ti") * rx)
      .withColumn("_y", col("_tj") * ry)
      .withColumn("_i0", floor(col("_x")).cast("long"))
      .withColumn("_j0", floor(col("_y")).cast("long"))
      .withColumn("_fx", col("_x") - col("_i0"))
      .withColumn("_fy", col("_y") - col("_j0"))
    val one = lit(1.0)
    val corners = tgt.select(others.map(col) ++ Seq(col("_ti"), col("_tj"),
      explode(array(
        struct(col("_i0").as("_ci"), col("_j0").as("_cj"),
          ((one - col("_fx")) * (one - col("_fy"))).as("_w")),
        struct((col("_i0") + 1).as("_ci"), col("_j0").as("_cj"),
          (col("_fx") * (one - col("_fy"))).as("_w")),
        struct(col("_i0").as("_ci"), (col("_j0") + 1).as("_cj"),
          ((one - col("_fx")) * col("_fy")).as("_w")),
        struct((col("_i0") + 1).as("_ci"), (col("_j0") + 1).as("_cj"),
          (col("_fx") * col("_fy")).as("_w")))).as("_c")): _*)
      .select(others.map(col) ++ Seq(col("_ti"), col("_tj"),
        col("_c._ci").as(iCol), col("_c._cj").as(jCol), col("_c._w")): _*)
    corners
      // A NULL-valued source cell is an ABSENT cell for coverage purposes:
      // without this filter `sum(_w * _v)` would skip the null but
      // `sum(_w)` would still count its weight, so a null lattice cell
      // silently read as covered. Filtering before the join keeps the two
      // sums over the same row set (and prunes the join input).
      .join(df.withColumnRenamed(valueCol, "_v")
        .filter(col("_v").isNotNull)
        .withColumn(iCol, col(iCol).cast("long"))
        .withColumn(jCol, col(jCol).cast("long")),
        others :+ iCol :+ jCol)
      .groupBy(others.map(col) ++ Seq(col("_ti"), col("_tj")): _*)
      .agg(sum(col("_w") * col("_v")).as(valueCol),
        sum(col("_w")).as("w_cover"))
      .withColumnsRenamed(Map("_ti" -> iCol, "_tj" -> jCol))
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
