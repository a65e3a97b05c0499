package graft.mesh

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Boundary synthesis + injection (reference
  * `domains/mesh/boundaries/generators.py:70-120` BoxTunnel,
  * `boundaries/inject.py:33-73` merge): generate the six axis-aligned faces
  * of a tunnel box as boundary meshes tagged inlet / outlet / slip walls and
  * union them into the domain's boundary table keyed by boundary name —
  * generated-table union, deterministic gen, no collect.
  */
object Boundaries {

  /** Six faces of [xmin,xmax]×[ymin,ymax]×[zmin,zmax], each an `res × res`
    * vertex grid: (boundary, face_id, i, j, x, y, z). Inlet = x-min face,
    * outlet = x-max, the rest slip walls (BoxTunnel role assignment).
    */
  def boxTunnel(spark: SparkSession,
                xmin: Double, xmax: Double, ymin: Double, ymax: Double,
                zmin: Double, zmax: Double, res: Int): DataFrame = {
    val grid = spark.range(res.toLong * res)
      .select((col("id") / res).cast("int").as("i"), (col("id") % res).cast("int").as("j"))
      .withColumn("u", col("i") / (res - 1.0))
      .withColumn("v", col("j") / (res - 1.0))
    def face(name: String, id: Int, x: org.apache.spark.sql.Column,
             y: org.apache.spark.sql.Column, z: org.apache.spark.sql.Column) =
      grid.select(lit(name).as("boundary"), lit(id).as("face_id"),
        col("i"), col("j"), x.as("x"), y.as("y"), z.as("z"))
    val lx = lit(xmin) + col("u") * (xmax - xmin)
    val ly = lit(ymin) + col("u") * (ymax - ymin)
    val lyv = lit(ymin) + col("v") * (ymax - ymin)
    val lzv = lit(zmin) + col("v") * (zmax - zmin)
    Seq(
      face("inlet", 0, lit(xmin), lyv, lit(zmin) + col("u") * (zmax - zmin)),
      face("outlet", 1, lit(xmax), lyv, lit(zmin) + col("u") * (zmax - zmin)),
      face("wall_ymin", 2, lx, lit(ymin), lzv),
      face("wall_ymax", 3, lx, lit(ymax), lzv),
      face("wall_zmin", 4, lx, lyv, lit(zmin)),
      face("wall_zmax", 5, lx, lyv, lit(zmax))
    ).reduce(_ unionByName _)
  }

  /** Inject generated boundaries into a domain's boundary table (union keyed
    * by boundary name; `overwrite=false` keeps existing boundaries with the
    * same name and drops the generated clash — reference inject semantics).
    */
  def inject(existing: DataFrame, generated: DataFrame,
             overwrite: Boolean = false): DataFrame = {
    val names = existing.select("boundary").distinct()
    val cleaned =
      if (overwrite) existing.join(generated.select("boundary").distinct(),
        Seq("boundary"), "left_anti")
      else existing
    val addable =
      if (overwrite) generated
      else generated.join(names, Seq("boundary"), "left_anti")
    cleaned.unionByName(addable, allowMissingColumns = true)
  }
}
