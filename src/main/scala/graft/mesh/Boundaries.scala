package graft.mesh

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Hemisphere radius inferred from the interior point cloud — the max of
    * |x|, y, |z| (reference `boundaries/_geometry.py:78`
    * radius_from_interior). One aggregate, no collect beyond the scalar.
    */
  def radiusFromInterior(interior: DataFrame,
                         x: String = "x", y: String = "y", z: String = "z"): Double =
    interior.agg(greatest(max(abs(col(x))), max(col(y)), max(abs(col(z))))
      .cast("double")).head().getDouble(0)

  /** Hemispherical open-road boundaries (reference HemisphereBoundaries,
    * `generators.py:133-188` + `_geometry.py:217-345`): a triangulated
    * hemisphere y >= 0 (pole at (0, radius, 0), equator pinned to y = 0)
    * split into `inlet` (centroid·U∞ <= 0) and `outlet` (> 0) by the
    * freestream direction, plus a `symmetry` disk on y = 0 sharing the
    * equator ring vertices (watertight seam). All cells are wound so
    * normals point inward (toward the origin; +y for the disk), matching
    * the reference's winding enforcement. The disk here is a fan around
    * the origin; `hemisphereWithHole` carves a vehicle silhouette out of
    * it (the reference's constrained-Delaunay disk).
    *
    * Output: one row per triangle — (boundary, cell_id, v0, v1, v2,
    * cx, cy, cz) with shared vertex ids (0 = pole, 1 + r·nTheta + i for
    * ring r azimuth i, 1 + (nPhi-1)·nTheta = disk center). Everything is
    * derived from `spark.range` by column math: no shuffle, no collect,
    * codegen throughout — the lattice scales linearly with nTheta·nPhi.
    * `hemisphereWithHole` is the constrained variant that carves a
    * silhouette loop out of the disk.
    */
  def hemisphere(spark: SparkSession, radius: Double, nTheta: Int, nPhi: Int,
                 ux: Double, uy: Double, uz: Double): DataFrame =
    hemisphereLattice(spark, radius, nTheta, nPhi, ux, uy, uz, withDisk = true)

  private def hemisphereLattice(spark: SparkSession, radius: Double,
                                nTheta: Int, nPhi: Int,
                                ux: Double, uy: Double, uz: Double,
                                withDisk: Boolean): DataFrame = {
    require(nTheta >= 3, s"need nTheta >= 3, got $nTheta")
    require(nPhi >= 2, s"need nPhi >= 2, got $nPhi")
    val un = math.sqrt(ux * ux + uy * uy + uz * uz)
    require(un > 0.0, "freestream vector must be non-zero")
    val (dx, dy, dz) = (ux / un, uy / un, uz / un)
    val dTheta = 2.0 * math.Pi / nTheta
    val dPhi = (math.Pi / 2) / (nPhi - 1)
    val centerId = 1L + (nPhi - 1).toLong * nTheta

    // vertex lattice: r = -1 is the pole, r = -2 the disk center, ring
    // nPhi-2 is the equator with y pinned to exactly 0 (as the reference
    // pins it for the watertight seam)
    def im(i: Column): Column = pmod(i, lit(nTheta))
    def vy(r: Column): Column =
      when(r === -1, radius).when(r === -2 || r === nPhi - 2, 0.0)
        .otherwise(lit(radius) * cos((r.cast("double") + 1.0) * dPhi))
    def vrad(r: Column): Column =
      when(r < 0, 0.0).otherwise(lit(radius) * sin((r.cast("double") + 1.0) * dPhi))
    def vx(r: Column, i: Column): Column = vrad(r) * cos(im(i).cast("double") * dTheta)
    def vz(r: Column, i: Column): Column = vrad(r) * sin(im(i).cast("double") * dTheta)
    def vid(r: Column, i: Column): Column =
      when(r === -1, 0L).when(r === -2, centerId)
        .otherwise(lit(1L) + r.cast("long") * nTheta + im(i).cast("long"))

    // cell lattice as corner (ring, azimuth) indices
    val pole = spark.range(nTheta.toLong).select(
      col("id").as("cell_id"), lit(false).as("sym"),
      lit(-1).as("r0"), lit(0).as("i0"),
      lit(0).as("r1"), col("id").cast("int").as("i1"),
      lit(0).as("r2"), (col("id") + 1).cast("int").as("i2"))
    val nStrip = 2L * (nPhi - 2) * nTheta
    val strips = spark.range(nStrip).select(
      (col("id") + nTheta).as("cell_id"), lit(false).as("sym"),
      (col("id") / (2 * nTheta)).cast("int").as("r"),
      ((col("id") % (2 * nTheta)) / 2).cast("int").as("i"),
      (col("id") % 2 === 1).as("b"))
      .select(col("cell_id"), col("sym"),
        when(col("b"), col("r")).otherwise(col("r")).as("r0"),
        when(col("b"), col("i") + 1).otherwise(col("i")).as("i0"),
        (col("r") + 1).as("r1"), col("i").as("i1"),
        when(col("b"), col("r") + 1).otherwise(col("r")).as("r2"),
        (col("i") + 1).as("i2"))
    val disk = spark.range(nTheta.toLong).select(
      (col("id") + nTheta + nStrip).as("cell_id"), lit(true).as("sym"),
      lit(-2).as("r0"), lit(0).as("i0"),
      lit(nPhi - 2).as("r1"), col("id").cast("int").as("i1"),
      lit(nPhi - 2).as("r2"), (col("id") + 1).cast("int").as("i2"))

    val domeCells = pole.unionByName(strips)
    val corners = (if (withDisk) domeCells.unionByName(disk) else domeCells)
      .select(col("cell_id"), col("sym"),
        vid(col("r0"), col("i0")).as("v0"),
        vid(col("r1"), col("i1")).as("v1"),
        vid(col("r2"), col("i2")).as("v2"),
        vx(col("r0"), col("i0")).as("x0"), vy(col("r0")).as("y0"), vz(col("r0"), col("i0")).as("z0"),
        vx(col("r1"), col("i1")).as("x1"), vy(col("r1")).as("y1"), vz(col("r1"), col("i1")).as("z1"),
        vx(col("r2"), col("i2")).as("x2"), vy(col("r2")).as("y2"), vz(col("r2"), col("i2")).as("z2"))

    // centroid, natural normal, then the reference's winding enforcement:
    // hemisphere normals must point toward the origin (centroid·n < 0),
    // the symmetry disk's toward the domain (+y); swap v1/v2 otherwise
    val withC = corners
      .withColumn("cx", (col("x0") + col("x1") + col("x2")) / 3)
      .withColumn("cy", (col("y0") + col("y1") + col("y2")) / 3)
      .withColumn("cz", (col("z0") + col("z1") + col("z2")) / 3)
      .withColumn("nx", (col("y1") - col("y0")) * (col("z2") - col("z0")) -
        (col("z1") - col("z0")) * (col("y2") - col("y0")))
      .withColumn("ny", (col("z1") - col("z0")) * (col("x2") - col("x0")) -
        (col("x1") - col("x0")) * (col("z2") - col("z0")))
      .withColumn("nz", (col("x1") - col("x0")) * (col("y2") - col("y0")) -
        (col("y1") - col("y0")) * (col("x2") - col("x0")))
      .withColumn("flip",
        when(col("sym"), col("ny") < 0)
          .otherwise(col("cx") * col("nx") + col("cy") * col("ny") + col("cz") * col("nz") > 0))
    withC.select(
      when(col("sym"), "symmetry")
        .when(col("cx") * dx + col("cy") * dy + col("cz") * dz <= 0, "inlet")
        .otherwise("outlet").as("boundary"),
      col("cell_id"),
      col("v0"),
      when(col("flip"), col("v2")).otherwise(col("v1")).as("v1"),
      when(col("flip"), col("v1")).otherwise(col("v2")).as("v2"),
      col("cx"), col("cy"), col("cz"),
      (lit(0.5) * sqrt(col("nx") * col("nx") + col("ny") * col("ny") +
        col("nz") * col("nz"))).as("area"))
  }

  /** Hemisphere with a SILHOUETTE HOLE carved out of the symmetry disk —
    * the reference's constrained-Delaunay disk (`generators.py:183-186`:
    * `silhouette_loops` + `constrained_delaunay_disk` cut the vehicle
    * outline out of y = 0). Supported subset: ONE hole loop, star-shaped
    * around the disk center (vehicle silhouettes are in practice), given
    * as (x, z) pairs strictly inside the disk. The annulus between the
    * equator ring and the hole loop is triangulated by the deterministic
    * azimuth-merge: each rim edge pairs with the last hole vertex at or
    * before its start azimuth, each hole edge with the first rim vertex at
    * or after its end azimuth — nTheta + M triangles, no overlap, exact
    * carve (total area = rim polygon − hole polygon). The hole loop is
    * bounded registry-size metadata (a silhouette), so its vertices ride
    * along as literals while the rim stays a distributed `spark.range` —
    * the lattice still scales with nTheta.
    *
    * Output schema matches [[hemisphere]]; hole vertices take ids
    * `1 + (nPhi-1)·nTheta + j` (the fan-center slot is unused).
    */
  def hemisphereWithHole(spark: SparkSession, radius: Double, nTheta: Int,
                         nPhi: Int, ux: Double, uy: Double, uz: Double,
                         hole: Seq[(Double, Double)]): DataFrame = {
    require(hole.length >= 3, s"hole needs >= 3 vertices, got ${hole.length}")
    val m = hole.length
    val dTheta = 2.0 * math.Pi / nTheta
    val dPhi = (math.Pi / 2) / (nPhi - 1)
    // azimuths, rotated so the smallest comes first; star-shapedness =
    // strictly increasing from there
    val rawAng = hole.map { case (x, z) =>
      val a = math.atan2(z, x); if (a < 0) a + 2.0 * math.Pi else a
    }
    val minIdx = rawAng.indices.minBy(rawAng)
    val ang = rawAng.drop(minIdx) ++ rawAng.take(minIdx)
    val verts = hole.drop(minIdx) ++ hole.take(minIdx)
    require(ang.zip(ang.tail).forall { case (a, b) => b > a + 1e-12 },
      "hole loop must be star-shaped around the disk center (strictly increasing azimuths)")
    verts.foreach { case (x, z) =>
      require(math.hypot(x, z) < radius * 0.999,
        s"hole vertex ($x, $z) not strictly inside the radius-$radius disk")
    }
    ang.foreach { a =>
      require(math.abs(a / dTheta - math.round(a / dTheta).toDouble) > 1e-9,
        s"hole azimuth $a collides with a rim azimuth (ambiguous merge)")
    }

    val dome = hemisphereLattice(spark, radius, nTheta, nPhi, ux, uy, uz,
      withDisk = false)

    val eqRing = nPhi - 2
    val rimBaseId = 1L + eqRing.toLong * nTheta
    val holeBaseId = 1L + (nPhi - 1).toLong * nTheta
    val cellStart = nTheta.toLong + 2L * (nPhi - 2) * nTheta
    // equator coordinates EXACTLY as the dome lattice computes them
    // (same expression tree → bit-identical doubles → watertight seam)
    val eqRad = radius * math.sin((eqRing + 1.0) * dPhi)
    def rimId(i: Column): Column = lit(rimBaseId) + pmod(i, lit(nTheta)).cast("long")
    def rimX(i: Column): Column =
      lit(eqRad) * cos(pmod(i, lit(nTheta)).cast("double") * dTheta)
    def rimZ(i: Column): Column =
      lit(eqRad) * sin(pmod(i, lit(nTheta)).cast("double") * dTheta)

    val angArr = typedLit(ang)
    val hxArr = typedLit(verts.map(_._1))
    val hzArr = typedLit(verts.map(_._2))
    // rim-edge triangles: distributed over the scale dimension nTheta
    val rimTri = spark.range(nTheta.toLong)
      .select((lit(cellStart) + col("id")).as("cell_id"), col("id").cast("int").as("i"))
      .withColumn("th", col("i").cast("double") * dTheta)
      .withColumn("cnt", size(filter(angArr, p => p <= col("th"))))
      .withColumn("aj", when(col("cnt") === 0, m - 1).otherwise(col("cnt") - 1))
      .select(col("cell_id"),
        rimId(col("i")).as("v0"), rimId(col("i") + 1).as("v1"),
        (lit(holeBaseId) + col("aj")).as("v2"),
        rimX(col("i")).as("x0"), rimZ(col("i")).as("z0"),
        rimX(col("i") + 1).as("x1"), rimZ(col("i") + 1).as("z1"),
        element_at(hxArr, col("aj") + 1).as("x2"),
        element_at(hzArr, col("aj") + 1).as("z2"))
    // hole-edge triangles: bounded by the silhouette size — driver-built
    val holeRows = (0 until m).map { j =>
      val j1 = (j + 1) % m
      val b = math.ceil(ang(j1) / dTheta).toInt % nTheta
      (cellStart + nTheta + j,
        holeBaseId + j, holeBaseId + j1, rimBaseId + b,
        verts(j)._1, verts(j)._2, verts(j1)._1, verts(j1)._2,
        eqRad * math.cos(b.toDouble * dTheta), eqRad * math.sin(b.toDouble * dTheta))
    }
    import spark.implicits._
    val holeTri = holeRows.toDF("cell_id", "v0", "v1", "v2",
      "x0", "z0", "x1", "z1", "x2", "z2")

    // y = 0 plane: normal is (0, ny, 0); winding toward +y, area = |ny|/2
    val annulus = rimTri.unionByName(holeTri)
      .withColumn("ny", (col("z1") - col("z0")) * (col("x2") - col("x0")) -
        (col("x1") - col("x0")) * (col("z2") - col("z0")))
      .withColumn("flip", col("ny") < 0)
      .select(lit("symmetry").as("boundary"), col("cell_id"),
        col("v0"),
        when(col("flip"), col("v2")).otherwise(col("v1")).as("v1"),
        when(col("flip"), col("v1")).otherwise(col("v2")).as("v2"),
        ((col("x0") + col("x1") + col("x2")) / 3).as("cx"),
        lit(0.0).as("cy"),
        ((col("z0") + col("z1") + col("z2")) / 3).as("cz"),
        (lit(0.5) * abs(col("ny"))).as("area"))
    dome.unionByName(annulus)
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
