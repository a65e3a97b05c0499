package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mesh.Boundaries
import graft.operators.FieldOps

/** Field select/precision/info filters + boundary synthesis. */
class FieldBoundarySpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq((1L, 2.5, 3.5f, "k", Seq(1.0, 2.0)))
      .toDF("id", "d", "f", "s", "arr")
  }

  test("fieldSelect: include whitelist keeps keys; exclude drops; both errors") {
    assert(FieldOps.fieldSelect(df, Seq("id"), include = Seq("d")).columns.toSeq == Seq("id", "d"))
    assert(FieldOps.fieldSelect(df, Seq("id"), exclude = Seq("arr", "s")).columns.toSeq == Seq("id", "d", "f"))
    intercept[IllegalArgumentException] {
      FieldOps.fieldSelect(df, Seq("id"), include = Seq("d"), exclude = Seq("f"))
    }
    intercept[IllegalArgumentException] {
      FieldOps.fieldSelect(df, Seq("id"), include = Seq("nope"))
    }
  }

  test("precisionCast: doubles → float, recursing through arrays and structs") {
    val s = spark
    import s.implicits._
    val nested = df.select(col("id"), struct(col("d"), col("arr")).as("td"), col("arr"))
    val out = FieldOps.precisionCast(nested)
    val tdType = out.schema("td").dataType.asInstanceOf[StructType]
    assert(tdType("d").dataType == FloatType)
    assert(tdType("arr").dataType.asInstanceOf[ArrayType].elementType == FloatType)
    assert(out.schema("arr").dataType.asInstanceOf[ArrayType].elementType == FloatType)
    assert(out.schema("id").dataType == LongType)     // non-float untouched
    val r = out.select(col("td.d")).collect()(0).getFloat(0)
    assert(r == 2.5f)
  }

  test("fieldInfo: per-group inventory as JSON") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, 1.0, Option(2.0)), (1L, 3.0, None), (2L, 5.0, Option(6.0)))
      .toDF("mesh_id", "a", "b")
    val r = FieldOps.fieldInfo(d, "mesh_id", Seq("a", "b"))
      .orderBy("mesh_id").collect()
    assert(r(0).getAs[Long]("n_rows") == 2)
    val json = r(0).getAs[String]("fields_json")
    assert(json.contains("\"field\":\"a\"") && json.contains("\"n_non_null\":1"))
  }

  test("boxTunnel: six faces, res² vertices each, coordinates on the box") {
    val b = Boundaries.boxTunnel(spark, 0, 10, -1, 1, 0, 2, res = 5)
    assert(b.count() == 6 * 25)
    val names = b.select("boundary").distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("inlet", "outlet", "wall_ymin", "wall_ymax", "wall_zmin", "wall_zmax"))
    val inletX = b.filter(col("boundary") === "inlet").select("x").distinct().collect()
    assert(inletX.length == 1 && inletX(0).getDouble(0) == 0.0)
    val r = b.agg(min("x"), max("x"), min("y"), max("y"), min("z"), max("z")).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 10.0)
    assert(r.getDouble(2) == -1.0 && r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 2.0)
  }

  test("hemisphere: lattice counts, seam, inward winding, freestream split") {
    val h = Boundaries.hemisphere(spark, radius = 2.0, nTheta = 12, nPhi = 5,
      ux = 1.0, uy = 0.25, uz = 0.5)
    val rows = h.collect()
    // nTheta pole fan + 2·(nPhi-2)·nTheta strip + nTheta disk cells
    assert(rows.length == 12 + 2 * 3 * 12 + 12)
    assert(rows.map(_.getString(0)).toSet == Set("inlet", "outlet", "symmetry"))
    assert(rows.count(_.getString(0) == "symmetry") == 12)
    // reference split for these params (checked against the formula): 34 inlet
    assert(rows.count(_.getString(0) == "inlet") == 34)
    // disk cells reuse the equator ring ids (1 + 3·12 + i) and the center 49
    val diskVs = rows.filter(_.getString(0) == "symmetry")
      .flatMap(r => Seq(r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(diskVs.contains(49L) && diskVs.intersect((37L to 48L).toSet).size == 12)
    // winding is inward: recompute the normal from the lattice for a pole
    // cell and check centroid·normal < 0
    val dTheta = 2 * math.Pi / 12
    val dPhi = math.Pi / 8
    def pt(r: Int, i: Int): (Double, Double, Double) =
      if (r == -1) (0.0, 2.0, 0.0)
      else {
        val y = if (r == 3) 0.0 else 2.0 * math.cos((r + 1) * dPhi)
        val rad = 2.0 * math.sin((r + 1) * dPhi)
        (rad * math.cos((i % 12) * dTheta), y, rad * math.sin((i % 12) * dTheta))
      }
    val c0 = rows.find(_.getLong(1) == 0L).get
    def coords(v: Long): (Double, Double, Double) =
      if (v == 0L) pt(-1, 0) else pt(((v - 1) / 12).toInt, ((v - 1) % 12).toInt)
    val (p0, p1, p2) = (coords(c0.getLong(2)), coords(c0.getLong(3)), coords(c0.getLong(4)))
    val n = (
      (p1._2 - p0._2) * (p2._3 - p0._3) - (p1._3 - p0._3) * (p2._2 - p0._2),
      (p1._3 - p0._3) * (p2._1 - p0._1) - (p1._1 - p0._1) * (p2._3 - p0._3),
      (p1._1 - p0._1) * (p2._2 - p0._2) - (p1._2 - p0._2) * (p2._1 - p0._1))
    val cx = (p0._1 + p1._1 + p2._1) / 3
    val cy = (p0._2 + p1._2 + p2._2) / 3
    val cz = (p0._3 + p1._3 + p2._3) / 3
    assert(cx * n._1 + cy * n._2 + cz * n._3 < 0)
    // radius inference: max(|x|, y, |z|) over the interior
    val s = spark
    import s.implicits._
    val interior = Seq((-1.5, 0.2, 0.1), (0.3, 0.9, -1.1), (0.0, 0.4, 0.2))
      .toDF("x", "y", "z")
    assert(Boundaries.radiusFromInterior(interior) == 1.5)
  }

  test("hemisphereWithHole: exact carve, watertight seam, no degenerate cells") {
    val hole = Seq.tabulate(4) { j =>
      val a = math.Pi / 12 + j * (math.Pi / 2)
      (0.8 * math.cos(a), 0.8 * math.sin(a))
    }
    val h = Boundaries.hemisphereWithHole(spark, radius = 2.0, nTheta = 12,
      nPhi = 5, ux = 1.0, uy = 0.25, uz = 0.5, hole = hole)
    val rows = h.collect()
    // dome unchanged (12 pole + 72 strip, same freestream split), disk fan
    // replaced by the nTheta + M annulus
    assert(rows.length == 12 + 72 + 16)
    assert(rows.count(_.getString(0) == "inlet") == 34)
    val sym = rows.filter(_.getString(0) == "symmetry")
    assert(sym.length == 16)
    // exact carve: triangle areas sum to rim polygon minus hole shoelace
    val rimArea = 0.5 * 12 * 2.0 * 2.0 * math.sin(2 * math.Pi / 12)
    val holeArea = 0.5 * math.abs((0 until 4).map { j =>
      val (x0, z0) = hole(j); val (x1, z1) = hole((j + 1) % 4)
      x0 * z1 - x1 * z0
    }.sum)
    val symArea = sym.map(_.getDouble(8)).sum
    assert(math.abs(symArea - (rimArea - holeArea)) < 1e-9)
    assert(sym.forall(_.getDouble(8) > 1e-9)) // no degenerate triangles
    // every hole vertex id and the FULL equator ring participate (seam)
    val vids = sym.flatMap(r => Seq(r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(vids.intersect((49L to 52L).toSet).size == 4)
    assert(vids.intersect((37L to 48L).toSet).size == 12)
    // degenerate and non-star holes are rejected loudly
    intercept[IllegalArgumentException] {
      Boundaries.hemisphereWithHole(spark, 2.0, 12, 5, 1, 0, 0,
        Seq((0.5, 0.1), (0.6, 0.1))) // 2 vertices
    }
    intercept[IllegalArgumentException] {
      Boundaries.hemisphereWithHole(spark, 2.0, 12, 5, 1, 0, 0,
        Seq((0.5, 0.1), (0.55, 0.11), (0.6, 0.1), (0.1, 3.0))) // outside disk
    }
  }

  test("inject: keep-existing by default, overwrite replaces") {
    val s = spark
    import s.implicits._
    val existing = Seq(("inlet", 99.0)).toDF("boundary", "x")
    val gen = Boundaries.boxTunnel(spark, 0, 1, 0, 1, 0, 1, res = 2)
    val kept = Boundaries.inject(existing, gen)
    // existing inlet kept; generated inlet dropped; other 5 faces added
    assert(kept.filter(col("boundary") === "inlet").count() == 1)
    assert(kept.select("boundary").distinct().count() == 6)
    val over = Boundaries.inject(existing, gen, overwrite = true)
    assert(over.filter(col("boundary") === "inlet").count() == 4) // res²=4 grid
  }
}
