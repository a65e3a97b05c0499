package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** LS-DYNA d3plot writer — the byte-level inverse of
  * `sources/D3PlotSource.parse` (same public database layout, same
  * supported subset: 32-bit LE words, shells with NV2D = MAXINT·7, IU=1
  * node coordinates per state). Produces corpora that real LS-DYNA tooling
  * and `D3PlotSource` both read; used for sink→source round-trip gating
  * the same way `VtuSink` gates the VTU path.
  *
  * One `<out>/<mesh_id>/d3plot` per mesh, assembled per-mesh on executors
  * (collect_list — one run fits in memory, the reference's own working
  * assumption for a single simulation).
  */
object D3PlotSink {

  /** points:    (mesh_id, point_id, x, y, z)
    * cells:     (mesh_id, cell_id, vertices[4], part_id)
    * states:    (mesh_id, t, time, point_id, dx, dy, dz)
    * shellData: (mesh_id, t, cell_id, layer, sx, sy, sz, txy, tyz, tzx, epsp)
    * Layers per cell must be uniform (MAXINT). Returns written paths.
    */
  def write(points: DataFrame, cells: DataFrame, states: DataFrame,
            shellData: DataFrame, out: String, title: String = "graft"): Seq[String] = {
    val spark = points.sparkSession
    val pts = points.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("point_id"), col("x"), col("y"), col("z"))))
        .as("pts"))
    val cls = cells.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("cell_id"), col("vertices"), col("part_id"))))
        .as("cls"))
    val sts = states.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("t"), col("point_id"), col("time"),
        col("dx"), col("dy"), col("dz")))).as("sts"))
    val shd = shellData.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("t"), col("cell_id"), col("layer"),
        col("sx"), col("sy"), col("sz"), col("txy"), col("tyz"), col("tzx"),
        col("epsp")))).as("shd"))
    val assembled = pts.join(cls, Seq("mesh_id"))
      .join(sts, Seq("mesh_id")).join(shd, Seq("mesh_id"))

    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    assembled.map { row =>
      val meshId = row.get(row.fieldIndex("mesh_id"))
      val bytes = render(row, title)
      val path = new org.apache.hadoop.fs.Path(s"$out/$meshId/d3plot")
      val fs = path.getFileSystem(hadoopConf.value)
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      path.toString
    }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
  }

  /** SPH-only d3plot writer — the byte-level inverse of
    * `D3PlotSource.readSph` for the supported subset: NUMNP nodes with
    * IU=1 per-state coordinates, NMSPH = NUMNP particles (particle i bound
    * to node i+1), element-data-flags enabling scalar
    * radius/pressure/density/neighbors/mass (stress/strain/energy off), no
    * solid/shell universes.
    *
    * points: (mesh_id, point_id, x, y, z) — point_id dense from 0
    * states: (mesh_id, t, time, point_id, dx, dy, dz)
    * sph:    (mesh_id, t, particle_id, material, radius, pressure, density,
    *          neighbors, mass) — particle_id ≡ node positional index;
    *          material must not vary across states (it also feeds the
    *          static node & material list)
    */
  def writeSph(points: DataFrame, states: DataFrame, sph: DataFrame,
               out: String, title: String = "graft sph"): Seq[String] = {
    val spark = points.sparkSession
    val pts = points.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("point_id"), col("x"), col("y"), col("z"))))
        .as("pts"))
    val sts = states.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("t"), col("point_id"), col("time"),
        col("dx"), col("dy"), col("dz")))).as("sts"))
    val sp = sph.groupBy(col("mesh_id")).agg(
      sort_array(collect_list(struct(col("t"), col("particle_id"),
        col("material"), col("radius"), col("pressure"), col("density"),
        col("neighbors"), col("mass")))).as("sph"))
    val assembled = pts.join(sts, Seq("mesh_id")).join(sp, Seq("mesh_id"))
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    assembled.map { row =>
      val meshId = row.get(row.fieldIndex("mesh_id"))
      val bytes = renderSph(row, title)
      val path = new org.apache.hadoop.fs.Path(s"$out/$meshId/d3plot")
      val fs = path.getFileSystem(hadoopConf.value)
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      path.toString
    }(org.apache.spark.sql.Encoders.STRING).collect().toSeq.sorted
  }

  private def renderSph(row: Row, title: String): Array[Byte] = {
    val pts = row.getSeq[Row](row.fieldIndex("pts"))
    val sts = row.getSeq[Row](row.fieldIndex("sts"))
    val sph = row.getSeq[Row](row.fieldIndex("sph"))
    val numnp = pts.length
    val nStates = sts.iterator.map(_.getInt(0)).distinct.length
    val numSphVars = 6 // material + radius + pressure + density + neighbors + mass
    val stateWords = 1 + numnp * 3 + numnp * numSphVars
    val total = 64 + 11 + numnp * 3 + numnp * 2 + nStates * stateWords + 1
    val bb = ByteBuffer.allocate(total * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(title.padTo(40, ' ').take(40).getBytes("US-ASCII"))
    (10 until 64).foreach {
      case 15 => bb.putInt(4)        // NDIM (3-D, mass-scaled form)
      case 16 => bb.putInt(numnp)
      case 20 => bb.putInt(1)        // IU
      case 37 => bb.putInt(numnp)    // NMSPH
      case _  => bb.putInt(0)
    }
    // element data flags: length 11, then radius/pressure/stress/epsp/
    // density/energy/neighbors/strain/mass/hist per-particle word counts
    Seq(11, 1, 1, 0, 0, 1, 0, 1, 0, 1, 0).foreach(bb.putInt)
    pts.foreach { p =>
      bb.putFloat(p.getDouble(1).toFloat)
      bb.putFloat(p.getDouble(2).toFloat)
      bb.putFloat(p.getDouble(3).toFloat)
    }
    val sphByT = sph.groupBy(_.getInt(0))
    // static node & material list from the first state's materials
    val matOf = sphByT(sphByT.keys.min).iterator
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    (0 until numnp).foreach { i =>
      bb.putInt(i + 1)
      bb.putInt(matOf.getOrElse(i.toLong, throw new IllegalArgumentException(
        s"no SPH row for particle $i (dense particle_id required)")).toInt)
    }
    val byT = sts.groupBy(_.getInt(0))
    byT.keys.toSeq.sorted.foreach { t =>
      val rows = byT(t)
      require(rows.length == numnp,
        s"state $t has ${rows.length} node rows, need $numnp (dense layout)")
      val prt = sphByT.getOrElse(t, Seq.empty)
      require(prt.length == numnp,
        s"state $t has ${prt.length} SPH rows, need $numnp (dense layout)")
      bb.putFloat(rows.head.getDouble(2).toFloat) // time
      rows.foreach { r =>
        bb.putFloat(r.getDouble(3).toFloat)
        bb.putFloat(r.getDouble(4).toFloat)
        bb.putFloat(r.getDouble(5).toFloat)
      }
      prt.foreach { r =>
        require(r.getLong(2) == matOf(r.getLong(1)),
          s"particle ${r.getLong(1)} material changes across states")
        bb.putFloat(r.getLong(2).toFloat)          // material word
        (3 to 7).foreach(i => bb.putFloat(r.getDouble(i).toFloat))
      }
    }
    bb.putFloat(-999999.0f)
    bb.array()
  }

  private def render(row: Row, title: String): Array[Byte] = {
    val pts = row.getSeq[Row](row.fieldIndex("pts"))
    val cls = row.getSeq[Row](row.fieldIndex("cls"))
    val sts = row.getSeq[Row](row.fieldIndex("sts"))
    val shd = row.getSeq[Row](row.fieldIndex("shd"))
    val numnp = pts.length
    val nel4 = cls.length
    val nStates = sts.iterator.map(_.getInt(0)).distinct.length
    val maxint =
      if (shd.isEmpty) 1
      else shd.iterator.map(_.getInt(2)).max + 1
    val nv2d = maxint * 7

    // point_id -> 1-based positional node index (d3plot connectivity)
    val posOf: Map[Long, Int] =
      pts.iterator.zipWithIndex.map { case (p, i) => p.getLong(0) -> (i + 1) }.toMap

    val stateWords = 1 + numnp * 3 + nel4 * nv2d // NGLBV=0, IU=1
    val total = 64 + numnp * 3 + nel4 * 5 + nStates * stateWords + 1
    val bb = ByteBuffer.allocate(total * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(title.padTo(40, ' ').take(40).getBytes("US-ASCII"))
    (10 until 64).foreach {
      case 15 => bb.putInt(4)        // NDIM (3-D)
      case 16 => bb.putInt(numnp)
      case 20 => bb.putInt(1)        // IU
      case 31 => bb.putInt(nel4)
      case 32 => bb.putInt(1)        // NUMMAT4
      case 33 => bb.putInt(nv2d)
      case 36 => bb.putInt(maxint)
      case 43 => bb.putInt(1000)     // IOSHL(1): stress on
      case 44 => bb.putInt(1000)     // IOSHL(2): epsp on
      case 45 => bb.putInt(999)      // IOSHL(3): resultants off
      case 46 => bb.putInt(999)      // IOSHL(4): thickness+ off
      case _  => bb.putInt(0)
    }
    pts.foreach { p =>
      bb.putFloat(p.getDouble(1).toFloat)
      bb.putFloat(p.getDouble(2).toFloat)
      bb.putFloat(p.getDouble(3).toFloat)
    }
    cls.foreach { c =>
      val vs = c.getSeq[Long](1)
      require(vs.length == 4, s"d3plot shells are 4-node; cell ${c.get(0)} has ${vs.length}")
      vs.foreach(v => bb.putInt(posOf.getOrElse(v, throw new IllegalArgumentException(
        s"cell vertex references point_id $v absent from points"))))
      bb.putInt(c.getLong(2).toInt)
    }
    // states: rows already sorted by (t, point_id) / (t, cell_id, layer)
    val byT = sts.groupBy(_.getInt(0))
    val shdByT = shd.groupBy(_.getInt(0))
    byT.keys.toSeq.sorted.foreach { t =>
      val rows = byT(t)
      // the layout is DENSE: any missing row would shift every later word
      require(rows.length == numnp,
        s"state $t has ${rows.length} node rows, need $numnp (dense layout)")
      require(shdByT.get(t).forall(_.length == nel4 * maxint),
        s"state $t has ${shdByT.get(t).map(_.length).getOrElse(0)} shell rows, " +
        s"need ${nel4 * maxint} (nel4·maxint)")
      require(shdByT.contains(t) || nel4 == 0,
        s"state $t missing shell rows for $nel4 shells")
      bb.putFloat(rows.head.getDouble(2).toFloat) // time
      rows.foreach { r =>
        bb.putFloat(r.getDouble(3).toFloat)
        bb.putFloat(r.getDouble(4).toFloat)
        bb.putFloat(r.getDouble(5).toFloat)
      }
      shdByT.getOrElse(t, Seq.empty).foreach { r =>
        (3 to 9).foreach(i => bb.putFloat(r.getDouble(i).toFloat))
      }
    }
    bb.putFloat(-999999.0f)
    bb.array()
  }
}
