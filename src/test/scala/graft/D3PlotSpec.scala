package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.D3PlotSource

/** D3plot binary decode: a synthetic fixture written word-for-word per the
  * public LS-DYNA database layout (64-word control block, geometry, state
  * data, EOF marker) must decode byte-exactly into the long model, and
  * compose with the von Mises kernel.
  */
class D3PlotSpec extends SparkSpec {

  // fixture: 4 nodes, 1 quad shell, 2 states, MAXINT=2 layers
  private val coords = Array(
    Array(0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f),
    Array(1.0f, 1.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
  private val state0Coords = coords
  private val state1Coords = coords.map(c => Array(c(0) + 0.5f, c(1), c(2) - 0.25f))
  // layer stresses chosen so the layer MEAN is a pure shear τxy=3 at t1
  private val t1Stress = Array( // (layer, voigt6)
    Array(10f, 10f, 10f, 2f, 0f, 0f), Array(10f, 10f, 10f, 4f, 0f, 0f))
  private val t1Epsp = Array(0.01f, 0.03f)

  private def fixtureBytes(title: String): Array[Byte] = {
    val numnp = 4; val nel4 = 1; val maxint = 2; val nglbv = 2
    val nv2d = maxint * 7
    val nStates = 2
    val stateWords = 1 + nglbv + numnp * 3 + nel4 * nv2d
    val total = 64 + numnp * 3 + nel4 * 5 + nStates * stateWords + 1
    val bb = ByteBuffer.allocate(total * 4).order(ByteOrder.LITTLE_ENDIAN)
    def pad(s: String, n: Int) = s.padTo(n, ' ').take(n)
    bb.put(pad(title, 40).getBytes("US-ASCII"))        // words 0-9: TITLE
    (10 until 64).foreach { w =>
      w match {
        case 15 => bb.putInt(4)       // NDIM (4 = 3-D)
        case 16 => bb.putInt(numnp)   // NUMNP
        case 18 => bb.putInt(nglbv)   // NGLBV
        case 20 => bb.putInt(1)       // IU
        case 31 => bb.putInt(nel4)    // NEL4
        case 32 => bb.putInt(1)       // NUMMAT4
        case 33 => bb.putInt(nv2d)    // NV2D
        case 36 => bb.putInt(maxint)  // MAXINT
        case _  => bb.putInt(0)
      }
    }
    coords.foreach(c => c.foreach(bb.putFloat))        // geometry: nodes
    Seq(1, 2, 3, 4).foreach(bb.putInt); bb.putInt(7)   // shell conn (1-based) + part
    // states
    Seq((0.0f, state0Coords, Array(Array.fill(6)(0f), Array.fill(6)(0f)), Array(0f, 0f)),
        (1.5f, state1Coords, t1Stress, t1Epsp)).foreach {
      case (time, cs, stress, epsp) =>
        bb.putFloat(time)
        (0 until nglbv).foreach(_ => bb.putFloat(99f)) // globals (skipped)
        cs.foreach(c => c.foreach(bb.putFloat))
        (0 until maxint).foreach { l =>
          stress(l).foreach(bb.putFloat); bb.putFloat(epsp(l))
        }
    }
    bb.putFloat(-999999.0f)                            // EOF marker
    bb.array()
  }

  test("parse: control block, geometry, states decode word-exactly") {
    val f = D3PlotSource.parse(fixtureBytes("crash run 1"))
    assert(f.title == "crash run 1")
    assert(f.coords.map(_.toSeq).toSeq == coords.map(_.toSeq).toSeq)
    assert(f.solids.isEmpty)
    assert(f.shells.length == 1)
    assert(f.shells(0)._1.toSeq == Seq(0L, 1L, 2L, 3L) && f.shells(0)._2 == 7L)
    assert(f.states.length == 2)
    assert(f.states(0).time == 0.0f && f.states(1).time == 1.5f)
    assert(f.states(1).nodeVec(2).toSeq == Seq(1.5f, 1.0f, -0.25f))
    assert(f.states(1).shellStress(0).map(_.toSeq).toSeq == t1Stress.map(_.toSeq).toSeq)
    assert(f.states(1).shellEpsp(0).toSeq == t1Epsp.toSeq)
  }

  /** General-layout fixture: word size 4/8, NEIPS extra history vars,
    * IOSHL(3)/(4) resultants, ISTRN strain tail, NARBS numbering block —
    * all the strides the decoder must SKIP without disturbing the decoded
    * stress/epsp. Extra words carry the sentinel 42 so a stride bug reads
    * it into a decoded field and fails the equality below.
    */
  private def mkFixture(ws: Int, neips: Int, ios3: Boolean, ios4: Boolean,
                        istrn: Boolean, narbs: Int, title: String): Array[Byte] = {
    val numnp = 4; val nel4 = 1; val maxint = 2; val nglbv = 2
    val nvLayer = 7 + neips
    val nv2d = maxint * nvLayer + (if (ios3) 8 else 0) + (if (ios4) 4 else 0) +
      (if (istrn) 12 else 0)
    val nStates = 2
    val stateWords = 1 + nglbv + numnp * 3 + nel4 * nv2d
    val total = 64 + numnp * 3 + nel4 * 5 + narbs + nStates * stateWords + 1
    val bb = ByteBuffer.allocate(total * ws).order(ByteOrder.LITTLE_ENDIAN)
    def pi(v: Int): Unit = { if (ws == 4) bb.putInt(v) else bb.putLong(v.toLong); () }
    def pf(v: Float): Unit = { if (ws == 4) bb.putFloat(v) else bb.putDouble(v.toDouble); () }
    bb.put(title.padTo(10 * ws, ' ').take(10 * ws).getBytes("US-ASCII"))
    (10 until 64).foreach {
      case 15 => pi(4)
      case 16 => pi(numnp)
      case 18 => pi(nglbv)
      case 20 => pi(1)
      case 31 => pi(nel4)
      case 32 => pi(1)
      case 33 => pi(nv2d)
      case 35 => pi(neips)
      case 36 => pi(maxint)
      case 39 => pi(narbs)
      case 43 => pi(1000)
      case 44 => pi(1000)
      case 45 => pi(if (ios3) 1000 else 999)
      case 46 => pi(if (ios4) 1000 else 999)
      case _ => pi(0)
    }
    coords.foreach(c => c.foreach(pf))
    Seq(1, 2, 3, 4).foreach(pi); pi(7)
    (0 until narbs).foreach(_ => pi(4242)) // numbering block, skipped
    Seq((0.0f, state0Coords, Array(Array.fill(6)(0f), Array.fill(6)(0f)), Array(0f, 0f)),
        (1.5f, state1Coords, t1Stress, t1Epsp)).foreach {
      case (time, cs, stress, epsp) =>
        pf(time)
        (0 until nglbv).foreach(_ => pf(99f))
        cs.foreach(c => c.foreach(pf))
        (0 until maxint).foreach { l =>
          stress(l).foreach(pf); pf(epsp(l))
          (0 until neips).foreach(_ => pf(42f)) // extra history, skipped
        }
        val tail = (if (ios3) 8 else 0) + (if (ios4) 4 else 0) + (if (istrn) 12 else 0)
        (0 until tail).foreach(_ => pf(42f))     // resultants/strain, skipped
    }
    pf(-999999.0f)
    bb.array()
  }

  private def assertDecodes(bytes: Array[Byte], title: String): Unit = {
    val f = D3PlotSource.parse(bytes)
    assert(f.title == title)
    assert(f.coords.map(_.toSeq).toSeq == coords.map(_.toSeq).toSeq)
    assert(f.shells.length == 1 && f.shells(0)._1.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(f.states.length == 2 && f.states(1).time == 1.5f)
    assert(f.states(1).shellStress(0).map(_.toSeq).toSeq == t1Stress.map(_.toSeq).toSeq)
    assert(f.states(1).shellEpsp(0).toSeq == t1Epsp.toSeq)
  }

  test("64-bit word files decode identically (word size auto-detected)") {
    assertDecodes(mkFixture(8, 0, ios3 = false, ios4 = false, istrn = false,
      narbs = 0, "wide run"), "wide run")
  }

  test("NEIPS history vars, IOSHL resultants, ISTRN tail, NARBS all skip cleanly") {
    assertDecodes(mkFixture(4, 3, ios3 = true, ios4 = true, istrn = true,
      narbs = 17, "rich layout"), "rich layout")
    // and the same rich layout at 64-bit words
    assertDecodes(mkFixture(8, 2, ios3 = true, ios4 = false, istrn = true,
      narbs = 9, "rich wide"), "rich wide")
  }

  test("NMSPH > 0: SPH blocks skip at documented strides, non-SPH decodes") {
    val numnp = 4; val nel4 = 1; val maxint = 2; val nglbv = 1
    val nv2d = maxint * 7
    val nmsph = 3
    // flags block: length 11, then radius/pressure/stress6/epsp/density/
    // energy/nneigh/strain6/mass word counts → 19 + material word = 20
    val isphfg = Array(11, 1, 1, 6, 1, 1, 1, 1, 6, 1)
    val numSphVars = 1 + isphfg.drop(1).sum + 1 // + mass entry below
    val stateWords = 1 + nglbv + numnp * 3 + nel4 * nv2d + nmsph * numSphVars
    val total = 64 + 11 + numnp * 3 + nel4 * 5 + nmsph * 2 + stateWords + 1
    val bb = ByteBuffer.allocate(total * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("sph run".padTo(40, ' ').getBytes("US-ASCII"))
    (10 until 64).foreach {
      case 15 => bb.putInt(4)
      case 16 => bb.putInt(numnp)
      case 18 => bb.putInt(nglbv)
      case 20 => bb.putInt(1)        // IU
      case 31 => bb.putInt(nel4)
      case 32 => bb.putInt(1)
      case 33 => bb.putInt(nv2d)
      case 36 => bb.putInt(maxint)
      case 37 => bb.putInt(nmsph)    // NMSPH
      case _ => bb.putInt(0)
    }
    isphfg.foreach(bb.putInt); bb.putInt(1)            // flags block (11 words)
    coords.foreach(_.foreach(bb.putFloat))
    Seq(1, 2, 3, 4).foreach(bb.putInt); bb.putInt(7)
    (0 until nmsph).foreach { i => bb.putInt(i + 1); bb.putInt(9) } // node+mat list
    bb.putFloat(2.5f)                                  // state: time
    bb.putFloat(99f)                                   // global (skipped)
    state1Coords.foreach(_.foreach(bb.putFloat))
    (0 until maxint).foreach { l =>
      t1Stress(l).foreach(bb.putFloat); bb.putFloat(t1Epsp(l))
    }
    (0 until nmsph * numSphVars).foreach(_ => bb.putFloat(-5f)) // SPH state data
    bb.putFloat(-999999.0f)
    val f = D3PlotSource.parse(bb.array())
    assert(f.title == "sph run")
    assert(f.coords.map(_.toSeq).toSeq == coords.map(_.toSeq).toSeq)
    assert(f.shells.length == 1 && f.shells(0)._2 == 7L)
    assert(f.states.length == 1)
    assert(f.states(0).time == 2.5f)
    assert(f.states(0).nodeVec(2).toSeq == Seq(1.5f, 1.0f, -0.25f))
    assert(f.states(0).shellStress(0).map(_.toSeq).toSeq == t1Stress.map(_.toSeq).toSeq)
    // the SPH universe itself decodes: node & material list, flag-driven
    // field labels, per-state particle words
    assert(f.sphParticles.toSeq == (0 until nmsph).map(i => (i.toLong, 9L)))
    assert(f.sphLabels == Seq("material", "radius", "pressure",
      "stress_0", "stress_1", "stress_2", "stress_3", "stress_4", "stress_5",
      "epsp", "density", "energy", "neighbors",
      "strain_0", "strain_1", "strain_2", "strain_3", "strain_4", "strain_5",
      "mass", "hist"))
    assert(f.states(0).sph.length == nmsph)
    assert(f.states(0).sph.forall(p =>
      p.length == numSphVars && p.forall(_ == -5f)))
  }

  test("SPH write -> readSph round trip: long particle universe") {
    import graft.sinks.D3PlotSink
    val s = spark
    import s.implicits._
    val pts = Seq((0L, 0L, 0.0, 0.0, 0.0), (0L, 1L, 1.0, 0.0, 0.0),
      (0L, 2L, 0.0, 1.0, 0.0)).toDF("mesh_id", "point_id", "x", "y", "z")
    val states = Seq(0, 1).flatMap(t => (0 to 2).map(i =>
      (0L, t, t * 0.5, i.toLong, i * 1.0, 0.0, 0.0)))
      .toDF("mesh_id", "t", "time", "point_id", "dx", "dy", "dz")
    val sph = Seq(0, 1).flatMap(t => (0 to 2).map(i =>
      (0L, t, i.toLong, (i % 2 + 1).toLong, (i + 1) * 0.25, (i + t) * 0.5,
        i * 0.75, (i % 7).toDouble, (i + 2) * 0.125)))
      .toDF("mesh_id", "t", "particle_id", "material", "radius", "pressure",
        "density", "neighbors", "mass")
    val dir = Files.createTempDirectory("d3psph").toString + "/store"
    D3PlotSink.writeSph(pts, states, sph, dir)
    val (particles, sphStates) = D3PlotSource.readSph(spark, s"$dir/*")
    assert(particles.count() == 3)
    assert(particles.orderBy("particle_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 1L), (1L, 1L, 2L), (2L, 2L, 1L)))
    // 2 states × 3 particles × 6 words
    assert(sphStates.count() == 36)
    val pressures = sphStates
      .filter(col("field") === "pressure" && col("t") === 1)
      .orderBy("particle_id").collect().map(_.getDouble(5))
    assert(pressures.toSeq == Seq(0.5, 1.0, 1.5))
    val mats = sphStates.filter(col("field") === "material")
      .select(sum("value")).first().getDouble(0)
    assert(mats == 2 * (1 + 2 + 1))
    spark.catalog.clearCache()
  }

  test("unsupported layouts fail loudly, not silently") {
    val good = fixtureBytes("x")
    // corrupt NV2D (word 33) to an unsupported layout
    val bad = good.clone()
    ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN).putInt(33 * 4, 11)
    val e = intercept[IllegalArgumentException] { D3PlotSource.parse(bad) }
    assert(e.getMessage.contains("NV2D"))
    val short = good.take(100)
    intercept[IllegalArgumentException] { D3PlotSource.parse(short) }
  }

  test("family files: d3plot01 continuation states append in order") {
    // continuation payload = one state, no control block: slice it out of a
    // fixture whose second state starts right after geometry + state 0
    val full = fixtureBytes("fam")
    val numnp = 4; val nglbv = 2; val nv2d = 14
    val stateWords = 1 + nglbv + numnp * 3 + nv2d
    val geomEnd = (64 + numnp * 3 + 5) * 4
    val state1Start = geomEnd + stateWords * 4
    val rootOnly = full.take(state1Start) ++ full.takeRight(4) // state0 + EOF
    val cont = full.slice(state1Start, state1Start + stateWords * 4) ++ full.takeRight(4)

    val f = D3PlotSource.parseFamily(rootOnly, Seq(cont))
    assert(f.states.length == 2)
    assert(f.states(0).time == 0.0f && f.states(1).time == 1.5f)
    assert(f.states(1).shellEpsp(0).toSeq == t1Epsp.toSeq)

    // distributed read assembles the family per run directory
    val dir = Files.createTempDirectory("d3fam").toString
    Files.createDirectories(Paths.get(dir, "run"))
    Files.write(Paths.get(dir, "run", "d3plot"), rootOnly)
    Files.write(Paths.get(dir, "run", "d3plot01"), cont)
    val (_, _, states, _) = D3PlotSource.read(spark, s"$dir/*")
    assert(states.select("t").distinct().count() == 2)
    assert(states.count() == 2 * 4)
  }

  test("parseKFile: PART→SECTION_SHELL thickness with comments and fallbacks") {
    val k =
      """$ comment header
        |*KEYWORD
        |*PART
        |left door panel
        |        1         10        100
        |*PART
        |roof
        |        2         20        100
        |*SECTION_SHELL
        |$ elform card
        |        10         2
        |      1.5       1.5       0.0       0.0
        |        20         2
        |      0.0       0.0       0.0       0.0
        |*END""".stripMargin
    val m = D3PlotSource.parseKFile(k)
    // section 10: mean of positive (1.5, 1.5) = 1.5; section 20: all zero → 0
    assert(m == Map(1L -> 1.5, 2L -> 0.0))
  }

  test("nodeThickness: incident-element average via part map") {
    val s = spark
    import s.implicits._
    // node 1 shared by parts 1 (t=1.5) and 2 (t=0.5) → 1.0; part 9 unmapped → 0
    val cells = Seq(
      ("m", 0L, Seq(0L, 1L), 1L), ("m", 1L, Seq(1L, 2L), 2L), ("m", 2L, Seq(3L), 9L)
    ).toDF("mesh_id", "cell_id", "vertices", "part_id")
    val t = D3PlotSource.nodeThickness(cells, Map(1L -> 1.5, 2L -> 0.5))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(t == Map(0L -> 1.5, 1L -> 1.0, 2L -> 0.5, 3L -> 0.0))
  }

  test("read: long tables + layer-mean von Mises compose") {
    val dir = Files.createTempDirectory("d3p").toString
    Files.createDirectories(Paths.get(dir, "run_a"))
    Files.createDirectories(Paths.get(dir, "run_b"))
    Files.write(Paths.get(dir, "run_a", "d3plot"), fixtureBytes("run a"))
    Files.write(Paths.get(dir, "run_b", "d3plot"), fixtureBytes("run b"))

    val (points, cells, states, shellData) = D3PlotSource.read(spark, s"$dir/*")
    assert(points.count() == 8 && cells.count() == 2)
    assert(states.count() == 2 * 2 * 4)          // runs × states × nodes
    assert(shellData.count() == 2 * 2 * 1 * 2)   // runs × states × cells × layers

    val vs = cells.select("vertices").collect()(0).getSeq[Long](0)
    assert(vs == Seq(0L, 1L, 2L, 3L))
    assert(cells.select("part_id").collect().map(_.getLong(0)).toSet == Set(7L))

    // layer-mean stress at t=1 is hydrostatic 10 + τxy mean(2,4)=3 → vm = 3√3
    val vm = shellData.filter(col("t") === 1)
      .groupBy(col("mesh_id"), col("cell_id"), col("t"))
      .agg(avg("sx").as("sx"), avg("sy").as("sy"), avg("sz").as("sz"),
        avg("txy").as("txy"), avg("tyz").as("tyz"), avg("tzx").as("tzx"),
        avg("epsp").as("epsp"))
      .withColumn("stress_vm", graft.functions.Physics.vonMises(
        col("sx"), col("sy"), col("sz"), col("txy"), col("tyz"), col("tzx")))
      .collect()
    assert(vm.length == 2)
    vm.foreach { r =>
      assert(math.abs(r.getAs[Double]("stress_vm") - 3 * math.sqrt(3)) < 1e-9)
      assert(math.abs(r.getAs[Double]("epsp") - 0.02) < 1e-9)
    }

    // per-state node vectors round-trip (current coords at t1)
    val d = states.filter(col("t") === 1 && col("point_id") === 2)
      .select("dx", "dy", "dz").collect()(0)
    assert((d.getDouble(0), d.getDouble(1), d.getDouble(2)) == (1.5, 1.0, -0.25))
  }
}
