package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import RandomMeshSource.{mix, unit}

/** Seeded synthetic sources for the da and atm domains (reference
  * `domains/da/sources/random.py:39` RandomDataArraySource and
  * `domains/atm/sources/random.py:39` RandomAtomicSource): each index is an
  * independent `seed + index` stream, so any subset regenerates identically
  * — the property checkpoint/resume depends on. Values come from
  * splitmix64 (uniform) and Box-Muller (normal) rather than numpy's
  * Generator — the reference pins per-index determinism, not a bit-exact
  * stream. Both generate straight from `spark.range` in a typed map:
  * narrow, partition-parallel, no shuffle, no driver data.
  */
object RandomSynthetic {

  /** Standard normal from two uniforms (Box-Muller). */
  private def gauss(u1: Double, u2: Double): Double =
    math.sqrt(-2.0 * math.log(1.0 - u1)) * math.cos(2.0 * math.Pi * u2)

  /** Long table of (time, variable, lat, lon) grid cells: lat descends
    * 90 → -90 inclusive, lon is [0, 360) without the endpoint, time
    * advances one hour per index from 2020-01-01, values are standard
    * normal f32 — the reference DataArray contract.
    */
  def dataArrays(spark: SparkSession, nSamples: Int, nLat: Int, nLon: Int,
                 variables: Seq[String], seed: Long): DataFrame = {
    require(nSamples > 0 && nLat > 0 && nLon > 0 && variables.nonEmpty,
      "dataArrays needs positive extents and at least one variable")
    import spark.implicits._
    val vArr = variables.toArray
    val nv = vArr.length
    val perSample = nv.toLong * nLat * nLon
    val (la0, lo0) = (nLat, nLon)
    spark.range(nSamples.toLong * perSample).map { id =>
      val s = id / perSample
      val r = id % perSample
      val v = (r / (la0.toLong * lo0)).toInt
      val cell = r % (la0.toLong * lo0)
      val la = (cell / lo0).toInt
      val lo = (cell % lo0).toInt
      val base = mix(seed + s) // per-index stream: seed + index
      val value = gauss(unit(base ^ mix(r * 2 + 1)), unit(base ^ mix(r * 2 + 2))).toFloat
      val lat = if (la0 == 1) 90.0 else 90.0 - la * (180.0 / (la0 - 1))
      val lon = lo * (360.0 / lo0)
      (s, 1577836800L + s * 3600L, vArr(v), la, lo, lat, lon, value)
    }.toDF("sample_idx", "epoch_s", "variable", "lat_idx", "lon_idx",
      "lat", "lon", "value")
      .withColumn("time", timestamp_seconds(col("epoch_s"))).drop("epoch_s")
  }

  /** Common-element set the reference draws atomic numbers from. */
  val Elements: Array[Int] = Array(1, 6, 7, 8, 9, 14, 16)

  /** (atoms, systems): per-atom rows (atomic number from `Elements`,
    * position uniform in the 10 Å box, forces normal·0.5) and per-system
    * rows (energy uniform in [-500, -100) eV, 6-component Voigt stresses
    * normal·0.01, cubic cell 10 Å, no PBC).
    */
  def atoms(spark: SparkSession, nSamples: Int, nAtoms: Int,
            seed: Long): (DataFrame, DataFrame) = {
    require(nSamples > 0 && nAtoms > 0, "atoms needs positive extents")
    import spark.implicits._
    val nA = nAtoms
    val atomRows = spark.range(nSamples.toLong * nA).map { id =>
      val s = id / nA
      val a = (id % nA).toInt
      val base = mix(seed + s)
      def u(k: Long): Double = unit(base ^ mix(a.toLong * 16 + k))
      val z = Elements((u(0) * Elements.length).toInt.min(Elements.length - 1))
      (s, a.toLong, z,
        u(1) * 10.0, u(2) * 10.0, u(3) * 10.0,
        gauss(u(4), u(5)) * 0.5, gauss(u(6), u(7)) * 0.5, gauss(u(8), u(9)) * 0.5)
    }.toDF("sample_idx", "atom_id", "atomic_number",
      "x", "y", "z", "fx", "fy", "fz")
    val systemRows = spark.range(nSamples.toLong).map { s =>
      val base = mix(seed + s)
      def u(k: Long): Double = unit(base ^ mix(-1L * 16 + k))
      val energy = -500.0 + u(0) * 400.0
      val stresses = Array.tabulate(6)(i => gauss(u(2 * i + 1), u(2 * i + 2)) * 0.01)
      (s, energy, stresses.toSeq, 10.0, false)
    }.toDF("sample_idx", "energy", "stresses", "cell", "pbc")
    (atomRows, systemRows)
  }
}
