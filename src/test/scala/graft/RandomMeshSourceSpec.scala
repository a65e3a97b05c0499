package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 synthetic mesh source: determinism, per-index partitioning,
  * column pruning reaching the reader.
  */
class RandomMeshSourceSpec extends SparkSpec {

  private def read(n: Long = 4, pts: Long = 50, seed: Long = 42) =
    spark.read.format("graft.sources.RandomMeshSource")
      .option("n_meshes", n).option("points_per_mesh", pts).option("seed", seed)
      .load()

  test("shape: n_meshes × points_per_mesh rows, one partition per mesh") {
    val df = read(n = 5, pts = 20)
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 5)
    val perMesh = df.groupBy("mesh_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perMesh == (0L until 5L).map(_ -> 20L).toMap)
  }

  test("same seed → identical data; different seed → different data") {
    val a = read().orderBy("mesh_id", "point_id").collect()
    val b = read().orderBy("mesh_id", "point_id").collect()
    assert(a.sameElements(b))
    val c = read(seed = 7).orderBy("mesh_id", "point_id").collect()
    assert(!a.sameElements(c))
  }

  test("column pruning reaches the scan (pruned schema in the plan)") {
    val df = read().select("mesh_id", "x")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(df.schema.fieldNames.toSeq == Seq("mesh_id", "x"))
    assert(scan.contains("mesh_id") && !scan.contains("field_b"))
    // values survive pruning identically
    val full = read().select("mesh_id", "point_id", "x").orderBy("mesh_id", "point_id").collect()
    val pruned = read().select("mesh_id", "point_id", "x").select("mesh_id", "point_id", "x")
      .orderBy("mesh_id", "point_id").collect()
    assert(full.sameElements(pruned))
  }

  test("values are in expected ranges and field_b is categorical") {
    val df = read(n = 2, pts = 200)
    val r = df.agg(min("x"), max("x"), countDistinct("field_b")).collect()(0)
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0)
    assert(r.getLong(2) == 2)
  }

  test("RandomSynthetic.dataArrays: seed+index streams, grid coordinates") {
    import graft.sources.RandomSynthetic
    def collectAll(n: Int) = RandomSynthetic
      .dataArrays(spark, n, 4, 6, Seq("a", "b"), 9L)
      .orderBy("sample_idx", "variable", "lat_idx", "lon_idx").collect()
    val two = collectAll(2)
    assert(two.length == 2 * 2 * 4 * 6)
    // deterministic
    assert(two.sameElements(collectAll(2)))
    // seed+index: sample rows are identical regardless of nSamples
    val three = collectAll(3)
    assert(two.toSeq == three.take(two.length).toSeq)
    // different seed differs
    val other = RandomSynthetic.dataArrays(spark, 2, 4, 6, Seq("a", "b"), 10L)
      .orderBy("sample_idx", "variable", "lat_idx", "lon_idx").collect()
    assert(!two.sameElements(other))
    // coordinates: lat descends 90 → -90 inclusive; lon half-open [0, 360)
    val lats = two.map(_.getAs[Double]("lat")).distinct.sorted.reverse
    assert(lats.head == 90.0 && lats.last == -90.0 && lats.length == 4)
    val lons = two.map(_.getAs[Double]("lon")).distinct.sorted
    assert(lons.head == 0.0 && lons.last == 300.0 && lons.length == 6)
    // time advances one hour per index
    val times = two.map(_.getAs[java.sql.Timestamp]("time").getTime).distinct.sorted
    assert(times.length == 2 && times(1) - times(0) == 3600L * 1000)
  }

  test("RandomSynthetic.atoms: element set, box, system scalars") {
    import graft.sources.RandomSynthetic
    val (atoms, systems) = RandomSynthetic.atoms(spark, 3, 25, 4L)
    assert(atoms.count() == 75 && systems.count() == 3)
    val zs = atoms.select("atomic_number").distinct().collect()
      .map(_.getInt(0)).toSet
    assert(zs.subsetOf(RandomSynthetic.Elements.toSet))
    val pos = atoms.agg(min(least(col("x"), col("y"), col("z"))),
      max(greatest(col("x"), col("y"), col("z")))).collect()(0)
    assert(pos.getDouble(0) >= 0.0 && pos.getDouble(1) < 10.0)
    val sys = systems.collect()
    assert(sys.forall(r => {
      val e = r.getAs[Double]("energy")
      e >= -500.0 && e < -100.0 &&
        r.getAs[scala.collection.Seq[Double]]("stresses").length == 6 &&
        r.getAs[Double]("cell") == 10.0 && !r.getAs[Boolean]("pbc")
    }))
    // deterministic per seed+index: first sample equals itself on regen
    val again = RandomSynthetic.atoms(spark, 1, 25, 4L)._1
      .orderBy("atom_id").collect()
    val first = atoms.filter(col("sample_idx") === 0).orderBy("atom_id").collect()
    assert(first.toSeq == again.toSeq)
  }
}
