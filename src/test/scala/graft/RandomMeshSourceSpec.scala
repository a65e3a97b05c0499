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
}
