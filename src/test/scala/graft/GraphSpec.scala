package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Atomic-graph operators: distributed prefix-sum offsets, info inventory. */
class GraphSpec extends SparkSpec {

  test("exclusivePrefixSum equals a sequential scan, under any partitioning") {
    val s = spark
    import s.implicits._
    val vals = (1 to 97).map(i => (i.toLong, (i * 7 % 13 + 1).toLong))
    val df = vals.toDF("sys_id", "natoms").repartition(7)
    for (parts <- Seq(1, 3, 8)) {
      val got = GraphOps.exclusivePrefixSum(df, "sys_id", "natoms", numPartitions = parts)
        .select("sys_id", "offset").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var acc = 0L
      vals.foreach { case (id, n) =>
        assert(got(id) == acc, s"sys $id at $parts partitions")
        acc += n
      }
    }
  }

  test("writePlan regions are disjoint and contiguous") {
    val s = spark
    import s.implicits._
    val systems = Seq(
      (1L, Seq(1, 1, 8)), (2L, Seq(6)), (3L, Seq(8, 8))
    ).toDF("sys_id", "atomic_numbers")
    val plan = GraphOps.writePlan(systems).orderBy("sys_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plan.toSeq == Seq((1L, 3L, 0L), (2L, 1L, 3L), (3L, 2L, 4L)))
  }

  test("atomicInfo: counts, species, composition") {
    val s = spark
    import s.implicits._
    val systems = Seq(
      (1L, Seq(1, 1, 8), Seq(0, 1, 2), Seq(true, true, true), -76.4)
    ).toDF("sys_id", "atomic_numbers", "edge_index_src", "pbc", "energy")
    val r = GraphOps.atomicInfo(systems).collect()(0)
    assert(r.getAs[Int]("n_atoms") == 3)
    assert(r.getAs[Int]("n_edges") == 3)
    assert(r.getAs[scala.collection.Seq[Int]]("species").toSeq == Seq(1, 8))
    assert(r.getAs[Int]("n_species") == 2)
  }

  test("perAtomFieldStats over exploded array columns") {
    val s = spark
    import s.implicits._
    val systems = Seq(
      (1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0, 5.0))
    ).toDF("sys_id", "forces")
    val r = GraphOps.perAtomFieldStats(systems, "forces").collect()(0)
    assert(r.getAs[Long]("n") == 5 && r.getAs[Double]("mean") == 3.0)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 5.0)
  }
}
